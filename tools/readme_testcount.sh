#!/usr/bin/env bash
# Patch README.md's close-time test count from a captured `sbt test`
# log (VERDICT r11 ask #6: the hand-written count went stale two
# rounds running — 262→270 in r10, 273→281 in r11 — because post-close
# specs land after the paragraph is written; generating it from the
# actual close-run summary removes the failure mode).
#
# Usage: sbt -batch test 2>&1 | tee /tmp/test.log
#        tools/readme_testcount.sh /tmp/test.log
#
# README.md marks the generated number with an HTML comment so only
# the CURRENT round's count is ever rewritten (earlier rounds'
# paragraphs are historical records and keep their frozen counts):
#   <!--testcount-->NNN tests
set -euo pipefail
cd "$(dirname "$0")/.."
LOG="${1:?usage: readme_testcount.sh <sbt-test-log>}"
# the AGGREGATE sbt summary ("Passed: Total N, Failed 0") — the
# per-framework "Tests: succeeded" line counts ScalaTest only and
# misses the ScalaCheck properties (PropertiesSpec's 8)
N=$(grep -oE 'Passed: Total [0-9]+, Failed 0' "$LOG" | tail -1 \
    | grep -oE '[0-9]+' | head -1)
[ -n "${N:-}" ] || { echo "no passing test summary in $LOG" >&2; exit 1; }
grep -q '<!--testcount-->' README.md || {
  echo "README.md has no <!--testcount--> marker" >&2; exit 1; }
sed -i -E "s/<!--testcount-->[0-9]+ tests/<!--testcount-->$N tests/" README.md
echo "README test count -> $N"
