#!/usr/bin/env bash
# Second-seed fuzz of the whole gate registry (builder tooling;
# VERDICT r6 next-round item 1): every CORRECTNESS gate passes on the
# driver's seed-42 fixture — this run re-verifies all of them on a
# STRUCTURE-HONEST variant at a different seed (graft.FuzzGen: seeded
# key-space rotations applied consistently across FK columns, ~10% of
# documents salted with one token, events arrival order and all
# measures preserved). A gate whose oracle only agrees because of a
# seed-42 accident (min-id representative, doc_id%3 batch split,
# duplicate-family labeling, IVF seeding) fails here immediately.
#
# Usage: tools/fuzz_check.sh [seed=1337] [srcDir=/root/testdata/sf0.01] [mode]
#   mode=skew additionally concentrates ~30% of events on one HOT USER
#   and ~30% of documents on one HOT DOMAIN (VERDICT r7 item 6 — the
#   AQE-skew shape no uniform fixture triggers) and records
#   CORRECTNESS_fuzz_skew.json instead of CORRECTNESS_fuzz.json.
set -euo pipefail
cd "$(dirname "$0")/.."

SEED="${1:-1337}"
SRC="${2:-/root/testdata/sf0.01}"
MODE="${3:-uniform}"
OUT="$PWD/target/fuzz/sf0.01_seed${SEED}_$MODE"
VOUT="/tmp/fuzz_verify_${SEED}_$MODE"
if [ "$MODE" = "skew" ]; then REC=CORRECTNESS_fuzz_skew.json; else REC=CORRECTNESS_fuzz.json; fi

sbt -batch "runMain graft.FuzzGen $SRC $OUT $SEED $MODE"
sbt -batch "runMain graft.Verify $OUT $VOUT"
python3 tools/oracle_check.py "$OUT" "$VOUT" "$REC"
echo "[fuzz] recorded $REC (seed=$SEED mode=$MODE)"
