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
# Usage: tools/fuzz_check.sh [seed=1337] [srcDir=/root/testdata/sf0.01]
# Writes CORRECTNESS_fuzz.json (same per-query shape as the driver's
# CORRECTNESS_r*.json) in the repo root.
set -euo pipefail
cd "$(dirname "$0")/.."

SEED="${1:-1337}"
SRC="${2:-/root/testdata/sf0.01}"
OUT="$PWD/target/fuzz/sf0.01_seed$SEED"
VOUT="/tmp/fuzz_verify_$SEED"

sbt -batch "runMain graft.FuzzGen $SRC $OUT $SEED"
sbt -batch "runMain graft.Verify $OUT $VOUT"
python3 tools/oracle_check.py "$OUT" "$VOUT" CORRECTNESS_fuzz.json
echo "[fuzz] recorded CORRECTNESS_fuzz.json (seed=$SEED)"
