#!/usr/bin/env python3
"""Mechanical per-query band table for BASELINE.md (builder tooling).

Inputs: a fresh full-suite Bench stdout (the long JSON line with the
per-query map) plus whatever per-query values survive in the driver's
BENCH_r*.json tail captures. Per gate, band = [0.7 x min(samples),
1.6 x max(samples)] -- the 0.7/1.6 spread covers the documented
shared-host drift (BASELINE.md round-4 note: +/-5-20 pct across
untouched queries, occasional 1.5x on streaming replays); the driver's
hard contract stays 2x of band midpoint. Emits a markdown table sorted
by gate name and a total band.

Usage: python3 tools/make_bands.py <fresh_bench_stdout> [BENCH_rN.json ...]
"""
import json, re, sys

def from_bench_stdout(path):
    for line in open(path):
        if '"queries"' in line:
            q = json.loads(line)["queries"]
            # Bench reports -1.0 when every sample of a gate failed;
            # that is a failed RUN, not a timing — refuse to band it
            failed = sorted(k for k, v in q.items() if v < 0)
            if failed:
                raise SystemExit(f"refusing to band a failed run: {failed}")
            return q
    raise SystemExit(f"no queries line in {path}")

def from_driver_artifact(path, gate_names):
    # Three accepted shapes: (a) Bench's own bench_per_gate.json (or a
    # committed BENCH_PER_GATE_r*.json copy) with a full "queries" map
    # — the complete per-gate record, preferred; (b) a driver
    # BENCH_r*.json whose "tail" capture truncates the head — scavenge
    # "name":value pairs; either way keep ONLY keys that are gates in
    # the fresh run — a non-gate numeric field (total/elapsed/...)
    # must never be banded as a query.
    doc = json.load(open(path))
    if "queries" in doc:
        return {k: float(v) for k, v in doc["queries"].items()
                if k in gate_names and float(v) >= 0}
    txt = doc.get("tail", "")
    out = {}
    for m in re.finditer(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', txt):
        k, v = m.group(1), float(m.group(2))
        if k in gate_names:
            out[k] = v
    return out

fresh = from_bench_stdout(sys.argv[1])
hist = [from_driver_artifact(p, set(fresh)) for p in sys.argv[2:]]

print("| gate | min-of-4 sec (r7) | prior samples | band (sec) |")
print("|---|---|---|---|")
lo_t = hi_t = 0.0
for q in sorted(fresh):
    samples = [fresh[q]] + [h[q] for h in hist if q in h]
    lo, hi = 0.7 * min(samples), 1.6 * max(samples)
    lo_t += lo; hi_t += hi
    prior = ", ".join(f"{h[q]:.2f}" for h in hist if q in h) or "—"
    print(f"| {q} | {fresh[q]:.2f} | {prior} | {lo:.2f}–{hi:.2f} |")
print(f"| **total ({len(fresh)} gates)** | "
      f"**{sum(fresh.values()):.1f}** | — | **{lo_t:.0f}–{hi_t:.0f}** |")
