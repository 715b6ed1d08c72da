#!/bin/bash
# Round-4 second-pass TPU sweep: re-measure entries invalidated by the
# bench-gate regression (PERF.md round-4 postmortem) + the fixed f64 path.
#   bash scripts/tpu_ab_sweep4.sh [results_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/ab_sweep4_results.txt}"
: > "$OUT"

run() {
  local name="$1"; shift
  echo "== $name ==" | tee -a "$OUT"
  timeout 3600 env "$@" python bench.py 2>"/tmp/ab4_stderr.$name.log" | tail -1 | tee -a "$OUT"
  echo "rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)" | tee -a "$OUT"
}

# multi-chip overlap projection: the per-frame path alone (valid this time)
run track_only FRODO_BENCH_TRACK_ONLY=1
# fused multi-level refine A/B (after the Mosaic-safe rewrite compiles)
run refine_fused FRODO_BENCH_REFINE=fused
# defaults anchor in the same window
run defaults FRODO_DUMMY=

# eval-mode f64 BA solve (x64 now takes the XLA edge path)
echo "== f64_ba_solve ==" | tee -a "$OUT"
timeout 3600 python scripts/profile_f64_ba.py 2>>/tmp/ab4_stderr.f64.log | tee -a "$OUT"

echo "sweep4 done -> $OUT"
