#!/bin/bash
# Round-4 TPU A/B sweep: the fused refine kernel, the multi-chip
# track-only projection, the merged-scatter BA solve, and the f64 rerun.
#   bash scripts/tpu_ab_sweep3.sh [results_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/ab_sweep3_results.txt}"
: > "$OUT"

run() {
  local name="$1"; shift
  echo "== $name ==" | tee -a "$OUT"
  timeout 3600 env "$@" python bench.py 2>"/tmp/ab3_stderr.$name.log" | tail -1 | tee -a "$OUT"
  echo "rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)" | tee -a "$OUT"
}

# fused multi-level refine vs the committed auto (pallas per-level)
run refine_fused FRODO_BENCH_REFINE=fused
# the multi-chip overlap projection: per-frame path alone
run track_only FRODO_BENCH_TRACK_ONLY=1
# defaults anchor AFTER the invert/scatter merges (same window)
run defaults_post FRODO_DUMMY=

# eval-mode f64 BA solve cost (VERDICT r2 #7 / r3 #8) + the merged-scatter
# solve cost (f32 anchor was 105.2 ms isolated pre-merge)
echo "== f64_ba_solve ==" | tee -a "$OUT"
timeout 3600 python scripts/profile_f64_ba.py 2>>/tmp/ab3_stderr.f64.log | tee -a "$OUT"

echo "sweep3 done -> $OUT"
