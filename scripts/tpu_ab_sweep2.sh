#!/bin/bash
# Round-3 second-pass TPU A/B sweep: stack the first sweep's winners.
# First-pass results (/tmp/ab_sweep_results.txt, PERF.md round 3):
#   baseline 17.23 | warm_d0 18.46 (now the default) | half_reuse 20.23 |
#   head_bf16 17.78 | combined_d0_bf16 19.33
# This pass measures the half path ON TOP of the new defaults and bisects
# its stream-dependency behavior (HALF_COPY / NO_SEED).
#   bash scripts/tpu_ab_sweep2.sh [results_file]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/ab_sweep2_results.txt}"
: > "$OUT"

run() {
  local name="$1"; shift
  echo "== $name ==" | tee -a "$OUT"
  timeout 3600 env "$@" python bench.py 2>"/tmp/ab2_stderr.$name.log" | tail -1 | tee -a "$OUT"
  echo "rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)" | tee -a "$OUT"
}

# anchor on today's defaults (warm d=-1 + half reuse ON — flipped after the
# first pass measured half 20.2 vs 17.2 and the oracle ATE came back neutral)
run baseline_defaults FRODO_DUMMY=
# control: half OFF on the same build (isolates the stack's half term)
run no_half FRODO_BENCH_NO_HALF=1
# ceiling: + bf16 DPT heads
run half_bf16 FRODO_BENCH_HEAD_DTYPE=bfloat16
# stream-dependency bisects for the half path (PERF.md round-3 stall)
run half_copy FRODO_BENCH_HALF_COPY=1
run half_noseed FRODO_BENCH_NO_SEED=1

# eval-mode f64 BA solve cost (VERDICT r2 #7; first pass died on a
# remote-compile HTTP 413 whose cause is NOT program size — the lowered
# HLO is 0.24 MB; re-run to see if it was the degraded window)
echo "== f64_ba_solve ==" | tee -a "$OUT"
timeout 3600 python scripts/profile_f64_ba.py 2>>/tmp/ab2_stderr.f64.log | tee -a "$OUT"

echo "sweep2 done -> $OUT"
