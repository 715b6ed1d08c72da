#!/bin/bash
# Round-3 TPU perf A/B sweep (VERDICT r2 #2). Run when the tunnel is live:
#   bash scripts/tpu_ab_sweep.sh [results_file]
#
# Sequential full-bench runs (the only honest A/B granularity — isolated
# microbenches measure dispatch latency, PERF.md). Each run exits cleanly;
# never kill one mid-TPU-use (that wedges the tunnel). The persistent
# compile cache (.jax_cache) makes repeat configs cheap; expect the FIRST
# run to spend 10-20 min in remote compiles.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/ab_sweep_results.txt}"
: > "$OUT"

run() {
  local name="$1"; shift
  echo "== $name ==" | tee -a "$OUT"
  # generous timeout: first compile through the remote-compile service is
  # slow; a clean timeout beats a hung round. Per-config stderr: a failed
  # config must stay diagnosable after later runs (round 3: attn_pallas
  # died silently and the next run overwrote its traceback)
  timeout 3600 env "$@" python bench.py 2>"/tmp/ab_stderr.$name.log" | tail -1 | tee -a "$OUT"
  # $? is tee's (always 0): record bench.py's own status (124 = timeout)
  echo "rc=${PIPESTATUS[0]} $(date -u +%H:%M:%S)" | tee -a "$OUT"
}

# Ordered by expected value: a usable tunnel window may not outlast the
# sweep, so the anchors and the biggest candidate levers go first.
# 1. baseline = defaults (warm split 2/4, half reuse OFF, refine auto=pallas)
run baseline_defaults FRODO_DUMMY=
# 2. score-only warm refine (no window search at all on warm frames; the
# center descriptor probe rides the occlusion gather — ops/matching.py;
# oracle-ATE A/B in PERF.md)
run warm_d0 FRODO_BENCH_DILATION_WARM=-1
# 3. model dtype lever (DPT convs on MXU at bf16)
run head_bf16 FRODO_BENCH_HEAD_DTYPE=bfloat16
# 4. refine kernel layout A/B
run refine_pallas_tile FRODO_BENCH_REFINE=pallas_tile
# 5. backend symmetric decode strategy (PERF.md r3: 2N-batch DPT heads
# measured 113.6 ms vs 2x20.9 ms asymmetric)
run sym_asym2 FRODO_BENCH_SYM_IMPL=asym2
# 6. combined best-guess (edit after 1-5 if the winners differ)
run combined_d0_bf16 FRODO_BENCH_DILATION_WARM=-1 FRODO_BENCH_HEAD_DTYPE=bfloat16
# 7. intermediate warm reach (oracle-ATE-neutral; fallback if d0 regresses)
run warm_d1 FRODO_BENCH_DILATION_WARM=1
# 8. isolate the warm split (turn it off)
run no_warm_split FRODO_BENCH_DILATION_WARM=0 FRODO_BENCH_MAXITER_WARM=0
# 9. the half reuse (ON — default off per the async-stream pathology, PERF.md r3)
run half_reuse FRODO_BENCH_HALF=1
# 10. remaining kernel/attention variants
run refine_shift FRODO_BENCH_REFINE=shift
run attn_pallas FRODO_BENCH_ATTN=pallas

# 8. eval-mode f64 BA solve cost (VERDICT r2 #7; not a bench A/B — the
# real-time path stays f32, this prices the eval default)
echo "== f64_ba_solve ==" | tee -a "$OUT"
timeout 3600 python scripts/profile_f64_ba.py 2>>/tmp/ab_stderr.log | tee -a "$OUT"

echo "sweep done -> $OUT"
