#!/bin/bash
# ETH3D SLAM training-sequence evaluation (reference scripts/eval_eth3d.sh).
set -e
# Retrieval runs DISABLED by default: without the trained retrieval
# checkpoint+codebook the fallback is a random codebook whose loop closures
# are meaningless. Set USE_RETRIEVAL=1 only when real assets exist.
RETR_FLAG="--no-retrieval"; [[ -n "$USE_RETRIEVAL" ]] && RETR_FLAG=""
ROOT=${1:-datasets/eth3d}
for seq in "$ROOT"/*/; do
  seq=$(basename "$seq")
  echo "=== $seq"
  python -m frodo_slam_tpu.main $RETR_FLAG --dataset "$ROOT/$seq" --config configs/eth3d.yaml --save-as eth3d || continue
  python -m frodo_slam_tpu.utils.ate "$ROOT/$seq/groundtruth.txt" "logs/eth3d/$seq.txt" || true
done
