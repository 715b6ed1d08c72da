#!/bin/bash
# ETH3D SLAM training-sequence evaluation (reference scripts/eval_eth3d.sh).
set -e
ROOT=${1:-datasets/eth3d}
for seq in "$ROOT"/*/; do
  seq=$(basename "$seq")
  echo "=== $seq"
  python -m frodo_slam_tpu.main --dataset "$ROOT/$seq" --config configs/eth3d.yaml --save-as eth3d || continue
  python -m frodo_slam_tpu.utils.ate "$ROOT/$seq/groundtruth.txt" "logs/eth3d/$seq.txt" || true
done
