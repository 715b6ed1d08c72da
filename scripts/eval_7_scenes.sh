#!/bin/bash
# 7-Scenes evaluation (reference scripts/eval_7_scenes.sh); ground truths in
# groundtruths/7-scenes/ of the reference release — regenerate with:
#   python scripts/convert_groundtruths.py 7-scenes <root> groundtruths/7-scenes
set -e
# Retrieval runs DISABLED by default: without the trained retrieval
# checkpoint+codebook the fallback is a random codebook whose loop closures
# are meaningless. Set USE_RETRIEVAL=1 only when real assets exist.
RETR_FLAG="--no-retrieval"; [[ -n "$USE_RETRIEVAL" ]] && RETR_FLAG=""
ROOT=${1:-datasets/7-scenes}
GT=${2:-groundtruths/7-scenes}
seqs=(chess fire heads office pumpkin redkitchen stairs)
for seq in "${seqs[@]}"; do
  echo "=== $seq"
  python -m frodo_slam_tpu.main $RETR_FLAG --dataset "$ROOT/$seq" --config configs/eval_calib.yaml --save-as 7-scenes
  python -m frodo_slam_tpu.utils.ate "$GT/$seq.txt" "logs/7-scenes/$seq.txt"
done
