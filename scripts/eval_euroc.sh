#!/bin/bash
# EuRoC evaluation (reference scripts/eval_euroc.sh), no-calib mode.
# Ground truths: python scripts/convert_groundtruths.py euroc <root> groundtruths/euroc
set -e
# Retrieval runs DISABLED by default: without the trained retrieval
# checkpoint+codebook the fallback is a random codebook whose loop closures
# are meaningless. Set USE_RETRIEVAL=1 only when real assets exist.
RETR_FLAG="--no-retrieval"; [[ -n "$USE_RETRIEVAL" ]] && RETR_FLAG=""
ROOT=${1:-datasets/euroc}
GT=${2:-groundtruths/euroc}
seqs=(MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult
      V1_01_easy V1_02_medium V1_03_difficult V2_01_easy V2_02_medium V2_03_difficult)
for seq in "${seqs[@]}"; do
  echo "=== $seq"
  python -m frodo_slam_tpu.main $RETR_FLAG --dataset "$ROOT/$seq" --config configs/eval_no_calib.yaml --save-as euroc
  python -m frodo_slam_tpu.utils.ate "$GT/$seq.txt" "logs/euroc/$seq.txt"
done
