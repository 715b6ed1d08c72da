#!/bin/bash
# TUM-RGBD fr1 evaluation (contract of the reference scripts/eval_tum.sh):
# headless single-thread run per sequence, then Sim3-aligned ATE RMSE.
# Usage: scripts/eval_tum.sh <datasets_root> [--no-calib]
set -e
# Retrieval runs DISABLED by default: without the trained retrieval
# checkpoint+codebook the fallback is a random codebook whose loop closures
# are meaningless. Set USE_RETRIEVAL=1 only when real assets exist.
RETR_FLAG="--no-retrieval"; [[ -n "$USE_RETRIEVAL" ]] && RETR_FLAG=""
ROOT=${1:-datasets/tum}
shift || true
CONFIG=configs/eval_calib.yaml
NAME=tum/calib
if [[ "$1" == "--no-calib" ]]; then CONFIG=configs/eval_no_calib.yaml; NAME=tum/no_calib; fi

seqs=(rgbd_dataset_freiburg1_360 rgbd_dataset_freiburg1_desk rgbd_dataset_freiburg1_desk2
      rgbd_dataset_freiburg1_floor rgbd_dataset_freiburg1_plant rgbd_dataset_freiburg1_room
      rgbd_dataset_freiburg1_rpy rgbd_dataset_freiburg1_teddy rgbd_dataset_freiburg1_xyz)

for seq in "${seqs[@]}"; do
  echo "=== $seq"
  python -m frodo_slam_tpu.main $RETR_FLAG --dataset "$ROOT/$seq" --config $CONFIG --save-as $NAME
  python -m frodo_slam_tpu.utils.ate "$ROOT/$seq/groundtruth.txt" "logs/$NAME/$seq.txt"
done
