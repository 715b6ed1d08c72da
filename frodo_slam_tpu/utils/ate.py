"""ATE CLI: Sim3-aligned trajectory error (the evo_ape replacement used by
scripts/eval_*.sh). Usage: python -m frodo_slam_tpu.utils.ate <gt> <traj>."""

import sys

from .evaluate import ate_rmse

if __name__ == "__main__":
    gt, traj = sys.argv[1:3]
    rmse = ate_rmse(gt, traj)
    print(f"ATE RMSE [m]: {rmse:.6f}")
