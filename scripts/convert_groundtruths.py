"""Generate TUM-format ground-truth files from raw dataset downloads.

The reference vendors pre-converted ground truths (groundtruths/euroc/*.txt,
groundtruths/7-scenes/*.txt); those are mechanical conversions of the
datasets' own ground truth, so this script regenerates them from the raw
data instead of shipping copies:

- EuRoC: mav0/state_groundtruth_estimate0/data.csv
    timestamp[ns], p_x, p_y, p_z, q_w, q_x, q_y, q_z, ...
  -> TUM rows ``t[s] x y z qx qy qz qw``.
- 7-Scenes: seq-XX/frame-XXXXXX.pose.txt (4x4 camera-to-world), one file
  per frame -> TUM rows with the frame index as timestamp.

Usage:
    python scripts/convert_groundtruths.py euroc <euroc_root> groundtruths/euroc
    python scripts/convert_groundtruths.py 7-scenes <7scenes_root> groundtruths/7-scenes
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np


def rot_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), Shepperd's method."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    return np.array([x, y, z, w])


def convert_euroc(root: pathlib.Path, out_dir: pathlib.Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    for seq in sorted(root.iterdir()):
        csv = seq / "mav0" / "state_groundtruth_estimate0" / "data.csv"
        if not csv.exists():
            continue
        rows = np.loadtxt(csv, delimiter=",", comments="#", usecols=range(8))
        t = rows[:, 0] * 1e-9
        p = rows[:, 1:4]
        q_wxyz = rows[:, 4:8]
        q_xyzw = q_wxyz[:, [1, 2, 3, 0]]
        out = np.column_stack([t, p, q_xyzw])
        np.savetxt(out_dir / f"{seq.name}.txt", out, fmt="%.9f")
        print(f"euroc {seq.name}: {len(out)} poses")


def convert_7scenes(root: pathlib.Path, out_dir: pathlib.Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    for scene in sorted(root.iterdir()):
        seqs = sorted(scene.glob("seq-*"))
        if not seqs:
            continue
        lines = []
        idx = 0
        for seq in seqs:
            for pose_file in sorted(seq.glob("frame-*.pose.txt")):
                T = np.loadtxt(pose_file).reshape(4, 4)
                q = rot_to_quat(T[:3, :3])
                lines.append([float(idx), *T[:3, 3], *q])
                idx += 1
        if lines:
            np.savetxt(out_dir / f"{scene.name}.txt", np.asarray(lines), fmt="%.9f")
            print(f"7-scenes {scene.name}: {len(lines)} poses")


if __name__ == "__main__":
    if len(sys.argv) != 4 or sys.argv[1] not in ("euroc", "7-scenes"):
        print(__doc__)
        sys.exit(1)
    kind, src, dst = sys.argv[1:4]
    fn = convert_euroc if kind == "euroc" else convert_7scenes
    fn(pathlib.Path(src), pathlib.Path(dst))
