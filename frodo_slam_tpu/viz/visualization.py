"""Visualization: live map state rendering, headless-first.

The reference renders with a moderngl+imgui OpenGL window
(``mast3r_slam/visualization.py:73-600`` + ``thirdparty/in3d``, GLSL surfel/
triangle shaders). None of that stack exists in a TPU datacenter image, and
SURVEY.md section 2.4 notes the *data contract* — per-keyframe pointmaps +
poses + factor-graph edges, with dirty-keyframe incremental updates — is
what must be preserved. This module implements that contract three ways:

- :class:`SLAMViewer` — pull-based snapshot renderer (matplotlib): top-down
  trajectory, camera frusta, confidence-thresholded point cloud, factor
  edges. Works over SSH; writes PNGs.
- :func:`export_state` — dump the full map state (poses, pointmaps, conf,
  edges) to an .npz for any external viewer.
- :func:`run_visualization` — background-thread loop matching the reference
  process entry point (main.py:193-197): re-renders only when keyframes
  change (the dirty-flag behavior, frame.py:387-390).

The reference's Open3D trajectory window (``map_visualization.py:18-267``)
maps to :meth:`SLAMViewer.plot_trajectories`.
"""

from __future__ import annotations

import pathlib
import threading
import time
from typing import Optional

import numpy as np


def _live_slots(store):
    n = int(store.n_size)
    total = int(store.n_total)
    return [k % store.capacity for k in range(max(0, total - n), total)]


def export_state(slam, path: str) -> str:
    """Dump poses/pointmaps/confidence/edges to ``.npz`` (the shared-state
    contract of SharedKeyframes, frame.py:360-390)."""
    slots = _live_slots(slam.store)
    idx = np.asarray(slots)
    data = dict(
        T_WC=np.asarray(slam.store.T_WC[idx]),
        X_canon=np.asarray(slam.store.X_canon[idx]),
        C=np.asarray(slam.store.C[idx]),
        N=np.asarray(slam.store.N[idx]),
        frame_id=np.asarray(slam.store.frame_id[idx]),
        edges_ii=np.asarray([i for i, _ in slam.backend._pairs], np.int32),
        edges_jj=np.asarray([j for _, j in slam.backend._pairs], np.int32),
    )
    path = str(path)
    np.savez_compressed(path, **data)
    return path


class SLAMViewer:
    """Matplotlib snapshot renderer of the live map."""

    def __init__(self, conf_threshold: float = 1.5, max_points: int = 200_000):
        self.conf_threshold = conf_threshold
        self.max_points = max_points

    def _world_points(self, slam):
        from ..ops import lie
        import jax.numpy as jnp

        slots = _live_slots(slam.store)
        if not slots:
            return np.zeros((0, 3)), np.zeros((0,))
        idx = np.asarray(slots)
        X = slam.store.X_canon[idx]
        T = slam.store.T_WC[idx]
        C = np.asarray(slam.store.C[idx])[..., 0] / np.maximum(
            np.asarray(slam.store.N[idx])[:, None], 1
        )
        pts = np.asarray(lie.sim3_act(T[:, None, :], X)).reshape(-1, 3)
        conf = C.reshape(-1)
        mask = conf > self.conf_threshold
        pts, conf = pts[mask], conf[mask]
        if len(pts) > self.max_points:
            sel = np.random.default_rng(0).choice(len(pts), self.max_points, replace=False)
            pts, conf = pts[sel], conf[sel]
        return pts, conf

    def render(self, slam, out_path: str, title: str = "") -> str:
        """Top-down (x-z) map: points, keyframe trajectory, factor edges."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        pts, conf = self._world_points(slam)
        slots = _live_slots(slam.store)
        T = np.asarray(slam.store.T_WC[np.asarray(slots)]) if slots else np.zeros((0, 8))

        fig, ax = plt.subplots(figsize=(8, 8))
        if len(pts):
            ax.scatter(pts[:, 0], pts[:, 2], s=0.3, c=conf, cmap="viridis", alpha=0.5)
        if len(T):
            ax.plot(T[:, 0], T[:, 2], "r.-", lw=1.5, ms=6, label="keyframes")
            # factor-graph edges (visualization.py:234-262)
            logical0 = max(0, int(slam.store.n_total) - len(slots))
            for i, j in slam.backend._pairs:
                a, b = i - logical0, j - logical0
                if 0 <= a < len(T) and 0 <= b < len(T):
                    ax.plot([T[a, 0], T[b, 0]], [T[a, 2], T[b, 2]], "g-", lw=0.5, alpha=0.6)
        ax.set_xlabel("x [m]")
        ax.set_ylabel("z [m]")
        ax.set_aspect("equal")
        ax.set_title(title or f"map: {len(slots)} keyframes, {len(pts)} pts")
        ax.legend(loc="upper right")
        pathlib.Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path

    def plot_trajectories(self, trajs: dict, out_path: str) -> str:
        """Multi-trajectory comparison (map_visualization.py:18-267): dict of
        name -> (N, >=3) positions."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 8))
        for name, P in trajs.items():
            P = np.asarray(P)
            ax.plot(P[:, 0], P[:, 2] if P.shape[1] > 2 else P[:, 1], ".-", label=name)
        ax.set_aspect("equal")
        ax.legend()
        pathlib.Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_path


def run_visualization(slam, out_dir: str, interval_s: float = 2.0,
                      stop_event: Optional[threading.Event] = None) -> threading.Thread:
    """Background render loop (the viz process slot of main.py:193-197);
    re-renders only when the keyframe count changes (dirty-flag analogue)."""
    viewer = SLAMViewer()
    stop = stop_event or threading.Event()

    def loop():
        last_n = -1
        frame_i = 0
        while not stop.is_set():
            n = int(slam.store.n_total)
            if n != last_n and n > 0:
                viewer.render(slam, str(pathlib.Path(out_dir) / f"map_{frame_i:05d}.png"))
                last_n = n
                frame_i += 1
            time.sleep(interval_s)

    t = threading.Thread(target=loop, daemon=True)
    t.stop_event = stop  # type: ignore[attr-defined]
    t.start()
    return t


def visualize_matches(matches_a, matches_b, img_a, img_b, out_path: str,
                      max_draw: int = 200) -> str:
    """Side-by-side match visualization (visualization_utils.py:138-190):
    the two frames concatenated horizontally with correspondence lines.

    matches_a/matches_b: (N, 2) [u, v] pixel coords; img_*: (H, W, 3) in
    [0, 1] or uint8.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    a = np.asarray(img_a)
    b = np.asarray(img_b)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0, 1) * 255).astype(np.uint8)
    if b.dtype != np.uint8:
        b = (np.clip(b, 0, 1) * 255).astype(np.uint8)
    h = max(a.shape[0], b.shape[0])
    canvas = np.zeros((h, a.shape[1] + b.shape[1], 3), np.uint8)
    canvas[: a.shape[0], : a.shape[1]] = a
    canvas[: b.shape[0], a.shape[1]:] = b

    ma = np.asarray(matches_a)
    mb = np.asarray(matches_b)
    n = len(ma)
    if n > max_draw:
        sel = np.random.default_rng(0).choice(n, max_draw, replace=False)
        ma, mb = ma[sel], mb[sel]

    fig, ax = plt.subplots(figsize=(12, 5))
    ax.imshow(canvas)
    off = a.shape[1]
    for (ua, va), (ub, vb) in zip(ma, mb):
        ax.plot([ua, ub + off], [va, vb], "-", lw=0.5, alpha=0.6)
    ax.scatter(ma[:, 0], ma[:, 1], s=2, c="lime")
    ax.scatter(mb[:, 0] + off, mb[:, 1], s=2, c="cyan")
    ax.axis("off")
    pathlib.Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out_path
