"""End-to-end VIO CLI test: run_vio dataset mode over a synthetic recorded
session (reference run_vio.py:172-242 + OdometryData replay, odometry.py:604).

Covers: pickle replay -> grab_rgb with odometry poses -> keyframing ->
odometry factors in the backend -> scale PGO (local_opt_mode).
"""

import pickle
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frodo_slam_tpu.models import mast3r


@pytest.fixture()
def session_pkl(tmp_path):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (40, 72, 3), np.uint8)
    items = []
    frame = base[0:32, 0:64]  # BGR, as the robot camera emits; identical
    # frames keep tracking on the success path under random tiny weights
    for i in range(4):
        pose = np.array([0.05 * i, 0, 0, 0, 0, 0, 1], np.float32)  # SE3 x+
        items.append({"timestamp": float(i) / 10.0, "frame": frame, "pose": pose})
    p = tmp_path / "session_mini.pkl"
    with open(p, "wb") as f:
        pickle.dump(items, f)
    return p


def test_run_vio_dataset_replay(session_pkl, tmp_path, monkeypatch):
    from frodo_slam_tpu import loader as loader_mod
    from frodo_slam_tpu import run_vio as rv
    from frodo_slam_tpu.data import image as image_mod
    from frodo_slam_tpu.slam import system as system_mod

    mcfg = mast3r.tiny_config()
    params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
    params["head2"] = params["head1"]
    params["dec_blocks2"] = params["dec_blocks"]
    monkeypatch.setattr(loader_mod, "load_mast3r", lambda *a, **k: (params, mcfg))

    real_resize = image_mod.resize_img

    def resize64(img, size=512, **kw):
        return real_resize(img, 64, **kw)

    monkeypatch.setattr(image_mod, "resize_img", resize64)
    monkeypatch.setattr(system_mod, "resize_img", resize64)

    cfg_yaml = tmp_path / "vio_test.yaml"
    cfg_yaml.write_text(
        "inherit: /root/repo/configs/base.yaml\n"
        "single_thread: True\n"
        "tracking:\n"
        "  match_frac_thresh: 1.1\n"
        "  min_match_frac: 0.0\n"
        "  Q_conf: 0.0\n"
        "  max_iters: 10\n"
        "  use_fnn: False\n"
        "local_opt:\n"
        "  Q_conf: 0.0\n"
        "  min_match_frac: 0.0\n"
        "  max_iters: 2\n"
        "tpu:\n"
        "  max_keyframes: 8\n"
        "  max_edges: 8\n"
        "  max_odom_edges: 8\n"
    )

    args = types.SimpleNamespace(
        dataset=str(session_pkl), config=str(cfg_yaml), weights=None,
        no_retrieval=True, use_odometry=True, wall_clock=False,
        every_n_frames=1, visualize=False,
    )
    slam = rv.run_dataset(args)

    assert slam is not None
    assert int(slam.store.n_size) >= 2  # tracked and keyframed
    stamps, poses = slam.keyframe_poses()
    assert np.all(np.isfinite(poses))
    # odometry factors were queued into the backend (vio.py:333-343 contract)
    assert len(slam.backend._odom_pairs) >= 1
