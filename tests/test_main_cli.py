"""End-to-end CLI test: frodo_slam_tpu.main over a synthetic RGB folder.

Covers the headless dataset-runner contract (reference main.py:151-346 /
SURVEY.md section 3.4): dataset dispatch -> prefetch loop -> SLAM ->
trajectory + PLY outputs, with a tiny model and a tiny image size so the
whole path runs on the CPU test platform.
"""

import pathlib
import types

import jax
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from frodo_slam_tpu.models import mast3r


@pytest.fixture()
def rgb_folder(tmp_path):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (40, 72, 3), np.uint8)
    d = tmp_path / "seq01"
    d.mkdir()
    img = base[0:32, 0:64]  # identical frames: random tiny weights produce
    # no real geometry, so only self-consistent frames track successfully
    for i in range(4):
        cv2.imwrite(str(d / f"{i:04d}.png"), img)
    return d


def test_main_cli_runs_and_writes_outputs(rgb_folder, tmp_path, monkeypatch):
    from frodo_slam_tpu import loader as loader_mod
    from frodo_slam_tpu import main as main_mod
    from frodo_slam_tpu.data import datasets as ds_mod

    mcfg = mast3r.tiny_config()
    params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
    params["head2"] = params["head1"]
    params["dec_blocks2"] = params["dec_blocks"]
    monkeypatch.setattr(loader_mod, "load_mast3r", lambda *a, **k: (params, mcfg))

    real_load = ds_mod.load_dataset

    def tiny_load(path, **kw):
        ds = real_load(path, **kw)
        ds.img_size = 64  # keep the CPU test at 64x32 instead of 512-long-edge
        return ds

    import frodo_slam_tpu.data as data_pkg

    monkeypatch.setattr(data_pkg, "load_dataset", tiny_load)
    monkeypatch.chdir(tmp_path)  # logs/ land in the test sandbox

    args = types.SimpleNamespace(
        dataset=str(rgb_folder), config="/root/repo/configs/base.yaml",
        calib=None, save_as="cli_test", no_viz=True, weights=None,
        no_retrieval=True, max_frames=4,
    )
    out = main_mod.run(args)

    traj = pathlib.Path(out["traj"])
    assert traj.exists()
    rows = np.loadtxt(traj).reshape(-1, 8)  # TUM format: t x y z qx qy qz qw
    assert rows.shape[0] >= 1 and np.all(np.isfinite(rows))
    assert pathlib.Path(out["ply"]).exists()
    # keyframe PNG dump (reference main.py:332): one PNG per live keyframe
    kf_dir = pathlib.Path(out["keyframes"])
    pngs = sorted(kf_dir.glob("*.png"))
    assert len(pngs) == rows.shape[0]
    img = cv2.imread(str(pngs[0]))
    assert img is not None and img.shape[2] == 3 and img.max() > 0


def test_main_cli_calib_yaml_reaches_calibrated_path(rgb_folder, tmp_path, monkeypatch):
    """A --calib yaml must override the dataset intrinsics and flip the
    system into the calibrated GN path (reference main.py:175-184)."""
    from frodo_slam_tpu import loader as loader_mod
    from frodo_slam_tpu import main as main_mod
    from frodo_slam_tpu.data import datasets as ds_mod
    import frodo_slam_tpu.slam.system as system_mod

    mcfg = mast3r.tiny_config()
    params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
    params["head2"] = params["head1"]
    params["dec_blocks2"] = params["dec_blocks"]
    monkeypatch.setattr(loader_mod, "load_mast3r", lambda *a, **k: (params, mcfg))

    real_load = ds_mod.load_dataset

    def tiny_load(path, **kw):
        ds = real_load(path, **kw)
        ds.img_size = 64
        return ds

    import frodo_slam_tpu.data as data_pkg

    monkeypatch.setattr(data_pkg, "load_dataset", tiny_load)
    monkeypatch.chdir(tmp_path)

    calib_yaml = tmp_path / "calib.yaml"
    calib_yaml.write_text(
        "width: 64\nheight: 32\ncalibration: [60.0, 60.0, 32.0, 16.0]\n"
    )

    created = {}
    real_SLAM = system_mod.SLAM

    class SpySLAM(real_SLAM):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            created["slam"] = self

    monkeypatch.setattr(system_mod, "SLAM", SpySLAM)

    args = types.SimpleNamespace(
        dataset=str(rgb_folder), config="/root/repo/configs/base.yaml",
        calib=str(calib_yaml), save_as="cli_calib_test", no_viz=True,
        weights=None, no_retrieval=True, max_frames=4,
    )
    out = main_mod.run(args)

    slam = created["slam"]
    assert slam.K is not None and slam.K.shape == (3, 3)
    assert bool(slam.tcfg.use_calib)  # solve dispatches to solve_GN_calib
    # the yaml K survived the 512->64 crop rescale (fx scaled by crop scale)
    assert np.isfinite(np.asarray(slam.K)).all()
    assert pathlib.Path(out["traj"]).exists()


def test_run_vio_load_calib_K(tmp_path):
    """run_vio's --calib plumbing: yaml -> K_frame (reference run_vio.py:94-110)."""
    import types as _types

    from frodo_slam_tpu.config import make_config
    from frodo_slam_tpu.run_vio import _load_calib_K

    calib_yaml = tmp_path / "calib.yaml"
    calib_yaml.write_text(
        "width: 640\nheight: 480\ncalibration: [520.0, 521.0, 320.5, 240.5]\n"
    )
    cfg = make_config("/root/repo/configs/base.yaml")
    args = _types.SimpleNamespace(calib=str(calib_yaml))
    K = _load_calib_K(args, cfg)
    assert K.shape == (3, 3) and np.isfinite(K).all()
    assert bool(cfg["use_calib"])
    # no-calib passthrough
    cfg2 = make_config("/root/repo/configs/base.yaml")
    assert _load_calib_K(_types.SimpleNamespace(calib=None), cfg2) is None
