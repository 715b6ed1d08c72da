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
