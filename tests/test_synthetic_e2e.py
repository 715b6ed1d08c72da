"""Synthetic-oracle end-to-end accuracy through the FULL system.

Runs scripts/eval_synthetic.py in a SUBPROCESS (the oracle patches the
model entry points module-wide, and jit caches key on config+shapes — the
patch must never leak into other tests' traces): the model is replaced by
an oracle rendering a consistent world from ground-truth poses, and
everything else — preprocessing, matcher, tracking GN, keyframing, backend
BA, trajectory export, Sim3 ATE — is the production stack.
"""

import json
import os
import pathlib
import subprocess
import sys


def test_synthetic_sequence_ate(tmp_path):
    script = pathlib.Path(__file__).parent.parent / "scripts" / "eval_synthetic.py"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(script.parent.parent)
    proc = subprocess.run(
        [sys.executable, str(script), "--frames", "10", "--noise", "0.003",
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["frames_tracked_ok"] == 10
    assert out["n_kf"] == 10
    # 10 frames, ~0.3m of motion, 3mm pointmap noise: the full pipeline
    # (tracking GN + backend BA) must stay within a few cm of ground truth
    assert out["ate_rmse"] < 0.05, out


def test_failure_path_episode():
    """Failure-path episode through the FULL system (reference
    tracker.py:222-276, vio.py:29-72, 321-328): the fnn descriptor fallback
    fires on a geometry-broken frame, dead-descriptor frames attempt
    retrieval relocalization and honestly fail, the loss counter resets the
    map into the atlas, and a fresh map re-initializes."""
    script = pathlib.Path(__file__).parent.parent / "scripts" / "eval_synthetic.py"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(script.parent.parent)
    proc = subprocess.run(
        [sys.executable, str(script), "--episode", "--noise", "0"],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["fnn_frames"] == 1
    assert out["loss_frames"] == 3
    assert out["reloc_attempts"] >= 1
    assert out["resets"] == 1
    assert out["post_reset_tracked"] == 6


def test_calibrated_pipeline_on_plane_world(tmp_path):
    """CALIBRATED end-to-end path (pixel+log-depth tracking GN + calib
    backend solve + ray constraining) on the ray-consistent plane world.

    The plane oracle produces REAL nearest-pixel correspondences, so the
    noise=0 ATE floor is ~0.1 m at this tiny 32x64/fx=100 scale
    (correspondence quantization ~2 cm at 4 m depth); the threshold below
    is a wiring-bug detector — convention/sign errors in the calib
    residuals or Jacobians blow past 0.5."""
    script = pathlib.Path(__file__).parent.parent / "scripts" / "eval_synthetic.py"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(script.parent.parent)
    proc = subprocess.run(
        [sys.executable, str(script), "--calib", "--frames", "8",
         "--noise", "0", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["frames_tracked_ok"] == 8
    assert out["n_kf"] == 8
    assert out["ate_rmse"] < 0.25, out


def test_loop_closure_improves_ate(tmp_path):
    """Retrieval loop closure through the FULL system: on an out-and-back
    trajectory with pointmap noise, the ASMK database proposes revisit
    keyframes, the backend inserts non-consecutive edges (vio.py:124-148),
    and the global BA pulls the loop shut — measured 16-frame/4mm result:
    ATE 0.195 (consecutive-only) -> 0.113 (with retrieval), 18 long loop
    edges."""
    script = pathlib.Path(__file__).parent.parent / "scripts" / "eval_synthetic.py"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(script.parent.parent)
    proc = subprocess.run(
        [sys.executable, str(script), "--loop", "--frames", "14",
         "--noise", "0.004", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=2400, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    on, off = out["loop"], out["no_retrieval"]
    assert on["frames_tracked_ok"] == 14 and off["frames_tracked_ok"] == 14
    # retrieval must produce genuine long-range loop edges...
    assert on["n_long_loop_edges"] >= 1, out
    assert off["n_loop_edges"] == 0, out
    # ...and closing the loop must not hurt (it helped by ~40% at 16
    # frames; small-margin runs may tie)
    assert on["ate_rmse"] <= off["ate_rmse"] * 1.05, out


def test_vio_metric_scale(tmp_path):
    """VIO metric-scale recovery through the FULL system (tracked config 5,
    BASELINE.md): the oracle world is rendered at monocular gauge
    alpha=0.5 while the odometry stream reports metric SE(3) poses. The
    wheel-odometry BA factors (gauss_newton_rays_odom semantics) plus the
    scale-only PGO write-back must make the METRIC trajectory t_i / s_i
    match the metric ground truth under scale-free SE(3) alignment —
    measured 16-frame/2mm result: 0.020 vs 0.256 without odometry."""
    script = pathlib.Path(__file__).parent.parent / "scripts" / "eval_synthetic.py"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(script.parent.parent)
    proc = subprocess.run(
        [sys.executable, str(script), "--vio", "--noise", "0.002",
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=2400, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    on, off = out["vio"], out["no_odom"]
    assert on["frames_tracked_ok"] == 16 and off["frames_tracked_ok"] == 16
    # shape must be good regardless (Sim3-aligned control)
    assert on["ate_sim3"] < 0.03, out
    # the metric test: scale-free SE(3) ATE of t/s, small in absolute
    # terms and far below the no-odometry run's gauge error
    assert on["ate_se3_scaled"] < 0.06, out
    assert on["ate_se3_scaled"] < 0.5 * off["ate_se3_scaled"], out
