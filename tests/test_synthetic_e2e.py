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
