"""End-to-end FPS through the committed CLI (VERDICT r4 weak #2).

Generates a synthetic RGB-folder sequence and drives ``frodo_slam_tpu.main``
on it with ``configs/bench_cli.yaml`` (bench-headline numerics + the
production threaded backend + pipelined frontend) and random shared-decoder
weights. Reports the CLI's own steady-state FPS prints as JSON.

Regime note: unlike bench.py — which skips the tracking-loss handling its
gate-off synthetic frames would trip (zero cross-image geometric
consistency under random weights; PERF.md round-4 postmortem) — the real
system treats zero-valid-match frames as tracking loss and resets. The
only random-weights regime the UNMODIFIED system tracks is IDENTICAL
frames (self-consistent decode -> valid matches), whose ~1.0 unique-match
fraction never triggers the keyframe policy: the CLI number is therefore
the TRACK-ONLY regime and compares against the bench's
``track_only_fps_vitL_288x512`` (measured 38.7 threaded, sweep5), not the
e2e headline. The backend's cost through this same code path is measured
in-bench (threaded 28.6 vs track-only 38.7).

Run on the TPU: ``python scripts/cli_fps.py [--frames 128]``.
"""

import argparse
import json
import os
import pathlib
import re
import subprocess
import sys
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent


def make_frames(out_dir: pathlib.Path, n: int, h=288, w=512):
    """The bench's smooth wave field as uint8 PNGs — one IDENTICAL frame
    repeated (see the module docstring's regime note: crop-shifted frames
    have no cross-image geometric consistency under random weights, so the
    real system's loss handling resets on every one)."""
    import cv2

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.zeros((h, w, 3), np.float32)
    for _ in range(8):
        fy, fx = rng.uniform(0.2, 3.0, 2)
        ph = rng.uniform(0, 2 * np.pi, 3).astype(np.float32)
        base += np.sin(
            fy * yy[..., None] / h * 2 * np.pi + fx * xx[..., None] / w * 2 * np.pi + ph
        ) * rng.uniform(0.1, 0.4)
    base += rng.normal(size=base.shape).astype(np.float32) * 0.05
    img = ((np.clip(base, -1, 1) * 0.5 + 0.5) * 255).astype(np.uint8)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        cv2.imwrite(str(out_dir / f"{i:05d}.png"), img[:, :, ::-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--config", default=str(REPO / "configs/bench_cli.yaml"))
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    seq = pathlib.Path(tempfile.mkdtemp(prefix="cli_fps_")) / "seq"
    make_frames(seq, args.frames)

    env = dict(os.environ)
    env["FRODO_RANDOM_SHARE_DECODER"] = "1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
    cmd = [
        sys.executable, "-m", "frodo_slam_tpu.main",
        "--dataset", str(seq), "--config", args.config,
        "--no-retrieval", "--max-frames", str(args.frames),
    ]
    proc = subprocess.run(cmd, cwd=str(REPO), env=env, capture_output=True,
                          text=True, timeout=3000)
    sys.stderr.write(proc.stderr[-2000:])
    fps = [float(m) for m in re.findall(r"FPS: ([0-9.]+)", proc.stdout)]
    # first FPS window carries compile/warmup remnants; steady state = rest
    steady = fps[1:] if len(fps) > 1 else fps
    print(json.dumps({
        "metric": "cli_track_fps_vitL_288x512",
        "value": round(float(np.mean(steady)), 3) if steady else 0.0,
        "unit": "frames/s",
        "windows": [round(f, 2) for f in fps],
        "frames": args.frames,
        "config": str(args.config),
        "rc": proc.returncode,
    }))
    if not args.keep:
        import shutil

        shutil.rmtree(seq.parent, ignore_errors=True)


if __name__ == "__main__":
    main()
