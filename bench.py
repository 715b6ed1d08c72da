"""Benchmark: per-frame tracking throughput of the flagship pipeline.

Measures the SLAM hot path on one chip — ViT-L encode of the incoming frame
+ asymmetric two-view decode + both heads + dense matching + Sim(3)
Gauss-Newton + keyframe update — i.e. everything `FrameTracker.track` does
per frame in the reference (tracker.py:161-368), as one jitted program on
synthetic 288x512 frames.

Baseline of record: the reference runs ~15 FPS end-to-end on an RTX 4090
(MASt3R-SLAM paper, linked at reference README.md:15; BASELINE.md) — the
repo itself commits no numbers. ``vs_baseline`` = our FPS / 15.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax

# NOTE: x64 stays OFF here. The tracking hot path is f32/bf16 end to end;
# only the backend BA solve wants f64 (bench doesn't run it), and int64
# index arithmetic measurably slows the matcher gathers on TPU.

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from frodo_slam_tpu.config import make_config  # noqa: E402
from frodo_slam_tpu.models import mast3r  # noqa: E402
from frodo_slam_tpu.slam import frame as frame_mod  # noqa: E402
from frodo_slam_tpu.slam.inference import decode_mono  # noqa: E402
from frodo_slam_tpu.slam.tracker import TrackingCfg, track_step  # noqa: E402

BASELINE_FPS = 15.0  # reference system on RTX 4090 (external, BASELINE.md)


def main():
    tiny = bool(os.environ.get("FRODO_BENCH_TINY"))
    if tiny:
        mcfg, (h, w), n_frames, capacity = mast3r.tiny_config(), (32, 64), 4, 8
    else:
        mcfg, (h, w), n_frames, capacity = mast3r.MASt3RConfig(), (288, 512), 30, 100
    capacity = int(os.environ.get("FRODO_BENCH_CAPACITY", capacity))

    cfg = make_config()
    match_cfg = tuple(sorted(dict(cfg.matching).items()))
    tcfg = TrackingCfg(
        min_match_frac=0.0,  # synthetic frames: keep the full pipeline running
        max_iters=int(cfg.tracking.max_iters),
        Q_conf=0.0,
        match_frac_thresh=float(cfg.tracking.match_frac_thresh),
    )

    params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
    # share decoder2/head2 := decoder/head1: with independent random weights
    # the two decoded views are geometrically inconsistent, so the LM matcher
    # wanders and its gathers scatter — a regime real (trained) weights never
    # produce. Sharing makes identical frames decode identically, which is
    # what a converged matcher sees on real sequences.
    params["head2"] = params["head1"]
    params["dec_blocks2"] = params["dec_blocks"]
    params = mast3r.cast_transformer_params(params, mcfg.dtype)
    hw = h * w
    del capacity  # streaming design: no ring buffer in the per-frame program

    # smooth textured frames (sum of low-frequency waves + mild noise): real
    # camera frames are spatially smooth, which keeps the matcher's warm-
    # started gathers local; uniform white noise is a pathological worst case
    # that no real sequence produces
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0 : h + 8, 0 : w + 8].astype(np.float32)
    base = np.zeros((h + 8, w + 8, 3), np.float32)
    for _ in range(8):
        fy, fx = rng.uniform(0.2, 3.0, 2)
        ph = rng.uniform(0, 2 * np.pi, 3).astype(np.float32)
        base += np.sin(
            fy * yy[..., None] / h * 2 * np.pi + fx * xx[..., None] / w * 2 * np.pi + ph
        ) * rng.uniform(0.1, 0.4)
    base += rng.normal(size=base.shape).astype(np.float32) * 0.05
    base = np.clip(base, -1, 1).astype(np.float32)
    frames = [jnp.asarray(base[i % 8 : i % 8 + h, i % 8 : i % 8 + w][None]) for i in range(n_frames)]

    import dataclasses
    from functools import partial

    @jax.jit
    def encode(params, img):
        return mast3r.encode_image(params, mcfg, img)

    def full_step(params, kf, img, idx_init):
        """encode + track as FOUR chained async dispatches per frame
        (encode | decode+heads | matcher | bookkeeping). Program boundaries
        reset XLA layout/fusion choices; the monolithic single-jit variant
        ran the matcher ~2.5x slower (87 vs 65 ms/frame on v5e)."""
        feat, pos = encode(params, img)
        fr = frame_mod.make_empty_frame(0, img, feat, pos)
        return track_step(params, mcfg, tcfg, match_cfg, (h, w), kf, fr, idx_init)

    # init keyframe (mono decode)
    feat, pos = encode(params, frames[0])
    f0 = frame_mod.make_empty_frame(0, frames[0], feat, pos)
    X0, C0 = decode_mono(params, mcfg, feat, pos, (h, w))
    Xn, Cn, Nn, Un = frame_mod.update_pointmap(f0.X_canon, f0.C, f0.N, f0.N_updates, X0, C0)
    kf = dataclasses.replace(f0, X_canon=Xn, C=Cn, N=Nn, N_updates=Un)

    # warmup / compile — BOTH program variants: the first frame runs with
    # idx_init=None (a different static signature), every later frame with a
    # warm-start index array. Without the second warmup the array variant
    # compiles inside the timed loop and the bench reports compile time.
    kf, fused, res = full_step(params, kf, frames[1], None)
    _ = float(res.match_frac)
    kf, fused, res = full_step(params, kf, frames[1], res.idx_f2k)
    _ = float(res.match_frac)

    # steady state: fully pipelined (flags fetched once at the end — on a
    # directly-attached TPU per-frame scalar fetches are ~free, but the
    # remote tunnel used here charges seconds for any early sync)
    t0 = time.perf_counter()
    idx_init = res.idx_f2k
    last = None
    for i in range(2, n_frames):
        kf, fused, res = full_step(params, kf, frames[i], idx_init)
        idx_init = res.idx_f2k
        last = res
    _ = float(last.match_frac)
    dt = time.perf_counter() - t0
    fps = (n_frames - 2) / dt

    print(json.dumps({
        "metric": "tracking_fps_vitL_288x512" if not tiny else "tracking_fps_tiny",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
