"""Probe the bench's synthetic match_frac distribution on the TPU.

The round-4 bench honesty upgrade enabled the real accept gate
(min_match_frac 0.008) + fnn fallback; the first TPU run rejected EVERY
frame (gate_miss 126/126) — the synthetic random-weight regime's fracs
evidently sit below the real gate. This prints flags[0] (match_frac) for a
short warm chain and for the decorrelated bad frame, so the bench can pin
a gate that separates normal from decorrelated frames honestly.

Usage: python scratch/bench_frac_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("FRODO_BENCH_FRAMES", "12")

import numpy as np

import bench  # reuse the bench's exact model/frames/config construction


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from frodo_slam_tpu.models import mast3r
    from frodo_slam_tpu.slam import frame as frame_mod
    from frodo_slam_tpu.slam.inference import decode_mono
    from frodo_slam_tpu.slam.tracker import TrackingCfg, track_step

    mcfg, (h, w) = mast3r.MASt3RConfig(), (288, 512)
    params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
    params["head2"] = params["head1"]
    params["dec_blocks2"] = params["dec_blocks"]
    params = mast3r.cast_transformer_params(params, mcfg.dtype)

    from frodo_slam_tpu.config import make_config
    cfg = make_config()
    mcd = dict(cfg.matching)
    # random-weight descriptors carry no cross-image signal: the 0.8 score
    # gate zeroes every match (measured). Geometric gates only — the score
    # gate is one compare, zero cost difference.
    mcd["ft_matching_threshold"] = -1e9
    match_cfg = tuple(sorted(mcd.items()))
    tcfg = TrackingCfg(
        min_match_frac=0.0, use_fnn=False,  # gate OFF: observe raw fracs
        max_iters=int(cfg.tracking.max_iters), Q_conf=0.0,
        match_frac_thresh=float(cfg.tracking.match_frac_thresh),
    )

    rng = np.random.default_rng(0)
    frames = bench._synthetic_frames(rng, h, w, 10)
    bad = bench._synthetic_frames(np.random.default_rng(12345), h, w, 1)[0]

    @jax.jit
    def encode(params, img):
        return mast3r.encode_image(params, mcfg, img)

    def step(kf, img, idx_init):
        feat, pos = encode(params, img)
        fr = frame_mod.make_empty_frame(0, img, feat, pos)
        return track_step(params, mcfg, tcfg, match_cfg, (h, w), kf, fr, idx_init)

    feat, pos = encode(params, frames[0])
    f0 = frame_mod.make_empty_frame(0, frames[0], feat, pos)
    X0, C0 = decode_mono(params, mcfg, feat, pos, (h, w))
    Xn, Cn, Nn, Un = frame_mod.update_pointmap(f0.X_canon, f0.C, f0.N, f0.N_updates, X0, C0)
    kf = dataclasses.replace(f0, X_canon=Xn, C=Cn, N=Nn, N_updates=Un)

    idx_init = None
    for i, img in enumerate(frames[1:9]):
        kf, fused, res = step(kf, img, idx_init)
        flags = np.asarray(res.flags)
        print(f"frame {i} ({'cold' if idx_init is None else 'warm'}): "
              f"match_frac={flags[0]:.6f} ok={flags[1]>0} new_kf={flags[2]>0}")
        idx_init = res.idx_f2k

    kf, fused, res = step(kf, bad, idx_init)
    flags = np.asarray(res.flags)
    print(f"BAD frame (warm-seeded): match_frac={flags[0]:.6f}")
    kf, fused, res = step(kf, bad, None)
    flags = np.asarray(res.flags)
    print(f"BAD frame (cold): match_frac={flags[0]:.6f}")


if __name__ == "__main__":
    main()
