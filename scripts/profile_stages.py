"""Stage-by-stage TPU timing of the tracking hot path.

Times each jitted stage separately (encode / decode+heads / matcher pieces /
GN / pointmap update / full track_step) to find where the frame budget goes.
Run on the TPU: ``python scripts/profile_stages.py``.

Remote-tunnel-safe timing: the axon TPU is a remote tunnel where
``block_until_ready`` does not synchronize execution and host fetches are
expensive. Each stage is timed by chaining N dispatches and fetching ONE
scalar (produced by a tiny jitted reduction) at the end; the measured
scalar-fetch baseline is subtracted.

x64 stays OFF to match bench.py (the tracking path is f32/bf16).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax
import jax.numpy as jnp
import numpy as np

from frodo_slam_tpu.models import mast3r
from frodo_slam_tpu.ops import lie, matching
from frodo_slam_tpu.slam import frame as frame_mod
from frodo_slam_tpu.slam.tracker import TrackingCfg, opt_pose_ray_dist_sim3, track_step

_first = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))


def touch(out):
    leaf = [l for l in jax.tree.leaves(out) if hasattr(l, "reshape")][0]
    return float(jax.device_get(_first(leaf)))


def timeit(name, fn, *args, n=10, fetch_base=0.0):
    t0 = time.perf_counter()
    out = fn(*args)
    touch(out)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    touch(out)
    dt = (time.perf_counter() - t0 - fetch_base) / n
    print(f"{name:30s} {dt * 1e3:9.2f} ms   (first call {t_first:6.2f} s)", flush=True)
    return out


def main():
    h, w = 288, 512
    hw = h * w
    cfg = mast3r.MASt3RConfig()
    params = mast3r.cast_transformer_params(
        mast3r.init_params(jax.random.PRNGKey(0), cfg), cfg.dtype
    )
    img = jnp.zeros((1, h, w, 3), jnp.float32)

    # fetch baseline
    tiny = jnp.zeros((4,), jnp.float32) + 1
    touch(tiny)
    t0 = time.perf_counter()
    for _ in range(10):
        touch(tiny)
    fetch_base = (time.perf_counter() - t0) / 10
    print(f"{'scalar fetch baseline':30s} {fetch_base * 1e3:9.2f} ms", flush=True)

    encode = jax.jit(lambda p, x: mast3r.encode_image(p, cfg, x))
    feat, pos = timeit("encode (ViT-L, 576 tok)", encode, params, img, fetch_base=fetch_base)

    decode = jax.jit(lambda p, f, po: mast3r.decode_and_heads(p, cfg, f, po, f, po, (h, w)))
    res = timeit("decode+heads (self pair)", decode, params, feat, pos, fetch_base=fetch_base)
    res1, res2 = res
    X11, X21 = res1["pts3d"], res2["pts3d"]
    D11, D21 = res1["desc"], res2["desc"]

    dec_only = jax.jit(lambda p, f, po: mast3r.decode_features(p, cfg, f, po, f, po)
                       if hasattr(mast3r, "decode_features") else None)
    try:
        timeit("decoder only (no heads)", dec_only, params, feat, pos, fetch_base=fetch_base)
    except Exception as e:
        print(f"decoder-only probe skipped: {type(e).__name__}", flush=True)

    prep = jax.jit(lambda a, b: matching.prep_for_iter_proj(a, b, None))
    rays, tgt, p_init = timeit("prep_for_iter_proj", prep, X11, X21, fetch_base=fetch_base)

    ip = jax.jit(lambda r, t, p: matching.iter_proj(
        r, t, p, max_iter=10, lambda_init=1e-8, cost_thresh=1e-6))
    p1f, conv = timeit("iter_proj (10 LM iters)", ip, rays, tgt, p_init, fetch_base=fetch_base)

    p1 = jnp.floor(p1f).astype(jnp.int32)
    D21q = D21.reshape(1, hw, -1)
    rf = jax.jit(lambda d1, d2, p: matching.refine_matches_shift(
        d1, d2, p, radius=3, dilation_max=5))
    timeit("refine_matches_shift (d5 r3)", rf, D11, D21q, p1, fetch_base=fetch_base)

    full_match = jax.jit(lambda a, b, c, d: matching.match(a, b, c, d))
    timeit("full matcher", full_match, X11, X21, D11, D21, fetch_base=fetch_base)

    # GN on 147k points
    tcfg = TrackingCfg(max_iters=50)
    Xf = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (hw, 3)) + [0, 0, 3], jnp.float32)
    Xk = lie.sim3_act(lie.sim3_exp(jnp.asarray([0.05, 0, 0, 0, 0.02, 0, 0.01], jnp.float32)), Xf)
    Qk = jnp.full((hw, 1), 4.0, jnp.float32)
    valid = jnp.ones((hw, 1), bool)
    gn = jax.jit(lambda xf, xk, q, v: opt_pose_ray_dist_sim3(
        tcfg, xf, xk, lie.sim3_identity(), lie.sim3_identity(), q, v))
    timeit("GN ray-dist (<=50 iters)", gn, Xf, Xk, Qk, valid, fetch_base=fetch_base)

    upd = jax.jit(lambda X, C, N, U, Xn, Cn: frame_mod.update_pointmap(X, C, N, U, Xn, Cn))
    C0 = jnp.ones((hw, 1), jnp.float32)
    N0 = jnp.ones((hw, 1), jnp.float32)
    timeit("update_pointmap", upd, X11[0].reshape(hw, 3), C0, N0, C0,
           X21[0].reshape(hw, 3), C0, fetch_base=fetch_base)

    # full track_step (the bench program)
    from frodo_slam_tpu.config import make_config
    from frodo_slam_tpu.slam.inference import decode_mono

    sys_cfg = make_config()
    match_cfg = tuple(sorted(dict(sys_cfg.matching).items()))
    tcfg2 = TrackingCfg(
        min_match_frac=0.0, max_iters=int(sys_cfg.tracking.max_iters),
        Q_conf=0.0, match_frac_thresh=float(sys_cfg.tracking.match_frac_thresh),
    )
    X0, C0m = decode_mono(params, cfg, feat, pos, (h, w))
    f0 = frame_mod.make_empty_frame(0, img, feat, pos)
    import dataclasses
    Xn, Cn, Nn, Un = frame_mod.update_pointmap(f0.X_canon, f0.C, f0.N, f0.N_updates, X0, C0m)
    kf = dataclasses.replace(f0, X_canon=Xn, C=Cn, N=Nn, N_updates=Un)

    def full_step(params, kf, img):
        feat, pos = mast3r.encode_image(params, cfg, img)
        fr = frame_mod.make_empty_frame(0, img, feat, pos)
        return track_step(params, cfg, tcfg2, match_cfg, (h, w), kf, fr, None)

    full_step_j = jax.jit(full_step)
    timeit("FULL track_step (encode+all)", full_step_j, params, kf, img,
           n=5, fetch_base=fetch_base)

    # WARM-started variant (the steady-state per-frame program: refine at
    # dilation_max_warm, iter_proj at max_iter_warm)
    idx0 = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (1, hw))

    def full_step_warm(params, kf, img, idx):
        feat, pos = mast3r.encode_image(params, cfg, img)
        fr = frame_mod.make_empty_frame(0, img, feat, pos)
        return track_step(params, cfg, tcfg2, match_cfg, (h, w), kf, fr, idx)

    timeit("FULL track_step (warm-start)", jax.jit(full_step_warm), params,
           kf, img, idx0, n=5, fetch_base=fetch_base)

    # fnn-FALLBACK frame (VERDICT r2 weak #4: the default config's
    # use_fnn branch adds a fast_nn pass on sparse frames — time one)
    tcfg_fnn = tcfg2._replace(min_match_frac=2.0, use_fnn=True,
                              min_match_frac_fnn=0.0)

    def full_step_fnn(params, kf, img):
        feat, pos = mast3r.encode_image(params, cfg, img)
        fr = frame_mod.make_empty_frame(0, img, feat, pos)
        return track_step(params, cfg, tcfg_fnn, match_cfg, (h, w), kf, fr, None)

    timeit("FULL track_step (fnn fallback)", jax.jit(full_step_fnn), params,
           kf, img, n=5, fetch_base=fetch_base)

    if "--backend" in sys.argv:
        profile_backend(params, cfg, fetch_base)


def profile_backend(params, cfg, fetch_base):
    """Backend keyframe-step stage budget (PERF.md table): symmetric pair
    decode+match, fused gating+cache ingest, donated row write, GN solve."""
    from frodo_slam_tpu.config import make_config
    from frodo_slam_tpu.slam.backend import _ingest_pairs
    from frodo_slam_tpu.slam.global_opt import (
        BAConfig, Edges, _edges_pre, empty_odom_edges, solve_gn_rays,
    )
    from frodo_slam_tpu.slam.inference import match_symmetric

    h, w = 288, 512
    hw = h * w
    window = 64
    sys_cfg = make_config()
    match_cfg_d = dict(sys_cfg.matching)
    ba_cfg = BAConfig(max_iters=int(sys_cfg.local_opt.max_iters), pin=1,
                      delta_norm=float(sys_cfg.local_opt.delta_norm))

    key = jax.random.PRNGKey(7)
    kp, kx = jax.random.split(key)
    pts_w = jax.random.uniform(kp, (hw, 3), minval=-2.0, maxval=2.0) + jnp.array([0, 0, 6.0])
    xis = jax.random.normal(kx, (window, 7)) * jnp.array([0.3] * 3 + [0.15] * 3 + [0.05])
    T_true = jax.vmap(lie.sim3_exp)(xis).astype(jnp.float32)
    X = jax.vmap(lambda T: lie.sim3_act(lie.sim3_inv(T), pts_w))(T_true).astype(jnp.float32)
    C = jnp.full((window, hw, 1), 5.0, jnp.float32)
    ii, jj = [], []
    for k in range(window - 1):
        ii += [k, k + 1]
        jj += [k + 1, k]
    e = 2 * window
    pad = e - len(ii)
    edges0 = Edges(
        ii=jnp.asarray(ii + [0] * pad, jnp.int32),
        jj=jnp.asarray(jj + [0] * pad, jnp.int32),
        idx=jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32), (e, hw)),
        valid=jnp.concatenate([jnp.ones((len(ii), hw), bool), jnp.zeros((pad, hw), bool)]),
        Q=jnp.full((e, hw), 4.0, jnp.float32),
        active=jnp.asarray([True] * len(ii) + [False] * pad),
    )
    XiT, w0 = jax.jit(_edges_pre, static_argnames="cfg")(BAConfig(), X, C, edges0)
    edges0 = edges0._replace(XiT=XiT, w0=w0)
    odom0 = empty_odom_edges(1)
    s_bar = jnp.full((window,), -1.0, jnp.float32)

    rng = np.random.default_rng(0)
    feat_i = jnp.asarray(rng.normal(size=(1, 576, cfg.enc_embed_dim)).astype(np.float32))
    feat_j = jnp.asarray(rng.normal(size=(1, 576, cfg.enc_embed_dim)).astype(np.float32))
    yy, xx = np.meshgrid(np.arange(h // 16), np.arange(w // 16), indexing="ij")
    pos = jnp.asarray(np.stack([yy, xx], -1).reshape(1, 576, 2), jnp.int32)

    ms = timeit("backend match_symmetric (pair)", lambda: match_symmetric(
        params, cfg, match_cfg_d, feat_i, pos, feat_j, pos, (h, w)),
        n=5, fetch_base=fetch_base)
    (idx_i2j, idx_j2i, vm_j, vm_i, Qii, Qjj, Qji, Qij) = ms

    n_one = jnp.ones((1,), jnp.int32)
    ing = timeit("backend _ingest_pairs", lambda: _ingest_pairs(
        jnp.float32(1.5), jnp.float32(1.5), jnp.float32(0.0),
        X[0:1], C[0:1], n_one, X[1:2], C[1:2], n_one,
        idx_i2j.astype(jnp.int32), idx_j2i.astype(jnp.int32),
        vm_j, vm_i, Qii, Qjj, Qji, Qij), n=5, fetch_base=fetch_base)
    (Qj, Qi, valid_j, valid_i, fracs, XiT_r0, w0_r0, XiT_r1, w0_r1) = ing

    noise = (jax.random.normal(jax.random.PRNGKey(3), (window, 7))
             * jnp.array([0.05] * 3 + [0.02] * 3 + [0.01])).at[0].set(0.0).astype(jnp.float32)
    T_init = jax.vmap(lie.sim3_retr)(T_true, noise)
    timeit("backend solve_gn_rays (window 64)", lambda: solve_gn_rays(
        ba_cfg, 1, T_init, X, C, edges0, odom0, s_bar), n=5, fetch_base=fetch_base)


if __name__ == "__main__":
    main()
