"""Round-5 matcher-focused probe (higher-rep, tighter numbers).

A/Bs the aligned precombined-corner table in iter_proj and breaks the cold
matcher into its in-situ pieces; also finishes the solve-slope and
merged-dispatch measurements the first probe ran out of time for.
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

from frodo_slam_tpu.config import make_config
from frodo_slam_tpu.models import mast3r
from frodo_slam_tpu.ops import lie, matching
from frodo_slam_tpu.slam import frame as frame_mod
from frodo_slam_tpu.slam.inference import _model_stage, decode_mono
from frodo_slam_tpu.slam.tracker import TrackingCfg, track_step_post

_first = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))


def touch(out):
    leaf = [l for l in jax.tree.leaves(out) if hasattr(l, "reshape")][0]
    return float(jax.device_get(_first(leaf)))


def timeit(name, fn, *args, n=30, fetch_base=0.0):
    out = fn(*args)
    touch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    touch(out)
    dt = (time.perf_counter() - t0 - fetch_base) / n
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return out


def main():
    h, w = 288, 512
    hw = h * w
    cfg = mast3r.MASt3RConfig()
    params = mast3r.init_params(jax.random.PRNGKey(0), cfg)
    params["head2"] = params["head1"]
    params["dec_blocks2"] = params["dec_blocks"]
    params = mast3r.cast_transformer_params(params, cfg.dtype)
    img = jnp.zeros((1, h, w, 3), jnp.float32)

    tiny = jnp.zeros((4,), jnp.float32) + 1
    touch(tiny)
    t0 = time.perf_counter()
    for _ in range(30):
        touch(tiny)
    # timeit's rep loop ends in ONE touch() fetch: subtract one fetch cost
    fetch_base = (time.perf_counter() - t0) / 30
    print(f"{'fetch baseline':44s} {fetch_base * 1e3:9.2f} ms", flush=True)

    sys_cfg = make_config()
    match_cfg_d = dict(sys_cfg.matching)
    cold_cfg, warm_cfg = matching.split_match_cfg(match_cfg_d)

    encode = jax.jit(lambda p, x: mast3r.encode_image(p, cfg, x))
    feat, pos = encode(params, img)
    touch(feat)
    model = jax.jit(lambda p, f, po: _model_stage(p, cfg, f, po, f, po, (h, w)))
    res11, res21 = model(params, feat, pos)
    touch(res11["pts3d"])

    idx0 = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (1, hw))

    prep = jax.jit(lambda a, b: matching.prep_for_iter_proj(a, b, None))
    rays, tgt, p_init = prep(res11["pts3d"], res21["pts3d"])
    touch(rays)
    ipw = jax.jit(lambda r, t, p: matching.iter_proj(
        r, t, p, max_iter=4, lambda_init=1e-8, cost_thresh=1e-6))
    timeit("iter_proj warm (4 it, aligned P)", ipw, rays, tgt, p_init,
           fetch_base=fetch_base)
    ipc = jax.jit(lambda r, t, p: matching.iter_proj(
        r, t, p, max_iter=10, lambda_init=1e-8, cost_thresh=1e-6))
    timeit("iter_proj cold (10 it, aligned P)", ipc, rays, tgt, p_init,
           fetch_base=fetch_base)

    warm_match = jax.jit(lambda a, b, c, d, i: matching.match(
        a, b, c, d, i, **warm_cfg))
    timeit("matcher WARM (d=-1, it=4)", warm_match, res11["pts3d"],
           res21["pts3d"], res11["desc"], res21["desc"], idx0,
           fetch_base=fetch_base)

    d0_cfg = dict(cold_cfg); d0_cfg["dilation_max"] = 0
    m_d0 = jax.jit(lambda a, b, c, d: matching.match(a, b, c, d, None,
                                                     **d0_cfg))
    timeit("matcher COLD d=0 (no refine)", m_d0, res11["pts3d"],
           res21["pts3d"], res11["desc"], res21["desc"],
           fetch_base=fetch_base)

    cold_match = jax.jit(lambda a, b, c, d: matching.match(a, b, c, d, None,
                                                           **cold_cfg))
    timeit("matcher COLD d=5 fused", cold_match, res11["pts3d"],
           res21["pts3d"], res11["desc"], res21["desc"],
           fetch_base=fetch_base, n=15)

    shift_cfg = dict(cold_cfg); shift_cfg["refine_impl"] = "shift"
    m_sh = jax.jit(lambda a, b, c, d: matching.match(a, b, c, d, None,
                                                     **shift_cfg))
    timeit("matcher COLD d=5 shift", m_sh, res11["pts3d"],
           res21["pts3d"], res11["desc"], res21["desc"],
           fetch_base=fetch_base, n=15)

    # merged matcher+post (1 dispatch vs 2)
    tcfg = TrackingCfg(
        min_match_frac=0.0, max_iters=int(sys_cfg.tracking.max_iters),
        Q_conf=0.0, match_frac_thresh=float(sys_cfg.tracking.match_frac_thresh),
    )
    X0, C0m = decode_mono(params, cfg, feat, pos, (h, w))
    f0 = frame_mod.make_empty_frame(0, img, feat, pos)
    import dataclasses
    Xn, Cn, Nn, Un = frame_mod.update_pointmap(f0.X_canon, f0.C, f0.N,
                                               f0.N_updates, X0, C0m)
    kf = dataclasses.replace(f0, X_canon=Xn, C=Cn, N=Nn, N_updates=Un)
    fr = frame_mod.make_empty_frame(1, img, feat, pos)

    idx_w, vm_w = warm_match(res11["pts3d"], res21["pts3d"], res11["desc"],
                             res21["desc"], idx0)
    post = lambda k, f, r1, r2, i, v: track_step_post(  # noqa: E731
        tcfg, (h, w), k, f, r1, r2, i, v, None)
    timeit("track_step_post (dispatch 3)", post, kf, fr, res11, res21,
           idx_w, vm_w, fetch_base=fetch_base)

    def two_disp(k, f, r1, r2, i):
        idx, vm = warm_match(r1["pts3d"], r2["pts3d"], r1["desc"], r2["desc"], i)
        return post(k, f, r1, r2, idx, vm)
    timeit("warm match + post (2 dispatches)", two_disp, kf, fr, res11,
           res21, idx0, fetch_base=fetch_base)

    merged = jax.jit(lambda k, f, r1, r2, i: track_step_post(
        tcfg, (h, w), k, f, r1, r2,
        *matching.match(r1["pts3d"], r2["pts3d"], r1["desc"], r2["desc"], i,
                        **warm_cfg), None))
    timeit("warm match + post (MERGED 1 dispatch)", merged, kf, fr, res11,
           res21, idx0, fetch_base=fetch_base)

    # decoder vs heads split
    dec_feats = jax.jit(lambda p, f, po: mast3r.decode(p, cfg, f, po, f, po))
    timeit("decoder only (no heads)", dec_feats, params, feat, pos,
           fetch_base=fetch_base)
    timeit("model stage (dec + heads)", model, params, feat, pos,
           fetch_base=fetch_base)

    # solve slope: 2 and 5 iterations
    from bench import _steady_state_window
    from frodo_slam_tpu.slam.global_opt import (BAConfig, empty_odom_edges,
                                                solve_gn_rays)

    window = 64
    T_true, X_win, C_win, edges0 = _steady_state_window(hw, window)
    ba_cfg = BAConfig(max_iters=int(sys_cfg.local_opt.max_iters), pin=1,
                      delta_norm=float(sys_cfg.local_opt.delta_norm))
    odom0 = empty_odom_edges(1)
    s_bar = jnp.full((window,), -1.0, jnp.float32)

    @jax.jit
    def perturb(key):
        noise = (
            jax.random.normal(key, (window, 7))
            * jnp.array([0.05] * 3 + [0.02] * 3 + [0.01])
        ).at[0].set(0.0).astype(jnp.float32)
        return jax.vmap(lie.sim3_retr)(T_true, noise)

    T0 = perturb(jax.random.PRNGKey(1))
    for iters in (2, 5, 10):
        cfg_i = ba_cfg._replace(max_iters=iters)
        solve_i = jax.jit(lambda T, e, c=cfg_i: solve_gn_rays(
            c, 1, T, X_win, C_win, e, odom0, s_bar))
        timeit(f"solve_gn_rays ({iters} it)", solve_i, T0, edges0,
               fetch_base=fetch_base, n=10)


if __name__ == "__main__":
    main()
