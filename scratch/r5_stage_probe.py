"""Round-5 probe: warm-path dispatch budget + backend piece budget.

Times the three per-frame dispatches (model | matcher | post) SEPARATELY at
the warm-frame schedule (the steady state: idx seeded, dilation_max_warm=-1,
max_iter_warm=4), plus every backend piece — so the round-5 perf levers are
picked from the real cost table, not the round-2 one.

Methodology: chained dispatches with evolving inputs (the remote-tunnel
contract from scripts/profile_stages.py), one array fetch at the end,
fetch baseline subtracted.
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
from frodo_slam_tpu.slam.inference import _model_stage, decode_asymmetric, decode_mono
from frodo_slam_tpu.slam.tracker import TrackingCfg, track_step, track_step_post

_first = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))


def touch(out):
    leaf = [l for l in jax.tree.leaves(out) if hasattr(l, "reshape")][0]
    return float(jax.device_get(_first(leaf)))


def timeit(name, fn, *args, n=10, fetch_base=0.0):
    out = fn(*args)
    touch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    touch(out)
    dt = (time.perf_counter() - t0 - fetch_base) / n
    print(f"{name:42s} {dt * 1e3:9.2f} ms", flush=True)
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
    for _ in range(10):
        touch(tiny)
    fetch_base = (time.perf_counter() - t0) / 10
    print(f"{'fetch baseline':42s} {fetch_base * 1e3:9.2f} ms", flush=True)

    sys_cfg = make_config()
    match_cfg_d = dict(sys_cfg.matching)
    cold_cfg, warm_cfg = matching.split_match_cfg(match_cfg_d)
    seed_cfg = matching.seed_match_cfg(match_cfg_d)

    encode = jax.jit(lambda p, x: mast3r.encode_image(p, cfg, x))
    feat, pos = encode(params, img)
    touch(feat)

    model = jax.jit(lambda p, f, po: _model_stage(p, cfg, f, po, f, po, (h, w)))
    res11, res21 = timeit("model stage (dec+heads, asym)", model, params, feat,
                          pos, fetch_base=fetch_base)

    # warm matcher dispatch: seeded idx, warm schedule
    idx0 = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (1, hw))
    warm_match = jax.jit(lambda a, b, c, d, i: matching.match(
        a, b, c, d, i, **warm_cfg))
    idx_w, vm_w = timeit("matcher WARM (seeded, d=-1, it=4)", warm_match,
                         res11["pts3d"], res21["pts3d"], res11["desc"],
                         res21["desc"], idx0, fetch_base=fetch_base)

    cold_match = jax.jit(lambda a, b, c, d: matching.match(a, b, c, d, None,
                                                           **cold_cfg))
    timeit("matcher COLD (full pyramid)", cold_match, res11["pts3d"],
           res21["pts3d"], res11["desc"], res21["desc"], fetch_base=fetch_base)

    # warm matcher pieces
    prep = jax.jit(lambda a, b: matching.prep_for_iter_proj(a, b, None))
    rays, tgt, p_init = timeit("  prep_for_iter_proj", prep, res11["pts3d"],
                               res21["pts3d"], fetch_base=fetch_base)
    ipw = jax.jit(lambda r, t, p: matching.iter_proj(
        r, t, p, max_iter=4, lambda_init=1e-8, cost_thresh=1e-6))
    timeit("  iter_proj warm (4 iters)", ipw, rays, tgt, p_init,
           fetch_base=fetch_base)
    ipc = jax.jit(lambda r, t, p: matching.iter_proj(
        r, t, p, max_iter=10, lambda_init=1e-8, cost_thresh=1e-6))
    timeit("  iter_proj cold (10 iters)", ipc, rays, tgt, p_init,
           fetch_base=fetch_base)

    # track_step_post at defaults
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
    post = lambda k, f, r1, r2, i, v: track_step_post(  # noqa: E731
        tcfg, (h, w), k, f, r1, r2, i, v, None)
    timeit("track_step_post", post, kf, fr, res11, res21, idx_w, vm_w,
           fetch_base=fetch_base)

    # full warm frame (all three dispatches chained)
    mc = tuple(sorted(match_cfg_d.items()))

    def full_warm(kf, img, idx):
        feat, pos = encode(params, img)
        f = frame_mod.make_empty_frame(0, img, feat, pos)
        return track_step(params, cfg, tcfg, mc, (h, w), kf, f, idx)

    kf2, fused, res = full_warm(kf, img, idx0)
    touch(res.flags)
    t0 = time.perf_counter()
    n = 10
    cur = kf
    for _ in range(n):
        cur, fused, res = full_warm(cur, img, res.idx_f2k)
    touch(res.flags)
    print(f"{'FULL warm frame (chained)':42s} "
          f"{(time.perf_counter() - t0 - fetch_base) / n * 1e3:9.2f} ms",
          flush=True)

    # ---- backend pieces -------------------------------------------------
    from bench import _steady_state_window
    from frodo_slam_tpu.slam.backend import (_ingest_pairs, _invert_match,
                                             _write_pair_rows)
    from frodo_slam_tpu.slam.global_opt import (BAConfig, empty_odom_edges,
                                                solve_gn_rays)

    window = 64
    T_true, X_win, C_win, edges0 = _steady_state_window(hw, window)
    ba_cfg = BAConfig(max_iters=int(sys_cfg.local_opt.max_iters), pin=1,
                      delta_norm=float(sys_cfg.local_opt.delta_norm))
    odom0 = empty_odom_edges(1)
    s_bar = jnp.full((window,), -1.0, jnp.float32)

    dec_asym = jax.jit(lambda p, f1, p1, f2, p2: decode_asymmetric(
        p, cfg, f1, p1, f2, p2, (h, w)))
    r11, r21 = timeit("backend decode_asymmetric (b=1)", dec_asym, params,
                      feat, pos, feat, pos, fetch_base=fetch_base)

    inv = jax.jit(_invert_match)
    (idx_seed, seeded) = timeit("backend _invert_match", inv,
                                idx_w.astype(jnp.int32), vm_w,
                                fetch_base=fetch_base)

    seed_match = jax.jit(lambda a, b, c, d, i: matching.match(
        a, b, c, d, i, **seed_cfg))
    idx_s, vm_s = timeit("backend seeded match (d_seed=5)", seed_match,
                         r11["pts3d"], r21["pts3d"], r11["desc"], r21["desc"],
                         idx_seed, fetch_base=fetch_base)

    n_one = jnp.ones((1,), jnp.int32)
    zf = jnp.float32(0.0)
    Qii = r11["desc_conf"].reshape(1, hw, 1)
    Qji = r21["desc_conf"].reshape(1, hw, 1)
    ing = jax.jit(_ingest_pairs)
    ing_out = timeit(
        "backend _ingest_pairs", ing, zf, zf, zf,
        X_win[62:63], C_win[62:63], n_one, X_win[63:64], C_win[63:64], n_one,
        idx_s.astype(jnp.int32), idx_w.astype(jnp.int32), vm_s, vm_w,
        Qii, Qii, Qji, Qji, fetch_base=fetch_base)
    (Qj, Qi, valid_j, valid_i, fracs, XiT_r0, w0_r0, XiT_r1, w0_r1) = ing_out

    live_rows = jnp.int32(2 * (window - 1))
    wr = jax.jit(_write_pair_rows, donate_argnums=())
    edges_w = timeit(
        "backend _write_pair_rows (no donate)", wr, edges0, live_rows,
        jnp.int32(62), jnp.int32(63), idx_s[0], idx_w[0],
        valid_j[0, :, 0], valid_i[0, :, 0], Qj[0, :, 0], Qi[0, :, 0],
        (XiT_r0[0], w0_r0[0], XiT_r1[0], w0_r1[0]), fetch_base=fetch_base)

    @jax.jit
    def perturb(key):
        noise = (
            jax.random.normal(key, (window, 7))
            * jnp.array([0.05] * 3 + [0.02] * 3 + [0.01])
        ).at[0].set(0.0).astype(jnp.float32)
        return jax.vmap(lie.sim3_retr)(T_true, noise)

    solve = jax.jit(lambda T, e: solve_gn_rays(ba_cfg, 1, T, X_win, C_win, e,
                                               odom0, s_bar))
    T0 = perturb(jax.random.PRNGKey(1))
    timeit("backend solve_gn_rays (10 it, 126 e)", solve, T0, edges_w,
           fetch_base=fetch_base)
    for iters in (1, 2, 5):
        cfg_i = ba_cfg._replace(max_iters=iters)
        solve_i = jax.jit(lambda T, e, c=cfg_i: solve_gn_rays(
            c, 1, T, X_win, C_win, e, odom0, s_bar))
        timeit(f"backend solve_gn_rays ({iters} it)", solve_i, T0, edges_w,
               fetch_base=fetch_base)

    # merged matcher+post single dispatch (dispatch-floor A/B): the tunnel
    # costs ~1 ms per dispatch; post is only ~2 ms of work
    merged = jax.jit(lambda k, f, r1, r2, i: track_step_post(
        tcfg, (h, w), k, f, r1, r2,
        *matching.match(r1["pts3d"], r2["pts3d"], r1["desc"], r2["desc"], i,
                        **warm_cfg), None))
    timeit("merged warm match+post (1 dispatch)", merged, kf, fr, res11,
           res21, idx0, fetch_base=fetch_base)

    # DPT-head cost split: decode without heads
    dec_feats = jax.jit(lambda p, f, po: mast3r.decode(p, cfg, f, po, f, po))
    timeit("decoder only (no heads)", dec_feats, params, feat, pos,
           fetch_base=fetch_base)


if __name__ == "__main__":
    main()
