"""Round-5 phantom hunt: the cold matcher (28 ms at d=0) costs ~2x its
pieces (prep 1.6 + iter_proj 6.1 + occlusion gather ~3). Bisect: LM unroll
on/off in-situ, iter_proj split into its own dispatch, and piece-wise cold
chains. Plus the DPT-head split at bf16 for the head-dtype ledger.
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
from frodo_slam_tpu.ops import matching
from frodo_slam_tpu.slam.inference import _model_stage

_first = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))


def touch(out):
    leaf = [l for l in jax.tree.leaves(out) if hasattr(l, "reshape")][0]
    return float(jax.device_get(_first(leaf)))


def timeit(name, fn, *args, n=20, fetch_base=0.0):
    out = fn(*args)
    touch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    touch(out)
    dt = (time.perf_counter() - t0 - fetch_base) / n
    print(f"{name:48s} {dt * 1e3:9.2f} ms", flush=True)
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
    fetch_base = (time.perf_counter() - t0) / 30
    print(f"{'fetch baseline':48s} {fetch_base * 1e3:9.2f} ms", flush=True)

    sys_cfg = make_config()
    match_cfg_d = dict(sys_cfg.matching)
    cold_cfg, warm_cfg = matching.split_match_cfg(match_cfg_d)
    d0_cfg = dict(cold_cfg)
    d0_cfg["dilation_max"] = 0

    encode = jax.jit(lambda p, x: mast3r.encode_image(p, cfg, x))
    feat, pos = encode(params, img)
    touch(feat)
    model = jax.jit(lambda p, f, po: _model_stage(p, cfg, f, po, f, po, (h, w)))
    res11, res21 = model(params, feat, pos)
    touch(res11["pts3d"])
    X11, X21 = res11["pts3d"], res21["pts3d"]
    D11, D21 = res11["desc"], res21["desc"]

    # 1) cold d0 monolithic, unrolled LM (the 28 ms measurement)
    m1 = jax.jit(lambda a, b, c, d: matching.match(a, b, c, d, None, **d0_cfg))
    timeit("cold d0 monolithic (LM unrolled)", m1, X11, X21, D11, D21,
           fetch_base=fetch_base)

    # 2) cold d0 monolithic, ROLLED LM
    import frodo_slam_tpu.ops.matching as M

    orig_iter_proj = M.iter_proj

    def rolled_iter_proj(r, t, p, **kw):
        kw["unroll"] = False
        return orig_iter_proj(r, t, p, **kw)

    M.iter_proj = rolled_iter_proj
    m2 = jax.jit(lambda a, b, c, d: matching.match(a, b, c, d, None, **d0_cfg))
    timeit("cold d0 monolithic (LM rolled)", m2, X11, X21, D11, D21,
           fetch_base=fetch_base)
    M.iter_proj = orig_iter_proj

    # 3) split: prep+iter_proj as its own dispatch, rest separately
    prep_proj = jax.jit(lambda a, b: matching.iter_proj(
        *matching.prep_for_iter_proj(a, b, None), max_iter=10,
        lambda_init=1e-8, cost_thresh=1e-6))

    def split(a, b, c, d):
        p1f, conv = prep_proj(a, b)
        idx = matching.pixel_to_lin(jnp.floor(p1f).astype(jnp.int32), w)
        return matching.match(a, b, c, d, idx, max_iter=0, dilation_max=0,
                              radius=3)

    # note: max_iter=0 reuses the given idx as the projection (p_init
    # passthrough) — measures the "rest of match" as a second dispatch
    timeit("cold d0 SPLIT (proj | rest)", split, X11, X21, D11, D21,
           fetch_base=fetch_base)

    # 4) pieces, chained in one timing (what the parts cost back-to-back)
    ip = jax.jit(lambda r, t, p: matching.iter_proj(
        r, t, p, max_iter=10, lambda_init=1e-8, cost_thresh=1e-6))
    prep = jax.jit(lambda a, b: matching.prep_for_iter_proj(a, b, None))

    packed_gather = jax.jit(
        lambda X, D, p1: jnp.take_along_axis(
            jnp.concatenate([X.reshape(1, hw, 3), D.reshape(1, hw, -1)], -1),
            matching.pixel_to_lin(p1, w)[..., None], axis=1))

    def pieces(a, b, c, d):
        rays, tgt, p0 = prep(a, b)
        p1f, conv = ip(rays, tgt, p0)
        rows = packed_gather(a, c, jnp.floor(p1f).astype(jnp.int32))
        return rows

    timeit("cold d0 PIECES (3 dispatches)", pieces, X11, X21, D11, D21,
           fetch_base=fetch_base)

    # 5) warm monolithic for reference
    idx0 = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (1, hw))
    m5 = jax.jit(lambda a, b, c, d, i: matching.match(a, b, c, d, i,
                                                      **warm_cfg))
    timeit("warm monolithic (it=4)", m5, X11, X21, D11, D21, idx0,
           fetch_base=fetch_base)

    # 6) cold d0 with max_iter=4 (is the phantom per-iteration?)
    d0_it4 = dict(d0_cfg)
    d0_it4["max_iter"] = 4
    m6 = jax.jit(lambda a, b, c, d: matching.match(a, b, c, d, None,
                                                   **d0_it4))
    timeit("cold d0 it=4 monolithic", m6, X11, X21, D11, D21,
           fetch_base=fetch_base)

    # 7) DPT heads at bf16 (the head_dtype ledger): params+compute bf16
    import dataclasses

    cfg_bf = dataclasses.replace(cfg, head_dtype=jnp.bfloat16)
    params_bf = mast3r.cast_transformer_params(
        mast3r.init_params(jax.random.PRNGKey(0), cfg_bf), cfg_bf.dtype)
    params_bf["head2"] = params_bf["head1"]
    params_bf["dec_blocks2"] = params_bf["dec_blocks"]
    model_bf = jax.jit(lambda p, f, po: _model_stage(p, cfg_bf, f, po, f, po,
                                                     (h, w)))
    timeit("model stage bf16 heads", model_bf, params_bf, feat, pos,
           fetch_base=fetch_base)
    dec_only = jax.jit(lambda p, f, po: mast3r.decode(p, cfg, f, po, f, po))
    timeit("decoder only (reference)", dec_only, params, feat, pos,
           fetch_base=fetch_base)


if __name__ == "__main__":
    main()
