"""Does a decoder|heads program boundary beat the fused model stage?

The round-5 phantom lesson (prep->LM boundary worth 4x) raises the same
question one level up: decode_and_heads fuses the 12-layer paired decoder
scan with two conv-heavy DPT passes. Measure decoder-only + heads-only as
separate dispatches vs the fused program.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax
import jax.numpy as jnp

from frodo_slam_tpu.models import mast3r
from frodo_slam_tpu.models import dpt as dpt_mod

_first = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))


def touch(o):
    l = [x for x in jax.tree.leaves(o) if hasattr(x, "reshape")][0]
    return float(jax.device_get(_first(l)))


def timeit(name, fn, *a, n=20, fb=0.0):
    o = fn(*a)
    touch(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(*a)
    touch(o)
    print(f"{name:44s} {(time.perf_counter()-t0-fb)/n*1e3:8.2f} ms", flush=True)
    return o


def main():
    h, w = 288, 512
    cfg = mast3r.MASt3RConfig()
    params = mast3r.init_params(jax.random.PRNGKey(0), cfg)
    params["head2"] = params["head1"]
    params["dec_blocks2"] = params["dec_blocks"]
    params = mast3r.cast_transformer_params(params, cfg.dtype)
    img = jnp.zeros((1, h, w, 3), jnp.float32)

    tiny = jnp.zeros((4,), jnp.float32) + 1
    touch(tiny)
    t0 = time.perf_counter()
    for _ in range(20):
        touch(tiny)
    fb = (time.perf_counter() - t0) / 20
    print(f"fetch baseline {fb*1e3:.1f} ms", flush=True)

    encode = jax.jit(lambda p, x: mast3r.encode_image(p, cfg, x))
    feat, pos = encode(params, img)
    touch(feat)

    fused = jax.jit(lambda p, f, po: mast3r.decode_and_heads(
        p, cfg, f, po, f, po, (h, w)))
    timeit("decode_and_heads FUSED", fused, params, feat, pos, fb=fb)

    dec = jax.jit(lambda p, f, po: mast3r.decode(p, cfg, f, po, f, po))
    grid = (h // cfg.patch_size, w // cfg.patch_size)

    @jax.jit
    def heads(p, hooks1, hooks2):
        hooks1 = [t.astype(cfg.head_dtype) for t in hooks1]
        hooks2 = [t.astype(cfg.head_dtype) for t in hooks2]
        pc1 = dpt_mod.dpt_apply(p["head1"]["dpt"], hooks1, grid)
        pc2 = dpt_mod.dpt_apply(p["head2"]["dpt"], hooks2, grid)
        cat_p = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                             p["head1"]["catmlp"], p["head2"]["catmlp"])
        enc = jnp.stack([hooks1[0], hooks2[0]])
        de = jnp.stack([hooks1[3], hooks2[3]])
        local = jax.vmap(lambda q, e, d: dpt_mod.catmlp_apply(
            q, e, d, grid, cfg.patch_size, cfg.local_feat_dim, cfg.two_confs
        ))(cat_p, enc, de)
        r1 = dpt_mod.postprocess(
            jnp.concatenate([pc1, local[0]], -1).astype(jnp.float32),
            cfg.local_feat_dim)
        r2 = dpt_mod.postprocess(
            jnp.concatenate([pc2, local[1]], -1).astype(jnp.float32),
            cfg.local_feat_dim)
        return r1, r2

    def split(p, f, po):
        hooks1, hooks2 = dec(p, f, po)
        return heads(p, hooks1, hooks2)

    timeit("decoder | heads SPLIT (2 dispatches)", split, params, feat, pos,
           fb=fb)
    timeit("decoder only", dec, params, feat, pos, fb=fb)
    hooks1, hooks2 = dec(params, feat, pos)
    touch(hooks1)
    timeit("heads only", heads, params, hooks1, hooks2, fb=fb)


if __name__ == "__main__":
    main()
