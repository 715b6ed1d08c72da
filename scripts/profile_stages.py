"""Stage-by-stage TPU timing of the tracking hot path.

Times each jitted stage separately (encode / decode+heads / matcher pieces /
GN / pointmap update) to find where the frame budget goes. Run on the TPU:
``python scripts/profile_stages.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from frodo_slam_tpu.models import mast3r
from frodo_slam_tpu.ops import matching
from frodo_slam_tpu.slam.tracker import TrackingCfg, opt_pose_ray_dist_sim3
from frodo_slam_tpu.ops import lie


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt * 1e3:9.2f} ms")
    return out


def main():
    h, w = 288, 512
    hw = h * w
    cfg = mast3r.MASt3RConfig()
    params = mast3r.init_params(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, h, w, 3), jnp.float32)

    encode = jax.jit(lambda p, x: mast3r.encode_image(p, cfg, x))
    feat, pos = timeit("encode (ViT-L, 576 tok)", encode, params, img)

    decode = jax.jit(lambda p, f, po: mast3r.decode_and_heads(p, cfg, f, po, f, po, (h, w)))
    res = timeit("decode+heads (self pair)", decode, params, feat, pos)
    res1, res2 = res
    X11, X21 = res1["pts3d"], res2["pts3d"]
    D11, D21 = res1["desc"], res2["desc"]

    prep = jax.jit(lambda a, b: matching.prep_for_iter_proj(a, b, None))
    rays, tgt, p_init = timeit("prep_for_iter_proj", prep, X11, X21)

    rays_c, tgt_c, p_c = jax.block_until_ready((rays, tgt, p_init))
    ip = lambda r, t, p: matching.iter_proj(r, t, p, max_iter=10, lambda_init=1e-8, cost_thresh=1e-6)
    p1f, conv = timeit("iter_proj (10 LM iters)", ip, rays_c, tgt_c, p_c)

    p1 = jnp.floor(p1f).astype(jnp.int32)
    rf = lambda d1, d2, p: matching.refine_matches(d1, d2, p, radius=3, dilation_max=5)
    timeit("refine_matches (d5 r3)", rf, D11, D21.reshape(1, hw, -1), p1)

    full_match = jax.jit(lambda a, b, c, d: matching.match(a, b, c, d))
    timeit("full matcher", full_match, X11, X21, D11, D21)

    # GN on 147k points
    tcfg = TrackingCfg(max_iters=50)
    Xf = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (hw, 3)) + [0, 0, 3], jnp.float32)
    Xk = lie.sim3_act(lie.sim3_exp(jnp.asarray([0.05, 0, 0, 0, 0.02, 0, 0.01], jnp.float32)), Xf)
    Qk = jnp.full((hw, 1), 4.0, jnp.float32)
    valid = jnp.ones((hw, 1), bool)
    gn = jax.jit(lambda xf, xk, q, v: opt_pose_ray_dist_sim3(
        tcfg, xf, xk, lie.sim3_identity(), lie.sim3_identity(), q, v))
    timeit("GN ray-dist (<=50 iters)", gn, Xf, Xk, Qk, valid)


if __name__ == "__main__":
    main()
