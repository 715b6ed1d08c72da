"""Chained component timings for the backend half-reuse path on TPU.

Round-3 bisect: in one tunnel window, bench.py measured
  no_half        17.11 FPS   (3.62 s / 62 frames)
  half+seed       8.67 FPS   (7.15 s)
  half+no-seed    9.59 FPS   (6.47 s)
=> ~400 ms/KF in the half path that is NOT the seed/invert, even though
the half path does strictly less device work than match_symmetric.
This times each component the honest way (chain N calls, one tiny fetch).
All programs are warmed first; per-call costs here are far above the
~1-3 ms dispatch floor, so isolated numbers are meaningful.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax
import jax.numpy as jnp
import numpy as np

from frodo_slam_tpu.config import make_config
from frodo_slam_tpu.models import mast3r
from frodo_slam_tpu.ops import matching as matching_ops
from frodo_slam_tpu.slam.backend import _invert_match
from frodo_slam_tpu.slam.inference import (
    decode_asymmetric, decode_symmetric_batch, match_symmetric,
)

mcfg = mast3r.MASt3RConfig()
h, w = 288, 512
hw = h * w
cfg = make_config()
match_cfg_d = dict(cfg.matching)
cold_cfg, warm_cfg = matching_ops.split_match_cfg(match_cfg_d)

params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
params["head2"] = params["head1"]
params["dec_blocks2"] = params["dec_blocks"]
params = mast3r.cast_transformer_params(params, mcfg.dtype)

rng = np.random.default_rng(0)
n_tok = (h // 16) * (w // 16)
# encoder-feature-shaped inputs (the decode is params-dominated; random is fine)
feat_i = jnp.asarray(rng.normal(size=(1, n_tok, mcfg.enc_embed_dim)), jnp.float32)
feat_j = jnp.asarray(rng.normal(size=(1, n_tok, mcfg.enc_embed_dim)), jnp.float32)
yy, xx = np.meshgrid(np.arange(h // 16), np.arange(w // 16), indexing="ij")
pos = jnp.asarray(np.stack([yy, xx], -1).reshape(1, n_tok, 2), jnp.int32)


def timed(name, fn, chain, n=10):
    out = fn()  # warm (compile if needed)
    jax.block_until_ready(out)
    t_sync0 = time.perf_counter()
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    sync_ms = (time.perf_counter() - t_sync0) * 1e3
    t0 = time.perf_counter()
    cur = out
    for _ in range(n):
        cur = fn() if chain is None else chain(cur)
    _ = np.asarray(jax.tree_util.tree_leaves(cur)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.1f} ms/call (x{n}, first-sync {sync_ms:.0f} ms)", flush=True)


# --- pair decodes ----------------------------------------------------------
timed("decode_asymmetric b=1",
      lambda: decode_asymmetric(params, mcfg, feat_i, pos, feat_j, pos, (h, w)),
      # chain via feat perturbation from an output scalar to defeat CSE-free repeats
      None)

timed("decode_symmetric_batch b=1pair",
      lambda: decode_symmetric_batch(params, mcfg, feat_i, pos, feat_j, pos, (h, w)),
      None)

# --- matches ---------------------------------------------------------------
res11, res21 = decode_asymmetric(params, mcfg, feat_i, pos, feat_j, pos, (h, w))
jax.block_until_ready(res21["pts3d"])

timed("match cold b=1",
      lambda: matching_ops.match(res11["pts3d"], res21["pts3d"],
                                 res11["desc"], res21["desc"], None, **cold_cfg),
      None)

idx0, vm0 = matching_ops.match(res11["pts3d"], res21["pts3d"],
                               res11["desc"], res21["desc"], None, **cold_cfg)
jax.block_until_ready(idx0)

timed("match warm b=1 (seeded)",
      lambda: matching_ops.match(res11["pts3d"], res21["pts3d"],
                                 res11["desc"], res21["desc"], idx0, **warm_cfg),
      None)

timed("_invert_match",
      lambda: _invert_match(idx0, vm0)[0],
      chain=lambda cur: _invert_match(cur, vm0)[0])

# --- the full symmetric program for reference ------------------------------
timed("match_symmetric (decode b=2 + cold match both dirs)",
      lambda: match_symmetric(params, mcfg, match_cfg_d, feat_i, pos, feat_j, pos, (h, w)),
      None)

print("backend:", jax.default_backend())
