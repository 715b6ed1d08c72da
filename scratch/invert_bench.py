"""Chained microbench + correctness check for _invert_match variants.

The half-reuse bisect (round 3): half+jitted decode = 8.67 FPS vs
no_half = 17.11 in the same tunnel window => ~+500 ms/KF left in the half
path. Prime suspect: the scatter in _invert_match — 147k rows with
NON-unique computed indices, which XLA TPU serializes.

Timing methodology per PERF.md: chain N calls output->input, one tiny
fetch at the end. 500 ms >> the ~1-3 ms dispatch floor, so this isolated
measurement is meaningful.

Usage: python scratch/invert_bench.py            (TPU)
       env -u PYTHONPATH PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
         python scratch/invert_bench.py          (CPU correctness only)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

HW = 288 * 512
REPS = 10


@jax.jit
def invert_scatter(idx_j2i, valid_match_i):
    """Current implementation (backend._invert_match): plain scatter with
    non-unique indices."""
    b, hw = idx_j2i.shape
    ident = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (b, hw))
    src = jnp.where(valid_match_i[..., 0], idx_j2i, hw)
    return ident.at[jnp.arange(b)[:, None], src].set(ident, mode="drop")


@jax.jit
def invert_sort(idx_j2i, valid_match_i):
    """Sort-based: sort (target, source) pairs by target, mark first
    occurrence per target (dedupe), then one scatter with UNIQUE indices
    (vectorizable on TPU)."""
    b, hw = idx_j2i.shape
    ident = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (b, hw))
    key = jnp.where(valid_match_i[..., 0], idx_j2i, hw)
    key_s, src_s = jax.lax.sort([key, ident], num_keys=1)
    first = jnp.concatenate(
        [jnp.ones((b, 1), bool), key_s[:, 1:] != key_s[:, :-1]], axis=1)
    # duplicates / invalids -> a unique out-of-range slot so the scatter
    # keeps its unique_indices guarantee while mode="drop" discards them
    key_u = jnp.where(first & (key_s < hw), key_s, hw + ident)
    return ident.at[jnp.arange(b)[:, None], key_u].set(
        src_s, mode="drop", unique_indices=True)


@jax.jit
def invert_searchsorted(idx_j2i, valid_match_i):
    """Sort + binary-search: no scatter at all (log2(hw) gather rounds)."""
    b, hw = idx_j2i.shape
    ident = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (b, hw))
    key = jnp.where(valid_match_i[..., 0], idx_j2i, hw)
    key_s, src_s = jax.lax.sort([key, ident], num_keys=1)
    pos = jax.vmap(lambda ks: jnp.searchsorted(ks, jnp.arange(hw, dtype=jnp.int32)))(key_s)
    pos = jnp.minimum(pos, hw - 1)
    hit = jnp.take_along_axis(key_s, pos, axis=1) == ident
    cand = jnp.take_along_axis(src_s, pos, axis=1)
    return jnp.where(hit, cand, ident)


def check():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, HW, (1, HW)), jnp.int32)
    valid = jnp.asarray(rng.random((1, HW, 1)) < 0.8)
    a = np.asarray(invert_scatter(idx, valid))
    b = np.asarray(invert_sort(idx, valid))
    c = np.asarray(invert_searchsorted(idx, valid))
    # where multiple sources map to one target the winner is arbitrary-but-
    # valid: compare by VALIDITY of the inverse, and exact agreement on
    # collision-free targets
    idxn = np.asarray(idx[0]); vn = np.asarray(valid[0, :, 0])
    counts = np.bincount(idxn[vn], minlength=HW)
    unique_t = counts == 1
    assert (a[0][unique_t] == b[0][unique_t]).all(), "sort variant mismatch"
    assert (a[0][unique_t] == c[0][unique_t]).all(), "searchsorted mismatch"
    # collision targets: each variant's answer must be a genuine preimage
    for out in (a, b, c):
        t = np.where(counts > 1)[0]
        ok = idxn[out[0][t]] == t
        assert ok.all(), "collision winner is not a preimage"
    print("correctness OK (exact on unique targets, valid preimage on collisions)")


def bench(fn, name, idx, valid):
    out = fn(idx, valid)
    _ = np.asarray(out[0, :1])  # warm + sync
    t0 = time.perf_counter()
    cur = out
    for _ in range(REPS):
        cur = fn(cur, valid)  # chain output -> input
    _ = np.asarray(cur[0, :1])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name}: {dt:.2f} ms/call (chained x{REPS}, backend={jax.default_backend()})")


if __name__ == "__main__":
    check()
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, HW, (1, HW)), jnp.int32)
    valid = jnp.asarray(rng.random((1, HW, 1)) < 0.8)
    for fn, name in ((invert_scatter, "scatter"), (invert_sort, "sort+unique-scatter"),
                     (invert_searchsorted, "sort+searchsorted")):
        bench(fn, name, idx, valid)
