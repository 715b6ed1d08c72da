"""Reciprocal nearest-neighbor descriptor matching (the tracker's fnn
fallback).

Behavioral spec: ``mast3r/fast_nn.py:115-194`` (``fast_reciprocal_NNs`` with
``dist='dot'``): seed a subsampled pixel grid in image 1, iterate the NN
fixpoint xy2 <- NN_2(D1[xy1]), xy1 <- NN_1(D2[xy2]) up to 10 times, and keep
correspondences that converged (reciprocal fixed points).

TPU design: the reference alternates KDTree/cdist queries with early-exit
bookkeeping on the host. Here each iteration is two chunked (Q, C) x (C, N)
matmul argmaxes (MXU) inside a ``lax.fori_loop``; convergence is a mask, not
an early exit — all shapes static, whole thing jittable inside the tracking
step's fallback branch (tracker.py:222-272 in the reference).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _nn_dot(queries: jax.Array, db: jax.Array, chunk: int = 256) -> jax.Array:
    """argmax_j queries @ db.T per row, chunked over queries to bound the
    (chunk, N) score tile. queries: (Q, C), db: (N, C) -> (Q,) int32."""
    q = queries.shape[0]
    pad = (-q) % chunk
    qp = jnp.pad(queries, ((0, pad), (0, 0)))
    qc = qp.reshape(-1, chunk, queries.shape[1])

    def one(qblk):
        scores = qblk @ db.T  # (chunk, N)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)

    idx = jax.lax.map(one, qc).reshape(-1)
    return idx[:q]


@partial(jax.jit, static_argnames=("subsample", "max_iter", "h1", "w1", "chunk"))
def fast_reciprocal_nns(D1: jax.Array, D2: jax.Array, h1: int, w1: int,
                        subsample: int = 8, max_iter: int = 10, chunk: int = 256):
    """D1: (H1*W1, C) frame descriptors; D2: (N2, C) keyframe descriptors.

    Returns (xy1 (Q,), xy2 (Q,), converged (Q,) bool) with Q the subsampled
    grid size; xy are linear indices into D1/D2 rows.
    """
    s = subsample
    ys = jnp.arange(s // 2, h1, s)
    xs = jnp.arange(s // 2, w1, s)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    xy1 = (xx + w1 * yy).reshape(-1).astype(jnp.int32)

    xy2 = jnp.full_like(xy1, -1)
    old_xy1 = xy1
    old_xy2 = xy2
    notyet = jnp.ones_like(xy1, dtype=bool)

    def body(_, state):
        xy1, xy2, old_xy1, old_xy2, notyet = state
        new_xy2 = _nn_dot(D1[xy1], D2, chunk)
        xy2 = jnp.where(notyet, new_xy2, xy2)
        notyet = notyet & (old_xy2 != xy2)
        new_xy1 = _nn_dot(D2[xy2], D1, chunk)
        xy1 = jnp.where(notyet, new_xy1, xy1)
        notyet = notyet & (old_xy1 != xy1)
        return (xy1, xy2, xy1, xy2, notyet)

    xy1, xy2, _, _, notyet = jax.lax.fori_loop(
        0, max_iter, body, (xy1, xy2, old_xy1, old_xy2, notyet)
    )
    return xy1, xy2, ~notyet
