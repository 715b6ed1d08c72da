"""fnn fallback matcher: reciprocal NN fixpoint on descriptor grids."""

import jax
import jax.numpy as jnp
import numpy as np

from frodo_slam_tpu.ops.fast_nn import fast_reciprocal_nns


def test_reciprocal_nns_identity():
    h, w, c = 16, 24, 8
    rng = np.random.default_rng(0)
    D = rng.normal(size=(h * w, c)).astype(np.float32)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    xy1, xy2, conv = fast_reciprocal_nns(jnp.asarray(D), jnp.asarray(D), h, w, subsample=4)
    assert bool(conv.all())
    np.testing.assert_array_equal(np.asarray(xy1), np.asarray(xy2))


def test_reciprocal_nns_shifted():
    """D2 is D1 with rows permuted by a known shift: reciprocal NNs must
    recover the permutation for converged queries."""
    h, w, c = 12, 16, 8
    rng = np.random.default_rng(1)
    D1 = rng.normal(size=(h * w, c)).astype(np.float32)
    D1 /= np.linalg.norm(D1, axis=-1, keepdims=True)
    perm = rng.permutation(h * w)
    D2 = D1[perm]
    inv = np.empty_like(perm)
    inv[perm] = np.arange(h * w)

    xy1, xy2, conv = fast_reciprocal_nns(jnp.asarray(D1), jnp.asarray(D2), h, w, subsample=4)
    xy1, xy2, conv = np.asarray(xy1), np.asarray(xy2), np.asarray(conv)
    assert conv.mean() > 0.9
    np.testing.assert_array_equal(xy2[conv], inv[xy1[conv]])
