"""Scalar-expanded Sim(3) normal-equation reduction vs an einsum oracle.

The production path (ops/normal_eqs.py) hand-expands the tiny R/3/3 dims;
this test rebuilds the same reduction with dense einsums (the formulation
the CUDA kernels gn_kernels.cu:749-858 describe) and checks agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frodo_slam_tpu.ops import lie
from frodo_slam_tpu.ops.normal_eqs import (
    cols_from_array,
    ray_dist_drd_cols,
    reduce_sim3_system,
)


def oracle(drd, w, err, P):
    """Dense einsum reduction of G^T D^T W D G, G = [I | -skew(P) | P]."""
    n = P.shape[0]
    S = np.zeros((n, 3, 3), np.float64)
    x, y, z = P[:, 0], P[:, 1], P[:, 2]
    S[:, 0, 1], S[:, 0, 2] = -z, y
    S[:, 1, 0], S[:, 1, 2] = z, -x
    S[:, 2, 0], S[:, 2, 1] = -y, x
    G = np.concatenate(
        [np.broadcast_to(np.eye(3), (n, 3, 3)), -S, P[:, :, None]], axis=2
    )  # (n, 3, 7)
    J = np.einsum("nda,nab->ndb", drd, G)  # (n, R, 7)
    B = np.einsum("nda,nd,ndb->ab", J, w, J)
    g = np.einsum("nda,nd->a", J, w * err)
    cost = np.sum(w * err * err)
    return B, g, cost


@pytest.mark.parametrize("R", [3, 4])
def test_reduce_matches_einsum_oracle(R):
    rng = np.random.default_rng(0)
    n = 257
    drd = rng.normal(size=(n, R, 3)).astype(np.float64)
    w = rng.uniform(0.1, 2.0, size=(n, R)).astype(np.float64)
    err = rng.normal(size=(n, R)).astype(np.float64)
    P = rng.normal(size=(n, 3)).astype(np.float64) + [0, 0, 3]

    drd_f = jnp.asarray(drd, jnp.float32)
    B, g, cost = reduce_sim3_system(
        cols_from_array(drd_f),
        [jnp.asarray(w[:, i], jnp.float32) for i in range(R)],
        [jnp.asarray(err[:, i], jnp.float32) for i in range(R)],
        jnp.asarray(P, jnp.float32),
    )
    B0, g0, c0 = oracle(drd, w, err, P)
    scale = np.abs(B0).max()
    np.testing.assert_allclose(np.asarray(B), B0, atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(g), g0, atol=2e-3 * np.abs(g0).max())
    np.testing.assert_allclose(float(cost), c0, rtol=1e-4)
    # Gram symmetry + PSD
    Bn = np.asarray(B, np.float64)
    np.testing.assert_allclose(Bn, Bn.T, atol=1e-4 * scale)
    assert np.linalg.eigvalsh(Bn).min() > -1e-3 * scale


def test_ray_dist_cols_match_jacobian():
    """ray_dist_drd_cols equals the analytic d[ray;dist]/dP rows."""
    rng = np.random.default_rng(1)
    P = rng.normal(size=(64, 3)).astype(np.float64) + [0, 0, 3]
    d = np.linalg.norm(P, axis=-1)
    r = P / d[:, None]
    cols = ray_dist_drd_cols(jnp.asarray(r, jnp.float32), jnp.asarray(d, jnp.float32))
    # analytic: d(P/|P|)/dP = (I - r r^T)/|P| ; d|P|/dP = r^T
    dnorm = (np.eye(3)[None] - r[:, :, None] * r[:, None, :]) / d[:, None, None]
    for drow in range(3):
        for a in range(3):
            np.testing.assert_allclose(
                np.asarray(cols[drow][a]), dnorm[:, drow, a], atol=1e-5
            )
    for a in range(3):
        np.testing.assert_allclose(np.asarray(cols[3][a]), r[:, a], atol=1e-6)
