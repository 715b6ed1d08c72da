"""Finite-difference validation of the BA edge Jacobian algebra
(Jj = Jrel @ AdjInv(T_i), Ji = -Jj — gn_kernels.cu:749-858)."""

import jax
import jax.numpy as jnp
import numpy as np

from frodo_slam_tpu.ops import lie
from frodo_slam_tpu.slam.global_opt import _adj_inv_matrix


def test_edge_jacobian_fd():
    Ti = lie.sim3_exp(jax.random.normal(jax.random.PRNGKey(3), (7,)) * 0.4)
    Tj = lie.sim3_exp(jax.random.normal(jax.random.PRNGKey(4), (7,)) * 0.4)
    Xj = jnp.array([0.3, -0.2, 2.5])
    Xi_meas = jnp.array([0.1, 0.4, 3.0])

    def err_gen(T_i, T_j):
        Tij = lie.sim3_rel(T_i, T_j)
        P = lie.sim3_act(Tij, Xj)
        nj = jnp.linalg.norm(P)
        rj = P / nj
        ni = jnp.linalg.norm(Xi_meas)
        ri = Xi_meas / ni
        return jnp.concatenate([rj - ri, (nj - ni)[None]])

    eps = 1e-5

    def fd(fn):
        J = np.zeros((4, 7))
        for n in range(7):
            e = np.zeros(7)
            e[n] = eps
            J[:, n] = (
                np.asarray(fn(jnp.asarray(e))) - np.asarray(fn(jnp.asarray(-e)))
            ) / (2 * eps)
        return J

    J_j_fd = fd(lambda xi: err_gen(Ti, lie.sim3_mul(lie.sim3_exp(xi), Tj)))
    J_i_fd = fd(lambda xi: err_gen(lie.sim3_mul(lie.sim3_exp(xi), Ti), Tj))

    # analytic, as in _ray_edge_system
    Tij = lie.sim3_rel(Ti, Tj)
    P = lie.sim3_act(Tij, Xj)
    nj = jnp.linalg.norm(P)
    rj = P / nj
    dnorm = (jnp.eye(3) - jnp.outer(rj, rj)) / nj
    Jrel = jnp.zeros((4, 7))
    Jrel = (
        Jrel.at[:3, :3].set(dnorm)
        .at[:3, 3:6].set(-lie.skew(rj))
        .at[3, :3].set(rj)
        .at[3, 6].set(nj)
    )
    M = _adj_inv_matrix(Ti)
    Jj = Jrel @ M

    np.testing.assert_allclose(np.asarray(Jj), J_j_fd, atol=1e-5)
    np.testing.assert_allclose(-J_j_fd, J_i_fd, atol=1e-5)
