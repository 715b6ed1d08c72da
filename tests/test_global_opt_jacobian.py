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


def _fd_pose_jacobian(fn, n_res, eps=1e-5):
    J = np.zeros((n_res, 7))
    for n in range(7):
        e = np.zeros(7)
        e[n] = eps
        J[:, n] = (
            np.asarray(fn(jnp.asarray(e))) - np.asarray(fn(jnp.asarray(-e)))
        ) / (2 * eps)
    return J


def _rel_jacobian(D, P, Ti):
    """Generic Jrel = D @ [I | -skew(P) | P] pushed through AdjInv(T_i)
    (the factoring _reduce_rel_system relies on)."""
    Jrel = jnp.concatenate(
        [D, -D @ lie.skew(P), (D @ P)[:, None]], axis=-1
    )  # (R, 7)
    return Jrel @ _adj_inv_matrix(Ti)


def test_calib_edge_jacobian_fd():
    """Pixel + log-depth rows (calib_proj_kernel, gn_kernels.cu:2486-2560)."""
    Ti = lie.sim3_exp(jax.random.normal(jax.random.PRNGKey(5), (7,)) * 0.3)
    Tj = lie.sim3_exp(jax.random.normal(jax.random.PRNGKey(6), (7,)) * 0.3)
    Xj = jnp.array([0.4, -0.3, 5.0])
    fx, fy, cx, cy = 20.0, 22.0, 16.0, 8.0
    u_t, v_t, zi_log = 3.0, 7.0, jnp.log(4.5)

    def err_gen(T_i, T_j):
        P = lie.sim3_act(lie.sim3_rel(T_i, T_j), Xj)
        u = fx * P[0] / P[2] + cx
        v = fy * P[1] / P[2] + cy
        return jnp.stack([u - u_t, v - v_t, jnp.log(P[2]) - zi_log])

    J_j_fd = _fd_pose_jacobian(
        lambda xi: err_gen(Ti, lie.sim3_mul(lie.sim3_exp(xi), Tj)), 3
    )
    J_i_fd = _fd_pose_jacobian(
        lambda xi: err_gen(lie.sim3_mul(lie.sim3_exp(xi), Ti), Tj), 3
    )

    P = lie.sim3_act(lie.sim3_rel(Ti, Tj), Xj)
    z_inv = 1.0 / P[2]
    D = jnp.asarray([
        [fx * z_inv, 0.0, -fx * P[0] * z_inv * z_inv],
        [0.0, fy * z_inv, -fy * P[1] * z_inv * z_inv],
        [0.0, 0.0, z_inv],
    ])
    Jj = _rel_jacobian(D, P, Ti)
    np.testing.assert_allclose(np.asarray(Jj), J_j_fd, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(-J_j_fd, J_i_fd, atol=1e-4)


def test_point_edge_jacobian_fd():
    """3-D point rows (point_align_kernel, gn_kernels.cu:2082-2160)."""
    Ti = lie.sim3_exp(jax.random.normal(jax.random.PRNGKey(7), (7,)) * 0.3)
    Tj = lie.sim3_exp(jax.random.normal(jax.random.PRNGKey(8), (7,)) * 0.3)
    Xj = jnp.array([0.4, -0.3, 5.0])
    Xi = jnp.array([0.2, 0.1, 4.0])

    def err_gen(T_i, T_j):
        return lie.sim3_act(lie.sim3_rel(T_i, T_j), Xj) - Xi

    J_j_fd = _fd_pose_jacobian(
        lambda xi: err_gen(Ti, lie.sim3_mul(lie.sim3_exp(xi), Tj)), 3
    )
    P = lie.sim3_act(lie.sim3_rel(Ti, Tj), Xj)
    Jj = _rel_jacobian(jnp.eye(3), P, Ti)
    np.testing.assert_allclose(np.asarray(Jj), J_j_fd, atol=1e-5)


def test_odom_edge_system_exact():
    """The odometry-edge normal-equation blocks must be built from the
    EXACT Jacobian of the SE(3)-log residual under the solver's left
    retraction — the reference's adjoint approximation
    (gn_kernels.cu:1193-1237) is ~45% off at general poses with non-unit
    scale and made the combined ray+odom GN diverge once the PGO scale
    write-back moved pose scales away from 1."""
    from frodo_slam_tpu.slam.global_opt import (
        BAConfig, _odom_edge_system, _odom_residual,
    )

    cfg = BAConfig(sigma_odom_t=1.0, sigma_odom_r=1.0)  # unit weights
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    Ti = lie.sim3_exp(
        jax.random.normal(k1, (7,)) * jnp.asarray([0.5] * 3 + [0.3] * 3 + [0.4]))
    Tj = lie.sim3_exp(
        jax.random.normal(k2, (7,)) * jnp.asarray([0.5] * 3 + [0.3] * 3 + [0.4]))
    T = jnp.stack([Ti, Tj])
    dm = jax.random.normal(k3, (6,)) * 0.3
    delta = jnp.concatenate([dm[:3], lie.so3_exp(dm[3:])])

    def resid(eps):
        Tp = jnp.stack([lie.sim3_retr(Ti, eps[:7]), lie.sim3_retr(Tj, eps[7:])])
        return _odom_residual(Tp, 0, 1, delta)

    J = jax.jacfwd(resid)(jnp.zeros(14))
    r0 = resid(jnp.zeros(14))
    H, g = _odom_edge_system(cfg, T, jnp.int32(0), jnp.int32(1), delta)
    # sigma=1: huber weights are 1 in the quadratic zone; clip like the impl
    from frodo_slam_tpu.ops.robust import huber

    w = np.asarray(jnp.concatenate([huber(r0[:3]), huber(r0[3:])]))
    JtWJ = np.asarray(J).T @ (w[:, None] * np.asarray(J))
    JtWr = np.asarray(J).T @ (w * np.asarray(r0))
    np.testing.assert_allclose(np.asarray(H), JtWJ, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g), JtWr, rtol=1e-5, atol=1e-7)
