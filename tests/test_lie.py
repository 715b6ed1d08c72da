"""Unit tests for the Sim3/SE3/SO3 library: round trips, group axioms,
adjoint identities, and numerical-vs-analytic Jacobians."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frodo_slam_tpu.ops import lie

jax.config.update("jax_default_matmul_precision", "highest")


def random_sim3(key, shape=()):
    k1, k2, k3 = jax.random.split(key, 3)
    xi = jax.random.normal(k1, (*shape, 7)) * jnp.array(
        [1.0, 1.0, 1.0, 0.8, 0.8, 0.8, 0.3]
    )
    return lie.sim3_exp(xi)


def test_quat_mul_matches_rotation_compose():
    key = jax.random.PRNGKey(0)
    q1 = lie.so3_exp(jax.random.normal(key, (5, 3)))
    q2 = lie.so3_exp(jax.random.normal(jax.random.PRNGKey(1), (5, 3)))
    R = lie.quat_to_R(lie.quat_mul(q1, q2))
    R12 = lie.quat_to_R(q1) @ lie.quat_to_R(q2)
    np.testing.assert_allclose(R, R12, atol=1e-5)


def test_quat_act_matches_matrix():
    key = jax.random.PRNGKey(2)
    q = lie.so3_exp(jax.random.normal(key, (7, 3)))
    X = jax.random.normal(jax.random.PRNGKey(3), (7, 3))
    np.testing.assert_allclose(
        lie.quat_act(q, X), (lie.quat_to_R(q) @ X[..., None])[..., 0], atol=1e-5
    )


def test_so3_exp_log_roundtrip():
    phi = jax.random.normal(jax.random.PRNGKey(4), (32, 3))
    # log of exp only round-trips for |phi| < pi (shortest rotation)
    phi = phi / jnp.linalg.norm(phi, axis=-1, keepdims=True) * 2.5
    phi2 = lie.so3_log(lie.so3_exp(phi))
    np.testing.assert_allclose(phi, phi2, atol=1e-4)
    # tiny angles
    phi = jax.random.normal(jax.random.PRNGKey(5), (8, 3)) * 1e-5
    np.testing.assert_allclose(phi, lie.so3_log(lie.so3_exp(phi)), atol=1e-8)


def test_R_to_quat_roundtrip():
    q = lie.so3_exp(jax.random.normal(jax.random.PRNGKey(6), (16, 3)))
    q2 = lie.R_to_quat(lie.quat_to_R(q))
    # sign-canonicalized comparison
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    np.testing.assert_allclose(q, q2, atol=1e-5)


def test_se3_exp_log_roundtrip():
    xi = jax.random.normal(jax.random.PRNGKey(7), (16, 6)) * jnp.array(
        [1, 1, 1, 0.8, 0.8, 0.8]
    )
    np.testing.assert_allclose(xi, lie.se3_log(lie.se3_exp(xi)), atol=1e-4)


def test_se3_group_axioms():
    T1 = lie.se3_exp(jax.random.normal(jax.random.PRNGKey(8), (4, 6)))
    T2 = lie.se3_exp(jax.random.normal(jax.random.PRNGKey(9), (4, 6)))
    X = jax.random.normal(jax.random.PRNGKey(10), (4, 3))
    np.testing.assert_allclose(
        lie.se3_act(lie.se3_mul(T1, T2), X),
        lie.se3_act(T1, lie.se3_act(T2, X)),
        atol=1e-5,
    )
    ident = lie.se3_mul(T1, lie.se3_inv(T1))
    np.testing.assert_allclose(ident[..., :3], 0.0, atol=1e-5)
    np.testing.assert_allclose(jnp.abs(ident[..., 6]), 1.0, atol=1e-5)


def test_sim3_exp_log_roundtrip():
    xi = jax.random.normal(jax.random.PRNGKey(11), (32, 7)) * jnp.array(
        [1, 1, 1, 0.9, 0.9, 0.9, 0.4]
    )
    np.testing.assert_allclose(xi, lie.sim3_log(lie.sim3_exp(xi)), atol=2e-4)
    # near-identity: bounded by f32 storage of q/s near 1 (~6e-8 abs), so
    # use a scale where the series branch dominates and a matching atol.
    xi = jax.random.normal(jax.random.PRNGKey(12), (8, 7)) * 1e-4
    np.testing.assert_allclose(xi, lie.sim3_log(lie.sim3_exp(xi)), atol=5e-7)


def test_sim3_act_matches_matrix():
    T = random_sim3(jax.random.PRNGKey(13), (6,))
    X = jax.random.normal(jax.random.PRNGKey(14), (6, 3))
    M = lie.sim3_to_matrix(T)
    Xh = jnp.concatenate([X, jnp.ones((6, 1))], axis=-1)
    np.testing.assert_allclose(
        lie.sim3_act(T, X), (M @ Xh[..., None])[..., :3, 0], atol=1e-5
    )


def test_sim3_mul_inv_rel():
    T1 = random_sim3(jax.random.PRNGKey(15), (4,))
    T2 = random_sim3(jax.random.PRNGKey(16), (4,))
    rel = lie.sim3_rel(T1, T2)
    np.testing.assert_allclose(
        rel, lie.sim3_mul(lie.sim3_inv(T1), T2), atol=1e-5
    )
    M = lie.sim3_to_matrix(T1) @ lie.sim3_to_matrix(T2)
    np.testing.assert_allclose(
        lie.sim3_to_matrix(lie.sim3_mul(T1, T2)), M, atol=1e-5
    )


def test_sim3_from_matrix_roundtrip():
    T = random_sim3(jax.random.PRNGKey(17), (5,))
    T2 = lie.sim3_from_matrix(lie.sim3_to_matrix(T))
    np.testing.assert_allclose(
        lie.sim3_to_matrix(T2), lie.sim3_to_matrix(T), atol=1e-5
    )


def test_sim3_retr_is_left_multiplication():
    T = random_sim3(jax.random.PRNGKey(18), (3,))
    xi = jax.random.normal(jax.random.PRNGKey(19), (3, 7)) * 0.1
    np.testing.assert_allclose(
        lie.sim3_retr(T, xi), lie.sim3_mul(lie.sim3_exp(xi), T), atol=1e-6
    )
    np.testing.assert_allclose(
        lie.sim3_retr_right(T, xi), lie.sim3_mul(T, lie.sim3_exp(xi)), atol=1e-6
    )


def sim3_adjoint_matrix(T):
    """Dense 7x7 adjoint built from the generator action, for testing
    sim3_apply_adj_inv: Adj(T) maps tangent at identity ... numerically via
    Adj(T) xi = log(T exp(xi) T^-1) derivative."""
    def f(xi):
        return lie.sim3_log(
            lie.sim3_mul(lie.sim3_mul(T, lie.sim3_exp(xi)), lie.sim3_inv(T))
        )

    return jax.jacfwd(f)(jnp.zeros(7))


def test_sim3_apply_adj_inv():
    T = random_sim3(jax.random.PRNGKey(20))
    X = jax.random.normal(jax.random.PRNGKey(21), (7,))
    Adj = sim3_adjoint_matrix(T)
    expected = jnp.linalg.solve(Adj.T, X[:, None])[:, 0]  # X @ Adj^{-1}
    got = lie.sim3_apply_adj_inv(T, X)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_left_jacobians():
    phi = jax.random.normal(jax.random.PRNGKey(22), (8, 3))
    J = lie.so3_left_jacobian(phi)
    Jinv = lie.so3_left_jacobian_inv(phi)
    eye = jnp.broadcast_to(jnp.eye(3), J.shape)
    np.testing.assert_allclose(J @ Jinv, eye, atol=1e-4)


def test_se3_log_matches_reference_structure():
    # logSE3 in gn_kernels.cu:1076-1084 computes rho = Jl_inv(phi) t
    T = lie.se3_exp(jax.random.normal(jax.random.PRNGKey(23), (4, 6)))
    out = lie.se3_log(T)
    phi = lie.so3_log(T[..., 3:7])
    rho = (lie.so3_left_jacobian_inv(phi) @ T[..., :3][..., None])[..., 0]
    np.testing.assert_allclose(out[..., :3], rho, atol=1e-6)
    np.testing.assert_allclose(out[..., 3:], phi, atol=1e-6)
