"""Geometry residuals/Jacobians vs numerical differentiation."""

import jax
import jax.numpy as jnp
import numpy as np

from frodo_slam_tpu.ops import geometry, lie

jax.config.update("jax_default_matmul_precision", "highest")


def test_point_to_ray_dist_jacobian():
    X = jax.random.normal(jax.random.PRNGKey(0), (16, 3)) + jnp.array([0, 0, 3.0])
    rd, J = geometry.point_to_ray_dist(X, jacobian=True)
    J_num = jax.vmap(jax.jacfwd(lambda x: geometry.point_to_ray_dist(x)))(X)
    np.testing.assert_allclose(J, J_num, atol=1e-4)
    np.testing.assert_allclose(rd[..., 3], jnp.linalg.norm(X, axis=-1), atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.norm(rd[..., :3], axis=-1), 1.0, atol=1e-5)


def test_act_sim3_jacobian():
    T = lie.sim3_exp(jax.random.normal(jax.random.PRNGKey(1), (7,)) * 0.5)
    X = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    pW, J = geometry.act_Sim3(T, X, jacobian=True)

    def act_with_perturbation(xi, x):
        return lie.sim3_act(lie.sim3_retr(T, xi[None])[0], x)

    J_num = jax.vmap(
        lambda x: jax.jacfwd(lambda xi: act_with_perturbation(xi, x))(jnp.zeros(7))
    )(X)
    np.testing.assert_allclose(J, J_num, atol=1e-4)


def test_project_calib():
    K = jnp.array([[320.0, 0, 256], [0, 320, 144], [0, 0, 1]])
    P = jnp.array([[0.1, -0.05, 2.0], [0.0, 0.0, 1.0], [1.0, 1.0, -0.5]])
    pz, J, valid = geometry.project_calib(P, K, (288, 512), jacobian=True)
    assert bool(valid[0, 0]) and bool(valid[1, 0])
    assert not bool(valid[2, 0])  # behind camera
    np.testing.assert_allclose(pz[1], jnp.array([256.0, 144.0, 0.0]), atol=1e-5)

    # numerical jacobian on valid points
    def f(p):
        out, _ = geometry.project_calib(p, K, (288, 512))
        return out

    J_num = jax.vmap(jax.jacfwd(f))(P[:2])
    np.testing.assert_allclose(J[:2], J_num, atol=1e-3)


def test_backproject_roundtrip():
    K = jnp.array([[320.0, 0, 256], [0, 320, 144], [0, 0, 1]])
    uv = geometry.get_pixel_coords((4, 6))
    z = jnp.linspace(0.5, 3.0, 24)[:, None]
    P = geometry.backproject(uv, z, K)
    pz, valid = geometry.project_calib(P, K, (4, 6), border=-10)
    np.testing.assert_allclose(pz[..., :2], uv, atol=1e-4)


def test_constrain_points_to_ray_keeps_depth():
    K = jnp.array([[100.0, 0, 32], [0, 100, 16], [0, 0, 1]])
    Xs = jax.random.normal(jax.random.PRNGKey(3), (32 * 64, 3)) + jnp.array(
        [0, 0, 4.0]
    )
    Xc = geometry.constrain_points_to_ray((32, 64), Xs, K)
    np.testing.assert_allclose(Xc[..., 2], Xs[..., 2], atol=1e-6)
    # constrained points project exactly onto the pixel grid
    pz, _ = geometry.project_calib(Xc, K, (32, 64), border=-100)
    np.testing.assert_allclose(pz[..., :2], geometry.get_pixel_coords((32, 64)), atol=1e-3)
