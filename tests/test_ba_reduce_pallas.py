"""Pallas BA ray-edge reduction (interpret mode) vs the jnp edge systems.

The kernel (ops/ba_reduce_pallas.py) must produce the same per-edge
(A (7,7), gj (7,)) as the reference jnp path ``_ray_edge_system`` — both
re-derive ``ray_align_kernel`` (gn_kernels.cu:576-907)."""

import jax
import jax.numpy as jnp
import numpy as np

from frodo_slam_tpu.ops import lie
from frodo_slam_tpu.ops.ba_reduce_pallas import ray_edge_systems_pallas
from frodo_slam_tpu.slam.global_opt import (
    BAConfig,
    _adj_inv_matrix,
    _edges_pre,
    _ray_edge_system,
)

from test_global_opt import _consecutive_edges, _make_world


def _pallas_systems(cfg, T_WC, edges, XiT, w0, XjT):
    Ti = T_WC[edges.ii]
    Tj = T_WC[edges.jj]
    Tij = jax.vmap(lie.sim3_rel)(Ti, Tj)
    R = jax.vmap(lie.quat_to_R)(Tij[:, 3:7])
    sR = Tij[:, 7, None, None] * R
    scal = jnp.concatenate([sR.reshape(-1, 9), Tij[:, :3]], axis=-1)
    B, g = ray_edge_systems_pallas(
        scal.astype(jnp.float32), XiT, XjT, w0,
        sigma_ray=float(cfg.sigma_ray), sigma_dist=float(cfg.sigma_dist),
        interpret=True,
    )
    M = jax.vmap(_adj_inv_matrix)(Ti).astype(jnp.float32)
    A = jnp.einsum("eba,ebc,ecd->ead", M, B, M)
    gj = jnp.einsum("eba,eb->ea", M, g)
    return A, gj


def test_pallas_matches_jnp_edge_systems():
    n_kf, hw = 4, 640  # not a multiple of 1024: exercises the pad path
    T_true, X = _make_world(jax.random.PRNGKey(0), n_kf, hw)
    T_true = T_true.astype(jnp.float32)
    X = X.astype(jnp.float32)
    C = jnp.full((n_kf, hw, 1), 5.0, jnp.float32)
    edges = _consecutive_edges(n_kf, hw)
    # random Q + some invalid points + an inactive edge: exercise gates
    key = jax.random.PRNGKey(3)
    kq, kv, kp = jax.random.split(key, 3)
    edges = edges._replace(
        Q=jax.random.uniform(kq, edges.Q.shape, minval=0.0, maxval=4.0),
        valid=jax.random.uniform(kv, edges.valid.shape) > 0.2,
        active=edges.active.at[-1].set(False),
        idx=jax.random.randint(kp, edges.idx.shape, 0, hw, jnp.int32),
    )
    cfg = BAConfig()

    noise = (
        jax.random.normal(jax.random.PRNGKey(5), (n_kf, 7))
        * jnp.asarray([0.05] * 3 + [0.02] * 3 + [0.01])
    ).astype(jnp.float32)
    T = jax.vmap(lie.sim3_retr)(T_true, noise)

    XiT, w0 = _edges_pre(cfg, X, C, edges)
    w0 = w0.astype(jnp.float32)  # like-for-like: x64 tests promote via Q
    XjT = jnp.take(jnp.swapaxes(X, 1, 2), edges.jj, axis=0)

    A_k, g_k = _pallas_systems(cfg, T, edges, XiT, w0, XjT)

    Xi = jnp.swapaxes(XiT, 1, 2)
    Xj = jnp.swapaxes(XjT, 1, 2)
    for e in range(edges.ii.shape[0]):
        A_r, g_r = _ray_edge_system(
            cfg, T, edges.ii[e], edges.jj[e], Xi[e], w0[e], Xj[e]
        )
        # f32 accumulation-order noise at 1/sigma_ray^2 ~ 1e5 weight scale
        np.testing.assert_allclose(A_k[e], A_r, rtol=5e-3, atol=2e-2)
        np.testing.assert_allclose(g_k[e], g_r, rtol=5e-3, atol=2e-2)
        # symmetric up to f32 rounding of the two M^T B M matmuls
        np.testing.assert_allclose(A_k[e], A_k[e].T, rtol=1e-4, atol=1e-1)


def test_pallas_solver_path_matches_xla_solver():
    """solve_gn_rays with edge_impl=pallas (interpret on CPU is exercised
    through the kernel test above; here force the pallas edge path end to
    end through the GN driver using interpret via monkeypatched impl)."""
    from frodo_slam_tpu.slam import global_opt as go

    n_kf, hw = 4, 512
    T_true, X = _make_world(jax.random.PRNGKey(1), n_kf, hw)
    T_true = T_true.astype(jnp.float32)
    X = X.astype(jnp.float32)
    C = jnp.full((n_kf, hw, 1), 5.0, jnp.float32)
    edges = _consecutive_edges(n_kf, hw)
    odom = go.empty_odom_edges(1)
    s_bar = jnp.full((n_kf,), -1.0, jnp.float32)
    noise = (
        jax.random.normal(jax.random.PRNGKey(7), (n_kf, 7))
        * jnp.asarray([0.05] * 3 + [0.02] * 3 + [0.01])
    ).astype(jnp.float32)
    T0 = jax.vmap(lie.sim3_retr)(T_true, noise)

    cfg_x = go.BAConfig(edge_impl="xla")
    T_x = go.solve_gn_rays(cfg_x, 1, T0, X, C, edges, odom, s_bar)

    # _pallas_ray_systems resolves the kernel from the module at trace time,
    # so patching the module attribute routes the solve through interpret
    # mode on CPU
    import unittest.mock as mock
    from frodo_slam_tpu.ops import ba_reduce_pallas as bk

    real = bk.ray_edge_systems_pallas

    def interp(*a, **kw):
        kw["interpret"] = True
        return real(*a, **kw)

    cfg_p = go.BAConfig(edge_impl="pallas")
    with mock.patch.object(bk, "ray_edge_systems_pallas", interp):
        T_p = go.solve_gn_rays(cfg_p, 1, T0, X, C, edges, odom, s_bar)

    assert np.all(np.isfinite(np.asarray(T_p)))
    # both paths must walk the same GN trajectory (checked to 10 iters)
    np.testing.assert_allclose(T_p, T_x, rtol=1e-3, atol=1e-3)
