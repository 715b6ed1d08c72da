"""Projective geometry, residuals and analytic Jacobians (pure JAX).

Behavioral spec: ``mast3r_slam/geometry.py`` (torch) — function-for-function,
with identical Jacobian conventions so the Gauss-Newton trackers reproduce the
reference math exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .lie import sim3_act, skew


def point_to_dist(X: jax.Array) -> jax.Array:
    return jnp.linalg.norm(X, axis=-1, keepdims=True)


def point_to_ray_dist(X: jax.Array, jacobian: bool = False):
    """Unit ray + distance of 3D points (geometry.py:17-34).

    Returns ``rd`` (..., 4) = [unit_ray(3), dist]; with ``jacobian=True`` also
    the 4x3 Jacobian d(rd)/dX.
    """
    d = point_to_dist(X)
    d_inv = 1.0 / d
    r = d_inv * X
    rd = jnp.concatenate([r, d], axis=-1)
    if not jacobian:
        return rd
    d_inv2 = d_inv * d_inv
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), (*X.shape[:-1], 3, 3))
    outer = X[..., :, None] * X[..., None, :]
    dr_dX = d_inv[..., None] * (eye - d_inv2[..., None] * outer)
    dd_dX = r[..., None, :]
    drd_dX = jnp.concatenate([dr_dX, dd_dX], axis=-2)  # (..., 4, 3)
    return rd, drd_dX


def act_Sim3(T: jax.Array, X: jax.Array, jacobian: bool = False):
    """Apply Sim(3) to points; optional Jacobian wrt 7-dim left-perturbation
    tangent of ``T`` (geometry.py:45-52): d pW / d[tau, phi, sigma] =
    [I | -skew(pW) | pW].
    """
    pW = sim3_act(T, X)
    if not jacobian:
        return pW
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), (*pW.shape[:-1], 3, 3))
    J = jnp.concatenate([eye, -skew(pW), pW[..., :, None]], axis=-1)  # (...,3,7)
    return pW, J


def decompose_K(K: jax.Array):
    return K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]


def project_calib(
    P: jax.Array,
    K: jax.Array,
    img_size,
    jacobian: bool = False,
    border: float = 0.0,
    z_eps: float = 0.0,
):
    """Pinhole projection to [u, v, log z] with validity mask
    (geometry.py:63-104)."""
    h, w = img_size
    fx, fy, cx, cy = decompose_K(K)
    x, y, z = jnp.moveaxis(P, -1, 0)
    z_safe = jnp.where(z > z_eps, z, jnp.ones_like(z))
    u = fx * x / z_safe + cx
    v = fy * y / z_safe + cy

    valid_u = (u > border) & (u < w - 1 - border)
    valid_v = (v > border) & (v < h - 1 - border)
    valid_z = z > z_eps
    valid = (valid_u & valid_v & valid_z)[..., None]

    logz = jnp.where(valid_z, jnp.log(z_safe), jnp.zeros_like(z))
    pz = jnp.stack([u, v, logz], axis=-1)

    if not jacobian:
        return pz, valid

    z_inv = 1.0 / z_safe
    zeros = jnp.zeros_like(z_inv)
    # rows of d[u,v,logz]/d[x,y,z]
    J = jnp.stack(
        [
            fx * z_inv, zeros, -fx * x * z_inv * z_inv,
            zeros, fy * z_inv, -fy * y * z_inv * z_inv,
            zeros, zeros, z_inv,
        ],
        axis=-1,
    ).reshape(*P.shape[:-1], 3, 3)
    return pz, J, valid


def backproject(p: jax.Array, z: jax.Array, K: jax.Array) -> jax.Array:
    """Pixels + depth -> 3D points (geometry.py:107-115)."""
    x = (p[..., 0] - K[0, 2]) / K[0, 0]
    y = (p[..., 1] - K[1, 2]) / K[1, 1]
    dirs = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return z * dirs


def get_pixel_coords(img_size, dtype=jnp.float32) -> jax.Array:
    """(h*w, 2) [u, v] pixel grid in row-major scan order
    (geometry.py:118-123)."""
    h, w = img_size
    u = jnp.arange(w, dtype=dtype)
    v = jnp.arange(h, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return jnp.stack([uu, vv], axis=-1).reshape(h * w, 2)


def constrain_points_to_ray(img_size, Xs: jax.Array, K: jax.Array) -> jax.Array:
    """Snap pointmap points onto their pixel rays, keeping depth
    (geometry.py:37-42). ``Xs``: (..., h*w, 3)."""
    uv = get_pixel_coords(img_size, dtype=Xs.dtype)
    uv = jnp.broadcast_to(uv, (*Xs.shape[:-1], 2))
    return backproject(uv, Xs[..., 2:3], K)
