"""SO(3) / SE(3) / Sim(3) Lie groups in pure JAX.

Conventions (identical to the reference's lietorch + CUDA device math,
``mast3r_slam/backend/src/gn_kernels.cu:220-480``):

- Quaternions stored ``[qx, qy, qz, qw]`` (scalar last), Hamilton product.
- SE(3) stored as 7-vector ``[t(3), q(4)]``.
- Sim(3) stored as 8-vector ``[t(3), q(4), s]`` (embedded dim 8).
- Sim(3) tangent is 7-dim ``[tau(3), phi(3), sigma]`` — translation, rotation,
  log-scale.
- Group action: ``Y = s * R(q) * X + t`` (gn_kernels.cu:249-261).
- ``retr(xi, T) = exp(xi) * T`` — *left* retraction (gn_kernels.cu:434-455),
  matching lietorch's ``Sim3.retr`` used by the tracker (tracker.py:446).

Everything is shape-polymorphic over leading batch dims and fully traceable,
so Gauss-Newton loops jit as single XLA programs. Small-angle branches use
the same series expansions as the reference, selected with ``jnp.where`` on
numerically-safe operands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


# ---------------------------------------------------------------------------
# quaternion primitives
# ---------------------------------------------------------------------------

def quat_mul(qi: jax.Array, qj: jax.Array) -> jax.Array:
    """Hamilton product ``qi * qj`` with scalar-last storage.

    Matches ``quat_comp`` (gn_kernels.cu:220-226).
    """
    xi, yi, zi, wi = jnp.moveaxis(qi, -1, 0)
    xj, yj, zj, wj = jnp.moveaxis(qj, -1, 0)
    return jnp.stack(
        [
            wi * xj + xi * wj + yi * zj - zi * yj,
            wi * yj - xi * zj + yi * wj + zi * xj,
            wi * zj + xi * yj - yi * xj + zi * wj,
            wi * wj - xi * xj - yi * yj - zi * zj,
        ],
        axis=-1,
    )


def quat_inv(q: jax.Array) -> jax.Array:
    """Conjugate of a unit quaternion (gn_kernels.cu:229-235)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_act(q: jax.Array, X: jax.Array) -> jax.Array:
    """Rotate vector(s) ``X`` by unit quaternion ``q`` (gn_kernels.cu:237-247)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, X)
    return X + qw * uv + jnp.cross(qv, uv)


def quat_to_R(q: jax.Array) -> jax.Array:
    """Unit quaternion to rotation matrix, rows last-two dims."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    rows = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return rows.reshape(*q.shape[:-1], 3, 3)


def R_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix to unit quaternion (scalar-last), branch-free.

    Uses the four Shepperd candidates and picks the best-conditioned one.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # candidate 0: w-major
    q0 = jnp.stack([m21 - m12, m02 - m20, m10 - m01, 1.0 + tr], axis=-1)
    # candidate 1: x-major
    q1 = jnp.stack([1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], axis=-1)
    # candidate 2: y-major
    q2 = jnp.stack([m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20], axis=-1)
    # candidate 3: z-major
    q3 = jnp.stack([m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01], axis=-1)

    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4cand, 4)
    mags = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(mags, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonicalize sign (w >= 0)
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of 3-vector(s)."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    o = jnp.zeros_like(x)
    rows = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return rows.reshape(*v.shape[:-1], 3, 3)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def so3_exp(phi: jax.Array) -> jax.Array:
    """Axis-angle to quaternion, small-angle series per gn_kernels.cu:341-363."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq)
    theta_p4 = theta_sq * theta_sq
    small = theta_sq < _EPS
    # Guard sqrt/div operands so both branches are finite.
    theta_safe = jnp.where(small, jnp.ones_like(theta), theta)
    imag = jnp.where(
        small,
        0.5 - theta_sq / 48.0 + theta_p4 / 3840.0,
        jnp.sin(0.5 * theta_safe) / theta_safe,
    )
    real = jnp.where(
        small,
        1.0 - theta_sq / 8.0 + theta_p4 / 384.0,
        jnp.cos(0.5 * theta_safe),
    )
    return jnp.concatenate([imag * phi, real], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Quaternion to axis-angle."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # ensure w >= 0 for the shortest rotation
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qv = qv * sign
    qw = qw * sign
    nv = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    small = nv < _EPS
    nv_safe = jnp.where(small, jnp.ones_like(nv), nv)
    angle = 2.0 * jnp.arctan2(nv, qw)
    scale = jnp.where(small, 2.0 / jnp.clip(qw, _EPS), angle / nv_safe)
    return scale * qv


def so3_left_jacobian(phi: jax.Array) -> jax.Array:
    """SO(3) left Jacobian J_l(phi)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta_sq)
    Phi = skew(phi)
    Phi2 = Phi @ Phi
    small = theta_sq < _EPS
    theta_safe = jnp.where(small, jnp.ones_like(theta), theta)
    A = jnp.where(small, 0.5 - theta_sq / 24.0, (1 - jnp.cos(theta_safe)) / jnp.where(small, 1.0, theta_sq))
    B = jnp.where(
        small,
        1.0 / 6.0 - theta_sq / 120.0,
        (theta_safe - jnp.sin(theta_safe)) / jnp.where(small, 1.0, theta_sq * theta_safe),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye + A * Phi + B * Phi2


def so3_left_jacobian_inv(phi: jax.Array) -> jax.Array:
    """Inverse SO(3) left Jacobian, matching ``Jl_inv`` (gn_kernels.cu:1042-1073)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta_sq)
    Phi = skew(phi)
    Phi2 = Phi @ Phi
    small = theta_sq < _EPS
    theta_safe = jnp.where(small, jnp.ones_like(theta), theta)
    sin_t = jnp.sin(theta_safe)
    cos_t = jnp.cos(theta_safe)
    factor2 = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        1.0 / jnp.where(small, 1.0, theta_sq)
        - (1.0 + cos_t) / jnp.where(small, 1.0, 2.0 * theta_safe * sin_t),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye - 0.5 * Phi + factor2 * Phi2


# ---------------------------------------------------------------------------
# SE(3): 7-vector [t, q]
# ---------------------------------------------------------------------------

def se3_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    out = jnp.zeros((*shape, 7), dtype=dtype)
    return out.at[..., 6].set(1.0)


def se3_t(T: jax.Array) -> jax.Array:
    return T[..., :3]


def se3_q(T: jax.Array) -> jax.Array:
    return T[..., 3:7]


def se3_mul(Ti: jax.Array, Tj: jax.Array) -> jax.Array:
    t = se3_t(Ti) + quat_act(se3_q(Ti), se3_t(Tj))
    q = quat_mul(se3_q(Ti), se3_q(Tj))
    return jnp.concatenate([t, q], axis=-1)


def se3_inv(T: jax.Array) -> jax.Array:
    qinv = quat_inv(se3_q(T))
    t = -quat_act(qinv, se3_t(T))
    return jnp.concatenate([t, qinv], axis=-1)


def se3_act(T: jax.Array, X: jax.Array) -> jax.Array:
    return quat_act(se3_q(T), X) + se3_t(T)


def se3_exp(xi: jax.Array) -> jax.Array:
    """se(3) tangent [rho, phi] -> SE(3)."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp(phi)
    t = (so3_left_jacobian(phi) @ rho[..., None])[..., 0]
    return jnp.concatenate([t, q], axis=-1)


def se3_log(T: jax.Array) -> jax.Array:
    """SE(3) -> [rho, phi], matching ``logSE3`` (gn_kernels.cu:1076-1084)."""
    phi = so3_log(se3_q(T))
    rho = (so3_left_jacobian_inv(phi) @ se3_t(T)[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_to_matrix(T: jax.Array) -> jax.Array:
    R = quat_to_R(se3_q(T))
    M = jnp.zeros((*T.shape[:-1], 4, 4), dtype=T.dtype)
    M = M.at[..., :3, :3].set(R)
    M = M.at[..., :3, 3].set(se3_t(T))
    return M.at[..., 3, 3].set(1.0)


def se3_from_matrix(M: jax.Array) -> jax.Array:
    q = R_to_quat(M[..., :3, :3])
    return jnp.concatenate([M[..., :3, 3], q], axis=-1)


# ---------------------------------------------------------------------------
# Sim(3): 8-vector [t, q, s]
# ---------------------------------------------------------------------------

def sim3_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    out = jnp.zeros((*shape, 8), dtype=dtype)
    return out.at[..., 6].set(1.0).at[..., 7].set(1.0)


def sim3_t(T: jax.Array) -> jax.Array:
    return T[..., :3]


def sim3_q(T: jax.Array) -> jax.Array:
    return T[..., 3:7]


def sim3_s(T: jax.Array) -> jax.Array:
    return T[..., 7:8]


def sim3_act(T: jax.Array, X: jax.Array) -> jax.Array:
    """``Y = s R X + t`` with X (..., 3) broadcast against T (..., 8)."""
    return sim3_s(T) * quat_act(sim3_q(T), X) + sim3_t(T)


def sim3_mul(Ti: jax.Array, Tj: jax.Array) -> jax.Array:
    """Composition: (t,q,s)_i * (t,q,s)_j."""
    t = sim3_t(Ti) + sim3_s(Ti) * quat_act(sim3_q(Ti), sim3_t(Tj))
    q = quat_mul(sim3_q(Ti), sim3_q(Tj))
    s = sim3_s(Ti) * sim3_s(Tj)
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_inv(T: jax.Array) -> jax.Array:
    qinv = quat_inv(sim3_q(T))
    s_inv = 1.0 / sim3_s(T)
    t = -s_inv * quat_act(qinv, sim3_t(T))
    return jnp.concatenate([t, qinv, s_inv], axis=-1)


def sim3_rel(Ti: jax.Array, Tj: jax.Array) -> jax.Array:
    """Relative pose ``T_i^{-1} * T_j`` (relSim3, gn_kernels.cu:294-314)."""
    si_inv = 1.0 / sim3_s(Ti)
    s = si_inv * sim3_s(Tj)
    qi_inv = quat_inv(sim3_q(Ti))
    q = quat_mul(qi_inv, sim3_q(Tj))
    t = si_inv * quat_act(qi_inv, sim3_t(Tj) - sim3_t(Ti))
    return jnp.concatenate([t, q, s], axis=-1)


def _sim3_W_coeffs(theta_sq, sigma, dtype):
    """Coefficients (C, A, B) of W = C I + A Phi + B Phi^2.

    Mirrors lietorch rxso3 via expSim3 (gn_kernels.cu:388-415). The four-way
    branch structure (|sigma| ~ 0 x |theta| ~ 0) is reproduced with nested
    ``where``.
    """
    one = jnp.asarray(1.0, dtype)
    half = jnp.asarray(0.5, dtype)
    theta = jnp.sqrt(theta_sq)
    scale = jnp.exp(sigma)

    small_sigma = jnp.abs(sigma) < _EPS
    small_theta = jnp.abs(theta) < _EPS

    sigma_safe = jnp.where(small_sigma, jnp.ones_like(sigma), sigma)
    theta_safe = jnp.where(small_theta, jnp.ones_like(theta), theta)
    theta_sq_safe = jnp.where(small_theta, jnp.ones_like(theta_sq), theta_sq)

    # C
    C = jnp.where(small_sigma, one, (scale - one) / sigma_safe)

    # branch: small sigma
    A_ss_lt = half  # both small
    B_ss_lt = one / 6.0
    A_ss = (one - jnp.cos(theta_safe)) / theta_sq_safe
    B_ss = (theta_safe - jnp.sin(theta_safe)) / (theta_sq_safe * theta_safe)

    # branch: large sigma
    sigma_sq = sigma_safe * sigma_safe
    A_ls_lt = ((sigma_safe - one) * scale + one) / sigma_sq
    B_ls_lt = (scale * half * sigma_sq + scale - one - sigma_safe * scale) / (
        sigma_sq * sigma_safe
    )
    a = scale * jnp.sin(theta_safe)
    b = scale * jnp.cos(theta_safe)
    c = theta_sq_safe + sigma_sq
    A_ls = (a * sigma_safe + (one - b) * theta_safe) / (theta_safe * c)
    B_ls = (C - ((b - one) * sigma_safe + a * theta_safe) / c) / theta_sq_safe

    A = jnp.where(
        small_sigma,
        jnp.where(small_theta, A_ss_lt, A_ss),
        jnp.where(small_theta, A_ls_lt, A_ls),
    )
    B = jnp.where(
        small_sigma,
        jnp.where(small_theta, B_ss_lt, B_ss),
        jnp.where(small_theta, B_ls_lt, B_ls),
    )
    return C, A, B


def _sim3_W(phi: jax.Array, sigma: jax.Array) -> jax.Array:
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    C, A, B = _sim3_W_coeffs(theta_sq, sigma, phi.dtype)
    Phi = skew(phi)
    Phi2 = Phi @ Phi
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return C[..., None] * eye + A[..., None] * Phi + B[..., None] * Phi2


def sim3_exp(xi: jax.Array) -> jax.Array:
    """Tangent [tau, phi, sigma] -> Sim(3) (expSim3, gn_kernels.cu:365-432)."""
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    q = so3_exp(phi)
    s = jnp.exp(sigma)
    W = _sim3_W(phi, sigma)
    t = (W @ tau[..., None])[..., 0]
    return jnp.concatenate([t, q, s], axis=-1)


def sim3_log(T: jax.Array) -> jax.Array:
    """Sim(3) -> tangent [tau, phi, sigma]: inverse of :func:`sim3_exp`."""
    phi = so3_log(sim3_q(T))
    sigma = jnp.log(sim3_s(T))
    W = _sim3_W(phi, sigma)
    tau = jnp.linalg.solve(W, sim3_t(T)[..., None])[..., 0]
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def sim3_retr(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Left retraction ``exp(xi) * T`` (retrSim3, gn_kernels.cu:434-455)."""
    return sim3_mul(sim3_exp(xi), T)


def sim3_retr_right(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Right retraction ``T * exp(xi)`` (retrSim3Right, gn_kernels.cu:457-480)."""
    return sim3_mul(T, sim3_exp(xi))


def sim3_apply_adj_inv(T: jax.Array, X: jax.Array) -> jax.Array:
    """Row-vector times inverse adjoint: ``Y = X @ Adj(T)^{-1}``.

    ``X``/``Y`` are 7-dim row covectors ordered [tau, omega, sigma]. Matches
    ``apply_Sim3_adj_inv`` (gn_kernels.cu:319-339); used to map point-space
    Jacobians at the relative pose onto world-frame pose tangents.
    """
    t, q, s = sim3_t(T), sim3_q(T), sim3_s(T)
    s_inv = 1.0 / s
    a, b, c = X[..., :3], X[..., 3:6], X[..., 6:7]
    Ra = quat_act(q, a)
    y1 = s_inv * Ra
    y2 = quat_act(q, b) + s_inv * jnp.cross(t, Ra)
    y3 = c + s_inv * jnp.sum(t * Ra, axis=-1, keepdims=True)
    return jnp.concatenate([y1, y2, y3], axis=-1)


def sim3_to_matrix(T: jax.Array) -> jax.Array:
    M = jnp.zeros((*T.shape[:-1], 4, 4), dtype=T.dtype)
    M = M.at[..., :3, :3].set(sim3_s(T)[..., None] * quat_to_R(sim3_q(T)))
    M = M.at[..., :3, 3].set(sim3_t(T))
    return M.at[..., 3, 3].set(1.0)


def sim3_from_matrix(M: jax.Array) -> jax.Array:
    sR = M[..., :3, :3]
    s = jnp.linalg.det(sR) ** (1.0 / 3.0)
    q = R_to_quat(sR / s[..., None, None])
    return jnp.concatenate([M[..., :3, 3], q, s[..., None]], axis=-1)


def sim3_to_se3(T: jax.Array) -> jax.Array:
    """Drop the scale (used when exporting TUM-format trajectories,
    evaluate.py:40 via lietorch_utils.as_SE3)."""
    return T[..., :7]
