"""Scalar-expanded Sim(3) normal-equation reduction (VPU-only).

Every Sim(3) alignment residual in this framework (tracking ray+distance,
backend ray, calib pixel+log-depth, point alignment) has a Jacobian that
factors as ``J = D . G`` with ``G = [I | -skew(P) | P]`` (3x7) and ``D``
the residual's derivative wrt the transformed point (R x 3 per point) —
the structure the reference CUDA kernels exploit row by row
(gn_kernels.cu:749-858, :2486-2560, :2082-2160).

The obvious batched formulation (einsum over per-point (R,3)x(3,3) blocks)
lowers on TPU to batched tiny matmuls that pad to the 128x128 MXU tile —
measured ~8 ms per reduction at 147k points. This module scalar-expands the
tiny R/3/3 dims into plain (n,) column arithmetic (pure VPU streams) and
reduces the 36 unique outputs (upper-triangular 7x7 Gram, gradient, cost)
in ONE (n, 36) sum — ~0.16 ms for the same reduction.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

_TRI = ([0, 0, 0, 1, 1, 2], [0, 1, 2, 1, 2, 2])


def _unpack_sym(v6):
    m = jnp.zeros((3, 3), v6.dtype).at[_TRI[0], _TRI[1]].set(v6)
    return m + m.T - jnp.diag(jnp.diag(m))


def reduce_sim3_system(
    drd_cols: Sequence[Sequence[jax.Array]],
    w_cols: Sequence[jax.Array],
    err_cols: Sequence[jax.Array],
    P: jax.Array,
):
    """Reduce weighted normal equations for residual rows ``D . G``.

    Args:
        drd_cols: R x 3 nested sequence of (n,) columns — ``D[d][a]`` is
            d(residual_d)/dP_a. Pass columns (not a materialized (n, R, 3)
            array) so producers fuse straight into the reduction.
        w_cols: R columns of robust information weights.
        err_cols: R columns of residuals.
        P: (n, 3) transformed points (defines G).

    Returns:
        (B, g, cost): the 7x7 Gram ``G^T D^T W D G`` summed over points, the
        7-vector ``G^T D^T (w . err)``, and ``sum(w . err^2)`` (un-halved).
    """
    R = len(drd_cols)
    assert len(w_cols) == R and len(err_cols) == R
    px, py, pz = P[:, 0], P[:, 1], P[:, 2]

    # M = D^T W D (symmetric 3x3), q = D^T (w.err)
    M = {}
    for a in range(3):
        for b in range(a, 3):
            M[(a, b)] = sum(w_cols[d] * drd_cols[d][a] * drd_cols[d][b] for d in range(R))
    we = [w_cols[d] * err_cols[d] for d in range(R)]
    q = [sum(we[d] * drd_cols[d][a] for d in range(R)) for a in range(3)]
    M00, M01, M02 = M[(0, 0)], M[(0, 1)], M[(0, 2)]
    M11, M12, M22 = M[(1, 1)], M[(1, 2)], M[(2, 2)]
    qx, qy, qz = q

    # Mp = M p
    Mpx = M00 * px + M01 * py + M02 * pz
    Mpy = M01 * px + M11 * py + M12 * pz
    Mpz = M02 * px + M12 * py + M22 * pz

    # MS = M S(p)
    MS00 = M01 * pz - M02 * py
    MS01 = -M00 * pz + M02 * px
    MS02 = M00 * py - M01 * px
    MS10 = M11 * pz - M12 * py
    MS11 = -M01 * pz + M12 * px
    MS12 = M01 * py - M11 * px
    MS20 = M12 * pz - M22 * py
    MS21 = -M02 * pz + M22 * px
    MS22 = M02 * py - M12 * px

    # SMS = S(p) MS (symmetric)
    SMS00 = -pz * MS10 + py * MS20
    SMS01 = -pz * MS11 + py * MS21
    SMS02 = -pz * MS12 + py * MS22
    SMS11 = pz * MS01 - px * MS21
    SMS12 = pz * MS02 - px * MS22
    SMS22 = -py * MS02 + px * MS12

    pxMp = (py * Mpz - pz * Mpy, pz * Mpx - px * Mpz, px * Mpy - py * Mpx)
    pxq = (py * qz - pz * qy, pz * qx - px * qz, px * qy - py * qx)

    contrib = jnp.stack(
        [
            M00, M01, M02, M11, M12, M22,                          # Btt (6)
            MS00, MS01, MS02, MS10, MS11, MS12, MS20, MS21, MS22,  # -BtP (9)
            Mpx, Mpy, Mpz,                                         # Bts (3)
            SMS00, SMS01, SMS02, SMS11, SMS12, SMS22,              # -BPP (6)
            pxMp[0], pxMp[1], pxMp[2],                             # BPs (3)
            px * Mpx + py * Mpy + pz * Mpz,                        # Bss (1)
            qx, qy, qz,                                            # g_t (3)
            pxq[0], pxq[1], pxq[2],                                # g_p (3)
            px * qx + py * qy + pz * qz,                           # g_s (1)
            sum(we[d] * err_cols[d] for d in range(R)),            # cost (1)
        ],
        axis=-1,
    )  # (n, 36)
    s = jnp.sum(contrib, axis=0)

    Btt = _unpack_sym(s[0:6])
    BtP = -s[6:15].reshape(3, 3)
    Bts = s[15:18]
    BPP = -_unpack_sym(s[18:24])
    BPs = s[24:27]
    Bss = s[27:28]

    B = jnp.block([
        [Btt, BtP, Bts[:, None]],
        [BtP.T, BPP, BPs[:, None]],
        [Bts[None, :], BPs[None, :], Bss[:, None]],
    ])
    g = jnp.concatenate([s[28:31], s[31:34], s[34:35]])
    return B, g, s[35]


def ray_dist_drd_cols(r: jax.Array, d: jax.Array) -> List[List[jax.Array]]:
    """D columns for the [unit-ray (3), distance (1)] residual: rows are
    ``dnorm = (I - r r^T)/d`` (symmetric) and ``r^T`` (geometry.py:17-34)."""
    rx, ry, rz = r[:, 0], r[:, 1], r[:, 2]
    inv_d = 1.0 / d
    D00 = (1.0 - rx * rx) * inv_d
    D01 = (-rx * ry) * inv_d
    D02 = (-rx * rz) * inv_d
    D11 = (1.0 - ry * ry) * inv_d
    D12 = (-ry * rz) * inv_d
    D22 = (1.0 - rz * rz) * inv_d
    return [[D00, D01, D02], [D01, D11, D12], [D02, D12, D22], [rx, ry, rz]]


def cols_from_array(drd: jax.Array) -> List[List[jax.Array]]:
    """(n, R, 3) materialized D -> nested column view."""
    return [[drd[:, d, a] for a in range(3)] for d in range(drd.shape[1])]
