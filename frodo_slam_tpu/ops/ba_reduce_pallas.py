"""Pallas TPU kernel for the backend BA ray-edge normal-equation reduction.

Spec: ``ray_align_kernel`` (reference backend/src/gn_kernels.cu:576-907) —
one CUDA block per edge reduces a 14x14 Hessian + 14 gradient over the HW
matched points. Our algebra (slam/global_opt.py) needs only the 7x7
relative-pose Gram ``B = Jrel^T W Jrel`` and ``g_rel = Jrel^T (w*err)``
per directed edge, since ``Ji = -Jj``.

Why a kernel: the jnp edge reduction materializes (chunk, HW, 4, 3)-class
intermediates in HBM — at the backend's steady state (E≈128 edges x 147k
points x 10 GN iterations) the solve measured ~630 ms on v5e, entirely
HBM-traffic-bound. This kernel streams each edge's points through VMEM
once per GN iteration (Xi, Xj, w0 = 28 B/point) and keeps every
intermediate in registers/VMEM, with the MXU uninvolved (per-point 7-vec
outer products are VPU work).

Jacobian structure exploited (derivable from gn_kernels.cu:749-858, here
re-derived): with rj = P/|P|, n = |P|,
  ray rows   : [ (I - rj rj^T)/n | -skew(rj) | 0 ]
  dist row   : [ rj^T            | 0  0  0   | n ]
i.e. the ray rows' scale column vanishes (Dray @ P = 0) and the dist
row's rotation block vanishes (rj^T skew(P) = 0). Entries are emitted
symbolically with literal zeros skipped, so the generated VPU op count is
near-minimal (~160 flops/point).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# fixed lane/sublane geometry
LANES = 128
RT = 128  # point rows per grid step (sublane dim)
N_OUT = 40  # 28 B entries + 7 g + cost/unused, padded to a sublane multiple

# (a, b) index pairs of the upper triangle of the symmetric 7x7 B
_TRIU = [(a, b) for a in range(7) for b in range(a, 7)]


def _row_entries(a0, a1, a2, dij, n):
    """The four weighted-residual rows of Jrel as length-7 lists; ``None``
    marks a literal zero (skipped at trace time)."""
    d00, d01, d02, d11, d12, d22 = dij
    r0 = [d00, d01, d02, None, a2, _neg(a1), None]
    r1 = [d01, d11, d12, _neg(a2), None, a0, None]
    r2 = [d02, d12, d22, a1, _neg(a0), None, None]
    rd = [a0, a1, a2, None, None, None, n]
    return r0, r1, r2, rd


def _neg(x):
    return -x


def _accum(rows, weights, errs):
    """Symbolic Σ_k w_k r_k r_k^T (28 upper-tri entries) and
    Σ_k (w_k e_k) r_k (7 entries), skipping literal-zero products."""
    B_entries = []
    for a, b in _TRIU:
        terms = [
            w * r[a] * r[b]
            for r, w in zip(rows, weights)
            if r[a] is not None and r[b] is not None
        ]
        B_entries.append(sum(terms[1:], terms[0]) if terms else None)
    g_entries = []
    for a in range(7):
        terms = [
            (w * e) * r[a]
            for r, w, e in zip(rows, weights, errs)
            if r[a] is not None
        ]
        g_entries.append(sum(terms[1:], terms[0]) if terms else None)
    return B_entries, g_entries


def _ray_reduce_kernel(scal_ref, xi_ref, xj_ref, w0_ref, out_ref, *,
                       sigma_ray, sigma_dist, huber_k):
    """One (edge, row-tile) grid step: accumulate the 35 reduction entries
    of RT x LANES points into the revisited (1, N_OUT, LANES) output block.

    scal_ref: (1, 8, 128) VMEM tile; row 0 lanes 0..11 hold
    [sR(9) row-major | t(3)] of the edge's relative Sim3 (a plain SMEM
    (1, 12) block violates Mosaic's (8, 128)-divisible block rule).
    xi_ref/xj_ref: (1, 3, RT, LANES) matched points (channel-major).
    w0_ref: (1, RT, LANES) combined gate/confidence sqrt-weights.
    """
    r = pl.program_id(1)

    xi0, xi1, xi2 = xi_ref[0, 0], xi_ref[0, 1], xi_ref[0, 2]
    xj0, xj1, xj2 = xj_ref[0, 0], xj_ref[0, 1], xj_ref[0, 2]
    w0 = w0_ref[0]

    s = [scal_ref[0, 0, k] for k in range(12)]
    # P = (s*R) @ Xj + t, scalars broadcast from SMEM
    p0 = s[0] * xj0 + s[1] * xj1 + s[2] * xj2 + s[9]
    p1 = s[3] * xj0 + s[4] * xj1 + s[5] * xj2 + s[10]
    p2 = s[6] * xj0 + s[7] * xj1 + s[8] * xj2 + s[11]

    eps = jnp.float32(1e-12)
    ni = jnp.sqrt(xi0 * xi0 + xi1 * xi1 + xi2 * xi2)
    ni_inv = 1.0 / jnp.maximum(ni, eps)
    n = jnp.sqrt(p0 * p0 + p1 * p1 + p2 * p2)
    n_inv = 1.0 / jnp.maximum(n, eps)
    a0, a1, a2 = p0 * n_inv, p1 * n_inv, p2 * n_inv

    e0 = a0 - xi0 * ni_inv
    e1 = a1 - xi1 * ni_inv
    e2 = a2 - xi2 * ni_inv
    ed = n - ni

    sr = w0 * jnp.float32(1.0 / sigma_ray)
    sd = w0 * jnp.float32(1.0 / sigma_dist)

    def hub(sw, e):
        # huber(x) = min(1, k/|x|) on the whitened residual (ops/robust.py)
        x = jnp.abs(sw * e)
        return jnp.where(x <= huber_k, 1.0, huber_k / jnp.maximum(x, eps))

    w_r0 = hub(sr, e0) * sr * sr
    w_r1 = hub(sr, e1) * sr * sr
    w_r2 = hub(sr, e2) * sr * sr
    w_d = hub(sd, ed) * sd * sd

    # Dray = (I - rj rj^T)/n, unique entries
    d00 = (1.0 - a0 * a0) * n_inv
    d01 = (-a0 * a1) * n_inv
    d02 = (-a0 * a2) * n_inv
    d11 = (1.0 - a1 * a1) * n_inv
    d12 = (-a1 * a2) * n_inv
    d22 = (1.0 - a2 * a2) * n_inv

    rows = _row_entries(a0, a1, a2, (d00, d01, d02, d11, d12, d22), n)
    B_entries, g_entries = _accum(
        rows, (w_r0, w_r1, w_r2, w_d), (e0, e1, e2, ed)
    )

    partial_rows = [
        jnp.sum(v, axis=0) if v is not None else jnp.zeros((LANES,), jnp.float32)
        for v in B_entries + g_entries
    ]
    partial_rows += [jnp.zeros((LANES,), jnp.float32)] * (N_OUT - len(partial_rows))
    tile = jnp.stack(partial_rows)  # (N_OUT, LANES)

    @pl.when(r == 0)
    def _init():
        out_ref[0] = tile

    @pl.when(r > 0)
    def _acc():
        out_ref[0] = out_ref[0] + tile


@partial(jax.jit, static_argnames=("sigma_ray", "sigma_dist", "huber_k", "interpret"))
def ray_edge_systems_pallas(
    scal: jax.Array,  # (E, 12) f32: per-edge [s*R row-major | t]
    XiT: jax.Array,  # (E, 3, N) f32, N multiple of RT*LANES
    XjT: jax.Array,  # (E, 3, N) f32
    w0: jax.Array,  # (E, N) f32 combined sqrt-weights (0 = masked point)
    *,
    sigma_ray: float,
    sigma_dist: float,
    huber_k: float = 1.345,
    interpret: bool = False,
):
    """All directed ray edges' (B (7,7), g_rel (7,)) in one kernel launch.

    Returns (B (E, 7, 7) symmetric, g (E, 7)); the caller pushes both
    through AdjInv(T_i) (see global_opt._reduce_rel_system).
    """
    scal = scal.astype(jnp.float32)
    XiT = XiT.astype(jnp.float32)
    XjT = XjT.astype(jnp.float32)
    w0 = w0.astype(jnp.float32)
    E, _, N = XiT.shape
    pad = (-N) % (8 * LANES)
    if pad:
        # zero-pad points: w0 = 0 masks them; all kernel math stays finite
        # on zero rows (guarded inverses), so they contribute exactly 0
        XiT = jnp.pad(XiT, ((0, 0), (0, 0), (0, pad)))
        XjT = jnp.pad(XjT, ((0, 0), (0, 0), (0, pad)))
        w0 = jnp.pad(w0, ((0, 0), (0, pad)))
        N += pad
    rows = N // LANES
    rt = next(r for r in (RT, 64, 32, 16, 8) if rows % r == 0)
    n_r = rows // rt
    xi4 = XiT.reshape(E, 3, rows, LANES)
    xj4 = XjT.reshape(E, 3, rows, LANES)
    w04 = w0.reshape(E, rows, LANES)

    scal_tile = jnp.zeros((E, 8, LANES), jnp.float32).at[:, 0, :12].set(scal)

    kern = partial(
        _ray_reduce_kernel,
        sigma_ray=sigma_ray, sigma_dist=sigma_dist, huber_k=huber_k,
    )
    out = pl.pallas_call(
        kern,
        grid=(E, n_r),
        in_specs=[
            pl.BlockSpec((1, 8, LANES), lambda e, r: (e, 0, 0)),
            pl.BlockSpec((1, 3, rt, LANES), lambda e, r: (e, 0, r, 0)),
            pl.BlockSpec((1, 3, rt, LANES), lambda e, r: (e, 0, r, 0)),
            pl.BlockSpec((1, rt, LANES), lambda e, r: (e, r, 0)),
        ],
        out_specs=pl.BlockSpec((1, N_OUT, LANES), lambda e, r: (e, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((E, N_OUT, LANES), jnp.float32),
        interpret=interpret,
    )(scal_tile, xi4, xj4, w04)

    vals = out.sum(axis=-1)  # (E, N_OUT) lane partials -> totals
    iu = jnp.array([a for a, _ in _TRIU])
    ju = jnp.array([b for _, b in _TRIU])
    B = jnp.zeros((E, 7, 7), jnp.float32)
    B = B.at[:, iu, ju].set(vals[:, :28])
    B = B.at[:, ju, iu].set(vals[:, :28])
    g = vals[:, 28:35]
    return B, g
