"""Backend global bundle adjustment: Sim(3) factor graph over keyframes.

Behavioral spec:
- edge construction / gating: ``mast3r_slam/global_opt.py`` ``FactorGraph``
  (:15-178) with the *upstream* per-edge confidence storage of
  ``global_opt_bk0.py:107-147`` (the fork's maintained file stores raw ``Qij``
  where upstream stores the combined ``sqrt(Qii[idx]*Qji)``; we follow
  upstream — it is the quantity the solver's gating was designed for);
- ray-alignment residual/Jacobian: ``backend/src/gn_kernels.cu:576-907``
  (``ray_align_kernel``);
- odometry SE(3)-log constraint: ``gn_kernels.cu:1106-1290``
  (``odom_constraint_kernel_left_perturb_log``, the variant the host driver
  launches at :1868);
- scale prior: ``gn_kernels.cu:1716-1790`` (``apply_scale_prior_cpu``);
- outer driver: ``gauss_newton_rays_odom_cuda`` (:1792-1934) /
  ``gauss_newton_rays_cuda`` (:909-995).

TPU design. The reference launches one CUDA block per edge, scatters 7x7
blocks into an Eigen sparse matrix on the *CPU* and Cholesky-solves there,
round-tripping device<->host every GN iteration (gn_kernels.cu:74-76,
191-196). Here the whole GN loop is ONE jitted program: per-edge Hessian
blocks come from a batched einsum (MXU), are scattered into a dense
(7P x 7P) system with ``segment_sum``-style index adds, and solved with an
on-device Cholesky — no host round trip. P <= 300 poses makes the dense
solve trivial next to the decoder FLOPs.

A key algebraic simplification vs the CUDA kernel: since ``Ji = -Jj``
(gn_kernels.cu:769, the kernel negates row-by-row), the 14x14 per-edge
Hessian is [[A, -A], [-A, A]] with ``A = M^T B M``, where B is the
7x7 Gram matrix of the *relative-pose* Jacobian and M = Adj(T_i)^{-1}.
We therefore only reduce B (7x7) over the HW points and do two 7x7 matmuls,
instead of reducing a 14x14 over points.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie
from ..ops.normal_eqs import cols_from_array, reduce_sim3_system
from ..ops.robust import huber


class BAConfig(NamedTuple):
    """Static BA parameters (config/base.yaml:40-56 ``local_opt``)."""

    max_iters: int = 10
    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    C_conf: float = 0.0
    Q_conf: float = 1.5
    delta_norm: float = 1e-8
    pin: int = 1
    # frodo odometry-mode overrides (global_opt.py:254-258 hard-codes these
    # when odometry factors are present)
    sigma_odom_t: float = 1e-3
    sigma_odom_r: float = 1e-3
    sigma_scale_prior: float = 0.1
    pixel_border: float = -10.0
    depth_eps: float = 1e-6
    sigma_point: float = 0.05  # point-alignment (config/base.yaml:33,54)
    # Edges processed together per lax.map step inside the GN loop (the
    # xla edge path). The per-edge reduction is tiny VPU work over 147k
    # points; mapping edges one-by-one serializes ~E dispatch-latency-bound
    # steps per iteration (measured 513 ms / 10-iter solve at E=128 on
    # v5e). Batching trades HBM working set (~B * HW * ~80 B) for
    # parallelism.
    map_batch: int = 16
    # Ray-edge reduction implementation: "auto" picks the fused Pallas
    # kernel (ops/ba_reduce_pallas.py) on TPU and the jnp lax.map path
    # elsewhere. The jnp path materializes (chunk, HW, 4, 3)-class
    # intermediates in HBM every GN iteration and is HBM-bound.
    edge_impl: str = "auto"


class Edges(NamedTuple):
    """Padded directed visual edges (two rows per keyframe pair).

    ii/jj index into the *window* pose arrays. ``idx``: for each pixel k of
    frame jj, the matched linear pixel in frame ii. ``valid`` already folds
    the match validity AND the Q gate computed at insertion (upstream
    semantics, global_opt_bk0.py:117-147). ``Q`` is the combined confidence
    sqrt(Q_ii[idx]*Q_ji).

    ``XiT``/``w0`` cache the edge's pose-independent solver inputs — the
    matched-point gather ``X[ii][idx]`` (channel-major) and the combined
    gate/confidence sqrt-weight. Row-granular gathers cost ~3.6 ms per 147k
    rows on TPU; re-gathering all E edges per solve measured 460 ms at the
    backend's steady state, so the gather runs ONCE at edge insertion
    (backend._pair_cache) and the arrays ride the edge store. This snapshots
    frame ii's pointmap at insertion time — the same relaxed consistency the
    reference's backend has with the frontend's concurrent pointmap fusion
    (it reads shared memory whenever the solve happens to run). ``None`` is
    accepted (tests / ad-hoc graphs): solvers then fall back to computing
    both on the fly (:func:`_edges_pre`).
    """

    ii: jax.Array  # (E,) int32
    jj: jax.Array  # (E,) int32
    idx: jax.Array  # (E, HW) int32
    valid: jax.Array  # (E, HW) bool
    Q: jax.Array  # (E, HW) f32
    active: jax.Array  # (E,) bool
    XiT: jax.Array | None = None  # (E, 3, HW) f32 X[ii][idx] channel-major
    w0: jax.Array | None = None  # (E, HW) f32 [valid & conf gates] * sqrt(Q)


class OdomEdges(NamedTuple):
    ii: jax.Array  # (O,) int32
    jj: jax.Array  # (O,) int32
    delta_T: jax.Array  # (O, 7) SE3 measured T_ij
    active: jax.Array  # (O,) bool


def empty_edges(e_max: int, hw: int, with_cache: bool = True) -> Edges:
    return Edges(
        ii=jnp.zeros((e_max,), jnp.int32),
        jj=jnp.zeros((e_max,), jnp.int32),
        idx=jnp.zeros((e_max, hw), jnp.int32),
        valid=jnp.zeros((e_max, hw), bool),
        Q=jnp.zeros((e_max, hw), jnp.float32),
        active=jnp.zeros((e_max,), bool),
        XiT=jnp.zeros((e_max, 3, hw), jnp.float32) if with_cache else None,
        w0=jnp.zeros((e_max, hw), jnp.float32) if with_cache else None,
    )


def empty_odom_edges(o_max: int) -> OdomEdges:
    ident = jnp.concatenate([jnp.zeros((6,), jnp.float32), jnp.ones((1,), jnp.float32)])
    return OdomEdges(
        ii=jnp.zeros((o_max,), jnp.int32),
        jj=jnp.zeros((o_max,), jnp.int32),
        delta_T=jnp.broadcast_to(ident, (o_max, 7)),
        active=jnp.zeros((o_max,), bool),
    )


# ---------------------------------------------------------------------------
# per-edge Hessian blocks
# ---------------------------------------------------------------------------

def _adj_inv_matrix(T: jax.Array) -> jax.Array:
    """7x7 matrix M with ``row @ M == sim3_apply_adj_inv(T, row)``."""
    eye = jnp.eye(7, dtype=T.dtype)
    return jax.vmap(lambda e: lie.sim3_apply_adj_inv(T, e))(eye)


def _reduce_rel_system(drd, w, err, P, Ti):
    """Reduce one directed edge's weighted normal equations over its points.

    Every backend residual (ray, calib-projection, point-alignment) has a
    relative-pose Jacobian that factors as ``Jrel = D . [I | -skew(P) | P]``
    where ``D = d(residual)/dP`` (gn_kernels.cu:749-858, :2486-2560,
    :2082-2160 all follow this pattern row by row). Build the 7x7 Gram
    ``B = Jrel^T W Jrel`` from per-point DxD blocks instead of materializing
    the (HW, R, 7) Jacobian, then push through AdjInv(T_i).

    Args: drd (HW, R, 3) = D rows, w (HW, R) robust weights, err (HW, R),
    P (HW, 3) transformed points, Ti (8,) pose i. Returns (A, gj) with
    H = [[A, -A], [-A, A]], g = (-gj, gj) since Ji = -Jj.
    """
    # Scalar-expanded VPU reduction (ops/normal_eqs.py) — the einsum
    # formulation lowered to MXU-padded tiny batched matmuls.
    R = drd.shape[1]
    B, g_rel, _ = reduce_sim3_system(
        cols_from_array(drd),
        [w[:, i] for i in range(R)],
        [err[:, i] for i in range(R)],
        P,
    )

    M = _adj_inv_matrix(Ti)
    A = M.T @ B @ M
    gj = M.T @ g_rel
    return A, gj


def _edges_pre(cfg: BAConfig, X, C, edges: Edges):
    """Pose-INDEPENDENT per-edge work: the matched-point gather
    (row-granular gathers cost ~3.6 ms per 147k rows on TPU — 460 ms for
    all edges at steady state, which is why the backend caches the result
    in the edge store at insertion; this fallback runs when the cache is
    absent) and the combined confidence gate. Returns
    (XiT (E, 3, HW), w0 (E, HW)) with w0 = [valid & gates] * sqrt(Q).
    ``active`` is NOT folded into w0 — the solver masks whole edges after
    the reduction — so cached w0 stays valid across evictions."""
    E, HW = edges.idx.shape
    XC = jnp.concatenate([X, C], axis=-1)  # (P, HW, 4): ONE gather, not two
    flat = XC.reshape(-1, 4)
    rows = flat[(edges.ii[:, None] * HW + edges.idx).reshape(-1)]
    rows = rows.reshape(E, HW, 4)
    Xi, Ci = rows[..., :3], rows[..., 3]
    Cj = C[edges.jj][..., 0]  # (E, HW)
    ok = edges.valid & (edges.Q > cfg.Q_conf) & (Ci > cfg.C_conf) & (Cj > cfg.C_conf)
    w0 = ok.astype(X.dtype) * jnp.sqrt(edges.Q)
    return jnp.swapaxes(Xi, 1, 2), w0


def _edge_inputs(cfg: BAConfig, X, C, edges: Edges):
    """Per-edge solver inputs: the cached (XiT, w0) when the edge store
    carries them, else the on-the-fly fallback; plus frame j's points as
    contiguous channel-major slices (cheap — no row gather).

    NOTE: the cache snapshots INSERTION-TIME Xi. For the calib solve the
    caller ray-constrains X first, which changes Xi's x/y but not its
    depth — valid only while _calib_edge_system keeps its depth-only
    contract on Xi (see its docstring)."""
    if edges.XiT is not None:
        XiT, w0 = edges.XiT, edges.w0
    else:
        XiT, w0 = _edges_pre(cfg, X, C, edges)
    XjT = jnp.take(jnp.swapaxes(X, 1, 2), edges.jj, axis=0)  # (E, 3, HW)
    return XiT, w0, XjT


def _pallas_ray_fn(cfg: BAConfig):
    """Ray edge systems via the fused Pallas reduction
    (ops/ba_reduce_pallas.py): per GN iteration, ONE kernel launch streams
    every edge's points through VMEM; only the tiny per-edge Sim3 scalars
    and the 7x7 AdjInv transforms run as jnp ops. Returns
    ``fn(T, xs) -> (A_all, gj_all)`` with xs = (ii, jj, XiT, w0, XjT)."""
    from ..ops.ba_reduce_pallas import ray_edge_systems_pallas

    def fn(T_WC_in, xs):
        ii, jj, XiT, w0, XjT = xs
        Ti = T_WC_in[ii]
        Tj = T_WC_in[jj]
        Tij = jax.vmap(lie.sim3_rel)(Ti, Tj)
        R = jax.vmap(lie.quat_to_R)(Tij[:, 3:7])
        sR = Tij[:, 7, None, None] * R
        scal = jnp.concatenate(
            [sR.reshape(-1, 9), Tij[:, :3]], axis=-1
        ).astype(jnp.float32)
        B, g = ray_edge_systems_pallas(
            scal, XiT.astype(jnp.float32), XjT.astype(jnp.float32),
            w0.astype(jnp.float32),
            sigma_ray=float(cfg.sigma_ray), sigma_dist=float(cfg.sigma_dist),
        )
        M = jax.vmap(_adj_inv_matrix)(Ti).astype(jnp.float32)
        A = jnp.einsum("eba,ebc,ecd->ead", M, B, M)
        gj = jnp.einsum("eba,eb->ea", M, g)
        return A.astype(T_WC_in.dtype), gj.astype(T_WC_in.dtype)

    return fn


def _edge_points(T_WC, edge_ii, edge_jj, Xj):
    """Pose-DEPENDENT prologue of all edge kernels: transform frame j's
    points into frame i. ``Xj`` comes pre-sliced from :func:`_edges_pre` so
    the GN loop body contains no large gathers at all."""
    Ti, Tj = T_WC[edge_ii], T_WC[edge_jj]
    Tij = lie.sim3_rel(Ti, Tj)
    P = lie.sim3_act(Tij, Xj)  # Xj in frame i
    return Ti, P


def _ray_edge_system(cfg: BAConfig, T_WC, edge_ii, edge_jj, Xi, w0, Xj):
    """One directed edge -> (A (7,7), gj (7,)) with H = [[A,-A],[-A,A]],
    g = (-gj, gj). Mirrors ray_align_kernel (gn_kernels.cu:576-907).
    ``Xi``/``w0``/``Xj`` come pre-gathered from :func:`_edges_pre`."""
    Ti, P = _edge_points(T_WC, edge_ii, edge_jj, Xj)
    X = Xi  # dtype anchor

    # eps guards: masked rows may carry all-zero cached points; NaNs would
    # survive the w0=0 multiply and poison the scatter
    eps = jnp.asarray(1e-12, X.dtype)
    norm_i = jnp.maximum(jnp.linalg.norm(Xi, axis=-1), eps)
    ri = Xi / norm_i[:, None]
    norm_j = jnp.maximum(jnp.linalg.norm(P, axis=-1), eps)
    nj_inv = 1.0 / norm_j
    rj = P * nj_inv[:, None]

    err = jnp.concatenate([rj - ri, (norm_j - norm_i)[:, None]], axis=-1)  # (HW,4)

    sqrt_w = jnp.stack(
        [w0 / cfg.sigma_ray] * 3 + [w0 / cfg.sigma_dist],
        axis=-1,
    )  # (HW, 4)
    w = huber(sqrt_w * err) * sqrt_w * sqrt_w  # (HW, 4)

    # D rows: dray/dP (the projector onto the ray's orthogonal complement)
    # and ddist/dP = rj. The -skew(rj) rotation block of gn_kernels.cu:749-858
    # equals dnorm @ -skew(P), and the dist row's rotation block vanishes
    # since rj x P = 0 — both fall out of the generic reduction.
    eye3 = jnp.eye(3, dtype=X.dtype)
    dnorm = nj_inv[:, None, None] * (eye3 - rj[:, :, None] * rj[:, None, :])  # (HW,3,3)
    drd = jnp.concatenate([dnorm, rj[:, None, :]], axis=1)  # (HW, 4, 3)
    return _reduce_rel_system(drd, w, err, P, Ti)


def _calib_edge_system(cfg: BAConfig, img_hw, K, T_WC, edge_ii, edge_jj,
                       idx, Xi, w0, Xj):
    """Calibrated pixel + log-depth edge (calib_proj_kernel,
    gn_kernels.cu:2295-2608): residual = [u - u_meas, v - v_meas,
    log z_j - log z_i] with pinhole K; validity additionally requires both
    depths > z_eps and the projection within the pixel border (the
    pose-dependent part of the gate; the rest is baked into ``w0``).

    INVARIANT — Xi is depth-only here: ``Xi`` may be the cached
    insertion-time snapshot (Edges.XiT), which is NOT ray-constrained,
    while the caller constrains the live pointmaps before a calib solve
    (solve_window_calib, reference global_opt.py:298-300). The cache is
    equivalent only because this kernel consumes Xi exclusively through
    Xi[:, 2] — the depth, which constrain_points_to_ray preserves exactly.
    Never read Xi[:, 0:2] in this function; recompute x/y from ``idx`` and
    K if a future residual needs them."""
    height, width = img_hw
    X = Xi  # dtype anchor
    Ti, P = _edge_points(T_WC, edge_ii, edge_jj, Xj)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    valid_z = (P[:, 2] > cfg.depth_eps) & (Xi[:, 2] > cfg.depth_eps)
    z_inv = jnp.where(valid_z, 1.0 / jnp.where(valid_z, P[:, 2], 1.0), 0.0)
    x_div_z = P[:, 0] * z_inv
    y_div_z = P[:, 1] * z_inv
    u = fx * x_div_z + cx
    v = fy * y_div_z + cy
    # measurement pixel of the matched point in frame i (gn_kernels.cu:2424-2426)
    u_t = (idx % width).astype(X.dtype)
    v_t = (idx // width).astype(X.dtype)
    valid_u = (u > cfg.pixel_border) & (u < width - 1 - cfg.pixel_border)
    valid_v = (v > cfg.pixel_border) & (v < height - 1 - cfg.pixel_border)

    zj_log = jnp.where(valid_z, jnp.log(jnp.where(valid_z, P[:, 2], 1.0)), 0.0)
    zi_log = jnp.where(valid_z, jnp.log(jnp.maximum(Xi[:, 2], cfg.depth_eps)), 0.0)
    err = jnp.stack([u - u_t, v - v_t, zj_log - zi_log], axis=-1)  # (HW, 3)

    okf = (valid_u & valid_v & valid_z).astype(X.dtype) * w0
    sw_pix = okf / cfg.sigma_pixel
    sw_dep = okf / cfg.sigma_depth
    sqrt_w = jnp.stack([sw_pix, sw_pix, sw_dep], axis=-1)
    w = huber(sqrt_w * err) * sqrt_w * sqrt_w

    # D = dproj/dP: pinhole rows + log-depth row (gn_kernels.cu:2486-2545;
    # the rotation/scale columns there are exactly D @ [-skew(P) | P])
    zeros = jnp.zeros_like(z_inv)
    drd = jnp.stack([
        jnp.stack([fx * z_inv, zeros, -fx * x_div_z * z_inv], axis=-1),
        jnp.stack([zeros, fy * z_inv, -fy * y_div_z * z_inv], axis=-1),
        jnp.stack([zeros, zeros, z_inv], axis=-1),
    ], axis=1)  # (HW, 3, 3)
    return _reduce_rel_system(drd, w, err, P, Ti)


def _point_edge_system(cfg: BAConfig, T_WC, edge_ii, edge_jj, Xi, w0, Xj):
    """3-D point-alignment edge (point_align_kernel, gn_kernels.cu:1936-2204):
    residual = Sim3(T_ij) Xj - Xi, D = I."""
    Ti, P = _edge_points(T_WC, edge_ii, edge_jj, Xj)
    X = Xi  # dtype anchor
    err = P - Xi  # (HW, 3)
    sw = w0 / cfg.sigma_point
    sqrt_w = jnp.broadcast_to(sw[:, None], err.shape)
    w = huber(sqrt_w * err) * sqrt_w * sqrt_w
    drd = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), (*err.shape, 3))
    return _reduce_rel_system(drd, w, err, P, Ti)


# NOTE on _adj_inv_matrix orientation: with M[n] = sim3_apply_adj_inv(Ti, e_n)
# the row-covector map is Jj = Jrel @ M (checked against finite differences in
# tests/test_global_opt.py::test_edge_jacobian_fd). Then A = Jj^T W Jj =
# M^T (Jrel^T W Jrel) M = M^T B M and gj = M^T g_rel.


def _odom_residual(T_WC, edge_ii, edge_jj, delta_T):
    """Odometry SE(3)-log residual (gn_kernels.cu:1144-1177).

    r = log_SE3(T_meas^-1 * T_pred) with T_pred the scale-corrected
    relative pose: R_ij = Ri^T Rj, t' = (1/s_j) Ri^T (tj - ti) — the
    reference divides by s_j: pose translations live in the map gauge,
    s_j x metric."""
    Ti, Tj = T_WC[edge_ii], T_WC[edge_jj]
    delta_T = delta_T.astype(T_WC.dtype)
    Ri = lie.quat_to_R(lie.sim3_q(Ti))
    Rj = lie.quat_to_R(lie.sim3_q(Tj))
    Rm = lie.quat_to_R(delta_T[3:7])
    tm = delta_T[:3]

    Rij = Ri.T @ Rj
    sj = lie.sim3_s(Tj)[0]
    sj_inv = jnp.where(sj == 0.0, 1e6, 1.0 / sj)
    t_pred = sj_inv * (Ri.T @ (lie.sim3_t(Tj) - lie.sim3_t(Ti)))

    R_err = Rm.T @ Rij
    t_err = Rm.T @ t_pred - Rm.T @ tm
    q_err = lie.R_to_quat(R_err)
    return lie.se3_log(jnp.concatenate([t_err, q_err]))  # (6,) [rho, phi]


def _odom_edge_system(cfg: BAConfig, T_WC, edge_ii, edge_jj, delta_T):
    """Odometry SE(3)-log constraint (gn_kernels.cu:1106-1290).

    Returns (H_full (14,14), g_full (14,)) ordered (pose_i, pose_j).

    The Jacobian is EXACT, by forward-mode autodiff of the residual under
    the solver's left retraction (sim3_retr) — the reference's hand-derived
    adjoint approximation (gn_kernels.cu:1193-1237) is only first-order
    near identity and measured ~45% off in Frobenius norm at general poses
    with non-unit scale, which made the combined ray+odom GN diverge once
    the PGO scale write-back moved pose scales away from 1. Six output
    rows x 14 tangent columns: jacfwd costs 14 JVPs of a scalar-sized
    residual — noise next to the ray reduction."""
    Ti, Tj = T_WC[edge_ii], T_WC[edge_jj]

    def r_of(eps):
        Tp = jnp.stack([lie.sim3_retr(Ti, eps[:7]), lie.sim3_retr(Tj, eps[7:])])
        return _odom_residual(Tp, 0, 1, delta_T)

    zero = jnp.zeros((14,), T_WC.dtype)
    r = r_of(zero)
    J = jax.jacfwd(r_of)(zero)  # (6, 14), exact at the linearization point

    info_t = 1.0 / (cfg.sigma_odom_t**2)
    info_r = 1.0 / (cfg.sigma_odom_r**2)
    w = jnp.concatenate(
        [
            info_t * huber(r[:3] / cfg.sigma_odom_t),
            info_r * huber(r[3:] / cfg.sigma_odom_r),
        ]
    )  # (6,)

    H = J.T @ (w[:, None] * J)
    g = J.T @ (w * r)
    return H, g


# ---------------------------------------------------------------------------
# GN solver
# ---------------------------------------------------------------------------

def _scatter_block(H, g, blocks, gvecs, ii_opt, jj_opt, p_opt):
    """Add per-edge 7x7 blocks into the dense (7P,7P) system; negative opt
    indices (pinned poses) are masked out (SparseBlock semantics,
    gn_kernels.cu:83-122)."""
    mask = ((ii_opt >= 0) & (jj_opt >= 0)).astype(H.dtype)
    i_safe = jnp.maximum(ii_opt, 0)
    j_safe = jnp.maximum(jj_opt, 0)
    if blocks is not None:
        H = H.reshape(p_opt, 7, p_opt, 7)
        H = H.at[i_safe, :, j_safe, :].add(mask[:, None, None] * blocks)
        H = H.reshape(p_opt * 7, p_opt * 7)
    if gvecs is not None:
        gmask = (ii_opt >= 0).astype(g.dtype)
        g = g.reshape(p_opt, 7)
        g = g.at[i_safe].add(gmask[:, None] * gvecs)
        g = g.reshape(p_opt * 7)
    return H, g


def _xla_edge_fn(cfg: BAConfig, edge_system):
    """The jnp ray/calib/point edge path: map ``edge_system(T, xs_e)`` over
    contiguous ``map_batch`` chunks of per-edge DATA (``lax.map`` dynamic-
    slices the chunk; mapping over *indices* instead re-materializes the
    big gathers inside the loop, which measured ~4x slower). Returns
    ``fn(T, xs) -> (A_all, gj_all)`` vectorized over whatever edge count
    ``xs`` carries (the sharded path hands it one shard)."""

    def fn(T_WC_in, xs):
        e_total = jax.tree.leaves(xs)[0].shape[0]
        bs = max(1, min(cfg.map_batch, e_total))
        return jax.lax.map(
            lambda xs_e: edge_system(T_WC_in, xs_e), xs, batch_size=bs
        )

    return fn


def _resolve_edge_impl(cfg: BAConfig) -> str:
    if cfg.edge_impl == "auto":
        # x64 (eval mode): int64 index operands leak into the pallas_call
        # and Mosaic has no 64-bit lowering (measured: the f64 profile
        # child died in MLIR verification, sweep3) — the XLA edge path
        # handles the widened types fine and eval mode is not latency-bound
        if jax.config.jax_enable_x64:
            return "xla"
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return cfg.edge_impl


def _build_edge_systems(mesh, xs, fn):
    """``edge_systems(T) -> (A (E,7,7), gj (E,7))`` from a vectorized
    per-edge ``fn(T, xs)``, optionally sharded over the device mesh.

    Multi-chip: the edge reduction is the solve's heavy compute (E x HW
    points streamed per GN iteration); edges split across EVERY mesh device
    (dp x tp — the 7x7 outputs are layout-agnostic, so both axes are just
    more workers here), poses stay replicated, and the tiny per-edge
    systems (E x 56 floats) are all-gathered so the dense assembly +
    Cholesky run replicated. Collectives ride ICI; this is the TPU-native
    replacement for the reference's 'backend on a second GPU'
    (run_vio.py:111-114)."""
    if mesh is None:
        return lambda T: fn(T, xs)

    try:
        from jax import shard_map  # jax >= 0.8
        _no_rep_check = {"check_vma": False}
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        _no_rep_check = {"check_rep": False}
    from jax.sharding import PartitionSpec as P

    E = jax.tree.leaves(xs)[0].shape[0]
    names = tuple(mesh.axis_names)
    n_all = 1
    for a in names:
        n_all *= int(mesh.shape[a])
    if E % n_all == 0:
        axes = names
    elif E % int(mesh.shape[names[0]]) == 0:
        axes = (names[0],)
    else:
        return lambda T: fn(T, xs)  # indivisible edge count: run replicated

    def spec(a):
        return P(axes, *([None] * (a.ndim - 1)))

    def wrapped(T, xs_shard):
        A, gj = fn(T, xs_shard)
        A = jax.lax.all_gather(A, axes, axis=0, tiled=True)
        gj = jax.lax.all_gather(gj, axes, axis=0, tiled=True)
        return A, gj

    # The tiled all_gather over every sharded axis makes both outputs
    # replicated, but jax's static VMA inference can't see that through
    # all_gather; skip the check (the CPU-mesh equivalence test asserts
    # the replicated and sharded solves match numerically).
    sm = shard_map(
        wrapped, mesh=mesh,
        in_specs=(P(), jax.tree.map(spec, xs)),
        out_specs=(P(), P()),
        **_no_rep_check,
    )
    return lambda T: sm(T, xs)


def _solve_gn(cfg: BAConfig, num_fix: int, T_WC, edges: Edges, odom: OdomEdges,
              s_bar, edge_systems):
    """Shared outer GN driver (gauss_newton_rays_odom_cuda,
    gn_kernels.cu:1792-1934): per iteration, reduce all edge systems, scatter
    into the dense (7P x 7P) normal equations, add odometry + scale-prior
    blocks, Cholesky-solve on device, retract, stop on small step.

    ``edge_systems(T_WC_in)`` -> (A_all (E, 7, 7), gj_all (E, 7)) for all
    directed visual edges; the pose-independent per-edge tensors
    (:func:`_edges_pre`) are closed over, computed ONCE before the loop —
    the matched-point gathers dominate when re-run per iteration.
    """
    p = T_WC.shape[0]
    p_opt = p - num_fix

    def iteration(T_WC_in):
        # visual edges
        A_all, gj_all = edge_systems(T_WC_in)
        amask = edges.active.astype(A_all.dtype)[:, None, None]
        A_all = A_all * amask
        gj_all = gj_all * amask[..., 0]

        ii_opt = edges.ii - num_fix
        jj_opt = edges.jj - num_fix

        # odometry edges
        def one_odom(o):
            Ho, go = _odom_edge_system(cfg, T_WC_in, odom.ii[o], odom.jj[o], odom.delta_T[o])
            m = odom.active[o].astype(Ho.dtype)
            return Ho * m, go * m

        # odom edges are scalar-sized — vmap them outright
        Ho_all, go_all = jax.vmap(one_odom)(jnp.arange(odom.ii.shape[0]))
        oi_opt = odom.ii - num_fix
        oj_opt = odom.jj - num_fix

        H = jnp.zeros((p_opt * 7, p_opt * 7), A_all.dtype)
        g = jnp.zeros((p_opt * 7,), A_all.dtype)
        # Ji = -Jj => H_ii = H_jj = A (symmetric), H_ij = H_ji = -A;
        # g_i = -gj, g_j = gj (gn_kernels.cu:769, 863-906). All four
        # quadrants of every visual AND odom edge ride ONE scatter-add
        # (and the two g halves a second): XLA lowers each .at[].add to its
        # own scatter op and never fuses them — 8 scatters measured as a
        # real slice of the 64-pose solve's per-iteration cost.
        odt = Ho_all.astype(A_all.dtype)
        H_blocks = jnp.concatenate([
            A_all, -A_all, -A_all, A_all,
            odt[:, :7, :7], odt[:, :7, 7:], odt[:, 7:, :7], odt[:, 7:, 7:],
        ])
        Hi = jnp.concatenate([ii_opt, ii_opt, jj_opt, jj_opt,
                              oi_opt, oi_opt, oj_opt, oj_opt])
        Hj = jnp.concatenate([ii_opt, jj_opt, ii_opt, jj_opt,
                              oi_opt, oj_opt, oi_opt, oj_opt])
        H, _ = _scatter_block(H, None, H_blocks, None, Hi, Hj, p_opt)
        godt = go_all.astype(g.dtype)
        g_vecs = jnp.concatenate([-gj_all, gj_all, godt[:, :7], godt[:, 7:]])
        gi = jnp.concatenate([ii_opt, jj_opt, oi_opt, oj_opt])
        _, g = _scatter_block(H, g, None, g_vecs, gi, gi, p_opt)

        # scale priors: r = log(s_i / s_bar_i), unit Jacobian on the scale DoF
        # (gn_kernels.cu:1716-1790)
        info_sp = jnp.asarray(1.0 / (cfg.sigma_scale_prior**2), H.dtype)
        s = T_WC_in[:, 7]
        sp_valid = (s_bar > 1e-6) & (s > 1e-6)
        sp_valid = sp_valid & (jnp.arange(p) >= num_fix)
        r_s = jnp.where(sp_valid, jnp.log(jnp.maximum(s, 1e-12) / jnp.maximum(s_bar, 1e-12)), 0.0)
        diag_idx = (jnp.arange(p_opt)) * 7 + 6
        sp_w = jnp.where(sp_valid[num_fix:], info_sp, 0.0)
        H = H.at[diag_idx, diag_idx].add(sp_w)
        g = g.at[diag_idx].add(sp_w * r_s[num_fix:])

        # Solve. With x64 enabled this matches the reference's double-
        # precision Eigen solve (gn_kernels.cu:163-199); without it we solve
        # in f32 with one step of iterative refinement, which recovers the
        # accuracy the huge ray information weights (1/sigma_ray^2 ~ 1e5)
        # would otherwise lose. A tiny Tikhonov term (the reference's ep/lm
        # hooks) keeps unconstrained DoFs harmlessly at zero instead of
        # failing the whole factorization.
        f64 = jax.config.jax_enable_x64
        sdt = jnp.float64 if f64 else jnp.float32
        Hs = H.astype(sdt)
        gs = g.astype(sdt)
        damp = (1e-8 if f64 else 1e-6) * jnp.maximum(jnp.max(jnp.diag(Hs)), 1.0)
        Hs = Hs + damp * jnp.eye(Hs.shape[0], dtype=sdt)
        L = jnp.linalg.cholesky(Hs)
        ok = jnp.all(jnp.isfinite(L))
        L = jnp.where(ok, L, jnp.eye(Hs.shape[0], dtype=sdt))
        dx = -jax.scipy.linalg.cho_solve((L, True), gs)
        if not f64:
            resid = -gs - Hs @ dx
            dx = dx + jax.scipy.linalg.cho_solve((L, True), resid)
        dx = jnp.where(ok, dx, 0.0).reshape(p_opt, 7).astype(T_WC_in.dtype)

        # retract non-fixed poses (pose_retr_kernel, gn_kernels.cu:482-560)
        T_free = jax.vmap(lie.sim3_retr)(T_WC_in[num_fix:], dx)
        T_out = T_WC_in.at[num_fix:].set(T_free)
        return T_out, jnp.linalg.norm(dx.reshape(-1))

    def cond(state):
        T, it, dn = state
        return (it < cfg.max_iters) & (dn >= cfg.delta_norm)

    def body(state):
        T, it, dn = state
        T_new, dn_new = iteration(T)
        return (T_new, it + 1, dn_new)

    T_final, _, _ = jax.lax.while_loop(
        cond, body, (T_WC, jnp.asarray(0), jnp.asarray(jnp.inf, jnp.float32))
    )
    return T_final


@partial(jax.jit, static_argnames=("cfg", "num_fix", "mesh"))
def solve_gn_rays(
    cfg: BAConfig,
    num_fix: int,
    T_WC: jax.Array,  # (P, 8) window poses
    X: jax.Array,  # (P, HW, 3)
    C: jax.Array,  # (P, HW, 1)
    edges: Edges,
    odom: OdomEdges,
    s_bar: jax.Array,  # (P,) scale-prior targets, <=0 disables (global_opt.py:212-224)
    mesh=None,  # optional jax.sharding.Mesh: edges shard across devices
):
    """Global ray-alignment GN with odometry factors and scale priors.

    One jitted program reproducing gauss_newton_rays_odom_cuda
    (gn_kernels.cu:1792-1934). Returns updated (P, 8) poses.
    """

    XiT, w0, XjT = _edge_inputs(cfg, X, C, edges)

    if _resolve_edge_impl(cfg) == "pallas":
        xs = (edges.ii, edges.jj, XiT, w0, XjT)
        fn = _pallas_ray_fn(cfg)
    else:
        xs = (edges.ii, edges.jj, jnp.swapaxes(XiT, 1, 2), w0,
              jnp.swapaxes(XjT, 1, 2))

        def edge_system(T_WC_in, xs_e):
            ii, jj, Xi_e, w0_e, Xj_e = xs_e
            return _ray_edge_system(cfg, T_WC_in, ii, jj, Xi_e, w0_e, Xj_e)

        fn = _xla_edge_fn(cfg, edge_system)

    edge_systems = _build_edge_systems(mesh, xs, fn)
    return _solve_gn(cfg, num_fix, T_WC, edges, odom, s_bar, edge_systems)


@partial(jax.jit, static_argnames=("cfg", "num_fix", "img_hw", "mesh"))
def solve_gn_calib(
    cfg: BAConfig,
    num_fix: int,
    img_hw: tuple,
    T_WC: jax.Array,  # (P, 8)
    X: jax.Array,  # (P, HW, 3) — already ray-constrained (global_opt.py:298-300)
    C: jax.Array,  # (P, HW, 1)
    K: jax.Array,  # (3, 3)
    edges: Edges,
    odom: OdomEdges,
    s_bar: jax.Array,
    mesh=None,
):
    """Calibrated pixel + log-depth global GN (gauss_newton_calib_cuda,
    gn_kernels.cu:2610-2702; driver global_opt.py:288-341). The reference's
    calib path carries no odometry/scale-prior factors — pass empty/inactive
    rows for parity, but they are supported (a VIO-with-calib extension)."""

    XiT, w0, XjT = _edge_inputs(cfg, X, C, edges)
    xs = (edges.ii, edges.jj, edges.idx, jnp.swapaxes(XiT, 1, 2), w0,
          jnp.swapaxes(XjT, 1, 2))

    def edge_system(T_WC_in, xs_e):
        ii, jj, idx, Xi_e, w0_e, Xj_e = xs_e
        return _calib_edge_system(
            cfg, img_hw, K, T_WC_in, ii, jj, idx, Xi_e, w0_e, Xj_e
        )

    edge_systems = _build_edge_systems(mesh, xs, _xla_edge_fn(cfg, edge_system))
    return _solve_gn(cfg, num_fix, T_WC, edges, odom, s_bar, edge_systems)


@partial(jax.jit, static_argnames=("cfg", "num_fix", "mesh"))
def solve_gn_points(
    cfg: BAConfig,
    num_fix: int,
    T_WC: jax.Array,
    X: jax.Array,
    C: jax.Array,
    edges: Edges,
    odom: OdomEdges,
    s_bar: jax.Array,
    mesh=None,
):
    """3-D point-alignment global GN (gauss_newton_points_cuda,
    gn_kernels.cu:2206-2293; exported at gn.cpp:152-160, driven by the
    disabled local mapper local_mapping.py:190-206)."""

    XiT, w0, XjT = _edge_inputs(cfg, X, C, edges)
    xs = (edges.ii, edges.jj, jnp.swapaxes(XiT, 1, 2), w0,
          jnp.swapaxes(XjT, 1, 2))

    def edge_system(T_WC_in, xs_e):
        ii, jj, Xi_e, w0_e, Xj_e = xs_e
        return _point_edge_system(cfg, T_WC_in, ii, jj, Xi_e, w0_e, Xj_e)

    edge_systems = _build_edge_systems(mesh, xs, _xla_edge_fn(cfg, edge_system))
    return _solve_gn(cfg, num_fix, T_WC, edges, odom, s_bar, edge_systems)
