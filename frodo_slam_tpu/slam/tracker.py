"""Frame-to-keyframe tracker: dense matching + Sim(3) Gauss-Newton.

Behavioral spec: ``mast3r_slam/tracker.py`` — ``FrameTracker.track``
(:161-368), ``opt_pose_ray_dist_sim3`` (:414-465), ``opt_pose_calib_sim3``
(:467-517), ``solve`` (:397-412), ``get_points_poses`` (:370-395).

TPU design: the whole per-frame step (decode -> match -> gate -> GN -> KF
pointmap update -> new-KF decision + conditional append) is ONE jitted
program with static shapes. Where the reference gathers the valid subset of
points (tracker.py:297-300), we keep all HW points and zero their
information weights — the normal equations are identical and the shapes stay
static. The <=50-iteration GN runs as a ``lax.while_loop`` with the
reference's convergence test; the 7x7 solve is a Cholesky on-device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import lie
from ..ops.geometry import (
    act_Sim3,
    constrain_points_to_ray,
    get_pixel_coords,
    point_to_ray_dist,
    project_calib,
)
from ..ops import matching
from ..ops.normal_eqs import ray_dist_drd_cols, reduce_sim3_system
from ..ops.robust import huber
from . import frame as frame_mod
from .frame import Frame
from . import inference as inference_mod
from .inference import AsymOut


class TrackingCfg(NamedTuple):
    """Static tracking parameters (config/base.yaml:18-38)."""

    min_match_frac: float = 0.1
    use_fnn: bool = False
    min_match_frac_fnn: float = 0.0008
    fnn_subsample: int = 8
    max_iters: int = 50
    C_conf: float = 0.0
    Q_conf: float = 1.5
    rel_error: float = 1e-3
    delta_norm: float = 1e-3
    huber_k: float = 1.345
    match_frac_thresh: float = 0.333
    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    pixel_border: float = -10.0
    depth_eps: float = 1e-6
    filtering_mode: str = "weighted_pointmap"
    filtering_score: str = "median"  # best_score mode's scorer (frame.py:93-99)
    use_calib: bool = False


class TrackResult(NamedTuple):
    """Small per-frame result. ``flags`` packs the host-read scalars into ONE
    array so a single tiny fetch serves the host control flow:
    [match_frac, ok, new_kf, T_WCf(8), T_CkCf(8), used_fnn]."""

    flags: jax.Array  # (20,) f32
    idx_f2k: jax.Array  # (1, HW) for warm-starting the next frame's matcher
    # raw projective-match half of the (active KF i, frame j) pair decode:
    # (idx_j2i (1,HW), valid_match_i (1,HW,1), Qjj (1,HW,1), Qij (1,HW,1)).
    # When the frame becomes keyframe j, this IS the [jj, ij] half of the
    # backend's symmetric consecutive-edge batch (decode(j,i) — see
    # inference.decode_symmetric_batch ordering), so the backend only
    # decodes+matches the missing (i,j) direction: half the keyframe-rate
    # decode + match cost (reference re-decodes both, global_opt.py:69-141).
    pair_half: object = None

    @property
    def match_frac(self):
        return self.flags[0]

    @property
    def used_fnn(self):
        return self.flags[19] > 0

    @property
    def ok(self):
        return self.flags[1] > 0

    @property
    def new_kf(self):
        return self.flags[2] > 0

    @property
    def T_WCf(self):
        return self.flags[3:11]

    @property
    def T_CkCf(self):
        return self.flags[11:19]


# ---------------------------------------------------------------------------
# dense 7x7 Gauss-Newton (tracker.py:397-412 solve + 414-517 loops)
# ---------------------------------------------------------------------------

def _solve_step(sqrt_info, r, J, huber_k):
    """Whiten, robustify, build 7x7 normal equations, solve.

    sqrt_info, r: (n, d); J: (n, d, 7). Returns (tau (7,), cost, ok).
    """
    whitened_r = sqrt_info * r
    robust_sqrt_info = sqrt_info * jnp.sqrt(huber(whitened_r, huber_k))
    A = (robust_sqrt_info[..., None] * J).reshape(-1, 7)
    b = (robust_sqrt_info * r).reshape(-1)
    H = A.T @ A
    g = -(A.T @ b)
    cost = 0.5 * jnp.dot(b, b)

    L, ok = _safe_cholesky(H)
    tau = jax.scipy.linalg.cho_solve((L, True), g)
    tau = jnp.where(ok, tau, jnp.zeros_like(tau))
    return tau, cost, ok


def _safe_cholesky(H):
    L = jnp.linalg.cholesky(H)
    ok = jnp.all(jnp.isfinite(L))
    return jnp.where(ok, L, jnp.eye(H.shape[0], dtype=H.dtype)), ok


def _gn_loop(cfg: TrackingCfg, T_init, residual_fn):
    """Shared GN driver: ``residual_fn(T) -> (sqrt_info, r, J)``.

    Reproduces the convergence test of nonlinear_optimizer.py:5-25 inside a
    ``lax.while_loop``.
    """

    def cond(state):
        T, old_cost, step, done, ok = state
        return (step < cfg.max_iters) & (~done) & ok

    def body(state):
        T, old_cost, step, done, ok_all = state
        sqrt_info, r, J = residual_fn(T)
        tau, new_cost, ok = _solve_step(sqrt_info, r, J, cfg.huber_k)
        new_cost = new_cost.astype(old_cost.dtype)
        tau = tau.astype(T.dtype)
        T_new = lie.sim3_retr(T, tau)  # left retraction, lietorch Sim3.retr
        rel = jnp.abs(new_cost - old_cost) / jnp.maximum(new_cost, 1e-12)
        dn = jnp.linalg.norm(tau)
        converged = (step > 0) & ((rel < cfg.rel_error) | (dn < cfg.delta_norm))
        return (T_new, new_cost, step + 1, converged, ok_all & ok)

    init = (T_init, jnp.asarray(jnp.inf, T_init.dtype), jnp.asarray(0), jnp.asarray(False), jnp.asarray(True))
    T, _, _, _, ok = jax.lax.while_loop(cond, body, init)
    return T, ok


def _gn_loop_fused(cfg: TrackingCfg, T_init, hg_fn):
    """GN driver over a fused step ``hg_fn(T) -> (H (7,7), g (7,), cost)``."""

    def cond(state):
        T, old_cost, step, done, ok = state
        return (step < cfg.max_iters) & (~done) & ok

    def body(state):
        T, old_cost, step, done, ok_all = state
        H, g, new_cost = hg_fn(T)
        L, ok = _safe_cholesky(H)
        tau = jax.scipy.linalg.cho_solve((L, True), g)
        tau = jnp.where(ok, tau, jnp.zeros_like(tau)).astype(T.dtype)
        new_cost = new_cost.astype(old_cost.dtype)
        T_new = lie.sim3_retr(T, tau)
        rel = jnp.abs(new_cost - old_cost) / jnp.maximum(new_cost, 1e-12)
        dn = jnp.linalg.norm(tau)
        converged = (step > 0) & ((rel < cfg.rel_error) | (dn < cfg.delta_norm))
        return (T_new, new_cost, step + 1, converged, ok_all & ok)

    init = (T_init, jnp.asarray(jnp.inf, T_init.dtype), jnp.asarray(0), jnp.asarray(False), jnp.asarray(True))
    T, _, _, _, ok = jax.lax.while_loop(cond, body, init)
    return T, ok


def opt_pose_ray_dist_sim3(cfg: TrackingCfg, Xf, Xk, T_WCf, T_WCk, Qk, valid):
    """Uncalibrated ray+distance GN (tracker.py:414-465).

    Xf: (HW, 3) frame points gathered at kf pixels; Xk: (HW, 3) kf points;
    Qk: (HW, 1); valid: (HW, 1) bool — folded into the weights instead of a
    gather.

    The normal equations are built from the Jacobian's analytic STRUCTURE
    (J = -drd/dP . [I | -skew(P) | P]): per-point 3x3 Gram blocks contract
    straight into the 7x7 system without ever materializing the (HW, 4, 7)
    Jacobian — the literal transcription streamed ~100MB per GN iteration.
    """
    sqrtQ = jnp.sqrt(Qk) * valid.astype(Qk.dtype)
    sqrt_info = jnp.concatenate(
        [jnp.repeat(sqrtQ / cfg.sigma_ray, 3, axis=-1), sqrtQ / cfg.sigma_dist], axis=-1
    )
    info = sqrt_info * sqrt_info
    rd_k = point_to_ray_dist(Xk)

    def hg(T_CkCf):
        pW = lie.sim3_act(T_CkCf, Xf)
        d = jnp.linalg.norm(pW, axis=-1, keepdims=True)
        r = pW / d
        rd_f = jnp.concatenate([r, d], axis=-1)
        err = rd_k - rd_f  # (n, 4)
        w = info * huber(sqrt_info * err, cfg.huber_k)  # (n, 4)

        # Scalar-expanded normal equations (ops/normal_eqs.py): the einsum
        # formulation lowered to MXU-padded tiny matmuls at ~8ms/iteration;
        # the column expansion runs ~0.16ms on the VPU.
        H, g, cost_sum = reduce_sim3_system(
            ray_dist_drd_cols(r, d[:, 0]),
            [w[:, i] for i in range(4)],
            [err[:, i] for i in range(4)],
            pW,
        )
        return H, g, 0.5 * cost_sum

    T_CkCf0 = lie.sim3_rel(T_WCk, T_WCf)
    T_CkCf, ok = _gn_loop_fused(cfg, T_CkCf0, hg)
    T_WCf_new = lie.sim3_mul(T_WCk, T_CkCf)
    return T_WCf_new, T_CkCf, ok


def opt_pose_calib_sim3(cfg: TrackingCfg, Xf, Xk, T_WCf, T_WCk, Qk, valid, meas_k,
                        valid_meas_k, K, img_size):
    """Calibrated pixel + log-depth GN (tracker.py:467-517)."""
    sqrtQ = jnp.sqrt(Qk) * valid.astype(Qk.dtype)
    sqrt_info = jnp.concatenate(
        [jnp.repeat(sqrtQ / cfg.sigma_pixel, 2, axis=-1), sqrtQ / cfg.sigma_depth], axis=-1
    )

    def residual(T_CkCf):
        Xf_Ck, dX_dT = act_Sim3(T_CkCf, Xf, jacobian=True)
        pz, dpz_dX, valid_proj = project_calib(
            Xf_Ck, K, img_size, jacobian=True, border=cfg.pixel_border, z_eps=cfg.depth_eps
        )
        m = (valid_proj & valid_meas_k).astype(sqrt_info.dtype)
        r = meas_k - pz
        J = -(dpz_dX @ dX_dT)
        return m * sqrt_info, r, J

    T_CkCf0 = lie.sim3_rel(T_WCk, T_WCf)
    T_CkCf, ok = _gn_loop(cfg, T_CkCf0, residual)
    T_WCf_new = lie.sim3_mul(T_WCk, T_CkCf)
    return T_WCf_new, T_CkCf, ok


# ---------------------------------------------------------------------------
# full tracking step
# ---------------------------------------------------------------------------

# the ONE jitted pair-decode program, shared with the backend's
# consecutive-edge half reuse (a duplicate ViT-L decode compile costs
# 10-20 min through the remote-compile service)
_model_stage = inference_mod._model_stage


def track_step(
    params,
    model_cfg,
    cfg: TrackingCfg,
    match_cfg,
    img_hw,
    kf: Frame,
    frame: Frame,
    idx_f2k_init: Optional[jax.Array],
    K: Optional[jax.Array] = None,
):
    """One tracked frame (FrameTracker.track, tracker.py:161-368).

    Streaming design: the per-frame program touches ONLY O(one-frame) state —
    the *active keyframe* (a Frame pytree, ~6MB) flows in, is pointmap-updated
    and, on a new-KF decision, replaced by the fused frame ON DEVICE. The
    keyframe history lives outside as host-indexed device buffers updated at
    keyframe rate; nothing ring-buffer-sized crosses the jit boundary per
    frame (that cost ~1s/frame of buffer traffic).

    FOUR dispatches, not one: model (decode+heads), matcher prep, the LM
    projector, and matcher-rest + bookkeeping fused. The dispatches chain
    asynchronously on device, and the program boundaries reset XLA's
    layout/fusion choices — the matcher inside one monolithic program ran
    the LM loop ~5x slower (XLA folds the corner-table build into every
    gather; PERF.md round 5), and model+matcher fused ran ~2.5x slower
    (round 2). Matcher-rest and bookkeeping fuse fine (device-neutral,
    measured) and save one ~1-3 ms tunnel RPC per frame on the synced
    path.

    Returns (kf_next, fused_frame, TrackResult).
    """
    res11, res21 = _model_stage(
        params, model_cfg, frame.feat, frame.pos, kf.feat, kf.pos, img_hw
    )
    cold_cfg, warm_cfg = matching.split_match_cfg(dict(match_cfg))
    mc = dict(warm_cfg if idx_f2k_init is not None else cold_cfg)
    h, w = img_hw
    X11, X21 = res11["pts3d"], res21["pts3d"]
    rays, tgt, p0 = matching._prep_jit(X11, X21, idx_f2k_init)
    p1f, converged = matching.iter_proj(
        rays, tgt, p0,
        max_iter=mc.get("max_iter", 10),
        lambda_init=mc.get("lambda_init", 1e-8),
        cost_thresh=mc.get("convergence_thresh", 1e-6),
    )
    # NO eager ops between the dispatches: the AsymOut flattening happens
    # INSIDE the fused rest+post program. Eager reshapes here were 12
    # extra per-frame RPCs through the remote-TPU tunnel (~1-3 ms each).
    return _match_rest_and_post(
        cfg, img_hw, kf, frame, res11, res21, p1f, converged, K,
        dist_thresh=mc.get("dist_thresh", 1e-1),
        radius=mc.get("radius", 3),
        dilation_max=mc.get("dilation_max", 5),
        ft_matching_threshold=mc.get("ft_matching_threshold", 0.8),
        refine_impl=matching._resolve_refine_impl(
            mc.get("refine_impl", "auto"), h, w),
    )


@partial(jax.jit, static_argnames=(
    "cfg", "img_hw", "radius", "dilation_max", "refine_impl"))
def _match_rest_and_post(
    cfg: TrackingCfg, img_hw, kf: Frame, frame: Frame, res11, res21,
    p1f, converged, K,
    *, dist_thresh, radius, dilation_max, ft_matching_threshold, refine_impl,
):
    """Matcher rest (occlusion gate + refine + score gate) fused with the
    tracking bookkeeping in ONE dispatch — device-neutral vs two dispatches
    (13.7 vs 14.0 ms measured, scratch/r5_matcher_probe.py) and one fewer
    host RPC per frame."""
    idx_f2k, valid_match_k = matching._match_post_project(
        res11["pts3d"], res21["pts3d"], res11["desc"], res21["desc"],
        p1f, converged,
        dist_thresh=dist_thresh, radius=radius, dilation_max=dilation_max,
        ft_matching_threshold=ft_matching_threshold, refine_impl=refine_impl,
    )
    return track_step_post(
        cfg, img_hw, kf, frame, res11, res21, idx_f2k, valid_match_k, K
    )


@partial(jax.jit, static_argnames=("cfg", "img_hw"))
def track_step_post(
    cfg: TrackingCfg,
    img_hw,
    kf: Frame,
    frame: Frame,
    res11,
    res21,
    idx_f2k_b: jax.Array,  # (1, HW) raw projective match
    valid_match_k_b: jax.Array,  # (1, HW, 1)
    K: Optional[jax.Array] = None,
):
    """Everything after decode+match: gating, GN, pointmap fusion, new-KF
    select (tracker.py:177-368). Factored out so the SLAM layer can run the
    model+matcher and this bookkeeping as SEPARATE dispatches — program
    boundaries reset XLA's layout/fusion choices, which measurably helps the
    matcher-heavy stage.
    """
    h, w = img_hw
    hw = h * w

    flat = lambda x, c: x.reshape(hw, c)  # noqa: E731
    out = AsymOut(
        idx_f2k=idx_f2k_b,
        valid_match_k=valid_match_k_b,
        Xff=flat(res11["pts3d"], 3),
        Cff=flat(res11["conf"], 1),
        Qff=flat(res11["desc_conf"], 1),
        Xkf=flat(res21["pts3d"], 3),
        Ckf=flat(res21["conf"], 1),
        Qkf=flat(res21["desc_conf"], 1),
        Dff=flat(res11["desc"], res11["desc"].shape[-1]),
        Dkf=flat(res21["desc"], res21["desc"].shape[-1]),
    )

    # fuse the frame's fresh pointmap (tracker.py:177)
    Xn, Cn, Nn, Un = frame_mod.update_pointmap(
        frame.X_canon, frame.C, frame.N, frame.N_updates, out.Xff, out.Cff,
        cfg.filtering_mode, cfg.filtering_score,
    )
    frame = dataclasses.replace(frame, X_canon=Xn, C=Cn, N=Nn, N_updates=Un)

    idx_f2k = out.idx_f2k[0]  # (HW,)
    valid_match_k = out.valid_match_k[0]  # (HW, 1)

    Cf_avg = frame.average_conf()
    Ck_avg = kf.average_conf()
    # one fused row gather for everything indexed by idx_f2k (TPU gathers
    # pay per gather op, so don't issue three)
    frame_cols = jnp.concatenate([out.Qff, Cf_avg, frame.X_canon], axis=-1)  # (HW, 5)

    def gates(idx, valid_m):
        g = frame_cols[idx]
        Qk = jnp.sqrt(g[:, 0:1] * out.Qkf)
        Cf = g[:, 1:2]
        v_opt = valid_m & (Cf > cfg.C_conf) & (Ck_avg > cfg.C_conf) & (Qk > cfg.Q_conf)
        v_kf = valid_m & (Qk > cfg.Q_conf)
        return g, Qk, v_opt, v_kf, jnp.mean(v_opt.astype(jnp.float32))

    gathered, Qk, valid_opt, valid_kf, match_frac = gates(idx_f2k, valid_match_k)

    used_fnn = jnp.asarray(False)
    if cfg.use_fnn:
        # descriptor reciprocal-NN fallback when projective matching is too
        # sparse (tracker.py:222-272)
        from ..ops.fast_nn import fast_reciprocal_nns

        def fnn_branch(_):
            xy1, xy2, conv = fast_reciprocal_nns(
                out.Dff, out.Dkf, h, w, subsample=cfg.fnn_subsample
            )
            tgt = jnp.where(conv, xy2, hw)  # out-of-bounds rows dropped
            idx_new = jnp.zeros((hw,), jnp.int32).at[tgt].set(xy1, mode="drop")
            valid_new = (
                jnp.zeros((hw,), bool).at[tgt].set(True, mode="drop")[:, None]
            )
            return idx_new, valid_new

        fallback = match_frac < cfg.min_match_frac
        idx_f2k, valid_match_k = jax.lax.cond(
            fallback, fnn_branch, lambda _: (idx_f2k, valid_match_k), None
        )
        used_fnn = fallback
        gathered, Qk, valid_opt, valid_kf, match_frac = gates(idx_f2k, valid_match_k)

    accept_thresh = jnp.where(used_fnn, cfg.min_match_frac_fnn, cfg.min_match_frac)

    # points & poses (tracker.py:370-395)
    if cfg.use_calib:
        assert K is not None
        Xf_all = constrain_points_to_ray(img_hw, frame.X_canon[None], K)[0]
        Xk = constrain_points_to_ray(img_hw, kf.X_canon[None], K)[0]
        uv_k = get_pixel_coords(img_hw, dtype=Xk.dtype)
        zk = Xk[..., 2:3]
        valid_meas_k = zk > cfg.depth_eps
        meas_k = jnp.concatenate(
            [uv_k, jnp.where(valid_meas_k, jnp.log(jnp.where(valid_meas_k, zk, 1.0)), 0.0)],
            axis=-1,
        )
        meas_k = jnp.where(valid_meas_k, meas_k, 0.0)
        Xf = Xf_all[idx_f2k]
        T_WCf_new, T_CkCf, ok = opt_pose_calib_sim3(
            cfg, Xf, Xk, frame.T_WC, kf.T_WC, Qk, valid_opt, meas_k, valid_meas_k, K, img_hw
        )
    else:
        Xf = gathered[:, 2:5]  # frame.X_canon rows, from the fused gather
        Xk = kf.X_canon
        T_WCf_new, T_CkCf, ok = opt_pose_ray_dist_sim3(
            cfg, Xf, Xk, frame.T_WC, kf.T_WC, Qk, valid_opt
        )

    # reject the frame wholesale if matching was too sparse or GN failed
    accept = (match_frac >= accept_thresh) & ok
    T_WCf_final = jnp.where(accept, T_WCf_new, frame.T_WC)
    frame = dataclasses.replace(frame, T_WC=T_WCf_final)

    # keyframe pointmap update: Xkk = T_CkCf . Xkf (tracker.py:325-328),
    # masked by acceptance (a where over the 6MB active-KF state, not a
    # cond — cond branches copy).
    Xkk = lie.sim3_act(T_CkCf, out.Xkf)
    Xu, Cu, Nu_, Uu = frame_mod.update_pointmap(
        kf.X_canon, kf.C, kf.N, kf.N_updates, Xkk, out.Ckf,
        cfg.filtering_mode, cfg.filtering_score,
    )
    kf_upd = dataclasses.replace(
        kf,
        X_canon=jnp.where(accept, Xu, kf.X_canon),
        C=jnp.where(accept, Cu, kf.C),
        N=jnp.where(accept, Nu_, kf.N),
        N_updates=jnp.where(accept, Uu, kf.N_updates),
    )

    # new-KF decision: unique valid matches / HW (tracker.py:330-331).
    # Sort-based unique count — a 147k scatter-max costs ~40ms on TPU, the
    # sort a fraction of that.
    sorted_idx = jnp.sort(jnp.where(valid_kf[:, 0], idx_f2k, hw))
    firsts = jnp.concatenate(
        [sorted_idx[:1] < hw, (sorted_idx[1:] != sorted_idx[:-1]) & (sorted_idx[1:] < hw)]
    )
    unique_frac = jnp.sum(firsts.astype(jnp.float32)) / hw
    new_kf = (unique_frac < cfg.match_frac_thresh) & accept

    # active keyframe for the next frame: the fused frame when it became a
    # keyframe, else the updated current keyframe — selected on device
    kf_next = jax.tree.map(
        lambda new, old: jnp.where(new_kf, new, old), frame, kf_upd
    )

    flags = jnp.concatenate(
        [
            jnp.stack([
                match_frac,
                accept.astype(jnp.float32),
                new_kf.astype(jnp.float32),
            ]),
            T_WCf_final.astype(jnp.float32),
            T_CkCf.astype(jnp.float32),
            used_fnn.astype(jnp.float32)[None],
        ]
    )
    # pair_half: the raw (PRE-fnn) projective half for backend
    # consecutive-edge reuse; stays on device, only consumed if this frame
    # becomes a keyframe
    return kf_next, frame, TrackResult(
        flags=flags,
        idx_f2k=idx_f2k[None],
        pair_half=(idx_f2k_b, valid_match_k_b, out.Qff[None], out.Qkf[None]),
    )
