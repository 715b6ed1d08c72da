"""Scale-only pose graph: align VO translation deltas to wheel odometry.

Behavioral spec: ``mast3r_slam/pgo.py`` — ``PoseGraph`` (:130-278) with the
default ``OdomResidualScaleOnly`` residual (:26-79): one global scalar ``s``
minimizing ``sum_i || s * t(T_i^-1 T_{i+1}) - t(O_i^-1 O_{i+1}) ||^2`` over
consecutive frame pairs, where T are VO poses and O odometry poses.

The reference solves this with 10 iterations of pypose Levenberg-Marquardt +
Cholesky + TrustRegion (:222-278). The problem is *linear* in ``s``, so the
TPU-native solution is the closed form ``s = <dt_vo, dt_odom> / <dt_vo,
dt_vo>`` — one fused reduction, identical minimum. The reference's final
per-frame scale smoothing (:269-274) multiplies every frame's scale by ``s``
(its endpoint/sqrt dance algebraically reduces to that), which we apply
directly.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import lie


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PoseGraphState:
    """Ring buffer of frame VO poses + odometry poses (pgo.py:140-146)."""

    Twc: jax.Array  # (B, 7) SE3 frame poses (scale stripped)
    Todom: jax.Array  # (B, 7) SE3 odometry poses
    scale: jax.Array  # (B, 1) per-frame smoothed scale
    n_total: jax.Array  # () int32 frames ever added

    @property
    def capacity(self) -> int:
        return self.Twc.shape[0]


def make_pose_graph(buffer_size: int = 300, dtype=jnp.float32) -> PoseGraphState:
    ident = lie.se3_identity(dtype=dtype)
    return PoseGraphState(
        Twc=jnp.broadcast_to(ident, (buffer_size, 7)),
        Todom=jnp.broadcast_to(ident, (buffer_size, 7)),
        scale=jnp.ones((buffer_size, 1), dtype),
        n_total=jnp.zeros((), jnp.int32),
    )


def pgo_add_frame(state: PoseGraphState, T_WC_sim3: jax.Array, odom_se3: jax.Array) -> PoseGraphState:
    """Append the frame pose (+ odometry pose) to the ring (pgo.py:173-185)."""
    slot = jnp.mod(state.n_total, state.capacity)
    return dataclasses.replace(
        state,
        Twc=state.Twc.at[slot].set(T_WC_sim3[:7]),
        Todom=state.Todom.at[slot].set(odom_se3),
        scale=state.scale.at[slot].set(T_WC_sim3[7]),
        n_total=state.n_total + 1,
    )


@partial(jax.jit, static_argnames=())
def pgo_optimize(state: PoseGraphState):
    """Solve for the global VO-to-odometry scale (pgo.py:222-278).

    Returns (state', s, ok). Consecutive deltas beyond the live window are
    masked; requires > 10 frames like the reference (:226-227).
    """
    n = jnp.minimum(state.n_total, state.capacity)
    B = state.capacity

    # NOTE: the reference optimizes over the buffer in slot order; with a
    # full ring this mixes the wrap point into one bogus delta — negligible
    # (1 of 300), and we mask deltas beyond the live region the same way.
    dT_vo = lie.se3_mul(jax.vmap(lie.se3_inv)(state.Twc[:-1]), state.Twc[1:])
    dT_od = lie.se3_mul(jax.vmap(lie.se3_inv)(state.Todom[:-1]), state.Todom[1:])
    t_vo = dT_vo[..., :3]
    t_od = dT_od[..., :3]

    valid = (jnp.arange(B - 1) + 1) < n
    w = valid.astype(t_vo.dtype)[:, None]
    num = jnp.sum(w * t_vo * t_od)
    den = jnp.sum(w * t_vo * t_vo)
    ok = (state.n_total > 10) & (den > 1e-12)
    s = jnp.where(ok, num / jnp.maximum(den, 1e-12), 1.0)

    new_scale = jnp.where(ok, state.scale * 0 + s, state.scale)
    return dataclasses.replace(state, scale=new_scale), s, ok


@partial(jax.jit, static_argnames=("iters",))
def pgo_optimize_full(
    Twc: jax.Array,
    Twc_prior_inv: jax.Array,
    Todom_inv: jax.Array,
    prior_weight: jax.Array,
    odom_weight: jax.Array,
    lc_edges: jax.Array,
    lc_T: jax.Array,
    lc_active: jax.Array,
    iters: int = 10,
):
    """Full Sim(3) pose-graph optimization (the reference's ``OdomResidual``
    variant, pgo.py:82-128 — unused by its default config but part of the
    API): optimize all poses so consecutive deltas agree with both the VO
    prior and the odometry measurement, plus optional loop-closure terms.

    Residual per consecutive pair i (exactly the reference's sum):
        r_i = w_p * log((T_i^-1 T_{i+1}) * Twc_prior_inv_i)
            + w_o * log((T_i^-1 T_{i+1}) * Todom_inv_i)
    Loop-closure rows: log((T_a^-1 T_b) * T_lc) per active edge, summed into
    the corresponding consecutive row like the reference's broadcast add.

    Solved as damped Gauss-Newton on the left-tangent of every pose with
    autodiff Jacobians and an on-device Cholesky (the reference uses pypose
    LM + TrustRegion; same stationary points).

    Args: Twc (N, 8) Sim3; *_inv (N-1, 8) Sim3; weights (N-1, 7) or scalars;
    lc_edges (L, 2) int32; lc_T (L, 8); lc_active (L,) bool.
    Returns (Twc_new, final_cost).
    """
    N = Twc.shape[0]
    dtype = Twc.dtype

    def residual(xi_flat):
        xi = xi_flat.reshape(N, 7)
        T = jax.vmap(lie.sim3_retr)(Twc, xi)
        dT = jax.vmap(lie.sim3_mul)(jax.vmap(lie.sim3_inv)(T[:-1]), T[1:])
        r_prior = jax.vmap(lie.sim3_log)(jax.vmap(lie.sim3_mul)(dT, Twc_prior_inv))
        r_odom = jax.vmap(lie.sim3_log)(jax.vmap(lie.sim3_mul)(dT, Todom_inv))
        r = r_prior * prior_weight + r_odom * odom_weight
        # loop closures: accumulate into the row of their source pose
        dlc = jax.vmap(lie.sim3_mul)(
            jax.vmap(lie.sim3_inv)(T[lc_edges[:, 0]]), T[lc_edges[:, 1]]
        )
        r_lc = jax.vmap(lie.sim3_log)(jax.vmap(lie.sim3_mul)(dlc, lc_T))
        r_lc = r_lc * lc_active[:, None].astype(dtype)
        r = r.at[jnp.clip(lc_edges[:, 0], 0, N - 2)].add(r_lc)
        return r.reshape(-1)

    def step(carry, _):
        xi, lam = carry
        r = residual(xi)
        J = jax.jacfwd(residual)(xi)  # ((N-1)*7, N*7)
        H = J.T @ J + lam * jnp.eye(N * 7, dtype=dtype)
        g = -(J.T @ r)
        L = jnp.linalg.cholesky(H)
        ok = jnp.all(jnp.isfinite(L))
        dx = jnp.where(
            ok, jax.scipy.linalg.cho_solve((L, True), g), jnp.zeros_like(g)
        )
        new_cost = jnp.sum(residual(xi + dx) ** 2)
        old_cost = jnp.sum(r**2)
        accept = new_cost < old_cost
        xi = jnp.where(accept, xi + dx, xi)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (xi, lam), new_cost

    xi0 = jnp.zeros((N * 7,), dtype)
    (xi, _), costs = jax.lax.scan(step, (xi0, jnp.asarray(1e-6, dtype)), None, length=iters)
    T_new = jax.vmap(lie.sim3_retr)(Twc, xi.reshape(N, 7))
    return T_new, costs[-1]
