"""Frame and keyframe state, TPU-native.

Behavioral spec: ``mast3r_slam/frame.py`` — the ``Frame`` dataclass (:17-168),
pointmap fusion filters (:101-165), and the 300-slot keyframe ring buffer
(``SharedKeyframes`` :360-575).

TPU design: instead of shared-CPU-memory torch tensors guarded by an RLock
(the reference's three-process design, frame.py:262-390), all keyframe state
lives in ONE pytree of fixed-shape device arrays. The single host process
orchestrates; jitted programs update slots with ``.at[idx].set``. This removes
every lock, every host<->device copy of pointmaps, and every serialization
hazard the reference documents (main.py:32-33).
"""

from __future__ import annotations

import dataclasses
import enum
import functools
from typing import Optional

import jax
import jax.numpy as jnp


class Mode(enum.Enum):
    INIT = 0
    TRACKING = 1
    RELOC = 2
    TERMINATED = 3


# ---------------------------------------------------------------------------
# pointmap fusion filters (frame.py:101-165)
# ---------------------------------------------------------------------------

def filtering_score(C: jax.Array, score_mode: str = "median") -> jax.Array:
    """Scalar confidence score of one observation (``Frame.get_score``,
    reference frame.py:93-99): the median or mean of the confidence map,
    selected by ``tracking.filtering_score``."""
    if score_mode == "median":
        return jnp.median(C)
    if score_mode == "mean":
        return jnp.mean(C)
    raise ValueError(f"unknown filtering_score {score_mode}")  # pragma: no cover


def update_pointmap(
    X_old: jax.Array,
    C_old: jax.Array,
    N: jax.Array,
    N_updates: jax.Array,
    X: jax.Array,
    C: jax.Array,
    mode: str = "weighted_pointmap",
    score_mode: str = "median",
):
    """Fuse a new pointmap observation into the canonical pointmap.

    All inputs/outputs are arrays; ``N``/``N_updates`` are int32 scalars.
    First observation (N_updates == 0) always initializes. Returns
    (X_new, C_new, N_new, N_updates_new).
    """
    first_obs = N_updates == 0

    if mode == "first":
        # the reference replaces on N_updates == 1 — i.e. it keeps the FIRST
        # post-init observation, not the init one (frame.py:113-116: init
        # sets N_updates=1, then ``first`` overwrites once more before
        # freezing)
        take_new = N_updates <= 1
        X_new = jnp.where(take_new, X, X_old)
        C_new = jnp.where(take_new, C, C_old)
        N_new = jnp.where(take_new, 1, N)
    elif mode == "recent":
        X_new, C_new = X, C
        N_new = jnp.ones_like(N)
    elif mode == "best_score":
        # keep whichever whole observation scores best (frame.py:101-127).
        # The reference carries ``self.score`` as state, but replacement
        # copies C wholesale and sets score = get_score(C), so the invariant
        # score == get_score(stored C) always holds — recomputing it here
        # avoids threading a score channel through every Frame/store pytree.
        better = filtering_score(C, score_mode) > filtering_score(C_old, score_mode)
        take_new = first_obs | better
        X_new = jnp.where(take_new, X, X_old)
        C_new = jnp.where(take_new, C, C_old)
        N_new = jnp.where(take_new, 1, N)
    elif mode == "indep_conf":
        mask = C > C_old
        X_new = jnp.where(first_obs, X, jnp.where(mask, X, X_old))
        C_new = jnp.where(first_obs, C, jnp.where(mask, C, C_old))
        N_new = jnp.ones_like(N)
    elif mode == "weighted_pointmap":
        Xw = (C_old * X_old + C * X) / (C_old + C)
        X_new = jnp.where(first_obs, X, Xw)
        C_new = jnp.where(first_obs, C, C_old + C)
        N_new = jnp.where(first_obs, 1, N + 1)
    elif mode == "weighted_spherical":
        def to_sph(P):
            r = jnp.linalg.norm(P, axis=-1, keepdims=True)
            x, y, z = jnp.split(P, 3, axis=-1)
            return jnp.concatenate([r, jnp.arctan2(y, x), jnp.arccos(z / r)], axis=-1)

        def to_cart(s):
            r, phi, theta = jnp.split(s, 3, axis=-1)
            st = jnp.sin(theta)
            return jnp.concatenate(
                [r * st * jnp.cos(phi), r * st * jnp.sin(phi), r * jnp.cos(theta)], axis=-1
            )

        sph = (C_old * to_sph(X_old) + C * to_sph(X)) / (C_old + C)
        X_new = jnp.where(first_obs, X, to_cart(sph))
        C_new = jnp.where(first_obs, C, C_old + C)
        N_new = jnp.where(first_obs, 1, N + 1)
    else:  # pragma: no cover
        raise ValueError(f"unknown filtering_mode {mode}")

    return X_new, C_new, N_new, N_updates + 1


# ---------------------------------------------------------------------------
# Frame
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Frame:
    """Per-frame state (frame.py:17-44). A pytree: passes through jit."""

    frame_id: jax.Array  # int32 scalar
    img: jax.Array  # (1, H, W, 3) ImgNorm'd
    T_WC: jax.Array  # (8,) Sim3
    X_canon: jax.Array  # (HW, 3)
    C: jax.Array  # (HW, 1)
    feat: jax.Array  # (1, N_tok, enc_dim)
    pos: jax.Array  # (1, N_tok, 2)
    N: jax.Array  # int32 scalar
    N_updates: jax.Array  # int32 scalar
    odom: Optional[jax.Array] = None  # (8,) odometry SE3 (stored padded)

    def average_conf(self) -> jax.Array:
        """C / N (frame.py:167-168)."""
        return self.C / jnp.maximum(self.N, 1).astype(self.C.dtype)


@functools.lru_cache(maxsize=8)
def _empty_frame_consts(hw):
    """Per-shape constant buffers for make_empty_frame. jax arrays are
    immutable, so one shared instance serves every frame — allocating them
    per frame cost 5 eager RPCs/frame through the remote-TPU tunnel (~1-3
    ms each), in the per-frame hot path (system.grab_rgb, bench)."""
    from ..ops.lie import sim3_identity

    return (
        sim3_identity(),
        jnp.zeros((hw, 3), jnp.float32),
        jnp.zeros((hw, 1), jnp.float32),
        jnp.zeros((), jnp.int32),
    )


def make_empty_frame(frame_id, img, feat, pos, T_WC=None, odom=None) -> Frame:
    hw = (img.shape[1] // 1) * (img.shape[2] // 1)
    ident, X0, C0, zero_i32 = _empty_frame_consts(hw)

    return Frame(
        frame_id=jnp.asarray(frame_id, jnp.int32),
        img=img,
        T_WC=ident if T_WC is None else T_WC,
        X_canon=X0,
        C=C0,
        feat=feat,
        pos=pos,
        N=zero_i32,
        N_updates=zero_i32,
        odom=odom,
    )


# ---------------------------------------------------------------------------
# Keyframe store
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KeyframeStore:
    """Fixed-capacity keyframe ring buffer as device arrays.

    Mirrors ``SharedKeyframes`` (frame.py:360-575): capacity ``buffer``
    (default 300), slot index = n_total % buffer when full. ``n_size`` is the
    number of live slots; both counters are traced int32 scalars so appends
    stay inside jit.
    """

    frame_id: jax.Array  # (K,) int32
    T_WC: jax.Array  # (K, 8)
    X_canon: jax.Array  # (K, HW, 3)
    C: jax.Array  # (K, HW, 1)
    feat: jax.Array  # (K, N_tok, enc_dim)
    pos: jax.Array  # (N_tok, 2) shared grid positions
    N: jax.Array  # (K,) int32
    N_updates: jax.Array  # (K,) int32
    odom: jax.Array  # (K, 8) odometry poses (identity-padded)
    n_size: jax.Array  # () int32: live keyframe count (<= K)
    n_total: jax.Array  # () int32: total appends ever

    @property
    def capacity(self) -> int:
        return self.T_WC.shape[0]

    def slot_of(self, kf_index: jax.Array) -> jax.Array:
        """Map logical keyframe index (0..n_total-1) to a physical slot."""
        return jnp.mod(kf_index, self.capacity)

    def last_slot(self) -> jax.Array:
        return self.slot_of(self.n_total - 1)


def make_keyframe_store(capacity: int, hw: int, n_tok: int, enc_dim: int,
                        dtype=jnp.float32) -> KeyframeStore:
    from ..ops.lie import sim3_identity

    return KeyframeStore(
        frame_id=jnp.full((capacity,), -1, jnp.int32),
        T_WC=jnp.broadcast_to(sim3_identity(dtype=dtype), (capacity, 8)),
        X_canon=jnp.zeros((capacity, hw, 3), dtype),
        C=jnp.zeros((capacity, hw, 1), dtype),
        feat=jnp.zeros((capacity, n_tok, enc_dim), dtype),
        pos=jnp.zeros((n_tok, 2), jnp.int32),  # filled on first append
        N=jnp.zeros((capacity,), jnp.int32),
        N_updates=jnp.zeros((capacity,), jnp.int32),
        odom=jnp.broadcast_to(
            jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1], dtype), (capacity, 8)
        ),
        n_size=jnp.zeros((), jnp.int32),
        n_total=jnp.zeros((), jnp.int32),
    )


def kf_append(store: KeyframeStore, frame: Frame, enable=None) -> KeyframeStore:
    """Append a frame as a keyframe (SharedKeyframes.append, frame.py:443-466).

    Jit-traceable; overwrites the oldest slot when full. ``enable`` (traced
    bool) makes the append a masked in-place write — see kf_update_pointmap
    for why that beats wrapping in lax.cond.
    """
    slot = store.slot_of(store.n_total)
    odom = frame.odom if frame.odom is not None else store.odom[slot]

    if enable is None:
        sel = lambda new, old: new  # noqa: E731
        en = True
    else:
        en = enable
        sel = lambda new, old: jnp.where(en, new, old)  # noqa: E731

    return dataclasses.replace(
        store,
        frame_id=store.frame_id.at[slot].set(sel(frame.frame_id, store.frame_id[slot])),
        T_WC=store.T_WC.at[slot].set(sel(frame.T_WC, store.T_WC[slot])),
        X_canon=store.X_canon.at[slot].set(sel(frame.X_canon, store.X_canon[slot])),
        C=store.C.at[slot].set(sel(frame.C, store.C[slot])),
        feat=store.feat.at[slot].set(sel(frame.feat[0], store.feat[slot])),
        pos=frame.pos[0],
        N=store.N.at[slot].set(sel(frame.N, store.N[slot])),
        N_updates=store.N_updates.at[slot].set(sel(frame.N_updates, store.N_updates[slot])),
        odom=store.odom.at[slot].set(sel(odom, store.odom[slot])),
        n_size=jnp.minimum(store.n_size + jnp.where(en, 1, 0), store.capacity),
        n_total=store.n_total + jnp.where(en, 1, 0),
    )


def kf_get_frame(store: KeyframeStore, slot: jax.Array) -> Frame:
    """Materialize one keyframe slot as a Frame view (no img)."""
    return Frame(
        frame_id=store.frame_id[slot],
        img=jnp.zeros((1, 1, 1, 3), store.T_WC.dtype),
        T_WC=store.T_WC[slot],
        X_canon=store.X_canon[slot],
        C=store.C[slot],
        feat=store.feat[slot][None],
        pos=store.pos[None],
        N=store.N[slot],
        N_updates=store.N_updates[slot],
        odom=store.odom[slot],
    )


def kf_update_pointmap(store: KeyframeStore, slot, X, C, mode: str,
                       enable=None, score_mode: str = "median") -> KeyframeStore:
    """``enable``: optional traced bool — a masked in-place slot write.

    Guarding with ``jnp.where`` instead of ``lax.cond`` matters on TPU:
    donation does not alias through cond branches, so a cond over the store
    copies every buffer (~130 ms/frame measured); the masked write is a pair
    of dynamic slice/update ops on one slot.
    """
    Xn, Cn, Nn, Un = update_pointmap(
        store.X_canon[slot], store.C[slot], store.N[slot], store.N_updates[slot],
        X, C, mode, score_mode,
    )
    if enable is not None:
        Xn = jnp.where(enable, Xn, store.X_canon[slot])
        Cn = jnp.where(enable, Cn, store.C[slot])
        Nn = jnp.where(enable, Nn, store.N[slot])
        Un = jnp.where(enable, Un, store.N_updates[slot])
    return dataclasses.replace(
        store,
        X_canon=store.X_canon.at[slot].set(Xn),
        C=store.C.at[slot].set(Cn),
        N=store.N.at[slot].set(Nn),
        N_updates=store.N_updates.at[slot].set(Un),
    )


def kf_update_T_WCs(store: KeyframeStore, T_WCs: jax.Array, slots: jax.Array) -> KeyframeStore:
    """Write back optimized poses (SharedKeyframes.update_T_WCs,
    frame.py:548-552)."""
    return dataclasses.replace(store, T_WC=store.T_WC.at[slots].set(T_WCs))
