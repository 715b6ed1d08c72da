"""Backend orchestration: factor-graph bookkeeping around the jitted solver.

Behavioral spec: ``mast3r_slam/global_opt.py`` ``FactorGraph`` host logic —
``add_factors`` edge gating (:69-141), ``add_odometry_factors`` (:55-67),
ring-buffer edge eviction ``_materialise_edges`` (:143-178), unique-window
construction + pin semantics (:180-224, gn_kernels.cu:208-212) — and the
backend worker loop of ``vio.py:75-161``.

TPU design: edges live in fixed-capacity padded device arrays (Edges /
OdomEdges); the host keeps tiny mirrors (python lists of (ii, jj) ints) to
decide gating, eviction and window membership — decisions the reference also
makes on the host. The heavy parts (symmetric decode+match batch, GN solve)
are the jitted programs in inference.py / global_opt.py.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry
from . import frame as frame_mod
from .frame import KeyframeStore
from .global_opt import (
    BAConfig,
    Edges,
    OdomEdges,
    empty_edges,
    empty_odom_edges,
    solve_gn_calib,
    solve_gn_rays,
)
from .inference import decode_asymmetric, match_symmetric
from ..utils.log import get_logger

log = get_logger("backend")


@partial(jax.jit, donate_argnums=(0,))
def _write_pair_rows(edges: Edges, r0, i, j, idx_i2j, idx_j2i,
                     valid_j, valid_i, Qj, Qi, cache=None):
    """Write both directed rows of one pair in ONE donated dispatch — a
    chain of eager .at[].set() calls copied the full padded edge buffers
    (tens of MB) once per field. ``cache``: optional
    (XiT_r0, w0_r0, XiT_r1, w0_r1) from :func:`_ingest_pairs` — the edge's
    pose-independent solver inputs (see Edges docstring)."""
    r1 = r0 + 1
    XiT, w0 = edges.XiT, edges.w0
    if cache is not None:
        XiT_r0, w0_r0, XiT_r1, w0_r1 = cache
        XiT = XiT.at[r0].set(XiT_r0).at[r1].set(XiT_r1)
        w0 = w0.at[r0].set(w0_r0).at[r1].set(w0_r1)
    return Edges(
        ii=edges.ii.at[r0].set(i).at[r1].set(j),
        jj=edges.jj.at[r0].set(j).at[r1].set(i),
        idx=edges.idx.at[r0].set(idx_i2j.astype(jnp.int32))
        .at[r1].set(idx_j2i.astype(jnp.int32)),
        valid=edges.valid.at[r0].set(valid_j).at[r1].set(valid_i),
        Q=edges.Q.at[r0].set(Qj.astype(edges.Q.dtype))
        .at[r1].set(Qi.astype(edges.Q.dtype)),
        active=edges.active.at[r0].set(True).at[r1].set(True),
        XiT=XiT,
        w0=w0,
    )


@jax.jit
def _invert_match(idx_j2i, valid_match_i):
    """Approximate inverse of a dense match: ``idx_j2i`` maps each query
    pixel p to a target pixel; the returned seed maps each target pixel
    back to p (identity where no valid inverse exists; scatter collisions
    keep an arbitrary winner).

    Returns ``(idx_seed, seeded)`` where ``seeded`` (b, hw) marks pixels
    that received a genuine inverse. HOLE pixels sit at identity — an
    arbitrary guess the warm schedule (score-only refine, few LM iters)
    cannot repair, and a weak descriptor gate may fail to reject (wrong
    geometry passing as a valid constraint — the loop-harness regression,
    PERF.md 2026-08-20); seeded-match consumers must mask them out."""
    b, hw = idx_j2i.shape
    ident = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (b, hw))
    src = jnp.where(valid_match_i[..., 0], idx_j2i, hw)  # invalid -> dropped
    rows = jnp.arange(b)[:, None]
    # ONE scatter for both outputs (row-granular scatters cost ~2.5-4 ms
    # per 147k rows on TPU): value ident+1 with 0 meaning "hole"
    packed = jnp.zeros((b, hw), jnp.int32).at[rows, src].set(
        ident + 1, mode="drop")
    seeded = packed > 0
    idx_seed = jnp.where(seeded, packed - 1, ident)
    return idx_seed, seeded


@partial(jax.jit, static_argnames=())
def _ingest_pairs(q_conf_gate, q_conf_ba, c_conf,
                  X_i, C_i, n_i, X_j, C_j, n_j,
                  idx_i2j, idx_j2i, valid_match_j, valid_match_i,
                  Qii, Qjj, Qji, Qij):
    """Gating + pose-independent edge-cache build for a batch of pairs in
    ONE dispatch, sharing the row gathers (147k-row gathers cost ~3-16 ms
    each on TPU; the gate's Q lookup and the cache's matched-point lookup
    use the SAME indices, so they ride one concatenated-table gather).

    Combined confidences + bidirectional gating follow
    global_opt_bk0.py:107-147; the cache is the Edges.XiT/w0 contract (run
    ONCE at insertion — re-gathering per solve measured 460 ms at steady
    state). ``n_*``: fusion counts normalizing the stored confidence sums.

    Shapes: X_* (N, HW, 3), C_* (N, HW, 1), n_* (N,), idx_* (N, HW),
    valid_match_* (N, HW, 1), Q** (N, HW, 1).
    Returns (Qj, Qi, valid_j, valid_i, fracs, XiT_r0, w0_r0, XiT_r1, w0_r1).
    """
    Cin = C_i[..., 0] / jnp.maximum(n_i, 1)[:, None].astype(C_i.dtype)
    Cjn = C_j[..., 0] / jnp.maximum(n_j, 1)[:, None].astype(C_j.dtype)

    def one_dir(X_a, C_a, Q_aa, C_b, Q_ba, idx, valid_match):
        # ONE (HW, 5) row gather serves the gate (Q_aa) and the cache (X, C)
        table = jnp.concatenate([X_a, C_a[..., None], Q_aa], axis=-1)
        rows = jnp.take_along_axis(table, idx[..., None], axis=1)
        Xg, Cg, Qg = rows[..., :3], rows[..., 3], rows[..., 4]
        Qcomb = jnp.sqrt(Qg * Q_ba[..., 0])  # (N, HW)
        valid = valid_match[..., 0] & (Qcomb > q_conf_gate)
        ok = valid & (Qcomb > q_conf_ba) & (Cg > c_conf) & (C_b > c_conf)
        w0 = ok.astype(X_a.dtype) * jnp.sqrt(Qcomb)
        return Qcomb, valid, jnp.swapaxes(Xg, 1, 2), w0

    Qj, valid_j, XiT_r0, w0_r0 = one_dir(X_i, Cin, Qii, Cjn, Qji, idx_i2j, valid_match_j)
    Qi, valid_i, XiT_r1, w0_r1 = one_dir(X_j, Cjn, Qjj, Cin, Qij, idx_j2i, valid_match_i)
    fracs = jnp.stack(
        [valid_j.mean(axis=1), valid_i.mean(axis=1)], axis=-1
    )  # (N, 2) — the ONLY host fetch add_factors needs
    return (Qj[..., None], Qi[..., None], valid_j[..., None], valid_i[..., None],
            fracs, XiT_r0, w0_r0, XiT_r1, w0_r1)


@partial(jax.jit, donate_argnums=(0,))
def _shift_rows_jit(edges: Edges, pair_idx):
    """Evict pair ``pair_idx``: shift later rows down by 2 and zero the tail,
    as one donated gather per field (the eager concat formulation copied the
    full padded buffers per field)."""
    E = edges.ii.shape[0]
    rows = jnp.arange(E, dtype=jnp.int32)
    src = jnp.where(rows >= 2 * pair_idx, rows + 2, rows)
    live = src < E
    srcc = jnp.minimum(src, E - 1)

    def shift(a):
        if a is None:
            return None
        out = a[srcc]
        mask = live.reshape((E,) + (1,) * (a.ndim - 1))
        return jnp.where(mask, out, jnp.zeros_like(out))

    return Edges(*[shift(getattr(edges, f)) for f in Edges._fields])


class BackendGraph:
    """Host-side factor graph over a KeyframeStore."""

    def __init__(self, params, model_cfg, cfg: BAConfig, match_cfg: tuple,
                 img_hw: Tuple[int, int], max_edges: int = 64, max_odom: int = 64,
                 Q_conf: float = 1.5, min_match_frac: float = 0.1, mesh=None):
        self.mesh = mesh
        if mesh is not None:
            # multi-chip: tensor-parallel params + dp-sharded pair batches for
            # the symmetric decode (SURVEY.md section 2.5 — the batched edge
            # decode is the system's genuinely parallel heavy compute)
            from ..parallel.mesh import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.model_cfg = model_cfg
        self.cfg = cfg
        self.match_cfg = match_cfg
        self.img_hw = img_hw
        self.hw = img_hw[0] * img_hw[1]
        self.Q_conf = Q_conf
        self.min_match_frac = min_match_frac

        self.max_edges = max_edges
        self.edges = empty_edges(2 * max_edges, self.hw)  # two directed rows/pair
        self.odom = empty_odom_edges(max_odom)
        # host mirrors: logical keyframe indices per stored pair / odom edge
        self._pairs: List[Tuple[int, int]] = []
        self._odom_pairs: List[Tuple[int, int]] = []
        self._n_odom = 0
        self.evict_fallback_count = 0  # non-consecutive (loop) evictions

    def reset(self):
        self.edges = empty_edges(2 * self.max_edges, self.hw)
        self.odom = empty_odom_edges(self.odom.ii.shape[0])
        self._pairs = []
        self._odom_pairs = []
        self._n_odom = 0

    # -- edge insertion ----------------------------------------------------

    def add_odometry_factors(self, ii: int, jj: int, delta_T: np.ndarray):
        """(global_opt.py:55-67): delta_T is the measured SE3 T_ii_jj."""
        slot = self._n_odom % self.odom.ii.shape[0]
        self.odom = OdomEdges(
            ii=self.odom.ii.at[slot].set(ii),
            jj=self.odom.jj.at[slot].set(jj),
            delta_T=self.odom.delta_T.at[slot].set(jnp.asarray(delta_T[:7])),
            active=self.odom.active.at[slot].set(True),
        )
        if slot < len(self._odom_pairs):
            self._odom_pairs[slot] = (ii, jj)
        else:
            self._odom_pairs.append((ii, jj))
        self._n_odom += 1

    def add_factors(self, store: KeyframeStore, ii: List[int], jj: List[int],
                    min_match_frac: Optional[float] = None, is_reloc: bool = False) -> bool:
        """Batched symmetric decode + match + bidirectional gating
        (global_opt.py:69-141). ``ii``/``jj`` are logical keyframe indices.

        Returns True if any edge was accepted (False aborts a reloc attempt,
        :117-119).
        """
        if not ii:
            return False
        mmf = self.min_match_frac if min_match_frac is None else min_match_frac
        slots_i = [int(i) % store.capacity for i in ii]
        slots_j = [int(j) % store.capacity for j in jj]
        feat_i = store.feat[jnp.asarray(slots_i)]
        feat_j = store.feat[jnp.asarray(slots_j)]
        n_pairs = len(ii)
        if self.mesh is not None:
            # pad the pair batch to the dp extent and shard it; padded rows
            # are never visited by the gating loop below
            from ..parallel.mesh import shard_batch

            dp = int(self.mesh.shape["dp"])
            padn = (-n_pairs) % dp
            if padn:
                feat_i = jnp.concatenate([feat_i, jnp.repeat(feat_i[-1:], padn, 0)])
                feat_j = jnp.concatenate([feat_j, jnp.repeat(feat_j[-1:], padn, 0)])
                n_pairs += padn
            pos = jnp.broadcast_to(store.pos[None], (n_pairs, *store.pos.shape))
            feat_i = shard_batch(feat_i, self.mesh)
            feat_j = shard_batch(feat_j, self.mesh)
            pos = shard_batch(pos, self.mesh)
        else:
            pos = jnp.broadcast_to(store.pos[None], (n_pairs, *store.pos.shape))

        (idx_i2j, idx_j2i, valid_match_j, valid_match_i,
         Qii, Qjj, Qji, Qij) = match_symmetric(
            self.params, self.model_cfg, dict(self.match_cfg),
            feat_i, pos, feat_j, pos, self.img_hw,
        )

        si_arr = jnp.asarray(slots_i)
        sj_arr = jnp.asarray(slots_j)
        (Qj, Qi, valid_j, valid_i, fracs,
         XiT_r0, w0_r0, XiT_r1, w0_r1) = _ingest_pairs(
            jnp.float32(self.Q_conf), jnp.float32(self.cfg.Q_conf),
            jnp.float32(self.cfg.C_conf),
            store.X_canon[si_arr][: len(ii)], store.C[si_arr][: len(ii)],
            store.N[si_arr][: len(ii)],
            store.X_canon[sj_arr][: len(ii)], store.C[sj_arr][: len(ii)],
            store.N[sj_arr][: len(ii)],
            idx_i2j[: len(ii)].astype(jnp.int32),
            idx_j2i[: len(ii)].astype(jnp.int32),
            valid_match_j[: len(ii)], valid_match_i[: len(ii)],
            Qii[: len(ii)], Qjj[: len(ii)], Qji[: len(ii)], Qij[: len(ii)],
        )
        # The gate fractions only DECIDE anything for reloc attempts and
        # non-consecutive (loop-closure) pairs — consecutive edges are
        # inserted unconditionally (global_opt.py:117-127). Skip the host
        # sync when nothing gates: through the remote-TPU tunnel one fetch
        # costs ~37 ms per keyframe.
        need_fracs = is_reloc or any(i != j - 1 for i, j in zip(ii, jj))
        if need_fracs:
            fracs = np.asarray(fracs)  # one small host fetch

        added = False
        for n, (i, j) in enumerate(zip(ii, jj)):
            consecutive = i == j - 1
            bad = need_fracs and float(fracs[n].min()) < mmf
            if bad and is_reloc:
                return False
            if bad and not consecutive:
                continue
            self._insert_pair(
                i, j,
                idx_i2j[n], idx_j2i[n],
                valid_j[n, :, 0], valid_i[n, :, 0],
                Qj[n, :, 0], Qi[n, :, 0],
                cache=(XiT_r0[n], w0_r0[n], XiT_r1[n], w0_r1[n]),
            )
            added = True
        return added

    def add_consecutive_half(self, store: KeyframeStore, i: int, j: int,
                             half) -> bool:
        """Insert the consecutive edge (i, j) reusing the tracker's half of
        the pair decode.

        ``half`` is TrackResult.pair_half from the frame that became
        keyframe ``j``: the tracker already ran decode(j, i) (= the [jj, ij]
        half of the symmetric batch, inference.decode_symmetric_batch) and
        matched its direction, so only decode(i, j) + one match remain —
        half the keyframe-rate decode+match cost. The reference re-decodes
        both directions (global_opt.py:69-141); skipping the redundant
        recompute is behavior-preserving because the pair decode is a pure
        function of the stored encoder features. Consecutive edges are
        inserted unconditionally (global_opt.py:117-127), so no gate fetch.
        """
        from ..ops import matching

        idx_j2i, valid_match_i, Qjj, Qij = half
        slot_i = int(i) % store.capacity
        slot_j = int(j) % store.capacity
        pos = store.pos[None]
        res11, res21 = decode_asymmetric(
            self.params, self.model_cfg, store.feat[slot_i][None], pos,
            store.feat[slot_j][None], pos, self.img_hw,
        )
        mc = dict(self.match_cfg)
        seed = bool(mc.get("seed_consecutive", True))
        cold_cfg, _ = matching.split_match_cfg(mc)
        seed_cfg = matching.seed_match_cfg(mc)
        if seed:
            # Seed the missing direction with the INVERSE of the tracker's
            # match: the tracker mapped i-pixels -> j-pixels; the (i, j)
            # direction needs j-pixels -> i-pixels, and a converged
            # consecutive pair's correspondence is near-bijective (pixel
            # correspondences are about the two IMAGES, so they transfer
            # across the two pair decodes whenever the model is
            # geometrically meaningful — trained weights; NOT random-weight
            # harnesses). With a seed this good the warm search schedule
            # applies (same argument as the tracker's warm frames; accuracy
            # A/B in PERF.md round 3). Pixels without a valid inverse seed
            # at identity; per-pixel validity gating absorbs the ones the
            # warm reach cannot recover (consecutive edges are masked, not
            # gated wholesale, global_opt.py:117-127).
            idx_seed, seeded = _invert_match(
                idx_j2i.astype(jnp.int32), valid_match_i)
            idx_i2j, valid_match_j = matching.match_split(
                res11["pts3d"], res21["pts3d"], res11["desc"], res21["desc"],
                idx_seed, **seed_cfg,
            )
            # identity-hole seeds are arbitrary guesses the warm schedule
            # cannot repair; keep only genuinely seeded pixels (the edge is
            # per-pixel masked, not gated wholesale, global_opt.py:117-127)
            valid_match_j = valid_match_j & seeded[..., None]
        else:
            idx_i2j, valid_match_j = matching.match_split(
                res11["pts3d"], res21["pts3d"], res11["desc"], res21["desc"],
                None, **cold_cfg,
            )
        hw = self.hw
        flat1 = lambda x: x.reshape(1, hw, 1)  # noqa: E731
        (Qj, Qi, valid_j, valid_i, _fracs,
         XiT_r0, w0_r0, XiT_r1, w0_r1) = _ingest_pairs(
            jnp.float32(self.Q_conf), jnp.float32(self.cfg.Q_conf),
            jnp.float32(self.cfg.C_conf),
            store.X_canon[slot_i][None], store.C[slot_i][None],
            store.N[slot_i][None],
            store.X_canon[slot_j][None], store.C[slot_j][None],
            store.N[slot_j][None],
            idx_i2j.astype(jnp.int32), idx_j2i.astype(jnp.int32),
            valid_match_j, valid_match_i,
            flat1(res11["desc_conf"]), Qjj, flat1(res21["desc_conf"]), Qij,
        )
        self._insert_pair(
            i, j, idx_i2j[0], idx_j2i[0], valid_j[0, :, 0], valid_i[0, :, 0],
            Qj[0, :, 0], Qi[0, :, 0],
            cache=(XiT_r0[0], w0_r0[0], XiT_r1[0], w0_r1[0]),
        )
        return True

    def _insert_pair(self, i, j, idx_i2j, idx_j2i, valid_j, valid_i, Qj, Qi,
                     cache=None):
        """Write the two directed rows of pair (i, j) into the padded arrays;
        evict the oldest pair when full (ring semantics)."""
        pair_slot = len(self._pairs)
        if pair_slot >= self.max_edges:
            evict = self._pick_evict()
            self._pairs.pop(evict)
            self._shift_rows(evict)
            pair_slot = len(self._pairs)
        self._pairs.append((int(i), int(j)))
        self.edges = _write_pair_rows(
            self.edges, jnp.int32(2 * pair_slot), jnp.int32(i), jnp.int32(j),
            idx_i2j, idx_j2i, valid_j, valid_i, Qj, Qi, cache=cache,
        )

    def _pick_evict(self) -> int:
        """Eviction under capacity pressure: loop-closure edges are scarce
        and precious (the reference keeps ALL edges for live keyframes,
        global_opt.py:24-37) while old consecutive edges between neighbors
        that have been jointly optimized for many solves carry the least
        new information. Prefer the oldest CONSECUTIVE pair that does not
        touch the most recent keyframes; fall back to the globally oldest
        pair (e.g. when everything left is a loop closure)."""
        newest = max(max(i, j) for i, j in self._pairs)
        for k, (pi, pj) in enumerate(self._pairs):
            if pi == pj - 1 and pj < newest - 1:
                return k
        # fallback: everything left is a loop closure (or touches the newest
        # keyframes) — a NON-consecutive pair dies. Count + log it so a
        # loop-heavy map silently shedding closures is visible (VERDICT r4
        # weak #6); raise tpu.max_edges if this fires in practice.
        self.evict_fallback_count += 1
        log.warning(
            "edge eviction fallback: no old consecutive pair at max_edges=%d; "
            "evicting pair %s (loop closure) — count=%d",
            self.max_edges, self._pairs[0], self.evict_fallback_count)
        return 0

    def _shift_rows(self, pair_idx: int):
        """Compact padded rows after evicting pair ``pair_idx``."""
        self.edges = _shift_rows_jit(self.edges, jnp.int32(pair_idx))

    def remove_dead_edges(self, oldest_alive: int):
        """Drop edges touching overwritten ring slots (_materialise_edges,
        global_opt.py:143-178)."""
        keep = [k for k, (i, j) in enumerate(self._pairs) if i >= oldest_alive and j >= oldest_alive]
        if len(keep) == len(self._pairs):
            pass
        else:
            e = self.edges
            rows = []
            for k in keep:
                rows += [2 * k, 2 * k + 1]
            idx = jnp.asarray(rows, jnp.int32) if rows else jnp.zeros((0,), jnp.int32)

            def gather_pad(a):
                if a is None:
                    return None
                out = jnp.zeros_like(a)
                if rows:
                    out = out.at[: len(rows)].set(a[idx])
                return out

            self.edges = Edges(*[gather_pad(getattr(e, f)) for f in Edges._fields])
            self._pairs = [self._pairs[k] for k in keep]
        # odometry edges
        keep_o = [k for k, (i, j) in enumerate(self._odom_pairs) if i >= oldest_alive and j >= oldest_alive]
        if len(keep_o) != len(self._odom_pairs):
            o = self.odom
            idx = jnp.asarray(keep_o, jnp.int32) if keep_o else jnp.zeros((0,), jnp.int32)

            def gather_pad_o(a):
                out = jnp.zeros_like(a)
                if keep_o:
                    out = out.at[: len(keep_o)].set(a[idx])
                return out

            self.odom = OdomEdges(*[gather_pad_o(getattr(o, f)) for f in OdomEdges._fields])
            self._odom_pairs = [self._odom_pairs[k] for k in keep_o]
            self._n_odom = len(self._odom_pairs)

    # -- solve ---------------------------------------------------------------

    def unique_kf_idx(self) -> List[int]:
        s = sorted({k for p in self._pairs for k in p})
        return s

    def _build_window(self, store: KeyframeStore, s_bar: Optional[np.ndarray]):
        """Compact the live keyframes + edges into padded window arrays
        (global_opt.py:226-252 window construction). Returns None when there
        is nothing to optimize."""
        oldest_alive = max(0, int(store.n_total) - store.capacity)
        self.remove_dead_edges(oldest_alive)
        uniq = self.unique_kf_idx()
        if len(uniq) <= self.cfg.pin:
            return None

        # pad window to a bucket size to bound recompiles
        p = len(uniq)
        bucket = 8
        while bucket < p:
            bucket *= 2
        pad = bucket - p
        kf_to_win = {k: n for n, k in enumerate(uniq)}

        slots = jnp.asarray([k % store.capacity for k in uniq] + [uniq[-1] % store.capacity] * pad)
        T_win = store.T_WC[slots]
        X_win = store.X_canon[slots]
        C_win = store.C[slots] / jnp.maximum(store.N[slots], 1)[:, None, None].astype(store.C.dtype)

        # Bucket the edge rows handed to the solver: live pairs are always
        # compacted to the FRONT of the padded arrays (_shift_rows /
        # remove_dead_edges), so slicing to a power-of-two bucket decouples
        # the solve cost (streams every handed row) from the store CAPACITY
        # (tpu.max_edges, sized for long sequences). Recompiles stay bounded
        # (one program per bucket size).
        ebucket = 8
        while ebucket < len(self._pairs):
            ebucket *= 2
        ebucket = min(ebucket, self.max_edges)
        rows = 2 * ebucket
        edges_sl = jax.tree.map(lambda a: a[:rows], self.edges)

        # edge indices -> window positions (padded rows point at 0 but are
        # inactive). Derived from the HOST mirrors, never fetched back from
        # the device: every row was written from host ints (_insert_pair /
        # compaction keeps live rows in front, in _pairs order), and a
        # device->host fetch costs ~37 ms per sync through the remote-TPU
        # tunnel — 4 of them per solve dominated the window build.
        e_ii = [0] * rows
        e_jj = [0] * rows
        for k, (pi, pj) in enumerate(self._pairs):
            e_ii[2 * k], e_jj[2 * k] = kf_to_win.get(pi, 0), kf_to_win.get(pj, 0)
            e_ii[2 * k + 1], e_jj[2 * k + 1] = e_jj[2 * k], e_ii[2 * k]
        edges_win = edges_sl._replace(
            ii=jnp.asarray(e_ii, jnp.int32), jj=jnp.asarray(e_jj, jnp.int32)
        )
        cap_o = int(self.odom.ii.shape[0])
        o_ii = [0] * cap_o
        o_jj = [0] * cap_o
        # odometry rows whose endpoints fell out of the window are disabled;
        # slots beyond the written mirror (len(_odom_pairs)) were never active
        o_act = [False] * cap_o
        for s, (oi, oj) in enumerate(self._odom_pairs):
            o_ii[s] = kf_to_win.get(int(oi), 0)
            o_jj[s] = kf_to_win.get(int(oj), 0)
            o_act[s] = int(oi) in kf_to_win and int(oj) in kf_to_win
        odom_win = self.odom._replace(
            ii=jnp.asarray(o_ii, jnp.int32),
            jj=jnp.asarray(o_jj, jnp.int32),
            active=jnp.asarray(o_act),
        )

        sb = jnp.full((bucket,), -1.0, jnp.float32)
        if s_bar is not None:
            vals = [float(s_bar[k]) if k < len(s_bar) else -1.0 for k in uniq] + [-1.0] * pad
            sb = jnp.asarray(vals, jnp.float32)
        return uniq, p, T_win, X_win, C_win, edges_win, odom_win, sb

    def _write_back(self, store: KeyframeStore, uniq, p, T_new) -> KeyframeStore:
        """Write back the free poses (global_opt.py:285-286)."""
        free = uniq[self.cfg.pin : p]
        if free:
            free_slots = jnp.asarray([k % store.capacity for k in free])
            store = frame_mod.kf_update_T_WCs(store, T_new[self.cfg.pin : p], free_slots)
        return store

    def solve_window_rays(self, store: KeyframeStore,
                          s_bar: Optional[np.ndarray] = None):
        """Build the compacted pose window and run the jitted ray-alignment
        GN (global_opt.py:226-286). Returns ``(uniq, p, T_new)`` — the solved
        window without writing it back — so a threaded caller can merge the
        poses into a store that advanced while the solve ran; ``None`` when
        there is nothing to optimize."""
        win = self._build_window(store, s_bar)
        if win is None:
            return None
        uniq, p, T_win, X_win, C_win, edges_win, odom_win, sb = win
        T_new = solve_gn_rays(self.cfg, self.cfg.pin, T_win, X_win, C_win,
                              edges_win, odom_win, sb, mesh=self.mesh)
        return uniq, p, T_new

    def solve_window_calib(self, store: KeyframeStore, K: jnp.ndarray,
                           s_bar: Optional[np.ndarray] = None):
        """Calibrated pixel/log-depth global GN window solve
        (global_opt.py:288-341): points are constrained to their pixel rays
        first (:298-300). Same return contract as ``solve_window_rays``."""
        win = self._build_window(store, s_bar)
        if win is None:
            return None
        uniq, p, T_win, X_win, C_win, edges_win, odom_win, sb = win
        X_win = geometry.constrain_points_to_ray(self.img_hw, X_win, K)
        T_new = solve_gn_calib(self.cfg, self.cfg.pin, self.img_hw, T_win,
                               X_win, C_win, jnp.asarray(K), edges_win,
                               odom_win, sb, mesh=self.mesh)
        return uniq, p, T_new

    def solve_GN_rays(self, store: KeyframeStore, s_bar: Optional[np.ndarray] = None) -> KeyframeStore:
        """Window solve + immediate write-back (the serialized eval path)."""
        out = self.solve_window_rays(store, s_bar)
        if out is None:
            return store
        return self._write_back(store, *out)

    def solve_GN_calib(self, store: KeyframeStore, K: jnp.ndarray,
                       s_bar: Optional[np.ndarray] = None) -> KeyframeStore:
        """Calibrated window solve + immediate write-back."""
        out = self.solve_window_calib(store, K, s_bar)
        if out is None:
            return store
        return self._write_back(store, *out)
