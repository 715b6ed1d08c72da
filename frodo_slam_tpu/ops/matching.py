"""Dense two-view pixel matching.

TPU-native reimplementation of the reference matching stack:

- :func:`iter_proj` — per-point 2-D Levenberg-Marquardt projection of target
  rays onto a ray image (spec: ``matching_kernels.cu:128-325``).
- :func:`refine_matches` — coarse-to-fine dilated window search maximizing a
  descriptor dot product (spec: ``matching_kernels.cu:25-125``).
- :func:`match` — the full pipeline with occlusion + score gating
  (spec: ``mast3r_slam/matching.py:8-92``).

All functions are vectorized ``jnp`` programs (XLA gathers); every step is
fully traceable so the whole matcher jits into the tracking step. Shapes are
static; validity is carried in masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .image import img_gradient


def pixel_to_lin(p: jax.Array, w: int) -> jax.Array:
    """(…, 2) [u, v] -> linear row-major index (matching.py:13-15)."""
    return p[..., 0] + w * p[..., 1]


def lin_to_pixel(idx: jax.Array, w: int) -> jax.Array:
    """Linear index -> (…, 2) [u, v] (matching.py:18-22)."""
    return jnp.stack([idx % w, idx // w], axis=-1)


def prep_for_iter_proj(X11: jax.Array, X21: jax.Array, idx_1_to_2_init):
    """Build the 9-channel ray+gradient image and initial guesses
    (matching.py:25-49).

    X11, X21: (b, h, w, 3) canonical pointmaps.
    Returns rays_with_grad (b, h, w, 9), pts3d_norm (b, h*w, 3),
    p_init (b, h*w, 2) float.
    """
    b, h, w, _ = X11.shape
    rays = X11 / jnp.linalg.norm(X11, axis=-1, keepdims=True)
    gx, gy = img_gradient(rays)
    rays_with_grad = jnp.concatenate([rays, gx, gy], axis=-1)

    X21_vec = X21.reshape(b, h * w, 3)
    pts3d_norm = X21_vec / jnp.linalg.norm(X21_vec, axis=-1, keepdims=True)

    if idx_1_to_2_init is None:
        # int32 explicitly: under x64 a bare arange would drag int64 through
        # every index op of the matcher
        idx_1_to_2_init = jnp.broadcast_to(
            jnp.arange(h * w, dtype=jnp.int32)[None], (b, h * w)
        )
    p_init = lin_to_pixel(idx_1_to_2_init, w).astype(rays.dtype)
    return rays_with_grad, pts3d_norm, p_init


@partial(jax.jit, static_argnames=("max_iter", "unroll"))
def iter_proj(
    rays_with_grad_img: jax.Array,
    pts3d_norm: jax.Array,
    p_init: jax.Array,
    max_iter: int = 10,
    lambda_init: float = 1e-8,
    cost_thresh: float = 1e-6,
    unroll: bool = True,
):
    """LM iteration in pixel space minimizing ||ray(u,v) - target||^2.

    Direct vectorization of ``iter_proj_kernel`` (matching_kernels.cu:128-284):
    one lane per query point instead of one CUDA thread.

    Args:
        rays_with_grad_img: (b, h, w, 9) [ray(3), d(ray)/du(3), d(ray)/dv(3)].
        pts3d_norm: (b, n, 3) unit target rays.
        p_init: (b, n, 2) float initial pixel guesses.
    Returns:
        p_new (b, n, 2) float, converged (b, n) bool.
    """
    b, h, w, c = rays_with_grad_img.shape

    u = jnp.clip(p_init[..., 0], 1.0, w - 2.0)
    v = jnp.clip(p_init[..., 1], 1.0, h - 2.0)
    lam = jnp.full(u.shape, lambda_init, dtype=u.dtype)
    converged = jnp.zeros(u.shape, dtype=bool)

    # Precombined-corner image: all four bilinear corners of every pixel
    # packed into one row, so each sample is ONE row gather instead of four
    # (measured 3x faster on TPU). Built once, reused by all iterations.
    # FULL-SIZE layout (h, w, 4c), not (h-1, w-1, 4c): the shrunk table's
    # 511-row reshape forced a misaligned relayout of 21 MB and put every
    # gather row at a non-power-of-two stride. The right/bottom pad cells
    # are NEVER sampled — u, v clamp to [1, w-2]/[1, h-2] above, so the +1
    # corners stay in-image — making this bit-identical to the shrunk table.
    img = rays_with_grad_img
    imgp = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)))
    P = jnp.concatenate(
        [img, imgp[:, :h, 1 : w + 1], imgp[:, 1 : h + 1, :w],
         imgp[:, 1 : h + 1, 1 : w + 1]],
        axis=-1,
    ).reshape(b, h * w, 4 * c)

    def sample(u, v):
        u0f = jnp.floor(u)
        v0f = jnp.floor(v)
        du = (u - u0f)[..., None]
        dv = (v - v0f)[..., None]
        i = (v0f.astype(jnp.int32) * w + u0f.astype(jnp.int32))[..., None]
        blk = jnp.take_along_axis(P, i, axis=1)  # (b, n, 4c)
        i00, i10 = blk[..., :c], blk[..., c : 2 * c]
        i01, i11 = blk[..., 2 * c : 3 * c], blk[..., 3 * c :]
        return (
            i00 * (1 - du) * (1 - dv)
            + i10 * du * (1 - dv)
            + i01 * (1 - du) * dv
            + i11 * du * dv
        )

    # ONE 9-channel bilinear gather per iteration: the accept-test sample at
    # (u_new, v_new) IS the next iteration's opening sample when accepted,
    # and on reject the carried sample at (u, v) is still current — so
    # carrying the sample in the loop state halves the gather count while
    # staying bit-identical to the reference kernel, which re-samples at the
    # top of every iteration (matching_kernels.cu:151-207, 233-268).
    samp0 = sample(u, v)

    def body(_, state):
        u, v, lam, converged, samp = state
        r = samp[..., 0:3]
        gx = samp[..., 3:6]
        gy = samp[..., 6:9]
        r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        err = r - pts3d_norm
        cost = jnp.sum(err * err, axis=-1)

        A00 = jnp.sum(gx * gx, axis=-1) + lam
        A01 = jnp.sum(gx * gy, axis=-1)
        A11 = jnp.sum(gy * gy, axis=-1) + lam
        b0 = -jnp.sum(err * gx, axis=-1)
        b1 = -jnp.sum(err * gy, axis=-1)

        det_inv = 1.0 / (A00 * A11 - A01 * A01)
        du = det_inv * (A11 * b0 - A01 * b1)
        dv = det_inv * (-A01 * b0 + A00 * b1)

        u_new = jnp.clip(u + du, 1.0, w - 2.0)
        v_new = jnp.clip(v + dv, 1.0, h - 2.0)

        samp_new = sample(u_new, v_new)
        r_new = samp_new[..., 0:3]
        r_new = r_new / jnp.linalg.norm(r_new, axis=-1, keepdims=True)
        err_new = r_new - pts3d_norm
        new_cost = jnp.sum(err_new * err_new, axis=-1)

        accept = new_cost < cost
        u = jnp.where(accept, u_new, u)
        v = jnp.where(accept, v_new, v)
        samp = jnp.where(accept[..., None], samp_new, samp)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        converged = jnp.where(accept, new_cost < cost_thresh, cost < cost_thresh)
        return u, v, lam, converged, samp

    u, v, lam, converged, _ = jax.lax.fori_loop(
        0, max_iter, body, (u, v, lam, converged, samp0),
        unroll=unroll,  # ~1ms/frame faster unrolled in ISOLATION (measured)
    )
    return jnp.stack([u, v], axis=-1), converged


@partial(jax.jit, static_argnames=("radius", "dilation_max"))
def refine_matches_gather(
    D11: jax.Array,
    D21: jax.Array,
    p1: jax.Array,
    radius: int = 3,
    dilation_max: int = 5,
):
    """Coarse-to-fine dilated descriptor search (matching_kernels.cu:25-85),
    gather formulation — the literal transcription of the CUDA kernel. Kept
    as the semantic oracle; the production path is
    :func:`refine_matches_shift` (TPU gathers run ~20x below the shift
    formulation's streaming bandwidth).

    Args:
        D11: (b, h, w, f) descriptor image.
        D21: (b, n, f) query descriptors.
        p1: (b, n, 2) int pixel guesses.
    Returns:
        p1_new (b, n, 2) int32, max_scores (b, n).
    """
    b, h, w, f = D11.shape
    flat = D11.reshape(b, h * w, f)

    u0 = p1[..., 0].astype(jnp.int32)
    v0 = p1[..., 1].astype(jnp.int32)
    neg_inf = jnp.asarray(-jnp.inf, dtype=D11.dtype)
    max_score = jnp.full(u0.shape, neg_inf, dtype=D11.dtype)
    u_best = u0
    v_best = v0

    # The reference enumerates u-major within a level and keeps the running
    # max strictly increasing; levels recenter the window at the current
    # best. The per-level window is a lax.fori_loop over the (2r+1)^2
    # offsets — unrolling all 5*(2r+1)^2 gathers (as a literal transcription
    # would) makes an XLA program whose compile time blows up; each loop
    # step still gathers the full (b, n) batch, so the device stays busy.
    n_side = 2 * radius + 1

    for d in range(dilation_max, 0, -1):  # static: levels recenter the window
        rd = radius * d

        def level_body(t, state, d=d, rd=rd):
            u0_, v0_, u_b, v_b, ms = state
            i = (t // n_side) * d
            j = (t % n_side) * d
            u = u0_ - rd + i
            v = v0_ - rd + j
            inside = (u >= 0) & (u < w) & (v >= 0) & (v < h)
            uc = jnp.clip(u, 0, w - 1)
            vc = jnp.clip(v, 0, h - 1)
            desc = jnp.take_along_axis(flat, (vc * w + uc)[..., None], axis=1)
            score = jnp.sum(desc * D21, axis=-1)
            score = jnp.where(inside, score, neg_inf)
            better = score > ms
            return (
                u0_,
                v0_,
                jnp.where(better, u, u_b),
                jnp.where(better, v, v_b),
                jnp.where(better, score, ms),
            )

        _, _, u_best, v_best, max_score = jax.lax.fori_loop(
            0, n_side * n_side, level_body, (u0, v0, u_best, v_best, max_score)
        )
        u0, v0 = u_best, v_best

    return jnp.stack([u_best, v_best], axis=-1), max_score


@partial(jax.jit, static_argnames=("radius", "dilation_max", "dtype"))
def refine_matches_shift(
    D11: jax.Array,
    D21: jax.Array,
    p1: jax.Array,
    radius: int = 3,
    dilation_max: int = 5,
    dtype=jnp.bfloat16,
    center_desc=None,
):
    """Coarse-to-fine dilated descriptor search, scatter+shift formulation.

    TPU-native re-derivation of ``refine_matches_kernel``
    (matching_kernels.cu:25-125): instead of gathering a descriptor window
    per query (fine-grained gathers run ~20x below HBM speed on TPU), each
    query's descriptor is scattered once into an image-shaped buffer at its
    current center, and every window offset becomes ONE shifted elementwise
    dot over contiguous (H, W, F) planes — pure VPU streaming. Levels
    recenter at the per-query running best exactly like the reference.

    Semantics note: queries whose current centers collide on one pixel
    cannot share a scatter slot. Every query is seeded with its true center
    score (one cheap gather), winners refine level by level exactly like the
    reference, and collision losers simply keep their running best — a
    truncated coarse-to-fine rather than a wrong answer. Scores are always
    genuine descriptor dots at genuine probe positions; colliding duplicates
    may end less refined than the reference's redundant evaluation. Exact
    behavior remains available via :func:`refine_matches_gather`.
    """
    b, h, w, f = D11.shape
    hw = h * w
    n_side = 2 * radius + 1
    qid = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (b, hw))

    u0 = p1[..., 0].astype(jnp.int32)
    v0 = p1[..., 1].astype(jnp.int32)
    neg_inf = jnp.asarray(-jnp.inf, dtype=jnp.float32)
    # seed with the center probe (the (0,0) offset of every reference
    # window) via one direct gather — collision losers keep at least this.
    # The caller may pass the pre-gathered rows (match() folds this into
    # its occlusion-check gather: 147k-row gathers cost ~2.5ms each on TPU)
    if center_desc is None:
        flat = D11.reshape(b, hw, f)
        center_desc = jnp.take_along_axis(flat, (v0 * w + u0)[..., None], axis=1)
    # seed in the compute dtype like the window probes so scores compare
    max_score = jnp.einsum(
        "bnf,bnf->bn",
        center_desc.astype(dtype),
        D21.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    u_best, v_best = u0, v0

    pad = radius * dilation_max
    hp, wp = h + 2 * pad, w + 2 * pad
    # bf16 descriptor planes by default: the reference computes these dots in
    # fp16 (matching_kernels.cu refine uses __half); halves the streamed bytes.
    D11p = jnp.pad(D11, ((0, 0), (pad, pad), (pad, pad), (0, 0))).astype(dtype)
    inside = jnp.pad(jnp.ones((1, h, w), jnp.float32), ((0, 0), (pad, pad), (pad, pad)))

    D21c = D21.astype(dtype)

    for d in range(dilation_max, 0, -1):
        rd = radius * d
        # ONE scatter per level: just the descriptor channels. Collision
        # winners are detected afterwards by comparing the gathered-back row
        # against the query's own descriptor (exact compare — the scatter
        # stores inputs bit-identically), which folds into the single
        # post-loop center gather instead of a second id scatter + gather.
        uc = jnp.clip(u_best, 0, w - 1)
        vc = jnp.clip(v_best, 0, h - 1)
        bi = jnp.arange(b)[:, None]
        Q = jnp.zeros((b, h, w, f), dtype).at[bi, vc, uc].set(D21c)

        # per-pixel best offset over the level's window: shifted dots.
        # fori_loop (dynamic_slice takes traced starts) instead of unrolling
        # the (2r+1)^2 offsets — the offsets can't fuse with each other
        # anyway, and unrolling made the HLO ~50x bigger per level (minutes
        # of compile time for zero runtime win).
        def offset_body(t, state, d=d, rd=rd):
            lvl_score, lvl_du, lvl_dv = state
            du = (t // n_side) * d - rd
            dv = (t % n_side) * d - rd
            shifted = jax.lax.dynamic_slice(
                D11p, (0, pad + dv, pad + du, 0), (b, h, w, f)
            )
            m = jax.lax.dynamic_slice(inside, (0, pad + dv, pad + du), (1, h, w))
            sc = jnp.einsum(
                "bhwf,bhwf->bhw", Q, shifted, preferred_element_type=jnp.float32
            )
            sc = jnp.where(m > 0, sc, neg_inf)
            better = sc > lvl_score
            return (
                jnp.where(better, sc, lvl_score),
                jnp.where(better, du, lvl_du),
                jnp.where(better, dv, lvl_dv),
            )

        lvl_score, lvl_du, lvl_dv = jax.lax.fori_loop(
            0, n_side * n_side, offset_body,
            (
                jnp.full((b, h, w), neg_inf, jnp.float32),
                jnp.zeros((b, h, w), jnp.int32),
                jnp.zeros((b, h, w), jnp.int32),
            ),
            unroll=n_side,  # amortize loop-step overhead; full unroll blows up compile
        )

        # ONE gather at the centers for everything: level result (score +
        # chosen offset) and the scattered descriptor row for winner check
        back = jnp.concatenate(
            [
                lvl_score[..., None],
                lvl_du.astype(jnp.float32)[..., None],
                lvl_dv.astype(jnp.float32)[..., None],
                Q.astype(jnp.float32),
            ],
            axis=-1,
        )[bi, vc, uc]  # (b, hw, 3 + f)
        sc_q = back[..., 0]
        du_q = back[..., 1].astype(jnp.int32)
        dv_q = back[..., 2].astype(jnp.int32)
        is_winner = jnp.all(back[..., 3:].astype(dtype) == D21c, axis=-1)
        # the probe coordinates are relative to the (unclamped) center,
        # mirroring the gather kernel's out-of-image masking
        u_cand = u_best + du_q
        v_cand = v_best + dv_q
        ok = (
            is_winner
            & (sc_q > max_score)
            & (u_cand >= 0) & (u_cand < w) & (v_cand >= 0) & (v_cand < h)
        )
        max_score = jnp.where(ok, sc_q, max_score)
        u_best = jnp.where(ok, u_cand, u_best)
        v_best = jnp.where(ok, v_cand, v_best)

    return jnp.stack([u_best, v_best], axis=-1), max_score


refine_matches = refine_matches_shift


def split_match_cfg(match_cfg) -> tuple:
    """(cold_cfg, warm_cfg) dicts for :func:`match` from a config mapping.

    ``dilation_max_warm`` (optional) is the refine search reach for
    WARM-STARTED frames: when the matcher is seeded with last frame's
    converged correspondences (the tracker's per-frame steady state), the LM
    projector lands within ~1px and the full coarse-to-fine pyramid
    (dilation 5..1, reach ±15px, the reference's cold-start contract at
    matching_kernels.cu:25-125) is redundant — each level costs a
    scatter+kernel+gather round (~6-8 ms at 288x512 on v5e). Cold starts
    (map init, the frame right after a keyframe switch, backend pair
    matching, reloc) always use the full ``dilation_max``. Likewise
    ``max_iter_warm`` caps the LM projector's iteration count on warm frames
    (the seeded guess is last frame's converged match; the reference always
    runs 10, matching_kernels.cu:151). 0/None/absent disables either split
    (warm == cold)."""
    cold = dict(match_cfg)
    cold.pop("seed_consecutive", None)  # backend policy knob, not a match() arg
    cold.pop("symmetric_impl", None)  # match_symmetric decode strategy knob
    warm_d = cold.pop("dilation_max_warm", None)
    warm_it = cold.pop("max_iter_warm", None)
    cold.pop("dilation_max_seed", None)  # consumed by seed_match_cfg
    warm = dict(cold)
    if warm_d:
        # -1: NO refine window on warm frames — the descriptor probe at the
        # LM-projected pixel alone gates validity (match() dilation_max==0
        # path); the probe rides the occlusion-check row gather, so the
        # whole refine stage costs one einsum. Positive: reduced pyramid.
        warm["dilation_max"] = max(0, int(warm_d))
    if warm_it:
        warm["max_iter"] = int(warm_it)
    return cold, warm


def seed_match_cfg(match_cfg) -> dict:
    """:func:`match` config for the backend's INVERSE-seeded consecutive
    match (backend.add_consecutive_half).

    The tracker's warm frames are seeded with the SAME-direction previous
    converged match (sub-pixel), so a score-only schedule
    (``dilation_max_warm: -1``) is safe there. The inverted seed is only
    approximately converged — scatter collisions keep an arbitrary winner
    and the inverse of an asymmetric match is off by its asymmetry — so a
    score-only probe lets 1-2 px errors through the gates as subtly wrong
    consecutive constraints, and even a two-level reach produced
    constraints that fought the loop closures on longer trajectories
    (16-frame loop oracle: 0.35 with edges vs 0.20 without; the full reach
    restores 0.11 — PERF.md round 4 "seeded-match reach matrix").
    ``dilation_max_seed`` (default 5 = the full cold pyramid) sets that
    reach; the warm LM iteration cap also applies when ``max_iter_warm``
    is set (when the warm split is disabled the seed config inherits the
    full cold ``max_iter``)."""
    cold, warm = split_match_cfg(match_cfg)
    seed = dict(warm)
    d = match_cfg.get("dilation_max_seed", 5)
    seed["dilation_max"] = max(0, min(int(d), int(cold.get("dilation_max", 5))))
    return seed


def _refine_dispatch(impl: str):
    """Select the refine implementation. ``fused`` runs the whole
    coarse-to-fine pyramid on device (ops/refine_fused_pallas.py) — on
    non-TPU backends it falls back to the interpreter so tests/CPU runs
    stay correct. ``auto`` (the config default) picks fused on TPU and
    shift elsewhere: equal match quality (pipeline-level agreement >0.97,
    equal mean scores), not bit-identical — contested-pixel winners and
    near-tie picks can differ (collision semantics + bf16 probe rounding;
    refine_fused_pallas.py docstring). The fused kernel won the committed
    full-bench A/B on every metric (21.66 vs 21.31 FPS, better p50/p99 —
    PERF.md round 4); the per-level kernel it replaced is deleted per the
    one-kernel rule ("pallas" aliases to fused for old configs).
    """
    on_tpu = jax.default_backend() == "tpu"
    if impl == "auto":
        impl = "fused" if on_tpu else "shift"
    if impl == "gather":
        return refine_matches_gather
    if impl in ("fused", "pallas", "pallas_tile"):
        from .refine_fused_pallas import refine_matches_fused

        return partial(refine_matches_fused, interpret=not on_tpu)
    return refine_matches_shift


def _resolve_refine_impl(refine_impl: str, h: int, w: int) -> str:
    if refine_impl in ("auto", "pallas", "pallas_tile", "fused") and (
            w % 128 or h % 8):
        # Mosaic tiling wants lane extents in 128-multiples and sublane
        # extents in 8-multiples; small/odd images (tiny harnesses) fall
        # back to the XLA shift formulation (same semantics, measured equal
        # match quality). Production 288x512 always takes the kernel.
        return "shift"
    return refine_impl


def _match_post_project(
    X11, X21, D11, D21, p1f, converged, *,
    dist_thresh, radius, dilation_max, ft_matching_threshold, refine_impl,
):
    """Everything after the LM projection: occlusion gate + refine + score
    gate (matching.py:71-92). ``p1f``: (b, hw, 2) float LM output."""
    b, h, w = X21.shape[:3]
    p1 = jnp.floor(p1f).astype(jnp.int32)  # torch .long() truncation
    valid_proj2 = converged

    # Occlusion gate: 3D distance between matched points (matching.py:71-76).
    # The refine step needs the descriptor rows at the same centers — fold
    # both lookups into ONE row gather (147k-row gathers cost ~2.5ms each
    # on TPU regardless of row width)
    X11_flat = X11.reshape(b, h * w, 3)
    lin = pixel_to_lin(p1, w)[..., None]
    center_desc = None
    if radius > 0 and (refine_impl != "gather" or dilation_max == 0):
        packed = jnp.concatenate([X11_flat, D11.reshape(b, h * w, -1)], axis=-1)
        rows = jnp.take_along_axis(packed, lin, axis=1)
        matched, center_desc = rows[..., :3], rows[..., 3:]
    else:
        matched = jnp.take_along_axis(X11_flat, lin, axis=1)
    dists2 = jnp.linalg.norm(matched - X21.reshape(b, h * w, 3), axis=-1)
    valid_proj2 = valid_proj2 & (dists2 < dist_thresh)

    if radius > 0 and dilation_max == 0:
        # score-only refine (warm-frame fast path, dilation_max_warm: -1):
        # the descriptor probe at the projected pixel — the (0,0) seed of
        # every refine variant — gates validity; no window search. The rows
        # were already gathered above, so this costs one einsum.
        scores = jnp.einsum(
            "bnf,bnf->bn",
            center_desc.astype(jnp.bfloat16),
            D21.reshape(b, h * w, -1).astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        valid_proj2 = valid_proj2 & (scores > ft_matching_threshold)
    elif radius > 0:
        kw = {} if refine_impl == "gather" else {"center_desc": center_desc}
        p1, scores = _refine_dispatch(refine_impl)(
            D11, D21.reshape(b, h * w, -1), p1, radius=radius,
            dilation_max=dilation_max, **kw
        )
        valid_proj2 = valid_proj2 & (scores > ft_matching_threshold)

    idx_1_to_2 = pixel_to_lin(p1, w)
    return idx_1_to_2, valid_proj2[..., None]


@partial(
    jax.jit,
    static_argnames=(
        "max_iter",
        "radius",
        "dilation_max",
        "refine_impl",
    ),
)
def match(
    X11: jax.Array,
    X21: jax.Array,
    D11: jax.Array,
    D21: jax.Array,
    idx_1_to_2_init=None,
    *,
    max_iter: int = 10,
    lambda_init: float = 1e-8,
    convergence_thresh: float = 1e-6,
    dist_thresh: float = 1e-1,
    radius: int = 3,
    dilation_max: int = 5,
    ft_matching_threshold: float = 0.8,
    refine_impl: str = "auto",
):
    """Full matcher as ONE program (match_iterative_proj, matching.py:52-92).

    X11/X21: (b, h, w, 3) pointmaps; D11/D21: (b, h, w, f) descriptors.
    Returns idx_1_to_2 (b, h*w) int32 and valid (b, h*w, 1) bool.

    Production host-level callers should prefer :func:`match_split`: the
    monolithic program runs the LM loop ~5x slower in-situ than the same
    ops dispatched separately (XLA virtualizes the precombined-corner
    table into every gather of the fused program; measured cold d=0:
    29.3 ms monolithic vs 7.5 ms split — PERF.md round 5). This one-jit
    form remains for in-jit callers and small shapes.
    """
    b, h, w = X21.shape[:3]
    refine_impl = _resolve_refine_impl(refine_impl, h, w)
    rays_with_grad, pts3d_norm, p_init = prep_for_iter_proj(
        X11, X21, idx_1_to_2_init
    )
    p1f, converged = iter_proj(
        rays_with_grad,
        pts3d_norm,
        p_init,
        max_iter=max_iter,
        lambda_init=lambda_init,
        cost_thresh=convergence_thresh,
    )
    return _match_post_project(
        X11, X21, D11, D21, p1f, converged,
        dist_thresh=dist_thresh, radius=radius, dilation_max=dilation_max,
        ft_matching_threshold=ft_matching_threshold, refine_impl=refine_impl,
    )


_prep_jit = jax.jit(prep_for_iter_proj)
_match_rest_jit = jax.jit(
    _match_post_project,
    static_argnames=("radius", "dilation_max", "refine_impl"),
)


def match_split(
    X11: jax.Array,
    X21: jax.Array,
    D11: jax.Array,
    D21: jax.Array,
    idx_1_to_2_init=None,
    *,
    max_iter: int = 10,
    lambda_init: float = 1e-8,
    convergence_thresh: float = 1e-6,
    dist_thresh: float = 1e-1,
    radius: int = 3,
    dilation_max: int = 5,
    ft_matching_threshold: float = 0.8,
    refine_impl: str = "auto",
):
    """The production matcher: THREE chained dispatches (prep | LM | rest),
    semantically identical to :func:`match`.

    Why not one jit: fused into one program, XLA refuses to materialize the
    21 MB precombined-corner table and instead folds its construction into
    every LM-iteration gather — per-iteration cost explodes ~5x (measured
    0.55 ms/iter isolated vs 2.8 ms/iter monolithic; cold d=0 matcher
    29.3 -> 7.5 ms as separate dispatches, scratch/r5_phantom_probe.py).
    Program boundaries force committed layouts, exactly the round-2
    model/matcher-split lesson one level down. The tracker composes the
    same pieces directly, fusing the rest stage with its bookkeeping
    (tracker._match_rest_and_post). Host-only (dispatches jits);
    in-jit callers use :func:`match`.
    """
    b, h, w = X21.shape[:3]
    refine_impl = _resolve_refine_impl(refine_impl, h, w)
    rays_with_grad, pts3d_norm, p_init = _prep_jit(X11, X21, idx_1_to_2_init)
    p1f, converged = iter_proj(
        rays_with_grad,
        pts3d_norm,
        p_init,
        max_iter=max_iter,
        lambda_init=lambda_init,
        cost_thresh=convergence_thresh,
    )
    return _match_rest_jit(
        X11, X21, D11, D21, p1f, converged,
        dist_thresh=dist_thresh, radius=radius, dilation_max=dilation_max,
        ft_matching_threshold=ft_matching_threshold, refine_impl=refine_impl,
    )
