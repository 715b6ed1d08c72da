"""Pallas TPU kernel for the dilated descriptor-correlation refine step.

Semantics: one level of ``refine_matches_kernel`` (reference
``matching_kernels.cu:25-125``) in the scatter+shift formulation of
:mod:`frodo_slam_tpu.ops.matching` — for every pixel p of a scattered
query-descriptor plane Q, score the (2r+1)^2 dilated offsets o against the
keyframe descriptor image D and return the best (score, du, dv) per pixel.

Why a kernel: the XLA shift formulation streams Q and a shifted D plane
from HBM once per offset (49 full-image reads per level, ~26 ms/frame
measured on v5e at 288x512x24). Here each Q row-tile is read once, D is
DMA'd into VMEM once per (batch, column-tile), and all offsets are
computed in-core. A single-column-tile layout variant (contiguous slab
DMA) measured e2e-neutral twice (17.28 vs 17.23 FPS r3; neutral r4) and
was deleted per the one-kernel rule; the FUSED whole-pyramid chain
(ops/refine_fused_pallas.py, `refine_impl: fused`) is the remaining
alternative — bench-neutral, isolated-faster (PERF.md round 4).

Layout (Mosaic alignment rules shape this): descriptor planes are
``(H, F, W)`` — image rows ride the LEADING (untiled) axis, where dynamic
row offsets (the dv probes) are unconstrained; channels ride the sublanes
(F padded to 32, zero channels contribute nothing to the dot); width rides
the 128-wide lanes, where static du offsets are allowed. A ``(F, H, W)``
layout fails to compile: sublane (dim -2) slice starts must be multiples
of 8, and dv probes are not.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F_PAD = 32  # descriptor channels padded to a full sublane group


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _corr_kernel(d_hbm, q_ref, score_ref, packed_ref, d_vmem, sem,
                 *, offsets, n_desc, th, tw, h, w, pad_t, halo, slab_w, wp, pad_l,
                 hp):
    """One (batch, column-tile, row-tile) grid step.

    d_hbm:  (b, hp, F_PAD, wp) ANY/HBM — zero-padded descriptor image.
    q_ref:  (1, th, F_PAD, tw) VMEM — query plane tile.
    d_vmem: (hp, F_PAD, slab_w) VMEM scratch — the column slab (tile width
            + du halo), copied in once per (batch, column-tile).
    Outputs per pixel of the tile: best f32 score, and an int32 packing of
    the seeded query's id (decoded from the base-256 digit channels
    ``n_desc..n_desc+2`` of the query plane) with the best (du, dv):
    ``qid * 4096 + (dv + 32) * 64 + (du + 32)`` — one plane instead of
    four, so the caller's per-level center gather reads 2 planes, not 6.
    """
    bi = pl.program_id(0)
    j = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        lane0 = j * tw + pad_l - halo
        cp = pltpu.make_async_copy(
            d_hbm.at[bi, :, :, pl.ds(lane0, slab_w)], d_vmem, sem
        )
        cp.start()
        cp.wait()

    q = q_ref[0].astype(jnp.float32)  # (th, F_PAD, tw)
    row0 = i * th

    ys = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + row0
    xs = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + j * tw

    neg = jnp.float32(-3.0e38)
    radius, dilation, dus = offsets

    # loop over the (2r+1) row offsets (dv) — a fori_loop, NOT an unroll:
    # 49 fully-unrolled probes kept too many (th, F, tw) loads live and
    # overflowed the VMEM stack. Dynamic dv is fine: image rows ride the
    # leading (untiled) axis. The (2r+1) lane offsets (du) unroll inside.
    def dv_body(t, state):
        best_s, best_du, best_dv = state
        dv = (t - radius) * dilation
        rows = d_vmem[pl.ds(pad_t + row0 + dv, th), :, :]  # (th, F, slab_w)
        row_ok = (ys + dv >= 0) & (ys + dv < h)
        for du in dus:  # static lane offsets
            probe = rows[:, :, halo + du : halo + du + tw]
            s = jnp.sum(q * probe.astype(jnp.float32), axis=1)  # (th, tw)
            inside = row_ok & (xs + du >= 0) & (xs + du < w)
            s = jnp.where(inside, s, neg)
            better = s > best_s
            best_s = jnp.where(better, s, best_s)
            best_du = jnp.where(better, du, best_du)
            best_dv = jnp.where(better, dv, best_dv)
        return best_s, best_du, best_dv

    best_s, best_du, best_dv = jax.lax.fori_loop(
        0, 2 * radius + 1, dv_body,
        (
            jnp.full((th, tw), neg, jnp.float32),
            jnp.zeros((th, tw), jnp.int32),
            jnp.zeros((th, tw), jnp.int32),
        ),
    )

    # seeded query id from the digit channels (exact small ints in bf16)
    qid = (
        q[:, n_desc, :].astype(jnp.int32)
        + 256 * q[:, n_desc + 1, :].astype(jnp.int32)
        + 65536 * q[:, n_desc + 2, :].astype(jnp.int32)
    )
    score_ref[0] = best_s
    packed_ref[0] = qid * 4096 + (best_dv + 32) * 64 + (best_du + 32)


@partial(jax.jit, static_argnames=("radius", "dilation", "n_desc", "interpret"))
def corr_level(Q: jax.Array, Dp: jax.Array, *, radius: int, dilation: int,
               n_desc: int, interpret: bool = False):
    """Best dilated-window offset per pixel for one refine level.

    Q:  (b, h, F_PAD, w) scattered query plane (zeros off-center); channels
        ``n_desc..n_desc+2`` carry the seeded query id as base-256 digits.
    Dp: (b, hp, F_PAD, wp) zero-padded descriptor image, pads from
        :func:`corr_pads`.
    Returns (score (b,h,w) f32, packed (b,h,w) i32) — packed as in
    :func:`_corr_kernel`.
    """
    b, h, f, w = Q.shape
    assert f == F_PAD
    hp, wp = Dp.shape[1], Dp.shape[3]
    pad_t = (hp - h) // 2
    pad_l = (wp - w) // 2
    rd = radius * dilation
    assert pad_t >= rd and pad_l >= rd, (pad_t, pad_l, rd)

    th = 32 if h % 32 == 0 else (16 if h % 16 == 0 else 8)
    tw = 256 if w % 256 == 0 and w > 256 else w
    assert h % th == 0 and w % tw == 0, (h, w, th, tw)
    if w // tw == 1:
        # single column tile: the slab is the whole padded width (a lane
        # multiple of 128 by construction; DMA lane slices must be)
        halo, slab_w = pad_l, wp
    else:
        # pad_l is 128-aligned-compatible: slab starts at j*tw exactly
        halo = pad_l
        slab_w = tw + 2 * halo
        assert slab_w % 128 == 0 and tw % 128 == 0, (tw, halo)
    assert halo >= rd, (halo, rd)
    offsets = (radius, dilation,
               tuple(du * dilation for du in range(-radius, radius + 1)))

    kern = partial(
        _corr_kernel, offsets=offsets, n_desc=n_desc, th=th, tw=tw, h=h, w=w,
        pad_t=pad_t, halo=halo, slab_w=slab_w, wp=wp, pad_l=pad_l, hp=hp,
    )
    grid = (b, w // tw, h // th)  # row tiles innermost: one D slab per column
    out_spec = pl.BlockSpec((1, th, tw), lambda bi, j, i: (bi, i, j))
    score, packed = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, th, F_PAD, tw), lambda bi, j, i: (bi, i, 0, j)),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hp, F_PAD, slab_w), Dp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(Dp, Q)
    return score, packed


def corr_pads(h: int, w: int, rd_max: int):
    """(pad_t, pad_l, hp, wp) for the padded descriptor image: pads cover
    the maximum probe reach plus the lane halo, W a multiple of 128."""
    halo_max = _round_up(rd_max, 16)
    hp = h + 2 * _round_up(rd_max, 8)
    wp = _round_up(w + 2 * halo_max, 128)
    pad_t = (hp - h) // 2
    pad_l = (wp - w) // 2
    return pad_t, pad_l, hp, wp


@partial(jax.jit, static_argnames=("radius", "dilation_max", "dtype", "interpret"))
def refine_matches_pallas(
    D11: jax.Array,
    D21: jax.Array,
    p1: jax.Array,
    radius: int = 3,
    dilation_max: int = 5,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    center_desc=None,
):
    """Coarse-to-fine dilated descriptor search, Pallas correlation kernel.

    Same contract and scatter semantics as
    :func:`frodo_slam_tpu.ops.matching.refine_matches_shift` (the spec is
    ``matching_kernels.cu:25-125``): levels recenter at the per-query best;
    colliding queries keep their seeded center score. Collision winners are
    identified exactly via a query-id plane scattered alongside the
    descriptors (an int32 id bitcast into two extra bf16 channels rides the
    SAME scatter, so winner selection is consistent by construction).

    D11: (b, h, w, f) keyframe descriptor image (channel-last, as decoded).
    D21: (b, n, f) query descriptors, n == h*w.
    p1:  (b, n, 2) int initial centers.
    Returns p1_new (b, n, 2) int32, max_scores (b, n) f32.
    """
    b, h, w, f = D11.shape
    hw = h * w
    assert f + 3 <= F_PAD, f

    u0 = p1[..., 0].astype(jnp.int32)
    v0 = p1[..., 1].astype(jnp.int32)
    if center_desc is None:
        flat = D11.reshape(b, hw, f)
        center_desc = jnp.take_along_axis(flat, (v0 * w + u0)[..., None], axis=1)
    max_score = jnp.einsum(
        "bnf,bnf->bn", center_desc.astype(dtype), D21.astype(dtype),
        preferred_element_type=jnp.float32,
    )
    u_best, v_best = u0, v0

    # padded channel-sublane descriptor image, built once for all levels
    rd_max = radius * dilation_max
    pad_t, pad_l, hp, wp = corr_pads(h, w, rd_max)
    Dcs = jnp.transpose(D11.astype(dtype), (0, 1, 3, 2))  # (b, h, f, w)
    Dp = jnp.pad(
        Dcs,
        (
            (0, 0),
            (pad_t, hp - h - pad_t),
            (0, F_PAD - f),
            (pad_l, wp - w - pad_l),
        ),
    )

    # query descriptors + packed query id. The id rides as THREE base-256
    # digit channels (values 0..255, exactly representable in bf16): a
    # bitcast encoding is NOT safe here — TPU XLA canonicalizes bf16 NaN
    # bit patterns during data movement (scatter/transpose/select), which
    # silently corrupted ids whose low half looked like a NaN.
    D21c = D21.astype(dtype)
    qid = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (b, hw))
    qid3 = jnp.stack(
        [qid % 256, (qid // 256) % 256, qid // 65536], axis=-1
    ).astype(dtype)  # (b, hw, 3), every digit exact in bf16
    pad_q = jnp.zeros((b, hw, F_PAD - f - 3), dtype)
    payload = jnp.concatenate([D21c, qid3, pad_q], axis=-1)  # (b, hw, F_PAD)
    bi = jnp.arange(b)[:, None]

    for d in range(dilation_max, 0, -1):
        uc = jnp.clip(u_best, 0, w - 1)
        vc = jnp.clip(v_best, 0, h - 1)
        # ONE scatter per level: desc + qid ride together, so the collision
        # winner is whichever row the scatter kept — no second pass needed.
        # The qid digit channels hit D's zero pad channels in the dot and
        # contribute exactly 0.
        Qcl = jnp.zeros((b, h, w, F_PAD), dtype).at[bi, vc, uc].set(payload)
        Qcs = jnp.transpose(Qcl, (0, 1, 3, 2))  # (b, h, F_PAD, w)

        score, packed = corr_level(
            Qcs, Dp, radius=radius, dilation=d, n_desc=f, interpret=interpret
        )

        # one small gather at the centers: the kernel already packed
        # (winning qid, du, dv) into one int32 plane; ride the f32 score
        # bit-pattern alongside it (int32 moves carry no NaN
        # canonicalization hazard; scores are finite by construction)
        planes = jnp.stack(
            [packed, jax.lax.bitcast_convert_type(score, jnp.int32)], axis=-1
        ).reshape(b, hw, 2)
        back = jnp.take_along_axis(
            planes, (vc * w + uc)[..., None], axis=1
        )  # (b, hw, 2)
        pk_q = back[..., 0]
        sc_q = jax.lax.bitcast_convert_type(back[..., 1], jnp.float32)
        du_q = pk_q % 64 - 32
        dv_q = (pk_q // 64) % 64 - 32
        qid_back = pk_q // 4096
        is_winner = qid_back == qid

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
