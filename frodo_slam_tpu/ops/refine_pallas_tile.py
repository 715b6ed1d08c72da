"""Pallas refine kernel, SINGLE-COLUMN-TILE layout — the A/B candidate.

Identical semantics to :mod:`refine_pallas` (one level of the reference's
``refine_matches_kernel``, matching_kernels.cu:25-125), different data
layout: ONE column tile per image with pre-sliced descriptor slabs
(``build_slabs``), so every per-tile Q/D fetch is one CONTIGUOUS DMA.
Microbench evidence (PERF.md round 2): the multi-tile kernel was entirely
DMA-bound on lane-strided sub-KB fetches (~2.5 ms/level independent of the
probe count); this layout removes those. The full-bench TPU A/B was cut
short by the wedged tunnel, so BOTH variants ship: select with
``matching.refine_impl: pallas_tile`` vs ``pallas``; delete the loser once
the A/B lands (scratch/refine_single_tile.patch is retired by this file).
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
                 *, offsets, n_desc, th, tw, h, w, pad_t, halo, slab_w):
    """One (batch, column-tile, row-tile) grid step.

    d_hbm:  (b, nct, hp, F_PAD, slab_w) ANY/HBM — PRE-SLICED column slabs
            (build_slabs): the per-tile copy is then ONE contiguous DMA.
            Slicing the slab out of the padded image in-kernel (a
            lane-strided 4-D copy) broke the transfer into ~10k sub-KB
            runs and cost ~2.4 ms/level — the whole kernel was DMA-bound
            (probe count didn't move the time at all).
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
        cp = pltpu.make_async_copy(d_hbm.at[bi, j], d_vmem, sem)
        cp.start()
        cp.wait()

    # q_ref carries the FULL image width: a (1, th, F_PAD, tw) block of the
    # (b, h, F_PAD, w) plane is a lane-strided fetch of th*F_PAD sub-KB
    # runs, and that strided DMA — not compute — was the whole kernel's
    # floor (~2.5 ms/level, independent of probe count). The full-width
    # row-tile block is ONE contiguous run; the column tile is cut here in
    # VMEM at a 128-aligned lane offset (free).
    lane0 = pl.multiple_of(j * tw, 128)
    q = q_ref[0, :, :, pl.ds(lane0, tw)].astype(jnp.float32)  # (th, F_PAD, tw)
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


def _tile_geometry(h: int, w: int, wp: int):
    """(th, tw, halo, slab_w): row/column tile sizes and the du halo. The
    halo is the full left pad so the slab geometry is level-independent —
    every refine level shares one pre-sliced slab array."""
    pad_l = (wp - w) // 2
    # ONE column tile: the slab is the whole padded width, so build_slabs
    # is an identity slice (free) and every Q/D fetch is contiguous
    # (column-tiled Q blocks were lane-strided fetches of sub-KB runs). At
    # 288x512 the slab is (320, 32, 640) bf16 = 13.1 MB of the 16 MB VMEM;
    # th = 16 keeps the Q blocks + f32 probe temps inside the remainder
    # (th = 32 overflowed the scoped-vmem limit by 0.6 MB).
    th = 16 if h % 16 == 0 else 8
    tw = w
    halo, slab_w = pad_l, wp
    return th, tw, halo, slab_w


@partial(jax.jit, static_argnames=("h", "w"))
def build_slabs(Dp: jax.Array, *, h: int, w: int) -> jax.Array:
    """Pre-slice the padded descriptor image into per-column-tile slabs
    (b, nct, hp, F_PAD, slab_w) so the kernel's per-tile fetch is one
    CONTIGUOUS DMA (see _corr_kernel docstring). XLA's strided slice copies
    run at full HBM bandwidth; built once per refine call, shared by all
    levels (the halo covers the maximum probe reach)."""
    b, hp, f, wp = Dp.shape
    th, tw, halo, slab_w = _tile_geometry(h, w, wp)
    nct = w // tw
    pad_l = (wp - w) // 2
    slabs = [
        jax.lax.dynamic_slice_in_dim(Dp, j * tw + pad_l - halo, slab_w, axis=3)
        for j in range(nct)
    ]
    return jnp.stack(slabs, axis=1)  # (b, nct, hp, F_PAD, slab_w)


@partial(jax.jit, static_argnames=("radius", "dilation", "n_desc", "h", "w",
                                   "interpret"))
def corr_level(Q: jax.Array, Dslabs: jax.Array, *, radius: int, dilation: int,
               n_desc: int, h: int, w: int, interpret: bool = False):
    """Best dilated-window offset per pixel for one refine level.

    Q:  (b, h, F_PAD, w) scattered query plane (zeros off-center); channels
        ``n_desc..n_desc+2`` carry the seeded query id as base-256 digits.
    Dslabs: (b, nct, hp, F_PAD, slab_w) pre-sliced slabs from
        :func:`build_slabs_hw` of the zero-padded descriptor image
        (pads from :func:`corr_pads`).
    Returns (score (b,h,w) f32, packed (b,h,w) i32) — packed as in
    :func:`_corr_kernel`.
    """
    b, hq, f, wq = Q.shape
    assert f == F_PAD and (hq, wq) == (h, w)
    _, nct, hp, _, slab_w = Dslabs.shape
    pad_t = (hp - h) // 2
    tw = w // nct
    halo = (slab_w - tw) // 2
    th = _tile_geometry(h, w, slab_w)[0]  # must match build_slabs
    rd = radius * dilation
    assert pad_t >= rd and halo >= rd, (pad_t, halo, rd)
    offsets = (radius, dilation,
               tuple(du * dilation for du in range(-radius, radius + 1)))

    kern = partial(
        _corr_kernel, offsets=offsets, n_desc=n_desc, th=th, tw=tw, h=h, w=w,
        pad_t=pad_t, halo=halo, slab_w=slab_w,
    )
    grid = (b, nct, h // th)  # row tiles innermost: one D slab per column
    out_spec = pl.BlockSpec((1, th, tw), lambda bi, j, i: (bi, i, j))
    score, packed = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            # full-width row tile, j ignored: contiguous fetch (see kernel)
            pl.BlockSpec((1, th, F_PAD, w), lambda bi, j, i: (bi, i, 0, 0)),
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hp, F_PAD, slab_w), Dslabs.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(Dslabs, Q)
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
    Dslabs = build_slabs(Dp, h=h, w=w)  # once; all levels share it

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
            Qcs, Dslabs, radius=radius, dilation=d, n_desc=f, h=h, w=w,
            interpret=interpret,
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
