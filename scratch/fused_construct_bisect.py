"""Find WHICH construct in the relocate/replant kernels crashes the Mosaic
compiler: pl.when-guarded DMA, the pull fori-loop, or the lane-concat
full-block store. Four stripped kernel variants, compiled one by one.

Usage: python scratch/fused_construct_bisect.py
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F_PAD, LANE_PAD = 32, 128
b, h, w, f = 1, 288, 512, 24
radius, dilation = 3, 5
rd = radius * dilation
th = 16
pad_v = 16
hp = h + 2 * pad_v
wlh = w + 2 * LANE_PAD
slab_h = th + 2 * rd
dus = tuple(du * dilation for du in range(-radius, radius + 1))

rng = np.random.default_rng(0)
Qp = jnp.asarray(rng.normal(size=(b, hp, F_PAD, wlh)), jnp.bfloat16)
grid = (b, hp // th)
block = pl.BlockSpec((1, th, F_PAD, wlh), lambda bi, i: (bi, i, 0, 0))


def call(kern):
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=block, out_shape=jax.ShapeDtypeStruct(Qp.shape, Qp.dtype),
        scratch_shapes=[pltpu.VMEM((slab_h, F_PAD, wlh), Qp.dtype),
                        pltpu.SemaphoreType.DMA],
    )(Qp)


def try_one(name, kern):
    try:
        call(kern).block_until_ready()
        print(f"{name}: OK")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:160]}")


def v1_when_dma(q_hbm, qn_ref, q_vmem, sem):
    """pl.when + DMA + plain store (no loop, no concat)."""
    bi, i = pl.program_id(0), pl.program_id(1)
    interior = (i * th >= pad_v) & ((i + 1) * th <= pad_v + h)

    @pl.when(jnp.logical_not(interior))
    def _():
        qn_ref[0] = jnp.zeros_like(qn_ref[0])

    @pl.when(interior)
    def _():
        cp = pltpu.make_async_copy(q_hbm.at[bi, pl.ds(i * th - rd, slab_h)],
                                   q_vmem, sem)
        cp.start()
        cp.wait()
        qn_ref[0] = q_vmem[pl.ds(rd, th), :, :]


def v2_concat_store(q_hbm, qn_ref, q_vmem, sem):
    """v1 + lane-concat store."""
    bi, i = pl.program_id(0), pl.program_id(1)
    interior = (i * th >= pad_v) & ((i + 1) * th <= pad_v + h)

    @pl.when(jnp.logical_not(interior))
    def _():
        qn_ref[0] = jnp.zeros_like(qn_ref[0])

    @pl.when(interior)
    def _():
        cp = pltpu.make_async_copy(q_hbm.at[bi, pl.ds(i * th - rd, slab_h)],
                                   q_vmem, sem)
        cp.start()
        cp.wait()
        mid = q_vmem[pl.ds(rd, th), :, LANE_PAD:LANE_PAD + w]
        zl = jnp.zeros((th, F_PAD, LANE_PAD), mid.dtype)
        qn_ref[0] = jnp.concatenate([zl, mid, zl], axis=2)


def v3_pull_loop(q_hbm, qn_ref, q_vmem, sem):
    """v1 + the 49-probe pull fori-loop, plain (uncat) store."""
    bi, i = pl.program_id(0), pl.program_id(1)
    interior = (i * th >= pad_v) & ((i + 1) * th <= pad_v + h)

    @pl.when(jnp.logical_not(interior))
    def _():
        qn_ref[0] = jnp.zeros_like(qn_ref[0])

    @pl.when(interior)
    def _():
        cp = pltpu.make_async_copy(q_hbm.at[bi, pl.ds(i * th - rd, slab_h)],
                                   q_vmem, sem)
        cp.start()
        cp.wait()

        def dv_body(t, state):
            acc, widx = state
            dv = (t - radius) * dilation
            rows = q_vmem[pl.ds(rd - dv, th), :, :]
            for j, du in enumerate(dus):
                src = rows[:, :, LANE_PAD - du:LANE_PAD - du + w]
                ok = (
                    (src[:, f + 3, :] > 0.5)
                    & (src[:, f + 4, :] == du)
                    & (src[:, f + 5, :] == dv)
                    & (widx < 0)
                )
                acc = jnp.where(ok[:, None, :], src, acc)
                widx = jnp.where(ok, t * 7 + j, widx)
            return acc, widx

        acc, widx = jax.lax.fori_loop(
            0, 7, dv_body,
            (jnp.zeros((th, F_PAD, w), q_vmem.dtype),
             jnp.full((th, w), -1, jnp.int32)),
        )
        qn_ref[0, :, :, pl.ds(LANE_PAD, w)] = acc


def v4_no_when(q_hbm, qn_ref, q_vmem, sem):
    """v3's loop WITHOUT pl.when (clamped DMA), concat store."""
    bi, i = pl.program_id(0), pl.program_id(1)
    start = jnp.clip(i * th - rd, 0, hp - slab_h)
    cp = pltpu.make_async_copy(q_hbm.at[bi, pl.ds(start, slab_h)],
                               q_vmem, sem)
    cp.start()
    cp.wait()

    def dv_body(t, state):
        acc, widx = state
        dv = (t - radius) * dilation
        rows = q_vmem[pl.ds(rd - dv, th), :, :]
        for j, du in enumerate(dus):
            src = rows[:, :, LANE_PAD - du:LANE_PAD - du + w]
            ok = (
                (src[:, f + 3, :] > 0.5)
                & (src[:, f + 4, :] == du)
                & (src[:, f + 5, :] == dv)
                & (widx < 0)
            )
            acc = jnp.where(ok[:, None, :], src, acc)
            widx = jnp.where(ok, t * 7 + j, widx)
        return acc, widx

    acc, widx = jax.lax.fori_loop(
        0, 7, dv_body,
        (jnp.zeros((th, F_PAD, w), q_vmem.dtype),
         jnp.full((th, w), -1, jnp.int32)),
    )
    zl = jnp.zeros((th, F_PAD, LANE_PAD), acc.dtype)
    qn_ref[0] = jnp.concatenate([zl, acc, zl], axis=2)


def v5_widx_only(q_hbm, qn_ref, q_vmem, sem):
    """pull loop carrying ONLY the small (th, w) widx (like corr)."""
    bi, i = pl.program_id(0), pl.program_id(1)
    start = jnp.clip(i * th - rd, 0, hp - slab_h)
    cp = pltpu.make_async_copy(q_hbm.at[bi, pl.ds(start, slab_h)],
                               q_vmem, sem)
    cp.start()
    cp.wait()

    def dv_body(t, widx):
        dv = (t - radius) * dilation
        rows = q_vmem[pl.ds(rd - dv, th), :, :]
        for j, du in enumerate(dus):
            src = rows[:, :, LANE_PAD - du:LANE_PAD - du + w]
            ok = (
                (src[:, f + 3, :] > 0.5)
                & (src[:, f + 4, :] == du)
                & (src[:, f + 5, :] == dv)
                & (widx < 0)
            )
            widx = jnp.where(ok, t * 7 + j, widx)
        return widx

    widx = jax.lax.fori_loop(0, 7, dv_body, jnp.full((th, w), -1, jnp.int32))
    qn_ref[0, :, :, pl.ds(LANE_PAD, w)] = jnp.broadcast_to(
        widx.astype(qn_ref.dtype)[:, None, :], (th, F_PAD, w))


def v6_acc_only(q_hbm, qn_ref, q_vmem, sem):
    """pull loop carrying ONLY the big (th, F, w) payload select."""
    bi, i = pl.program_id(0), pl.program_id(1)
    start = jnp.clip(i * th - rd, 0, hp - slab_h)
    cp = pltpu.make_async_copy(q_hbm.at[bi, pl.ds(start, slab_h)],
                               q_vmem, sem)
    cp.start()
    cp.wait()

    def dv_body(t, acc):
        dv = (t - radius) * dilation
        rows = q_vmem[pl.ds(rd - dv, th), :, :]
        for j, du in enumerate(dus):
            src = rows[:, :, LANE_PAD - du:LANE_PAD - du + w]
            ok = (src[:, f + 3, :] > 0.5) & (src[:, f + 4, :] == du)
            acc = jnp.where(ok[:, None, :], src, acc)
        return acc

    acc = jax.lax.fori_loop(
        0, 7, dv_body, jnp.zeros((th, F_PAD, w), q_vmem.dtype))
    qn_ref[0, :, :, pl.ds(LANE_PAD, w)] = acc


def v7_acc_unrolled(q_hbm, qn_ref, q_vmem, sem):
    """big payload select with the dv loop fully unrolled (no fori)."""
    bi, i = pl.program_id(0), pl.program_id(1)
    start = jnp.clip(i * th - rd, 0, hp - slab_h)
    cp = pltpu.make_async_copy(q_hbm.at[bi, pl.ds(start, slab_h)],
                               q_vmem, sem)
    cp.start()
    cp.wait()

    acc = jnp.zeros((th, F_PAD, w), q_vmem.dtype)
    widx = jnp.full((th, w), -1, jnp.int32)
    for t in range(7):
        dv = (t - radius) * dilation
        rows = q_vmem[pl.ds(rd - dv, th), :, :]
        for j, du in enumerate(dus):
            src = rows[:, :, LANE_PAD - du:LANE_PAD - du + w]
            ok = (
                (src[:, f + 3, :] > 0.5)
                & (src[:, f + 4, :] == du)
                & (src[:, f + 5, :] == dv)
                & (widx < 0)
            )
            acc = jnp.where(ok[:, None, :], src, acc)
            widx = jnp.where(ok, t * 7 + j, widx)
    qn_ref[0, :, :, pl.ds(LANE_PAD, w)] = acc


def v8_sublane_extract(q_hbm, qn_ref, q_vmem, sem):
    """v2 + ONE sublane extraction + 2-D compare + 3-D select."""
    bi, i = pl.program_id(0), pl.program_id(1)
    start = jnp.clip(i * th - rd, 0, hp - slab_h)
    cp = pltpu.make_async_copy(q_hbm.at[bi, pl.ds(start, slab_h)],
                               q_vmem, sem)
    cp.start()
    cp.wait()
    mid = q_vmem[pl.ds(rd, th), :, LANE_PAD:LANE_PAD + w]
    ok = mid[:, f + 3, :] > 0.5
    sel = jnp.where(ok[:, None, :], mid, jnp.zeros_like(mid))
    zl = jnp.zeros((th, F_PAD, LANE_PAD), mid.dtype)
    qn_ref[0] = jnp.concatenate([zl, sel, zl], axis=2)


def v9_bf16_int_cmp(q_hbm, qn_ref, q_vmem, sem):
    """v8 with a bf16 == python-int comparison."""
    bi, i = pl.program_id(0), pl.program_id(1)
    start = jnp.clip(i * th - rd, 0, hp - slab_h)
    cp = pltpu.make_async_copy(q_hbm.at[bi, pl.ds(start, slab_h)],
                               q_vmem, sem)
    cp.start()
    cp.wait()
    mid = q_vmem[pl.ds(rd, th), :, LANE_PAD:LANE_PAD + w]
    ok = (mid[:, f + 3, :] > 0.5) & (mid[:, f + 4, :] == 5)
    sel = jnp.where(ok[:, None, :], mid, jnp.zeros_like(mid))
    zl = jnp.zeros((th, F_PAD, LANE_PAD), mid.dtype)
    qn_ref[0] = jnp.concatenate([zl, sel, zl], axis=2)


def v10_offcenter_slice(q_hbm, qn_ref, q_vmem, sem):
    """v8 but sliced at an UNALIGNED lane offset (LANE_PAD - 5)."""
    bi, i = pl.program_id(0), pl.program_id(1)
    start = jnp.clip(i * th - rd, 0, hp - slab_h)
    cp = pltpu.make_async_copy(q_hbm.at[bi, pl.ds(start, slab_h)],
                               q_vmem, sem)
    cp.start()
    cp.wait()
    mid = q_vmem[pl.ds(rd, th), :, LANE_PAD - 5:LANE_PAD - 5 + w]
    ok = mid[:, f + 3, :] > 0.5
    sel = jnp.where(ok[:, None, :], mid, jnp.zeros_like(mid))
    zl = jnp.zeros((th, F_PAD, LANE_PAD), mid.dtype)
    qn_ref[0] = jnp.concatenate([zl, sel, zl], axis=2)


def v11_extract_no_select(q_hbm, qn_ref, q_vmem, sem):
    """sublane extract used only in 2-D math (no 3-D broadcast select)."""
    bi, i = pl.program_id(0), pl.program_id(1)
    start = jnp.clip(i * th - rd, 0, hp - slab_h)
    cp = pltpu.make_async_copy(q_hbm.at[bi, pl.ds(start, slab_h)],
                               q_vmem, sem)
    cp.start()
    cp.wait()
    mid = q_vmem[pl.ds(rd, th), :, LANE_PAD:LANE_PAD + w]
    ok = (mid[:, f + 3, :] > 0.5).astype(mid.dtype)  # (th, w)
    sel = mid + jnp.zeros_like(mid)
    zl = jnp.zeros((th, F_PAD, LANE_PAD), mid.dtype)
    out = jnp.concatenate([zl, sel, zl], axis=2)
    # consume ok in a 2-D way so it is not dead code
    qn_ref[0] = out * jnp.max(ok)


def v12_select_no_extract(q_hbm, qn_ref, q_vmem, sem):
    """3-D broadcast select WITHOUT a sublane extraction (mask from a
    sublane reduction)."""
    bi, i = pl.program_id(0), pl.program_id(1)
    start = jnp.clip(i * th - rd, 0, hp - slab_h)
    cp = pltpu.make_async_copy(q_hbm.at[bi, pl.ds(start, slab_h)],
                               q_vmem, sem)
    cp.start()
    cp.wait()
    mid = q_vmem[pl.ds(rd, th), :, LANE_PAD:LANE_PAD + w]
    ok = jnp.sum(mid.astype(jnp.float32), axis=1) > 0.0  # (th, w)
    sel = jnp.where(ok[:, None, :], mid, jnp.zeros_like(mid))
    zl = jnp.zeros((th, F_PAD, LANE_PAD), mid.dtype)
    qn_ref[0] = jnp.concatenate([zl, sel, zl], axis=2)


def v13_extract_f32(q_hbm, qn_ref, q_vmem, sem):
    """v8 with the block cast to f32 BEFORE the sublane extraction."""
    bi, i = pl.program_id(0), pl.program_id(1)
    start = jnp.clip(i * th - rd, 0, hp - slab_h)
    cp = pltpu.make_async_copy(q_hbm.at[bi, pl.ds(start, slab_h)],
                               q_vmem, sem)
    cp.start()
    cp.wait()
    mid = q_vmem[pl.ds(rd, th), :, LANE_PAD:LANE_PAD + w]
    mid32 = mid.astype(jnp.float32)
    ok = (mid32[:, f + 3, :] > 0.5) & (mid32[:, f + 4, :] == 5.0)
    sel = jnp.where(ok[:, None, :], mid, jnp.zeros_like(mid))
    zl = jnp.zeros((th, F_PAD, LANE_PAD), mid.dtype)
    qn_ref[0] = jnp.concatenate([zl, sel, zl], axis=2)


for name, kern in (("v13_extract_f32", v13_extract_f32),):
    try_one(name, kern)
