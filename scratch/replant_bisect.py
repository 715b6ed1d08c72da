"""Bisect the replant kernel's remaining Mosaic crash: ghost path, won
loop, or the dual-output structure.

Usage: python scratch/replant_bisect.py
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
n_side = 2 * radius + 1

rng = np.random.default_rng(0)
Qp = jnp.asarray(rng.normal(size=(b, hp, F_PAD, wlh)), jnp.bfloat16)
grid = (b, hp // th)
block = pl.BlockSpec((1, th, F_PAD, wlh), lambda bi, i: (bi, i, 0, 0))


def try_one(name, kern, n_in, n_out):
    try:
        out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [block] * (n_in - 1),
            out_specs=[block] * n_out if n_out > 1 else block,
            out_shape=([jax.ShapeDtypeStruct(Qp.shape, Qp.dtype)] * n_out
                       if n_out > 1 else jax.ShapeDtypeStruct(Qp.shape, Qp.dtype)),
            scratch_shapes=[pltpu.VMEM((slab_h, F_PAD, wlh), Qp.dtype),
                            pltpu.SemaphoreType.DMA],
        )(*([Qp] * n_in))
        jax.tree.leaves(out)[0].block_until_ready()
        print(f"{name}: OK")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:160]}")


def _common(qn_hbm, q_vmem, sem, i, bi):
    cp = pltpu.make_async_copy(
        qn_hbm.at[bi, pl.ds(jnp.clip(i * th - rd, 0, hp - slab_h), slab_h)],
        q_vmem, sem)
    cp.start()
    cp.wait()


def _won(q_vmem, own32):
    odu = own32[:, f + 4, :]
    odv = own32[:, f + 5, :]
    won = jnp.zeros((th, w), jnp.bool_)
    for t in range(n_side):
        dv = (t - radius) * dilation
        rows_t = q_vmem[pl.ds(rd + dv, th), :, :]
        wrow = rows_t.astype(jnp.float32)[:, f + 6, :]
        for j, du in enumerate(dus):
            wch = wrow[:, LANE_PAD + du : LANE_PAD + du + w]
            won = won | ((odu == du) & (odv == dv) & (wch == t * n_side + j))
    return won


def r1_single_out(qn_hbm, qa_ref, qf_ref, q_vmem, sem):
    """full replant logic, ONE output (no ghost)."""
    bi, i = pl.program_id(0), pl.program_id(1)
    interior = (i * th >= pad_v) & ((i + 1) * th <= pad_v + h)

    @pl.when(jnp.logical_not(interior))
    def _():
        qf_ref[0] = jnp.zeros_like(qf_ref[0])

    @pl.when(interior)
    def _():
        _common(qn_hbm, q_vmem, sem, i, bi)
        own = qa_ref[0, :, :, pl.ds(LANE_PAD, w)]
        own32 = own.astype(jnp.float32)
        won = _won(q_vmem, own32)
        center = q_vmem[pl.ds(rd, th), :, pl.ds(LANE_PAD, w)]
        occupied = center.astype(jnp.float32)[:, f + 3, :] > 0.5
        own_valid = own32[:, f + 3, :] > 0.5
        replant = own_valid & jnp.logical_not(won) & jnp.logical_not(occupied)
        zl = jnp.zeros((th, F_PAD, LANE_PAD), own.dtype)
        qf_ref[0] = jnp.concatenate(
            [zl, jnp.where(replant[:, None, :], own, center), zl], axis=2)


def r2_dual_out_trivial(qn_hbm, qa_ref, ghost_ref, qf_ref, gout_ref, q_vmem, sem):
    """dual outputs + ghost passthrough, trivial logic (no won loop)."""
    bi, i = pl.program_id(0), pl.program_id(1)
    interior = (i * th >= pad_v) & ((i + 1) * th <= pad_v + h)

    @pl.when(jnp.logical_not(interior))
    def _():
        qf_ref[0] = jnp.zeros_like(qf_ref[0])
        gout_ref[0] = jnp.zeros_like(gout_ref[0])

    @pl.when(interior)
    def _():
        _common(qn_hbm, q_vmem, sem, i, bi)
        own = qa_ref[0, :, :, pl.ds(LANE_PAD, w)]
        center = q_vmem[pl.ds(rd, th), :, pl.ds(LANE_PAD, w)]
        occupied = center.astype(jnp.float32)[:, f + 3, :] > 0.5
        zl = jnp.zeros((th, F_PAD, LANE_PAD), own.dtype)
        qf_ref[0] = jnp.concatenate(
            [zl, jnp.where(occupied[:, None, :], own, center), zl], axis=2)
        gout_ref[0] = jnp.concatenate(
            [zl,
             jnp.where(occupied[:, None, :], own,
                       ghost_ref[0, :, :, pl.ds(LANE_PAD, w)]),
             zl], axis=2)


def r3_ref_sublane_read(qn_hbm, qa_ref, qf_ref, q_vmem, sem):
    """won loop reading the widx channel via a REF sublane index."""
    bi, i = pl.program_id(0), pl.program_id(1)
    interior = (i * th >= pad_v) & ((i + 1) * th <= pad_v + h)

    @pl.when(jnp.logical_not(interior))
    def _():
        qf_ref[0] = jnp.zeros_like(qf_ref[0])

    @pl.when(interior)
    def _():
        _common(qn_hbm, q_vmem, sem, i, bi)
        own = qa_ref[0, :, :, pl.ds(LANE_PAD, w)]
        own32 = own.astype(jnp.float32)
        odu = own32[:, f + 4, :]
        odv = own32[:, f + 5, :]
        won = jnp.zeros((th, w), jnp.bool_)
        for t in range(n_side):
            dv = (t - radius) * dilation
            wrow = q_vmem[pl.ds(rd + dv, th), f + 6, :].astype(jnp.float32)
            for j, du in enumerate(dus):
                wch = wrow[:, LANE_PAD + du : LANE_PAD + du + w]
                won = won | ((odu == du) & (odv == dv) & (wch == t * n_side + j))
        center = q_vmem[pl.ds(rd, th), :, pl.ds(LANE_PAD, w)]
        occupied = center.astype(jnp.float32)[:, f + 3, :] > 0.5
        own_valid = own32[:, f + 3, :] > 0.5
        replant = own_valid & jnp.logical_not(won) & jnp.logical_not(occupied)
        zl = jnp.zeros((th, F_PAD, LANE_PAD), own.dtype)
        qf_ref[0] = jnp.concatenate(
            [zl, jnp.where(replant[:, None, :], own, center), zl], axis=2)


def r4_one_slab_cast(qn_hbm, qa_ref, qf_ref, q_vmem, sem):
    """won loop over ONE f32 cast of the whole slab, static value slices."""
    bi, i = pl.program_id(0), pl.program_id(1)
    interior = (i * th >= pad_v) & ((i + 1) * th <= pad_v + h)

    @pl.when(jnp.logical_not(interior))
    def _():
        qf_ref[0] = jnp.zeros_like(qf_ref[0])

    @pl.when(interior)
    def _():
        _common(qn_hbm, q_vmem, sem, i, bi)
        own = qa_ref[0, :, :, pl.ds(LANE_PAD, w)]
        own32 = own.astype(jnp.float32)
        odu = own32[:, f + 4, :]
        odv = own32[:, f + 5, :]
        wplane = q_vmem[:, :, :].astype(jnp.float32)[:, f + 6, :]  # (slab_h, wlh)
        won = jnp.zeros((th, w), jnp.bool_)
        for t in range(n_side):
            dv = (t - radius) * dilation
            wrow = wplane[rd + dv : rd + dv + th, :]
            for j, du in enumerate(dus):
                wch = wrow[:, LANE_PAD + du : LANE_PAD + du + w]
                won = won | ((odu == du) & (odv == dv) & (wch == t * n_side + j))
        center = q_vmem[pl.ds(rd, th), :, pl.ds(LANE_PAD, w)]
        occupied = center.astype(jnp.float32)[:, f + 3, :] > 0.5
        own_valid = own32[:, f + 3, :] > 0.5
        replant = own_valid & jnp.logical_not(won) & jnp.logical_not(occupied)
        zl = jnp.zeros((th, F_PAD, LANE_PAD), own.dtype)
        qf_ref[0] = jnp.concatenate(
            [zl, jnp.where(replant[:, None, :], own, center), zl], axis=2)


def r5_fori_won(qn_hbm, qa_ref, qf_ref, q_vmem, sem):
    """won loop as a fori over dv (7 steps, 7-way unrolled inner) like the
    relocate kernel that now compiles."""
    bi, i = pl.program_id(0), pl.program_id(1)
    interior = (i * th >= pad_v) & ((i + 1) * th <= pad_v + h)

    @pl.when(jnp.logical_not(interior))
    def _():
        qf_ref[0] = jnp.zeros_like(qf_ref[0])

    @pl.when(interior)
    def _():
        _common(qn_hbm, q_vmem, sem, i, bi)
        own = qa_ref[0, :, :, pl.ds(LANE_PAD, w)]
        own32 = own.astype(jnp.float32)
        odu = own32[:, f + 4, :]
        odv = own32[:, f + 5, :]

        def t_body(t, won):
            dv = (t - radius) * dilation
            rows_t = q_vmem[pl.ds(rd + dv, th), :, :]
            wrow = rows_t.astype(jnp.float32)[:, f + 6, :]
            for j, du in enumerate(dus):
                wch = wrow[:, LANE_PAD + du : LANE_PAD + du + w]
                won = won | (
                    (odu == du) & (odv == dv.astype(jnp.float32))
                    & (wch == (t * n_side + j).astype(jnp.float32)))
            return won

        won = jax.lax.fori_loop(
            0, n_side, t_body, jnp.zeros((th, w), jnp.bool_))
        center = q_vmem[pl.ds(rd, th), :, pl.ds(LANE_PAD, w)]
        occupied = center.astype(jnp.float32)[:, f + 3, :] > 0.5
        own_valid = own32[:, f + 3, :] > 0.5
        replant = own_valid & jnp.logical_not(won) & jnp.logical_not(occupied)
        zl = jnp.zeros((th, F_PAD, LANE_PAD), own.dtype)
        qf_ref[0] = jnp.concatenate(
            [zl, jnp.where(replant[:, None, :], own, center), zl], axis=2)


try_one("r5_fori_won", r5_fori_won, 2, 1)
