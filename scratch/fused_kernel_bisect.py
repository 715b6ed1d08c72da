"""Compile each fused-refine kernel ALONE on the TPU to find which one
crashes the remote Mosaic compile helper (HTTP 500, no diagnostics).

Usage: python scratch/fused_kernel_bisect.py
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

import frodo_slam_tpu.ops.refine_fused_pallas as F

b, h, w, f = 1, 288, 512, 24
radius, dilation = 3, 5
rd = radius * dilation
th = 16
pad_v = F._round_up(rd, th)
hp = h + 2 * pad_v
wlh = w + 2 * F.LANE_PAD
pad_t, pad_l, hp_d, wp = F._corr_pads(h, w, rd)

rng = np.random.default_rng(0)
Qp = jnp.asarray(rng.normal(size=(b, hp, F.F_PAD, wlh)), jnp.bfloat16)
Dp = jnp.asarray(rng.normal(size=(b, hp_d, F.F_PAD, wp)), jnp.bfloat16)
offsets = (radius, dilation,
           tuple(du * dilation for du in range(-radius, radius + 1)))
grid = (b, hp // th)
block = pl.BlockSpec((1, th, F.F_PAD, wlh), lambda bi, i: (bi, i, 0, 0))


def try_one(name, fn):
    try:
        out = fn()
        jax.tree.leaves(out)[0].block_until_ready()
        print(f"{name}: OK")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:200]}")


corr = partial(
    F._corr_mark_kernel, offsets=offsets, n_desc=f, th=th, h=h, w=w,
    pad_v=pad_v, pad_t=pad_t, pad_l=pad_l, hp_d=hp_d, slab_h=th + 2 * rd,
)
try_one("corr_mark", lambda: pl.pallas_call(
    corr, grid=grid,
    in_specs=[pl.BlockSpec(memory_space=pl.ANY), block],
    out_specs=block, out_shape=jax.ShapeDtypeStruct(Qp.shape, Qp.dtype),
    scratch_shapes=[pltpu.VMEM((th + 2 * rd, F.F_PAD, wp), Dp.dtype),
                    pltpu.SemaphoreType.DMA],
)(Dp, Qp))

reloc = partial(
    F._relocate_kernel, offsets=offsets, n_desc=f, th=th, h=h, w=w,
    pad_v=pad_v, n_blocks=hp // th, slab_h=th + 2 * rd,
)
try_one("relocate", lambda: pl.pallas_call(
    reloc, grid=grid,
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=block, out_shape=jax.ShapeDtypeStruct(Qp.shape, Qp.dtype),
    scratch_shapes=[pltpu.VMEM((th + 2 * rd, F.F_PAD, wlh), Qp.dtype),
                    pltpu.SemaphoreType.DMA],
)(Qp))

replant = partial(
    F._replant_kernel, offsets=offsets, n_desc=f, th=th, h=h, w=w,
    pad_v=pad_v, slab_h=th + 2 * rd,
)
try_one("replant", lambda: pl.pallas_call(
    replant, grid=grid,
    in_specs=[pl.BlockSpec(memory_space=pl.ANY), block, block],
    out_specs=[block, block],
    out_shape=[jax.ShapeDtypeStruct(Qp.shape, Qp.dtype)] * 2,
    scratch_shapes=[pltpu.VMEM((th + 2 * rd, F.F_PAD, wlh), Qp.dtype),
                    pltpu.SemaphoreType.DMA],
)(Qp, Qp, Qp))
