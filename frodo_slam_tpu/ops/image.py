"""Image-space helpers: Scharr-like gradients with reflect padding.

Spec: ``mast3r_slam/image.py:5-38`` — 3x3 kernels [[-3,0,3],[-10,0,10],[-3,0,3]]/32
(and transpose for y), applied per-channel with reflect padding. Implemented
with shifted slices instead of a grouped conv: cheaper for XLA to fuse and
exactly equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def img_gradient(img: jax.Array):
    """``img``: (b, h, w, c) -> (gx, gy) same shape.

    Channel-last layout (TPU-friendly); the reference uses channel-first.
    """
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")

    tl = p[:, :-2, :-2]
    tc = p[:, :-2, 1:-1]
    tr = p[:, :-2, 2:]
    ml = p[:, 1:-1, :-2]
    mr = p[:, 1:-1, 2:]
    bl = p[:, 2:, :-2]
    bc = p[:, 2:, 1:-1]
    br = p[:, 2:, 2:]

    gx = (-3.0 * tl + 3.0 * tr - 10.0 * ml + 10.0 * mr - 3.0 * bl + 3.0 * br) / 32.0
    gy = (-3.0 * tl - 10.0 * tc - 3.0 * tr + 3.0 * bl + 10.0 * bc + 3.0 * br) / 32.0
    return gx, gy
