"""Fast TPU compile-check + chained timing for the fused refine kernels.

Iterating Mosaic fixes through the full bench costs ~10 min per attempt;
this drives ONLY refine_matches_fused at production shapes (288x512x24),
compile first, then honest chained timing (evolving seeds, one tiny fetch
at the end) against the per-level pallas_tile path. Sub-2 ms numbers are
dispatch-floor noise (PERF.md); the decision A/B remains the full bench.

Usage (on the TPU): python scratch/fused_refine_tpu_check.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax
import jax.numpy as jnp
import numpy as np

from frodo_slam_tpu.ops.refine_fused_pallas import refine_matches_fused
from frodo_slam_tpu.ops.refine_pallas_tile import (
    refine_matches_pallas as refine_tile,
)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
b, h, w, f = 1, 288, 512, 24
hw = h * w

rng = np.random.default_rng(0)
D11 = rng.normal(size=(b, h, w, f)).astype(np.float32)
D11 /= np.linalg.norm(D11, axis=-1, keepdims=True)
D21 = rng.normal(size=(b, hw, f)).astype(np.float32)
D21 /= np.linalg.norm(D21, axis=-1, keepdims=True)
uu, vv = np.meshgrid(np.arange(w), np.arange(h))
p0 = np.stack([uu.ravel(), vv.ravel()], -1)[None].repeat(b, 0)
p0 = np.clip(p0 + rng.integers(-3, 4, p0.shape), 0, [w - 1, h - 1]).astype(np.int32)

D11j, D21j, pj = jnp.asarray(D11), jnp.asarray(D21), jnp.asarray(p0)

for name, fn, kw in (
    ("fused_d1", refine_matches_fused, dict(radius=3, dilation_max=1)),
    ("fused_d2", refine_matches_fused, dict(radius=3, dilation_max=2)),
    ("fused_d3", refine_matches_fused, dict(radius=3, dilation_max=3)),
    ("fused_d4", refine_matches_fused, dict(radius=3, dilation_max=4)),
    ("fused_d5", refine_matches_fused, dict(radius=3, dilation_max=5)),
):
    t0 = time.perf_counter()
    try:
        p_out, s_out = fn(D11j, D21j, pj, **kw)
        s_out.block_until_ready()
    except Exception as e:  # noqa: BLE001 - report and continue
        print(f"{name}: COMPILE/RUN FAILED: {type(e).__name__}: {str(e)[:300]}")
        continue
    t_compile = time.perf_counter() - t0

    # chained timing with evolving seeds: feed the previous output back in
    t0 = time.perf_counter()
    p_cur = pj
    for _ in range(REPS):
        p_cur, s_out = fn(D11j, D21j, p_cur, **kw)
    _ = np.asarray(s_out[0, :4])
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name}: warm+compile {t_compile:.1f}s, chained {dt:.2f} ms/call, "
          f"mean_score {float(jnp.mean(s_out)):.4f}")
