"""Isolate what dominates corr_level: the 49 probes' unaligned lane slices,
the channel reduction, or the slab DMA. Variants via monkeypatched radius."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
import jax, jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
from frodo_slam_tpu.ops.refine_pallas import build_slabs, corr_level, corr_pads, F_PAD

b, h, w, f = 1, 288, 512, 24
rd_max = 15
pad_t, pad_l, hp, wp = corr_pads(h, w, rd_max)
rng = np.random.default_rng(0)
Q = jnp.asarray(rng.normal(size=(b, h, F_PAD, w)).astype(np.float32), jnp.bfloat16)
Dp = jnp.asarray(rng.normal(size=(b, hp, F_PAD, wp)).astype(np.float32), jnp.bfloat16)
Dslabs = build_slabs(Dp, h=h, w=w)

_first = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))
def bench(name, fn, n=20):
    out = fn(); float(jax.device_get(_first(out[0])))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(jax.device_get(_first(out[0])))
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)

for (r, d) in [(3, 5), (3, 1), (1, 5), (0, 1), (2, 5)]:
    bench(f"corr_level r={r} d={d} ({(2*r+1)**2} probes)",
          lambda r=r, d=d: corr_level(Q, Dslabs, radius=r, dilation=d, n_desc=f, h=h, w=w))

bench("build_slabs", lambda: (build_slabs(Dp, h=h, w=w),))
