"""Probe: device->host fetch latency vs buffer size through the tunnel.

2026-08-19 pathology: a jitted SCALAR float() fetch takes 125-612 s while a
64 KB np.asarray fetch takes ~30 ms (scripts/tunnel_probe.py log). If the
slow path is size-gated, every host sync in the pipeline (match_frac flags,
gating fracs) can ride a padded >=threshold fetch instead.

Prints one JSON line: {"shape": ms, ...}. Scalar float() goes LAST (it may
take minutes).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

from frodo_slam_tpu.utils.backend_probe import ensure_backend_reachable

ensure_backend_reachable()

import jax
import jax.numpy as jnp
import numpy as np

out = {}
for shape in [(16384,), (4096,), (1024,), (256,), (128,), (64,), (8,), (2,), (1,)]:
    f = jax.jit(lambda x: x * 2)
    a = jnp.ones(shape, jnp.float32)
    r = f(a)
    r.block_until_ready()
    # two reps; report the second (first may carry stream state)
    np.asarray(f(a))
    t0 = time.perf_counter()
    np.asarray(f(a))
    ms = (time.perf_counter() - t0) * 1e3
    out[str(shape)] = round(ms, 1)
    print(json.dumps(out), flush=True)

# item() on a 1-element array (the float() path used by the pipeline flags)
a1 = jnp.ones((1,), jnp.float32)
f1 = jax.jit(lambda x: x + 1)
f1(a1).block_until_ready()
t0 = time.perf_counter()
float(f1(a1)[0])
out["float_of_(1,)[0]"] = round((time.perf_counter() - t0) * 1e3, 1)
print(json.dumps(out), flush=True)

# true scalar () fetch — the measured-pathological path; do it last
s = jnp.float32(1.0)
g = jax.jit(lambda x: x + 1)
g(s).block_until_ready()
t0 = time.perf_counter()
float(g(s))
out["float_()"] = round((time.perf_counter() - t0) * 1e3, 1)
print(json.dumps(out), flush=True)
