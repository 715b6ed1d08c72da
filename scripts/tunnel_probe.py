"""Bounded health probe of the remote-TPU tunnel's DATA path.

The tunnel can be up (backend init + dispatch fine) while its device->host
fetch path is pathological: on 2026-08-18 a jitted scalar ``float()`` fetch
took 5-70 s and a 2 MB fetch ~39 s, vs ~36 ms per sync in round 2 — FPS
numbers measured in such a window are meaningless (PERF.md). Every recorded
TPU measurement should be accompanied by this probe's output.

Prints one JSON line:
  {"ok": bool, "scalar_fetch_ms": x, "small_fetch_ms": x, "dispatch_ms": x,
   "put_ms": x, "healthy": bool}

``healthy`` = every fetch path under 150 ms. Exit code 0 if the probe ran
(healthy or not), 1 if the backend was unreachable.

Never kill this probe mid-run if avoidable — processes dying mid-TPU-use
can wedge the tunnel for hours (round-2 post-mortem). The per-step work is
tiny; a slow tunnel makes it slow, not hung: give it a generous timeout.
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


def main() -> int:
    from frodo_slam_tpu.utils.backend_probe import ensure_backend_reachable

    try:
        ensure_backend_reachable()
    except RuntimeError as e:
        print(json.dumps({"ok": False, "error": str(e)}))
        return 1

    import jax
    import jax.numpy as jnp
    import numpy as np

    a = jnp.ones((128, 128), jnp.float32)  # 64 KB
    f = jax.jit(lambda x: x * 2)
    f(a).block_until_ready()
    t0 = time.perf_counter()
    np.asarray(f(a))
    small_ms = (time.perf_counter() - t0) * 1e3

    # tiny ARRAY fetch: the path every pipeline host sync now rides
    # (np.asarray(res.flags); bench.py and system.grab_rgb) — the scalar
    # float() path degrades independently (PERF.md 2026-08-19: 125-612 s
    # scalar while (1,) array fetches stayed ~30 ms)
    a1 = jnp.ones((32,), jnp.float32)
    f1 = jax.jit(lambda x: x + 1)
    f1(a1).block_until_ready()
    t0 = time.perf_counter()
    np.asarray(f1(a1))
    tiny_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    for _ in range(20):
        r = f(a)
    r.block_until_ready()
    disp_ms = (time.perf_counter() - t0) * 1e3 / 20

    h = np.ones((256, 256), np.float32)
    t0 = time.perf_counter()
    jax.device_put(h).block_until_ready()
    put_ms = (time.perf_counter() - t0) * 1e3

    # the scalar float() path is measured LAST and only on request: the
    # pipeline no longer uses it, and in degraded windows it takes minutes
    # — gating usability on it starves measurement windows where every
    # path the system actually uses is fine
    scalar_ms = None
    if os.environ.get("FRODO_PROBE_SCALAR"):
        g = jax.jit(lambda x: x + 1)
        sc = jnp.float32(1.0)
        g(sc).block_until_ready()
        t0 = time.perf_counter()
        float(g(sc))
        scalar_ms = round((time.perf_counter() - t0) * 1e3, 1)

    healthy = tiny_ms < 150 and small_ms < 150 and put_ms < 300
    print(json.dumps({
        "ok": True,
        "tiny_fetch_ms": round(tiny_ms, 1),
        "small_fetch_ms": round(small_ms, 1),
        "dispatch_ms": round(disp_ms, 2),
        "put_ms": round(put_ms, 1),
        "scalar_fetch_ms": scalar_ms,
        "healthy": healthy,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
