"""Does a device->host fetch on the axon tunnel wait only for its PRODUCER,
or does it drain the whole enqueued stream?

Method: compute a tiny buffer B and sync. Enqueue a long-running program on
unrelated data (~hundreds of ms). Immediately fetch B. If the fetch returns
in ~baseline time, fetches wait only on their producer (and the pipelined
pass's synced_fps bound needs another explanation); if it returns in
~slow-program time, the drain semantics claimed in PERF.md round 5 hold.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    x = jnp.ones((2048, 2048), jnp.bfloat16)

    @jax.jit
    def slow(a):
        def body(_, s):
            return s @ a * 0.5 + s

        return jax.lax.fori_loop(0, 120, body, a)

    tiny = (jnp.arange(8.0) + 1.0)
    np.asarray(tiny)  # materialized + synced

    # warm slow + measure its duration via chained-dispatch timing
    y = slow(x)
    np.asarray(y[:1, :1])
    t0 = time.perf_counter()
    y = slow(x)
    np.asarray(y[:1, :1])
    t_slow = time.perf_counter() - t0
    print(f"slow program wall (dispatch+fetch): {t_slow*1e3:.1f} ms", flush=True)

    # baseline tiny fetch
    t0 = time.perf_counter()
    np.asarray(tiny)
    t_base = time.perf_counter() - t0
    print(f"tiny fetch baseline: {t_base*1e3:.1f} ms", flush=True)

    # the experiment: enqueue slow, then immediately fetch the OLD tiny
    for rep in range(3):
        y = slow(x)
        t0 = time.perf_counter()
        np.asarray(tiny)
        t_fetch = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(y[:1, :1])
        t_drain = time.perf_counter() - t0
        print(f"rep {rep}: tiny fetch WITH slow enqueued: {t_fetch*1e3:.1f} ms; "
              f"then slow-result fetch: {t_drain*1e3:.1f} ms", flush=True)

    # variant: fetch a buffer produced EARLIER in the same stream than the
    # slow program (the pipelined pass's exact shape: flags of frame i-1
    # fetched while later work is enqueued)
    @jax.jit
    def fast(a):
        return a * 2.0

    f = fast(tiny)
    y = slow(x)  # enqueued after fast
    t0 = time.perf_counter()
    np.asarray(f)
    t_mid = time.perf_counter() - t0
    print(f"fetch of earlier-in-stream product with slow enqueued behind: "
          f"{t_mid*1e3:.1f} ms", flush=True)
    np.asarray(y[:1, :1])


if __name__ == "__main__":
    main()
