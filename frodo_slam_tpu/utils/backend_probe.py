"""Bounded first-contact probe of the configured jax backend.

Why this exists: the bench host reaches its one TPU chip through a remote
tunnel whose backend init (the first ``jax.devices()`` call) hangs
*indefinitely* when the tunnel is wedged — it does not error. Every driver
entry point (bench.py, __graft_entry__.entry) must therefore make its first
device contact through a killable subprocess with a deadline, so a dead
tunnel yields a fast, diagnosable failure instead of an eternal hang
(post-mortem: BENCH_r02.json rc=1 after full-pipeline import, and
MULTICHIP_r02.json rc=124 hung in the parent).

``probe_backend`` never initializes a backend in the calling process.
"""

from __future__ import annotations

import os
import subprocess
import sys

DEFAULT_TIMEOUT_S = float(os.environ.get("FRODO_BACKEND_PROBE_TIMEOUT", "120"))

_PROBE_CODE = (
    "import jax; d = jax.devices(); "
    "print('FRODO_PROBE', len(d), jax.default_backend(), flush=True)"
)


def backend_already_initialized() -> bool:
    """True iff this process already holds a live backend (then first
    contact cannot hang — the hang only happens during initialization)."""
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge.backends_are_initialized())
    except Exception:
        return False


def probe_backend(timeout_s: float = DEFAULT_TIMEOUT_S) -> tuple[int, str]:
    """Initialize the configured default backend in a throwaway subprocess.

    Returns (device_count, platform_name). Raises RuntimeError with a
    one-line diagnosis on timeout or init failure. The subprocess inherits
    the environment, so it resolves the same platform the caller would.
    """
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        raise RuntimeError(
            f"jax backend probe timed out after {timeout_s:.0f}s: the "
            "configured platform (JAX_PLATFORMS="
            f"{os.environ.get('JAX_PLATFORMS', '')!r}) hung during init — "
            "remote TPU tunnel wedged/unreachable"
        ) from None
    for line in proc.stdout.splitlines():
        if line.startswith("FRODO_PROBE"):
            _, n, platform = line.split()
            return int(n), platform
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()
    raise RuntimeError(
        "jax backend probe failed (rc=%d): %s"
        % (proc.returncode, tail[-1] if tail else "no output")
    )


def ensure_backend_reachable(timeout_s: float = DEFAULT_TIMEOUT_S) -> None:
    """Fail fast (bounded) if the default backend cannot initialize.

    No-op when a backend is already live in this process."""
    if backend_already_initialized():
        return
    probe_backend(timeout_s)
