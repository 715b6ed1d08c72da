"""Hierarchical wall-clock profiling registry.

Spec: ``mast3r_slam/profile.py:18-130`` (``@timeit`` decorator, ``timeblock``
context manager, nested report printer) and ``tictoc.py:4-30`` — the CUDA
event tic/toc becomes :func:`device_timeblock`, which calls
``block_until_ready`` on a probe array, the JAX analogue of
``torch.cuda.synchronize``. For deep kernel traces use ``jax.profiler`` —
:func:`trace` wraps it.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Dict, List, Optional


class _Node:
    __slots__ = ("name", "total", "count", "children")

    def __init__(self, name: str):
        self.name = name
        self.total = 0.0
        self.count = 0
        self.children: Dict[str, "_Node"] = {}


class TimingRegistry:
    """Nested timing accumulator (profile.py:18-66)."""

    def __init__(self):
        self.root = _Node("root")
        self._stack: List[_Node] = [self.root]

    @contextlib.contextmanager
    def timeblock(self, name: str):
        parent = self._stack[-1]
        node = parent.children.setdefault(name, _Node(name))
        self._stack.append(node)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            node.total += time.perf_counter() - t0
            node.count += 1
            self._stack.pop()

    def timeit(self, fn=None, name: Optional[str] = None):
        """Decorator form (profile.py:25-40)."""

        def deco(f):
            label = name or f.__qualname__

            @functools.wraps(f)
            def wrapper(*a, **kw):
                with self.timeblock(label):
                    return f(*a, **kw)

            return wrapper

        return deco(fn) if fn is not None else deco

    def report(self) -> str:
        """Nested report (print_timing_registry, profile.py:68-125)."""
        lines: List[str] = []

        def walk(node: _Node, depth: int, parent_total: float):
            for child in sorted(node.children.values(), key=lambda c: -c.total):
                pct = 100.0 * child.total / parent_total if parent_total > 0 else 0.0
                avg = child.total / max(child.count, 1)
                lines.append(
                    f"{'  ' * depth}{child.name}: {child.total:.3f}s "
                    f"({child.count}x, avg {avg * 1e3:.2f}ms, {pct:.1f}%)"
                )
                walk(child, depth + 1, child.total)

        total = sum(c.total for c in self.root.children.values())
        lines.append(f"total tracked: {total:.3f}s")
        walk(self.root, 0, total)
        return "\n".join(lines)

    def reset(self):
        self.root = _Node("root")
        self._stack = [self.root]


registry = TimingRegistry()
timeblock = registry.timeblock
timeit = registry.timeit


@contextlib.contextmanager
def device_timeblock(name: str, *arrays):
    """Like timeblock but synchronizes listed device arrays first/last,
    the JAX analogue of tictoc.py's cuda-event timing."""
    import jax

    for a in arrays:
        jax.block_until_ready(a)
    with registry.timeblock(name):
        out = yield
        if out is not None:
            jax.block_until_ready(out)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace wrapper for device-level kernel timelines."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
