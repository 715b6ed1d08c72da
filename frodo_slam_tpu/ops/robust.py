"""Robust kernels and Gauss-Newton convergence tests.

Spec: ``mast3r_slam/nonlinear_optimizer.py:5-42`` and the device-side Huber
weight in ``gn_kernels.cu:214-217``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def huber(r: jax.Array, k: float = 1.345) -> jax.Array:
    """Huber IRLS weight: 1 inside the kernel, k/|r| outside
    (nonlinear_optimizer.py:28-33)."""
    r_abs = jnp.abs(r)
    return jnp.where(r_abs < k, jnp.ones_like(r), k / r_abs)


def tukey(r: jax.Array, k: float = 4.6851) -> jax.Array:
    """Tukey biweight (nonlinear_optimizer.py:36-42)."""
    r_abs = jnp.abs(r)
    tmp = 1.0 - (r_abs / k) ** 2
    return jnp.where(r_abs < k, tmp * tmp, jnp.zeros_like(r))


def check_convergence(
    step, rel_error_thresh, delta_norm_thresh, old_cost, new_cost, delta
) -> jax.Array:
    """Relative-cost + step-norm termination (nonlinear_optimizer.py:5-25).

    Traceable: returns a boolean array usable inside ``lax.while_loop``.
    """
    rel = jnp.abs(new_cost - old_cost) / jnp.maximum(new_cost, 1e-12)
    dn = jnp.linalg.norm(delta)
    return (step > 0) & ((rel < rel_error_thresh) | (dn < delta_norm_thresh))
