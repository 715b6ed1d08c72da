"""Test harness: force an 8-virtual-device CPU platform so sharding tests run
without TPU hardware. Must run before jax initializes a backend (NOT before
jax is imported — the axon sitecustomize imports jax at interpreter start,
so env-var-only overrides of JAX_PLATFORMS are silently ignored; use
jax.config.update, which works any time before first backend use)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses we spawn
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# cpu-specific cache dir: entries compiled via the axon remote-compile
# service carry different host CPU features and SIGILL-warn when loaded here
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache_cpu"
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

# The environment presets JAX_PLATFORMS=axon (remote TPU tunnel) and imports
# jax before this file runs; override the live config unconditionally.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the virtual-device CPU platform, got "
    + jax.default_backend()
)
assert len(jax.devices()) >= 8, "xla_force_host_platform_device_count not applied"
jax.config.update("jax_threefry_partitionable", True)
# The backend BA solves its (7P x 7P) normal equations in f64, matching the
# reference's double-precision Eigen solve (gn_kernels.cu:163-199).
jax.config.update("jax_enable_x64", True)
