"""BA solve at steady state with the cached edge pre + pallas reduction."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from frodo_slam_tpu.ops import lie
from frodo_slam_tpu.slam.global_opt import (
    BAConfig, Edges, _edges_pre, empty_odom_edges, solve_gn_rays,
)

window = 64
h, w = 288, 512
hw = h * w
key = jax.random.PRNGKey(7)
kp, kx = jax.random.split(key)
pts_w = jax.random.uniform(kp, (hw, 3), minval=-2.0, maxval=2.0) + jnp.array([0, 0, 6.0])
xis = jax.random.normal(kx, (window, 7)) * jnp.array([0.3, 0.3, 0.3, 0.15, 0.15, 0.15, 0.05])
T_true = jax.vmap(lie.sim3_exp)(xis).astype(jnp.float32)
X = jax.vmap(lambda T: lie.sim3_act(lie.sim3_inv(T), pts_w))(T_true).astype(jnp.float32)
C = jnp.full((window, hw, 1), 5.0, jnp.float32)
ii, jj = [], []
for k in range(window - 1):
    ii += [k, k + 1]; jj += [k + 1, k]
e = 2 * window
pad = e - len(ii)
edges = Edges(
    ii=jnp.asarray(ii + [0] * pad, jnp.int32),
    jj=jnp.asarray(jj + [0] * pad, jnp.int32),
    idx=jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32), (e, hw)),
    valid=jnp.concatenate([jnp.ones((len(ii), hw), bool), jnp.zeros((pad, hw), bool)]),
    Q=jnp.full((e, hw), 4.0, jnp.float32),
    active=jnp.asarray([True] * len(ii) + [False] * pad),
)
XiT, w0 = jax.jit(_edges_pre, static_argnames="cfg")(BAConfig(), X, C, edges)
edges = edges._replace(XiT=XiT, w0=w0)
odom0 = empty_odom_edges(1)
s_bar = jnp.full((window,), -1.0, jnp.float32)

noise = (jax.random.normal(jax.random.PRNGKey(3), (window, 7))
         * jnp.array([0.05] * 3 + [0.02] * 3 + [0.01])).at[0].set(0.0).astype(jnp.float32)
T_init = jax.vmap(lie.sim3_retr)(T_true, noise)

_first = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))

for impl in sys.argv[1:] or ["pallas", "xla"]:
    cfg = BAConfig(max_iters=10, pin=1, edge_impl=impl)
    t0 = time.perf_counter()
    out = solve_gn_rays(cfg, 1, T_init, X, C, edges, odom0, s_bar)
    float(jax.device_get(_first(out)))
    tc = time.perf_counter() - t0
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = solve_gn_rays(cfg, 1, out, X, C, edges, odom0, s_bar)
    float(jax.device_get(_first(out)))
    dt = (time.perf_counter() - t0) / reps
    err = float(jnp.abs(out - T_true).max())
    print(f"impl={impl:7s} solve {dt*1000:7.1f} ms  first {tc:6.1f}s  err {err:.2e}", flush=True)
