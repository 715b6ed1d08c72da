"""Where does the BA solve's 630ms go? Time: precompute-only, 1-iter, 10-iter,
isolated dense Cholesky+cho_solve at 441, isolated one-chunk edge reduction."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from frodo_slam_tpu.ops import lie
from frodo_slam_tpu.slam.global_opt import (
    BAConfig, Edges, empty_odom_edges, solve_gn_rays, _edges_pre,
    _ray_edge_system,
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
odom0 = empty_odom_edges(1)
s_bar = jnp.full((window,), -1.0, jnp.float32)

noise = (jax.random.normal(jax.random.PRNGKey(3), (window, 7))
         * jnp.array([0.05] * 3 + [0.02] * 3 + [0.01])).at[0].set(0.0).astype(jnp.float32)
T_init = jax.vmap(lie.sim3_retr)(T_true, noise)

_first = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))

def bench(name, fn, *args, n=5):
    t0 = time.perf_counter()
    out = fn(*args)
    float(jax.device_get(_first(jax.tree.leaves(out)[0])))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jax.device_get(_first(jax.tree.leaves(out)[0])))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:35s} {dt*1000:8.1f} ms   (first {tc:6.1f}s)", flush=True)

cfg0 = BAConfig(max_iters=0, pin=1, map_batch=8)
cfg1 = BAConfig(max_iters=1, pin=1, map_batch=8)
bench("solve max_iters=0 (pre only)",
      solve_gn_rays, cfg0, 1, T_init, X, C, edges, odom0, s_bar)
bench("solve max_iters=1",
      solve_gn_rays, cfg1, 1, T_init, X, C, edges, odom0, s_bar)

# isolated cholesky + 2x cho_solve at 441 (the f32+refinement solve)
p_opt = (window - 1) * 7
A = jax.random.normal(jax.random.PRNGKey(0), (p_opt, p_opt), jnp.float32)
Hd = A @ A.T + p_opt * jnp.eye(p_opt)
gd = jax.random.normal(jax.random.PRNGKey(1), (p_opt,), jnp.float32)

@jax.jit
def chol10(H, g):
    def body(i, g):
        L = jnp.linalg.cholesky(H + i * 1e-6 * jnp.eye(p_opt))
        dx = jax.scipy.linalg.cho_solve((L, True), g)
        dx = dx + jax.scipy.linalg.cho_solve((L, True), g - H @ dx)
        return dx
    return jax.lax.fori_loop(0, 10, body, g)

bench("10x cholesky+2 solves @441", chol10, Hd, gd)

# isolated edge reduction: one lax.map over all 128 edges, batch 8
cfgr = BAConfig(map_batch=8)
pre = _edges_pre(cfgr, X, C, edges)
xs = (edges.ii, edges.jj) + tuple(pre)

from functools import partial

@partial(jax.jit, static_argnames=("cfg",))
def reduce_all(cfg, T, xs):
    def one(xs_e):
        ii_, jj_, Xi_, w0_, Xj_ = xs_e
        return _ray_edge_system(cfg, T, ii_, jj_, Xi_, w0_, Xj_)
    return jax.lax.map(one, xs, batch_size=8)

bench("edge reduction all 128 (B=8)", reduce_all, cfgr, T_init, xs)

@partial(jax.jit, static_argnames=("cfg",))
def pre_only(cfg, X, C, edges):
    return _edges_pre(cfg, X, C, edges)

bench("_edges_pre alone", pre_only, cfgr, X, C, edges)
