"""Time the bench's backend keyframe step piece by piece on the TPU."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
import jax, jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")

from frodo_slam_tpu.config import make_config
from frodo_slam_tpu.models import mast3r
from frodo_slam_tpu.ops import lie
from frodo_slam_tpu.slam.backend import _gate_pairs, _pair_cache, _write_pair_rows
from frodo_slam_tpu.slam.global_opt import BAConfig, Edges, _edges_pre, empty_odom_edges, solve_gn_rays
from frodo_slam_tpu.slam.inference import match_symmetric

mcfg = mast3r.MASt3RConfig()
h, w = 288, 512
hw = h * w
window = 64
cfg = make_config()
match_cfg_d = dict(cfg.matching)
ba_cfg = BAConfig(max_iters=int(cfg.local_opt.max_iters), pin=1,
                  delta_norm=float(cfg.local_opt.delta_norm))

params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
params["head2"] = params["head1"]
params["dec_blocks2"] = params["dec_blocks"]
params = mast3r.cast_transformer_params(params, mcfg.dtype)

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
edges0 = Edges(
    ii=jnp.asarray(ii + [0] * pad, jnp.int32),
    jj=jnp.asarray(jj + [0] * pad, jnp.int32),
    idx=jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32), (e, hw)),
    valid=jnp.concatenate([jnp.ones((len(ii), hw), bool), jnp.zeros((pad, hw), bool)]),
    Q=jnp.full((e, hw), 4.0, jnp.float32),
    active=jnp.asarray([True] * len(ii) + [False] * pad),
)
XiT, w0 = jax.jit(_edges_pre, static_argnames="cfg")(BAConfig(), X, C, edges0)
edges0 = edges0._replace(XiT=XiT, w0=w0)
odom0 = empty_odom_edges(1)
s_bar = jnp.full((window,), -1.0, jnp.float32)

rng = np.random.default_rng(0)
feat_i = jnp.asarray(rng.normal(size=(1, 576, mcfg.enc_embed_dim)).astype(np.float32))
feat_j = jnp.asarray(rng.normal(size=(1, 576, mcfg.enc_embed_dim)).astype(np.float32))
yy, xx = np.meshgrid(np.arange(h // 16), np.arange(w // 16), indexing="ij")
pos = jnp.asarray(np.stack([yy, xx], -1).reshape(1, 576, 2), jnp.int32)

_first = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))
def touch(o):
    leaf = [l for l in jax.tree.leaves(o) if hasattr(l, "reshape")][0]
    return float(jax.device_get(_first(leaf)))

def bench(name, fn, *args, n=5):
    t0 = time.perf_counter(); out = fn(*args); touch(out)
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    touch(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt*1000:8.1f} ms  (first {tc:6.1f}s)", flush=True)
    return out

ms = bench("match_symmetric (pair)", lambda: match_symmetric(
    params, mcfg, match_cfg_d, feat_i, pos, feat_j, pos, (h, w)))
(idx_i2j, idx_j2i, vm_j, vm_i, Qii, Qjj, Qji, Qij) = ms

gp = bench("gate_pairs", lambda: _gate_pairs(
    idx_i2j, idx_j2i, vm_j, vm_i, Qii, Qjj, Qji, Qij, jnp.float32(0.0)))
Qj, Qi, valid_j, valid_i, fracs = gp

t0 = time.perf_counter()
for _ in range(5):
    f = np.asarray(_gate_pairs(idx_i2j, idx_j2i, vm_j, vm_i, Qii, Qjj, Qji, Qij, jnp.float32(0.0))[4])
print(f"{'gate+frac host fetch':32s} {(time.perf_counter()-t0)/5*1000:8.1f} ms", flush=True)

Ni = jnp.int32(1)
pc = bench("_pair_cache (2 row gathers)", lambda: _pair_cache(
    jnp.float32(1.5), jnp.float32(0.0), X[0], C[0], Ni, X[1], C[1], Ni,
    idx_i2j[0].astype(jnp.int32), idx_j2i[0].astype(jnp.int32),
    valid_j[0, :, 0], valid_i[0, :, 0], Qj[0, :, 0], Qi[0, :, 0]))

def wpr(edges):
    return _write_pair_rows(edges, jnp.int32(2 * (window - 1)), jnp.int32(window - 2),
                            jnp.int32(window - 1), idx_i2j[0], idx_j2i[0],
                            valid_j[0, :, 0], valid_i[0, :, 0],
                            Qj[0, :, 0], Qi[0, :, 0], cache=pc)
t0 = time.perf_counter()
edges_c = jax.tree.map(jnp.copy, edges0)
edges_c = wpr(edges_c)
touch(edges_c)
print(f"{'_write_pair_rows (donated)':32s} {(time.perf_counter()-t0)*1000:8.1f} ms (incl copy+compile)", flush=True)

noise = (jax.random.normal(jax.random.PRNGKey(3), (window, 7))
         * jnp.array([0.05] * 3 + [0.02] * 3 + [0.01])).at[0].set(0.0).astype(jnp.float32)
T_init = jax.vmap(lie.sim3_retr)(T_true, noise)
bench("solve_gn_rays (bench cfg)", lambda: solve_gn_rays(
    ba_cfg, 1, T_init, X, C, edges0, odom0, s_bar))

# --- sub-decompositions --------------------------------------------------
from frodo_slam_tpu.slam.inference import decode_symmetric_batch
from frodo_slam_tpu.ops import matching as M

dec = bench("decode_symmetric_batch (N=1)", lambda: decode_symmetric_batch(
    params, mcfg, feat_i, pos, feat_j, pos, (h, w)))
Xd, Cd, Dd, Qd = dec
X11 = jnp.concatenate([Xd[0], Xd[2]], axis=0)
X21 = jnp.concatenate([Xd[1], Xd[3]], axis=0)
D11 = jnp.concatenate([Dd[0], Dd[2]], axis=0)
D21 = jnp.concatenate([Dd[1], Dd[3]], axis=0)
bench("matching.match b=2", lambda: M.match(X11, X21, D11, D21, None, **match_cfg_d))
bench("matching.match b=1", lambda: M.match(X11[:1], X21[:1], D11[:1], D21[:1], None, **match_cfg_d))

# transpose cost
A_rows = jnp.zeros((hw, 3), jnp.float32) + X[0]
bench("swapaxes (HW,3)->(3,HW)", lambda: jnp.swapaxes(A_rows, 0, 1) + 0.0)
idxr = idx_i2j[0].astype(jnp.int32)
tbl = jnp.concatenate([X[0], C[0]], axis=-1)
bench("one (HW,4) row gather", lambda: tbl[idxr])
bench("one (HW,) scalar gather", lambda: C[0][:, 0][idxr])

