import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
import jax, jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
from frodo_slam_tpu.config import make_config
from frodo_slam_tpu.ops import matching as M

h, w, f = 288, 512, 24
hw = h * w
cfg = make_config()
mc = dict(cfg.matching)
rng = np.random.default_rng(0)
# smooth pointmaps so iter_proj behaves like real frames
yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
base = np.stack([(xx-w/2)/w*2, (yy-h/2)/h*2, np.ones_like(xx)*3], -1)
X11 = jnp.asarray(base[None] + rng.normal(size=(1,h,w,3)).astype(np.float32)*0.01)
X21 = jnp.asarray(base[None] + rng.normal(size=(1,h,w,3)).astype(np.float32)*0.01)
D11 = jnp.asarray(rng.normal(size=(1,h,w,f)).astype(np.float32))
D21 = jnp.asarray(rng.normal(size=(1,h,w,f)).astype(np.float32))
D11 = D11 / jnp.linalg.norm(D11, axis=-1, keepdims=True)
D21r = (D21 / jnp.linalg.norm(D21, axis=-1, keepdims=True))

_first = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))
def run(n=20):
    idx, valid = M.match(X11, X21, D11, D21r, None, **mc)
    float(jax.device_get(_first(idx)))
    idx, valid = M.match(X11, X21, D11, D21r, idx, **mc)  # warm init variant
    float(jax.device_get(_first(idx)))
    t0 = time.perf_counter()
    out = None
    idx_init = None
    for _ in range(n):
        idx, valid = M.match(X11, X21, D11, D21r, idx_init, **mc)
        idx_init = idx
    float(jax.device_get(_first(idx)))
    return (time.perf_counter()-t0)/n*1000

print(f"match b=1 in one jit chain: {run():.1f} ms", flush=True)
