import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
import jax, jax.numpy as jnp
from frodo_slam_tpu.models import mast3r, dpt as dpt_mod
_first = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))
def touch(o):
    l = [x for x in jax.tree.leaves(o) if hasattr(x, "reshape")][0]
    return float(jax.device_get(_first(l)))
def timeit(name, fn, *a, n=20, fb=0.0):
    o = fn(*a); touch(o)
    t0 = time.perf_counter()
    for _ in range(n): o = fn(*a)
    touch(o)
    print(f"{name:44s} {(time.perf_counter()-t0-fb)/n*1e3:8.2f} ms", flush=True)
h, w = 288, 512
cfg = mast3r.MASt3RConfig()
params = mast3r.init_params(jax.random.PRNGKey(0), cfg)
params["head2"] = params["head1"]; params["dec_blocks2"] = params["dec_blocks"]
params = mast3r.cast_transformer_params(params, cfg.dtype)
img = jnp.zeros((1, h, w, 3), jnp.float32)
tiny = jnp.zeros((4,), jnp.float32) + 1
touch(tiny)
t0 = time.perf_counter()
for _ in range(20): touch(tiny)
fb = (time.perf_counter()-t0)/20
print(f"fetch baseline {fb*1e3:.1f} ms")
feat, pos = jax.jit(lambda p, x: mast3r.encode_image(p, cfg, x))(params, img)
touch(feat)
dec = jax.jit(lambda p, f, po: mast3r.decode(p, cfg, f, po, f, po))
hooks1, hooks2 = dec(params, feat, pos)
touch(hooks1)
grid = (h // cfg.patch_size, w // cfg.patch_size)
def mk_heads(prec):
    @jax.jit
    def heads(p, h1, h2):
        with jax.default_matmul_precision(prec):
            pc1 = dpt_mod.dpt_apply(p["head1"]["dpt"], h1, grid)
            pc2 = dpt_mod.dpt_apply(p["head2"]["dpt"], h2, grid)
        return pc1, pc2
    return heads
for prec in ("float32", "tensorfloat32", "bfloat16"):
    try:
        timeit(f"DPT heads f32 params, precision={prec}", mk_heads(prec), params, hooks1, hooks2, fb=fb)
    except Exception as e:
        print(f"{prec}: {type(e).__name__} {e}")
