"""A/B: attention_impl xla vs pallas flash, and head_dtype f32 vs bf16,
timed on the full decode_and_heads program (chained, one scalar fetch)."""
import dataclasses
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
import jax, jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
from frodo_slam_tpu.models import mast3r

h, w = 288, 512
base = mast3r.MASt3RConfig()
params = mast3r.init_params(jax.random.PRNGKey(0), base)
params = mast3r.cast_transformer_params(params, base.dtype)
rng = np.random.default_rng(0)
feat = jnp.asarray(rng.normal(size=(1, 576, base.enc_embed_dim)).astype(np.float32))
yy, xx = np.meshgrid(np.arange(h // 16), np.arange(w // 16), indexing="ij")
pos = jnp.asarray(np.stack([yy, xx], -1).reshape(1, 576, 2), jnp.int32)

_first = jax.jit(lambda x: x.reshape(-1)[0].astype(jnp.float32))

def bench(name, cfg, n=20):
    fn = jax.jit(lambda p, f, po: mast3r.decode_and_heads(p, cfg, f, po, f, po, (h, w)))
    out = fn(params, feat, pos)
    float(jax.device_get(_first(out[0]["pts3d"])))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(params, feat, pos)
    float(jax.device_get(_first(out[0]["pts3d"])))
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)
    return out

o1 = bench("decode+heads xla f32-head", base)
o2 = bench("decode+heads pallas-attn", dataclasses.replace(base, attention_impl="pallas"))
o3 = bench("decode+heads bf16-head", dataclasses.replace(base, head_dtype=jnp.bfloat16))

# numeric drift of the variants vs baseline
for name, o in [("pallas-attn", o2), ("bf16-head", o3)]:
    d = float(jnp.abs(o[0]["pts3d"] - o1[0]["pts3d"]).max())
    r = float(jnp.abs(o[0]["pts3d"] - o1[0]["pts3d"]).mean() / (jnp.abs(o1[0]["pts3d"]).mean() + 1e-9))
    print(f"{name}: max|dpts3d|={d:.3e} mean rel={r:.3e}", flush=True)
