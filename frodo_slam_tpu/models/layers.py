"""Transformer building blocks for the MASt3R two-view network, in pure JAX.

Behavioral spec: ``croco/models/blocks.py`` (Attention/CrossAttention/Block/
DecoderBlock/Mlp/PatchEmbed) and the RoPE2D fallback in
``croco/models/pos_embed.py:112-159``. Parameters are plain pytrees (nested
dicts of arrays) so the checkpoint converter is a direct key mapping and every
apply function jits/shards transparently.

TPU notes:
- attention uses one fused ``jax.nn.dot_product_attention`` (MXU path) per
  block instead of the reference's flash-attn CUDA kernel;
- encoder/decoder stacks are ``lax.scan`` over stacked per-layer params for
  O(1) compile time;
- matmuls run in the configured compute dtype (bf16 by default, matching the
  reference's fp16/bf16 autocast, ``mast3r_utils.py:88-211``) while layernorms
  accumulate in f32.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializers (xavier-uniform to mirror CroCoNet._init_weights)
# ---------------------------------------------------------------------------

def _xavier(rng, shape, dtype=jnp.float32, fan_in=None, fan_out=None):
    fi = fan_in if fan_in is not None else shape[0]
    fo = fan_out if fan_out is not None else shape[-1]
    a = float(np.sqrt(6.0 / (fi + fo)))
    return jax.random.uniform(rng, shape, dtype, -a, a)


def linear_init(rng, d_in: int, d_out: int, bias: bool = True) -> Params:
    p = {"w": _xavier(rng, (d_in, d_out))}
    if bias:
        p["b"] = jnp.zeros((d_out,))
    return p


def linear(p: Params, x: jax.Array) -> jax.Array:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layernorm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layernorm(p: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# MLP (blocks.py:66-90)
# ---------------------------------------------------------------------------

def mlp_init(rng, d_in: int, d_hidden: int, d_out: int | None = None) -> Params:
    r1, r2 = jax.random.split(rng)
    d_out = d_in if d_out is None else d_out
    return {"fc1": linear_init(r1, d_in, d_hidden), "fc2": linear_init(r2, d_hidden, d_out)}


def mlp(p: Params, x: jax.Array) -> jax.Array:
    return linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], x), approximate=False))


# ---------------------------------------------------------------------------
# RoPE2D (pos_embed.py:112-159): token dim split in half; first half rotated
# by y position, second half by x position.
# ---------------------------------------------------------------------------

def _rope_cos_sin(pos1d: jax.Array, half_dim: int, base: float, dtype):
    """cos/sin tables for one axis. ``pos1d``: (..., N) integer positions.

    Returns (..., N, half_dim) with freqs duplicated as ``cat(f, f)`` exactly
    like the reference (pos_embed.py:121-127).
    """
    d4 = half_dim // 2
    inv_freq = 1.0 / (base ** (jnp.arange(0, half_dim, 2, dtype=jnp.float32) / half_dim))
    freqs = pos1d.astype(jnp.float32)[..., None] * inv_freq  # (..., N, d4)
    freqs = jnp.concatenate([freqs, freqs], axis=-1)  # (..., N, half_dim)
    del d4
    return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope2d(tokens: jax.Array, pos: jax.Array, base: float = 100.0) -> jax.Array:
    """``tokens``: (B, heads, N, head_dim); ``pos``: (B, N, 2) int (y, x)."""
    hd = tokens.shape[-1]
    half = hd // 2
    y_tok, x_tok = tokens[..., :half], tokens[..., half:]

    cos_y, sin_y = _rope_cos_sin(pos[..., 0], half, base, tokens.dtype)
    cos_x, sin_x = _rope_cos_sin(pos[..., 1], half, base, tokens.dtype)
    # broadcast over heads: (B, 1, N, half)
    cos_y, sin_y, cos_x, sin_x = (t[:, None] for t in (cos_y, sin_y, cos_x, sin_x))

    y_tok = y_tok * cos_y + _rotate_half(y_tok) * sin_y
    x_tok = x_tok * cos_x + _rotate_half(x_tok) * sin_x
    return jnp.concatenate([y_tok, x_tok], axis=-1)


# ---------------------------------------------------------------------------
# Attention (blocks.py:92-135) / CrossAttention (blocks.py:158-215)
# ---------------------------------------------------------------------------

def attention_init(rng, dim: int) -> Params:
    r1, r2 = jax.random.split(rng)
    return {"qkv": linear_init(r1, dim, 3 * dim), "proj": linear_init(r2, dim, dim)}


def _sdpa(q, k, v, impl: str = "xla"):
    """q,k,v: (B, heads, N, hd) -> (B, N, heads*hd). Fused attention on MXU.

    ``impl='pallas'`` uses the Pallas TPU flash-attention kernel (the
    replacement for the reference's flash-attn CUDA dependency,
    croco/models/blocks.py:26-30) — useful for the backend's big 2N-pair
    decode batches; the XLA path is equally good at B=1, 576 tokens.
    """
    b, h, n, hd = q.shape
    if impl == "pallas":
        blk = min(512, n)
        while n % blk:
            blk //= 2
        if blk % 128:
            # Mosaic requires block_k to be a multiple of 128; n=576 (the
            # 288x512 token grid) has no such divisor, so the kernel cannot
            # tile it — fall back to the XLA fused attention rather than
            # crash (same contract as the pallas refine shape guard).
            impl = "xla"
    if impl == "pallas":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            flash_attention,
        )

        bs = BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
            block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
        )
        out = flash_attention(q, k, v, sm_scale=1.0 / float(hd) ** 0.5, block_sizes=bs)
        return out.transpose(0, 2, 1, 3).reshape(b, n, h * hd)
    out = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    )
    return out.reshape(b, n, h * hd)


def attention(p: Params, x: jax.Array, xpos: jax.Array, num_heads: int, rope_base: float | None,
              attn_impl: str = "xla"):
    b, n, c = x.shape
    hd = c // num_heads
    qkv = linear(p["qkv"], x).reshape(b, n, 3, num_heads, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    if rope_base is not None:
        q = apply_rope2d(q, xpos, rope_base)
        k = apply_rope2d(k, xpos, rope_base)
    return linear(p["proj"], _sdpa(q, k, v, attn_impl))


def cross_attention_init(rng, dim: int) -> Params:
    rq, rk, rv, rp = jax.random.split(rng, 4)
    return {
        "projq": linear_init(rq, dim, dim),
        "projk": linear_init(rk, dim, dim),
        "projv": linear_init(rv, dim, dim),
        "proj": linear_init(rp, dim, dim),
    }


def cross_attention(
    p: Params, query, key, value, qpos, kpos, num_heads: int, rope_base: float | None,
    attn_impl: str = "xla",
):
    b, nq, c = query.shape
    hd = c // num_heads
    q = linear(p["projq"], query).reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
    k = linear(p["projk"], key).reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    v = linear(p["projv"], value).reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    if rope_base is not None:
        q = apply_rope2d(q, qpos, rope_base)
        k = apply_rope2d(k, kpos, rope_base)
    return linear(p["proj"], _sdpa(q, k, v, attn_impl))


# ---------------------------------------------------------------------------
# Encoder / decoder blocks (blocks.py:137-156, 217-231)
# ---------------------------------------------------------------------------

def block_init(rng, dim: int, mlp_ratio: float = 4.0) -> Params:
    r1, r2 = jax.random.split(rng)
    return {
        "norm1": layernorm_init(dim),
        "attn": attention_init(r1, dim),
        "norm2": layernorm_init(dim),
        "mlp": mlp_init(r2, dim, int(dim * mlp_ratio)),
    }


def block(p: Params, x, xpos, num_heads: int, rope_base: float | None,
          attn_impl: str = "xla"):
    x = x + attention(p["attn"], layernorm(p["norm1"], x), xpos, num_heads, rope_base, attn_impl)
    x = x + mlp(p["mlp"], layernorm(p["norm2"], x))
    return x


def decoder_block_init(rng, dim: int, mlp_ratio: float = 4.0, norm_mem: bool = True) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    p = {
        "norm1": layernorm_init(dim),
        "attn": attention_init(r1, dim),
        "cross_attn": cross_attention_init(r2, dim),
        "norm2": layernorm_init(dim),
        "norm3": layernorm_init(dim),
        "mlp": mlp_init(r3, dim, int(dim * mlp_ratio)),
    }
    if norm_mem:
        p["norm_y"] = layernorm_init(dim)
    return p


def decoder_block(p: Params, x, y, xpos, ypos, num_heads: int, rope_base: float | None,
                  attn_impl: str = "xla"):
    """One decoder block; returns updated x (y passes through,
    blocks.py:224-231)."""
    x = x + attention(p["attn"], layernorm(p["norm1"], x), xpos, num_heads, rope_base, attn_impl)
    y_ = layernorm(p["norm_y"], y) if "norm_y" in p else y
    x = x + cross_attention(
        p["cross_attn"], layernorm(p["norm2"], x), y_, y_, xpos, ypos, num_heads, rope_base,
        attn_impl,
    )
    x = x + mlp(p["mlp"], layernorm(p["norm3"], x))
    return x


# ---------------------------------------------------------------------------
# Patch embedding (blocks.py:247-295; PatchEmbedDust3R semantics)
# ---------------------------------------------------------------------------

def patch_embed_init(rng, patch_size: int, in_chans: int, embed_dim: int) -> Params:
    # torch Conv2d(in, out, k, stride=k); xavier on (out, in*k*k)
    k = patch_size
    w = _xavier(rng, (k, k, in_chans, embed_dim), fan_in=in_chans * k * k, fan_out=embed_dim)
    return {"w": w, "b": jnp.zeros((embed_dim,))}


def patch_embed(p: Params, img: jax.Array, patch_size: int):
    """``img``: (B, H, W, 3) -> tokens (B, N, D), pos (B, N, 2) int32 (y, x).

    The stride==kernel conv is a reshape + one matmul: ideal for the MXU and
    exactly equal to the reference conv.
    """
    b, h, w, c = img.shape
    k = patch_size
    gh, gw = h // k, w // k
    x = img.reshape(b, gh, k, gw, k, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, k * k * c)
    kernel = p["w"].astype(x.dtype).reshape(k * k * c, -1)
    tokens = x @ kernel + p["b"].astype(x.dtype)

    yy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    pos = jnp.stack([yy, xx], axis=-1).reshape(1, gh * gw, 2)
    pos = jnp.broadcast_to(pos, (b, gh * gw, 2))
    return tokens, pos
