"""DPT pointmap head + MASt3R cat-MLP local-feature head, in pure JAX.

Behavioral spec:
- ``croco/models/dpt_block.py:264-449`` (DPTOutputAdapter: act_postprocess
  conv pyramid, layer_rn projections, refinenet fusion, regression head),
- ``dust3r/dust3r/heads/dpt_head.py:20-115`` (hook wiring + fix: crop of
  path_4, deleted duplicate act_*_postprocess weights),
- ``mast3r/catmlp_dpt_head.py:42-123`` (MLP on concat(enc,dec) token ->
  pixel-shuffle local descriptors) and the postprocess at
  ``dust3r/heads/postprocess.py:22-58`` / ``catmlp_dpt_head.py:17-39``.

Everything is channel-last (NHWC) for TPU; convs are ``lax.conv`` with HWIO
kernels; the stride==kernel transposed convs collapse to single matmuls.
Heads run in float32 (the reference disables autocast for them,
``mast3r_utils.py:69-72``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .layers import Params, mlp, mlp_init


# ---------------------------------------------------------------------------
# conv helpers (NHWC / HWIO)
# ---------------------------------------------------------------------------

def conv_init(rng, kh, kw, cin, cout, bias=True) -> Params:
    w = jax.random.normal(rng, (kh, kw, cin, cout)) * (1.0 / np.sqrt(kh * kw * cin))
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,))
    return p


def conv2d(p: Params, x: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv_transpose_init(rng, k, cin, cout) -> Params:
    # torch ConvTranspose2d weight (cin, cout, k, k); stored here as (cin, k, k, cout)
    w = jax.random.normal(rng, (cin, k, k, cout)) * (1.0 / np.sqrt(cin))
    return {"w": w, "b": jnp.zeros((cout,))}


def conv_transpose_matmul(p: Params, x: jax.Array, k: int) -> jax.Array:
    """ConvTranspose2d with stride == kernel == k, padding 0.

    Non-overlapping: each input pixel expands into a k x k output block, which
    is one matmul + reshape (MXU-friendly; no scatter).
    """
    b, h, w, cin = x.shape
    kernel = p["w"].astype(x.dtype).reshape(cin, -1)  # (cin, k*k*cout) after reorder
    cout = p["w"].shape[-1]
    y = x.reshape(b * h * w, cin) @ kernel  # (bhw, k*k*cout)
    y = y.reshape(b, h, w, k, k, cout).transpose(0, 1, 3, 2, 4, 5).reshape(b, h * k, w * k, cout)
    return y + p["b"].astype(x.dtype)


def resize_bilinear_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with torch ``align_corners=True`` grid semantics.

    (jax.image.resize only implements half-pixel centers, so do it by hand:
    gather 4 corners + lerp. Static shapes; fuses into the surrounding convs.)
    """
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x

    def grid(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return jnp.zeros((n_out,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    sy = grid(h, out_h)
    sx = grid(w, out_w)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (sy - y0.astype(jnp.float32)).astype(x.dtype)[None, :, None, None]
    wx = (sx - x0.astype(jnp.float32)).astype(x.dtype)[None, None, :, None]

    rows0 = jnp.take(x, y0, axis=1)
    rows1 = jnp.take(x, y1, axis=1)
    top = jnp.take(rows0, x0, axis=2) * (1 - wx) + jnp.take(rows0, x1, axis=2) * wx
    bot = jnp.take(rows1, x0, axis=2) * (1 - wx) + jnp.take(rows1, x1, axis=2) * wx
    return top * (1 - wy) + bot * wy


# ---------------------------------------------------------------------------
# DPT adapter
# ---------------------------------------------------------------------------

def _residual_conv_unit_init(rng, features: int) -> Params:
    r1, r2 = jax.random.split(rng)
    return {"conv1": conv_init(r1, 3, 3, features, features), "conv2": conv_init(r2, 3, 3, features, features)}


def _residual_conv_unit(p: Params, x: jax.Array) -> jax.Array:
    out = jax.nn.relu(x)
    out = conv2d(p["conv1"], out, padding=1)
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out, padding=1)
    return out + x


def _fusion_block_init(rng, features: int) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "res1": _residual_conv_unit_init(r1, features),
        "res2": _residual_conv_unit_init(r2, features),
        "out_conv": conv_init(r3, 1, 1, features, features),
    }


def _fusion_block(p: Params, x: jax.Array, res: jax.Array | None) -> jax.Array:
    """FeatureFusionBlock_custom (dpt_block.py:142-212), width_ratio == 1."""
    if res is not None:
        x = x + _residual_conv_unit(p["res1"], res)
    x = _residual_conv_unit(p["res2"], x)
    x = resize_bilinear_align_corners(x, 2 * x.shape[1], 2 * x.shape[2])
    return conv2d(p["out_conv"], x)


def dpt_init(
    rng,
    dim_tokens: Sequence[int],
    layer_dims: Sequence[int] = (96, 192, 384, 768),
    feature_dim: int = 256,
    last_dim: int = 128,
    num_channels: int = 4,
) -> Params:
    rs = jax.random.split(rng, 16)
    p: Dict[str, Any] = {
        # act_postprocess (dpt_block.py:346-409)
        "act1_conv": conv_init(rs[0], 1, 1, dim_tokens[0], layer_dims[0]),
        "act1_deconv": conv_transpose_init(rs[1], 4, layer_dims[0], layer_dims[0]),
        "act2_conv": conv_init(rs[2], 1, 1, dim_tokens[1], layer_dims[1]),
        "act2_deconv": conv_transpose_init(rs[3], 2, layer_dims[1], layer_dims[1]),
        "act3_conv": conv_init(rs[4], 1, 1, dim_tokens[2], layer_dims[2]),
        "act4_conv": conv_init(rs[5], 1, 1, dim_tokens[3], layer_dims[3]),
        "act4_conv2": conv_init(rs[6], 3, 3, layer_dims[3], layer_dims[3]),
        # scratch.layer_rn (dpt_block.py:20-77), bias-free 3x3
        "layer_rn": [conv_init(rs[7 + i], 3, 3, layer_dims[i], feature_dim, bias=False) for i in range(4)],
        # refinenets 1-4
        "refine": [_fusion_block_init(rs[11 + i], feature_dim) for i in range(4)],
        # regression head (dpt_block.py:318-325)
        "head_conv1": conv_init(rs[15], 3, 3, feature_dim, feature_dim // 2),
    }
    r16, r17 = jax.random.split(rs[15])
    p["head_conv2"] = conv_init(r16, 3, 3, feature_dim // 2, last_dim)
    p["head_conv3"] = conv_init(r17, 1, 1, last_dim, num_channels)
    return p


def dpt_apply(p: Params, hook_tokens: List[jax.Array], grid_hw) -> jax.Array:
    """``hook_tokens``: 4 token maps (B, N, C_hook) at hooks [0, 2l/4, 3l/4, l].

    Returns (B, H, W, num_channels) where H = 16 * grid_h etc.
    Mirrors DPTOutputAdapter_fix.forward (dpt_head.py:34-66).
    """
    gh, gw = grid_hw
    maps = [t.reshape(t.shape[0], gh, gw, t.shape[-1]) for t in hook_tokens]

    l1 = conv_transpose_matmul(p["act1_deconv"], conv2d(p["act1_conv"], maps[0]), 4)
    l2 = conv_transpose_matmul(p["act2_deconv"], conv2d(p["act2_conv"], maps[1]), 2)
    l3 = conv2d(p["act3_conv"], maps[2])
    l4 = conv2d(p["act4_conv2"], conv2d(p["act4_conv"], maps[3]), stride=2, padding=1)

    layers = [l1, l2, l3, l4]
    layers = [conv2d(p["layer_rn"][i], layers[i], padding=1) for i in range(4)]

    path4 = _fusion_block(p["refine"][3], layers[3], None)
    # dust3r fix: crop path_4 to layers[2] spatial dims (dpt_head.py:57)
    path4 = path4[:, : layers[2].shape[1], : layers[2].shape[2]]
    path3 = _fusion_block(p["refine"][2], path4, layers[2])
    path2 = _fusion_block(p["refine"][1], path3, layers[1])
    path1 = _fusion_block(p["refine"][0], path2, layers[0])

    x = conv2d(p["head_conv1"], path1, padding=1)
    x = resize_bilinear_align_corners(x, 2 * x.shape[1], 2 * x.shape[2])
    x = conv2d(p["head_conv2"], x, padding=1)
    x = jax.nn.relu(x)
    return conv2d(p["head_conv3"], x)


# ---------------------------------------------------------------------------
# Cat-MLP local feature head + postprocess
# ---------------------------------------------------------------------------

def catmlp_init(rng, enc_dim: int, dec_dim: int, local_feat_dim: int, patch_size: int,
                two_confs: bool = True, hidden_dim_factor: float = 4.0) -> Params:
    idim = enc_dim + dec_dim
    out = (local_feat_dim + int(two_confs)) * patch_size**2
    return {"mlp": mlp_init(rng, idim, int(hidden_dim_factor * idim), out)}


def catmlp_apply(p: Params, enc_tokens, dec_tokens, grid_hw, patch_size: int,
                 local_feat_dim: int, two_confs: bool = True) -> jax.Array:
    """MLP on concat(enc,dec) tokens -> per-pixel feature image via
    pixel-shuffle (catmlp_dpt_head.py:71-90). Returns (B, H, W, d+two_confs).
    """
    gh, gw = grid_hw
    ps = patch_size
    d = local_feat_dim + int(two_confs)
    cat = jnp.concatenate([enc_tokens, dec_tokens], axis=-1)
    feats = mlp(p["mlp"], cat)  # (B, N, d*ps*ps)
    b = feats.shape[0]
    # torch: view(B, d*ps*ps, gh, gw) -> pixel_shuffle(ps): channel idx = c*ps*ps + i*ps + j
    feats = feats.reshape(b, gh, gw, d, ps, ps)
    feats = feats.transpose(0, 1, 4, 2, 5, 3).reshape(b, gh * ps, gw * ps, d)
    return feats


def postprocess(fmap: jax.Array, desc_dim: int, conf_vmin: float = 1.0):
    """Activations for the metric MASt3R checkpoint (catmlp_dpt_head.py:25-39):
    depth_mode ('exp',-inf,inf), conf_mode ('exp',1,inf),
    desc_conf_mode ('exp',0,inf), desc 'norm'.

    ``fmap``: (B, H, W, 3+1+desc_dim+1). Returns dict with pts3d, conf, desc,
    desc_conf.
    """
    xyz = fmap[..., 0:3]
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts3d = xyz / jnp.clip(d, 1e-8) * jnp.expm1(d)  # reg_dense_depth 'exp'
    conf = conf_vmin + jnp.exp(fmap[..., 3])  # reg_dense_conf ('exp',1,inf)
    desc = fmap[..., 4 : 4 + desc_dim]
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc_conf = jnp.exp(fmap[..., 4 + desc_dim])  # ('exp',0,inf)
    return {"pts3d": pts3d, "conf": conf, "desc": desc, "desc_conf": desc_conf}
