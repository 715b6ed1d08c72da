"""The MASt3R two-view pointmap network, assembled in pure JAX.

Architecture of record (the published
``MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric`` checkpoint, instantiated
at ``mast3r/model.py:21-37`` / ``dust3r/dust3r/model.py:46-210`` /
``croco/models/croco.py:21-112``):

- shared ViT-L encoder: patch 16, dim 1024, depth 24, heads 16, RoPE base 100
- two decoders (``dec_blocks``, ``dec_blocks2``): dim 768, depth 12, heads 12,
  cross-attending to the other view each layer
- per-view DPT head (hooks [0, 6, 9, 12]) for pts3d+conf and a cat-MLP
  pixel-shuffle head for 24-dim local descriptors + desc confidence
- postprocess: pts3d = unit(xyz) * expm1(|xyz|), conf = 1 + exp, desc
  L2-normalized, desc_conf = exp

Functional API (params are plain pytrees):
    encode_image(params, cfg, img)            -> feat (B,N,1024), pos (B,N,2)
    decode(params, cfg, f1, p1, f2, p2)       -> hook token lists per view
    downstream_head(params, cfg, hooks, hw)   -> dict(pts3d, conf, desc, desc_conf)
    inference(params, cfg, img1, img2)        -> (res11, res21)  [one direction]

The encoder/decoder run in ``cfg.dtype`` (bf16 by default, like the reference
autocast ``mast3r_utils.py:88-211``); heads run in f32
(``dust3r/model.py:205-207``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from . import dpt as dpt_mod
from .layers import (
    Params,
    block,
    block_init,
    decoder_block,
    decoder_block_init,
    layernorm,
    layernorm_init,
    linear,
    linear_init,
    patch_embed,
    patch_embed_init,
)


@dataclasses.dataclass(frozen=True)
class MASt3RConfig:
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    local_feat_dim: int = 24
    two_confs: bool = True
    dpt_feature_dim: int = 256
    dpt_layer_dims: Tuple[int, ...] = (96, 192, 384, 768)
    dtype: Any = jnp.bfloat16  # encoder/decoder compute dtype
    # head compute dtype. f32 is the reference contract
    # (dust3r/model.py:205-207); bf16 halves the DPT conv cost on the MXU
    # at a small numeric deviation (validated vs f32 by test_model_parity)
    head_dtype: Any = jnp.float32
    attention_impl: str = "xla"  # "xla" | "pallas" (TPU flash-attention kernel)
    # portrait inputs (true height > width) are stored transposed into
    # landscape layout and flagged here; the patch embed / heads transpose
    # in and out (the reference's ManyAR_PatchEmbed + transpose_to_landscape
    # contract). Static: one aspect per compiled program.
    portrait: bool = False

    @property
    def hooks(self) -> Tuple[int, int, int, int]:
        l2 = self.dec_depth
        return (0, l2 * 2 // 4, l2 * 3 // 4, l2)

    @property
    def dpt_last_dim(self) -> int:
        return self.dpt_feature_dim // 2


def tiny_config(**kw) -> MASt3RConfig:
    """Small config for CPU tests; dec_depth stays 12 (head hooks require >9,
    catmlp_dpt_head.py:108)."""
    kw.setdefault("enc_embed_dim", 64)
    kw.setdefault("enc_depth", 2)
    kw.setdefault("enc_num_heads", 2)
    kw.setdefault("dec_embed_dim", 48)
    kw.setdefault("dec_depth", 12)
    kw.setdefault("dec_num_heads", 2)
    kw.setdefault("dtype", jnp.float32)
    return MASt3RConfig(**kw)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _stack_layers(layer_params: List[Params]) -> Params:
    """Stack a list of identically-shaped layer pytrees along a new leading
    axis so the whole stack scans with ``lax.scan``."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)


def cast_transformer_params(params: Params, dtype=jnp.bfloat16) -> Params:
    """Cast the encoder/decoder weights to the compute dtype ONCE.

    ``linear`` casts weights to the activation dtype per use; with f32 master
    weights that re-streams ~2.6GB f32 + writes ~1.3GB bf16 EVERY frame.
    Heads stay f32 (they compute in f32, dust3r/model.py:205-207); layernorm
    params are upcast internally either way.
    """
    out = dict(params)
    for k in ("patch_embed", "enc_blocks", "decoder_embed", "dec_blocks", "dec_blocks2"):
        out[k] = jax.tree.map(lambda x: x.astype(dtype), params[k])
    return out


def init_params(rng, cfg: MASt3RConfig) -> Params:
    keys = jax.random.split(rng, 8)
    enc_blocks = _stack_layers(
        [block_init(k, cfg.enc_embed_dim, cfg.mlp_ratio) for k in jax.random.split(keys[0], cfg.enc_depth)]
    )
    dec_blocks = _stack_layers(
        [decoder_block_init(k, cfg.dec_embed_dim, cfg.mlp_ratio) for k in jax.random.split(keys[1], cfg.dec_depth)]
    )
    dec_blocks2 = _stack_layers(
        [decoder_block_init(k, cfg.dec_embed_dim, cfg.mlp_ratio) for k in jax.random.split(keys[2], cfg.dec_depth)]
    )
    dim_tokens = (cfg.enc_embed_dim,) + (cfg.dec_embed_dim,) * 3
    head = lambda k: {  # noqa: E731
        "dpt": dpt_mod.dpt_init(
            k,
            dim_tokens,
            cfg.dpt_layer_dims,
            cfg.dpt_feature_dim,
            cfg.dpt_last_dim,
            num_channels=4,
        ),
        "catmlp": dpt_mod.catmlp_init(
            k, cfg.enc_embed_dim, cfg.dec_embed_dim, cfg.local_feat_dim, cfg.patch_size, cfg.two_confs
        ),
    }
    return {
        "patch_embed": patch_embed_init(keys[3], cfg.patch_size, 3, cfg.enc_embed_dim),
        "enc_blocks": enc_blocks,
        "enc_norm": layernorm_init(cfg.enc_embed_dim),
        "decoder_embed": linear_init(keys[4], cfg.enc_embed_dim, cfg.dec_embed_dim),
        "dec_blocks": dec_blocks,
        "dec_blocks2": dec_blocks2,
        "dec_norm": layernorm_init(cfg.dec_embed_dim),
        "head1": head(keys[5]),
        "head2": head(keys[6]),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def encode_image(params: Params, cfg: MASt3RConfig, img: jax.Array,
                 portrait=None):
    """``img``: (B, H, W, 3) ImgNorm'd, stored landscape (W >= H). Returns
    f32 feat (B, N, D), pos.

    Spec: ``dust3r/model.py:127-139`` (`_encode_image`). ``portrait=True``
    follows the reference's ``ManyAR_PatchEmbed`` contract
    (dust3r/patch_embed.py:43-71): a portrait image is stored transposed
    into landscape layout; the patch embed transposes it back before the
    conv, so tokens come out in portrait raster order with portrait (y, x)
    positions. Static flag (defaults to ``cfg.portrait``): one aspect per
    compiled program (TPU shapes)."""
    portrait = cfg.portrait if portrait is None else portrait
    if portrait:
        img = jnp.swapaxes(img, 1, 2)
    x, pos = patch_embed(params["patch_embed"], img.astype(cfg.dtype), cfg.patch_size)

    def step(carry, layer_p):
        return block(layer_p, carry, pos, cfg.enc_num_heads, cfg.rope_base,
                     cfg.attention_impl), None

    x, _ = jax.lax.scan(step, x, params["enc_blocks"])
    x = layernorm(params["enc_norm"], x)
    return x.astype(jnp.float32), pos


def decode(params: Params, cfg: MASt3RConfig, f1, pos1, f2, pos2):
    """Cross-attending twin decoders (``dust3r/model.py:171-190``).

    Returns (hooks1, hooks2): for each view the 4 hook activations
    [enc_out, dec_{l/2}, dec_{3l/4}, dec_norm(dec_l)] in f32, ready for the
    DPT head, plus the normed final decoder tokens (== hooks[3]).
    """
    enc1, enc2 = f1, f2
    x1 = linear(params["decoder_embed"], f1.astype(cfg.dtype))
    x2 = linear(params["decoder_embed"], f2.astype(cfg.dtype))

    # The two decoders are independent weight stacks over mirrored inputs;
    # pair them into one batched computation (vmap over stacked weights) so
    # every matmul is twice as large and the kernel count halves — B=1
    # two-view decode is otherwise badly MXU-underutilized.
    xp = jnp.stack([x1, x2])  # (2, B, N, D)
    pp = jnp.stack([pos1, pos2])
    pp_swap = jnp.flip(pp, axis=0)
    paired = jax.tree.map(
        lambda a, b: jnp.stack([a, b], axis=1), params["dec_blocks"], params["dec_blocks2"]
    )  # leaves (L, 2, ...)

    block_pair = jax.vmap(
        lambda p, x, y, px, py: decoder_block(
            p, x, y, px, py, cfg.dec_num_heads, cfg.rope_base, cfg.attention_impl
        )
    )

    def step(carry, layer_p):
        xp = carry
        yp = jnp.flip(xp, axis=0)  # each stream cross-attends to the other
        xp_new = block_pair(layer_p, xp, yp, pp, pp_swap)
        return xp_new, xp_new

    _, ys = jax.lax.scan(step, xp, paired)  # (L, 2, B, N, D)
    ys1, ys2 = ys[:, 0], ys[:, 1]
    # ys: (depth, B, N, D); hook indices 1..depth map to ys[hook-1]
    h1, h2, h3 = cfg.hooks[1] - 1, cfg.hooks[2] - 1, cfg.hooks[3] - 1
    d1_last = layernorm(params["dec_norm"], ys1[h3]).astype(jnp.float32)
    d2_last = layernorm(params["dec_norm"], ys2[h3]).astype(jnp.float32)
    hooks1 = [enc1, ys1[h1].astype(jnp.float32), ys1[h2].astype(jnp.float32), d1_last]
    hooks2 = [enc2, ys2[h1].astype(jnp.float32), ys2[h2].astype(jnp.float32), d2_last]
    return hooks1, hooks2


def _transpose_res(res: Dict) -> Dict:
    """Swap the spatial axes of every head output map — the reference's
    ``transposed()`` (dust3r/utils/misc.py:108) bringing a portrait-computed
    result back to the landscape storage layout."""
    return {k: jnp.swapaxes(v, 1, 2) for k, v in res.items()}


def downstream_head(params_head: Params, cfg: MASt3RConfig, hooks: List[jax.Array], img_hw,
                    portrait=None):
    """DPT + cat-MLP head + postprocess, all f32
    (catmlp_dpt_head.py:71-96).

    ``img_hw`` is always the landscape storage shape (h <= w). With
    ``portrait=True`` the head computes at the true portrait grid (w, h) and
    the outputs are transposed back to landscape layout — the reference's
    ``transpose_to_landscape`` wrapper (dust3r/utils/misc.py:56-108)."""
    portrait = cfg.portrait if portrait is None else portrait
    h, w = img_hw
    if portrait:
        h, w = w, h
    grid = (h // cfg.patch_size, w // cfg.patch_size)
    hooks = [t.astype(cfg.head_dtype) for t in hooks]
    pts_conf = dpt_mod.dpt_apply(params_head["dpt"], hooks, grid)  # (B,H,W,4)
    local = dpt_mod.catmlp_apply(
        params_head["catmlp"], hooks[0], hooks[3], grid, cfg.patch_size, cfg.local_feat_dim, cfg.two_confs
    )  # (B,H,W,d+1)
    fmap = jnp.concatenate([pts_conf, local], axis=-1).astype(jnp.float32)
    res = dpt_mod.postprocess(fmap, cfg.local_feat_dim)
    return _transpose_res(res) if portrait else res


def decode_and_heads(params: Params, cfg: MASt3RConfig, f1, pos1, f2, pos2, img_hw,
                     portrait=None):
    """One decoder pass + both heads — the reference's ``decoder()``
    (mast3r_utils.py:56-72). Returns (res1, res2) dicts.

    ``portrait`` applies the ``transpose_to_landscape`` head contract to
    both views (see ``downstream_head``); both views must share the aspect.

    The DPT heads run SEQUENTIALLY: vmapping the conv-heavy DPT over stacked
    head weights lowers to looped/grouped convolutions that run ~6x slower
    than two plain passes (measured 16.9ms vmapped vs 2x2.6ms sequential on
    v5e). The cat-MLP heads are pure matmuls, which DO batch cleanly — they
    run as one vmapped pair."""
    portrait = cfg.portrait if portrait is None else portrait
    hooks1, hooks2 = decode(params, cfg, f1, pos1, f2, pos2)
    h, w = img_hw
    if portrait:
        h, w = w, h
    grid = (h // cfg.patch_size, w // cfg.patch_size)
    hooks1 = [t.astype(cfg.head_dtype) for t in hooks1]
    hooks2 = [t.astype(cfg.head_dtype) for t in hooks2]

    pc1 = dpt_mod.dpt_apply(params["head1"]["dpt"], hooks1, grid)
    pc2 = dpt_mod.dpt_apply(params["head2"]["dpt"], hooks2, grid)

    cat_p = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        params["head1"]["catmlp"], params["head2"]["catmlp"],
    )
    enc = jnp.stack([hooks1[0], hooks2[0]])
    dec = jnp.stack([hooks1[3], hooks2[3]])
    local = jax.vmap(
        lambda p, e, d: dpt_mod.catmlp_apply(
            p, e, d, grid, cfg.patch_size, cfg.local_feat_dim, cfg.two_confs
        )
    )(cat_p, enc, dec)

    res1 = dpt_mod.postprocess(
        jnp.concatenate([pc1, local[0]], axis=-1).astype(jnp.float32),
        cfg.local_feat_dim,
    )
    res2 = dpt_mod.postprocess(
        jnp.concatenate([pc2, local[1]], axis=-1).astype(jnp.float32),
        cfg.local_feat_dim,
    )
    if portrait:
        res1, res2 = _transpose_res(res1), _transpose_res(res2)
    return res1, res2


def inference(params: Params, cfg: MASt3RConfig, img1: jax.Array, img2: jax.Array,
              portrait=None):
    """Full two-view forward (``dust3r/model.py:198-210``), images NHWC
    in landscape storage layout (transposed when ``portrait``)."""
    f1, pos1 = encode_image(params, cfg, img1, portrait)
    f2, pos2 = encode_image(params, cfg, img2, portrait)
    return decode_and_heads(params, cfg, f1, pos1, f2, pos2, img1.shape[1:3], portrait)


def stack_xcdq(res11: Dict, res21: Dict):
    """Stack one decode direction into the (2b, h, w, ·) X/C/D/Q layout used
    by the SLAM layer (mast3r_utils.py:330-345)."""
    X = jnp.concatenate([res11["pts3d"], res21["pts3d"]], axis=0)
    C = jnp.concatenate([res11["conf"], res21["conf"]], axis=0)
    D = jnp.concatenate([res11["desc"], res21["desc"]], axis=0)
    Q = jnp.concatenate([res11["desc_conf"], res21["desc_conf"]], axis=0)
    return X, C, D, Q
