"""Retrieval feature head: whiten -> project -> attention top-k.

Behavioral spec: ``mast3r/retrieval/model.py`` — ``Whitener`` (:55-76),
``build_projector`` (:144-157), ``featweights='l2norm'`` attention (:132-134),
``how_select_local`` (:88-104) — and the SLAM-side wrapper ``prep_features``
(``mast3r_slam/retrieval_database.py:30-46``).

Pure JAX; the whitener runs in f32 (the reference forces f64 for the tiny
(N,1024)x(1024,1024) matmul, which is noise here), everything jittable so the
whole per-keyframe feature prep is one fused program on TPU.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..models.layers import layernorm, layernorm_init, linear, linear_init

Params = Dict[str, Any]


def whitener_init(dim: int) -> Params:
    return {"m": jnp.zeros((1, dim)), "p": jnp.eye(dim)}


def whitener(p: Params, x: jax.Array, l2norm: bool = False) -> jax.Array:
    y = (x - p["m"].astype(x.dtype)) @ p["p"].astype(x.dtype)
    if l2norm:
        y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    return y


def projector_init(rng, d_in: int, hdims: List[int]) -> Params:
    """MLP: [Linear, LN, GELU] x (len-1) + final Linear (model.py:144-157)."""
    layers = []
    d = d_in
    keys = jax.random.split(rng, max(len(hdims), 1))
    for i, h in enumerate(hdims[:-1]):
        layers.append({"lin": linear_init(keys[i], d, h), "ln": layernorm_init(h)})
        d = h
    final = linear_init(keys[-1], d, hdims[-1]) if hdims else None
    return {"layers": layers, "final": final}


def projector(p: Params, x: jax.Array) -> jax.Array:
    for layer in p["layers"]:
        x = jax.nn.gelu(layernorm(layer["ln"], linear(layer["lin"], x)), approximate=False)
    if p["final"] is not None:
        x = linear(p["final"], x)
    return x


def how_select_local(feat: jax.Array, attn: jax.Array, nfeat: int):
    """Top-nfeat features by attention (model.py:88-104).

    feat: (B, N, C); attn: (B, N). Returns (B, nfeat, C), attn, indices.
    """
    k = min(int(nfeat), attn.shape[1])
    topk_attn, topk_idx = jax.lax.top_k(attn, k)
    topk_feat = jnp.take_along_axis(feat, topk_idx[..., None], axis=1)
    return topk_feat, topk_attn, topk_idx


class RetrievalHead:
    """Config + params holder with a jitted ``prep_features``."""

    def __init__(self, params: Params, nfeat: int = 300, residual: bool = False):
        self.params = params
        self.nfeat = nfeat
        self.residual = residual

        def _prep(params, backbone_feat):
            pre = whitener(params["prewhiten"], backbone_feat)
            proj = projector(params["projector"], pre)
            if self.residual:
                proj = proj + pre
            attn = jnp.linalg.norm(proj, axis=-1)  # featweights='l2norm'
            proj_w = whitener(params["postwhiten"], proj)
            topk, _, _ = how_select_local(proj_w, attn, self.nfeat)
            return topk

        self._prep = jax.jit(_prep)

    @staticmethod
    def init(rng, backbone_dim: int = 1024, hdims: List[int] = [1024], nfeat: int = 300) -> "RetrievalHead":
        params = {
            "prewhiten": whitener_init(backbone_dim),
            "projector": projector_init(rng, backbone_dim, hdims),
            "postwhiten": whitener_init(hdims[-1] if hdims else backbone_dim),
        }
        return RetrievalHead(params, nfeat=nfeat)

    def prep_features(self, backbone_feat: jax.Array) -> jax.Array:
        """(B, N, enc_dim) encoder tokens -> (B, nfeat, dim) local features
        (retrieval_database.py:30-46)."""
        return self._prep(self.params, backbone_feat)


def convert_retrieval_checkpoint(sd, hdims: List[int] = [1024]) -> Params:
    """Torch retrieval ckpt state dict (numpy values) -> params pytree."""
    import numpy as np

    p = {
        "prewhiten": {"m": np.asarray(sd["prewhiten.m"], np.float32),
                      "p": np.asarray(sd["prewhiten.p"], np.float32)},
        "postwhiten": {"m": np.asarray(sd["postwhiten.m"], np.float32),
                       "p": np.asarray(sd["postwhiten.p"], np.float32)},
    }
    layers = []
    n_hidden = len(hdims) - 1
    for i in range(n_hidden):
        layers.append({
            "lin": {"w": sd[f"projector.{3*i}.weight"].T, "b": sd[f"projector.{3*i}.bias"]},
            "ln": {"scale": sd[f"projector.{3*i+1}.weight"], "bias": sd[f"projector.{3*i+1}.bias"]},
        })
    fi = 3 * n_hidden
    p["projector"] = {
        "layers": layers,
        "final": {"w": sd[f"projector.{fi}.weight"].T, "b": sd[f"projector.{fi}.bias"]},
    }
    return p
