"""PyTorch MASt3R checkpoint -> JAX params pytree.

Key layout of the source checkpoint: ``AsymmetricMASt3R`` state dict
(mast3r/model.py:40-68, dust3r/dust3r/model.py:46-210). Conversion rules:

- ``nn.Linear``   weight (out, in)        -> (in, out) transpose
- ``nn.Conv2d``   weight (O, I, kh, kw)   -> HWIO (kh, kw, I, O)
- ``ConvTranspose2d`` weight (I, O, k, k) -> (I, k, k, O) (our matmul layout)
- ``nn.LayerNorm`` weight/bias            -> scale/bias

Works on a plain ``{name: np.ndarray}`` dict so the runtime never needs
torch; ``load_torch_checkpoint`` uses torch (CPU) when installed to read a
``.pth`` and handles the reference's dec_blocks2-duplication rule
(dust3r/model.py:92-99). Converted params can be saved/loaded as ``.npz``.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .mast3r import MASt3RConfig


def _lin(sd, name):
    p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _conv(sd, name, bias=True):
    p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0))}
    if bias and f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _deconv(sd, name):
    return {
        "w": np.ascontiguousarray(sd[f"{name}.weight"].transpose(0, 2, 3, 1)),
        "b": sd[f"{name}.bias"],
    }


def _mlp(sd, name):
    return {"fc1": _lin(sd, f"{name}.fc1"), "fc2": _lin(sd, f"{name}.fc2")}


def _enc_block(sd, name):
    return {
        "norm1": _ln(sd, f"{name}.norm1"),
        "attn": {"qkv": _lin(sd, f"{name}.attn.qkv"), "proj": _lin(sd, f"{name}.attn.proj")},
        "norm2": _ln(sd, f"{name}.norm2"),
        "mlp": _mlp(sd, f"{name}.mlp"),
    }


def _dec_block(sd, name):
    p = {
        "norm1": _ln(sd, f"{name}.norm1"),
        "attn": {"qkv": _lin(sd, f"{name}.attn.qkv"), "proj": _lin(sd, f"{name}.attn.proj")},
        "cross_attn": {
            "projq": _lin(sd, f"{name}.cross_attn.projq"),
            "projk": _lin(sd, f"{name}.cross_attn.projk"),
            "projv": _lin(sd, f"{name}.cross_attn.projv"),
            "proj": _lin(sd, f"{name}.cross_attn.proj"),
        },
        "norm2": _ln(sd, f"{name}.norm2"),
        "norm3": _ln(sd, f"{name}.norm3"),
        "mlp": _mlp(sd, f"{name}.mlp"),
    }
    if f"{name}.norm_y.weight" in sd:
        p["norm_y"] = _ln(sd, f"{name}.norm_y")
    return p


def _dpt(sd, name):
    return {
        "act1_conv": _conv(sd, f"{name}.act_postprocess.0.0"),
        "act1_deconv": _deconv(sd, f"{name}.act_postprocess.0.1"),
        "act2_conv": _conv(sd, f"{name}.act_postprocess.1.0"),
        "act2_deconv": _deconv(sd, f"{name}.act_postprocess.1.1"),
        "act3_conv": _conv(sd, f"{name}.act_postprocess.2.0"),
        "act4_conv": _conv(sd, f"{name}.act_postprocess.3.0"),
        "act4_conv2": _conv(sd, f"{name}.act_postprocess.3.1"),
        "layer_rn": [_conv(sd, f"{name}.scratch.layer{i + 1}_rn", bias=False) for i in range(4)],
        "refine": [
            {
                "res1": {
                    "conv1": _conv(sd, f"{name}.scratch.refinenet{i + 1}.resConfUnit1.conv1"),
                    "conv2": _conv(sd, f"{name}.scratch.refinenet{i + 1}.resConfUnit1.conv2"),
                },
                "res2": {
                    "conv1": _conv(sd, f"{name}.scratch.refinenet{i + 1}.resConfUnit2.conv1"),
                    "conv2": _conv(sd, f"{name}.scratch.refinenet{i + 1}.resConfUnit2.conv2"),
                },
                "out_conv": _conv(sd, f"{name}.scratch.refinenet{i + 1}.out_conv"),
            }
            for i in range(4)
        ],
        "head_conv1": _conv(sd, f"{name}.head.0"),
        "head_conv2": _conv(sd, f"{name}.head.2"),
        "head_conv3": _conv(sd, f"{name}.head.4"),
    }


def _stack(blocks):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *blocks)


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: MASt3RConfig) -> Dict[str, Any]:
    """Convert a torch state dict (as numpy arrays) into the params pytree of
    :func:`frodo_slam_tpu.models.mast3r.init_params`."""
    # dec_blocks2 may be absent in older checkpoints; duplicate dec_blocks
    # (dust3r/model.py:92-99).
    if not any(k.startswith("dec_blocks2") for k in sd):
        sd = dict(sd)
        for k in list(sd):
            if k.startswith("dec_blocks."):
                sd[k.replace("dec_blocks.", "dec_blocks2.", 1)] = sd[k]

    params = {
        "patch_embed": {
            "w": np.ascontiguousarray(sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)),
            "b": sd["patch_embed.proj.bias"],
        },
        "enc_blocks": _stack([_enc_block(sd, f"enc_blocks.{i}") for i in range(cfg.enc_depth)]),
        "enc_norm": _ln(sd, "enc_norm"),
        "decoder_embed": _lin(sd, "decoder_embed"),
        "dec_blocks": _stack([_dec_block(sd, f"dec_blocks.{i}") for i in range(cfg.dec_depth)]),
        "dec_blocks2": _stack([_dec_block(sd, f"dec_blocks2.{i}") for i in range(cfg.dec_depth)]),
        "dec_norm": _ln(sd, "dec_norm"),
    }
    for n in (1, 2):
        params[f"head{n}"] = {
            "dpt": _dpt(sd, f"downstream_head{n}.dpt"),
            "catmlp": {"mlp": _mlp(sd, f"downstream_head{n}.head_local_features")},
        }
    return params


def torch_module_to_numpy_sd(module) -> Dict[str, np.ndarray]:
    """state_dict of a live torch module -> numpy dict (test helper)."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def load_torch_checkpoint(path: str, cfg: MASt3RConfig) -> Dict[str, Any]:
    """Read a reference ``.pth`` checkpoint and convert (requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k: np.asarray(v.float().numpy()) for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_state_dict(sd, cfg)


def save_npz(params: Dict[str, Any], path: str) -> None:
    import jax

    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_npz(path: str, cfg: MASt3RConfig) -> Dict[str, Any]:
    import jax

    from .mast3r import init_params

    template = jax.eval_shape(lambda: init_params(jax.random.PRNGKey(0), cfg))
    data = np.load(path)
    leaves_kp, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, leaf in leaves_kp:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        arr = data[key]
        assert arr.shape == leaf.shape, f"{key}: {arr.shape} != {leaf.shape}"
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)
