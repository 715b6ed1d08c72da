"""Model/retriever loading (the ``load_mast3r`` / ``load_retriever`` layer,
``mast3r_slam/mast3r_utils.py:14-52``).

Checkpoint resolution order:
1. ``<path>.npz`` — converted JAX params (fast path; produce once with
   ``python -m frodo_slam_tpu.loader convert <ckpt.pth> <out.npz>``),
2. ``<path>.pth`` — original torch checkpoint (requires torch, converts on
   the fly),
3. none found — randomly initialized weights with a loud warning (geometry
   will be meaningless; useful for benchmarks and smoke tests only).
"""

from __future__ import annotations

import os
import pathlib
import sys
import warnings
from typing import Optional, Tuple

import jax
import numpy as np

from .models import convert, mast3r

DEFAULT_CKPT = "checkpoints/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth"
DEFAULT_RETRIEVAL = "checkpoints/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric_retrieval_trainingfree.pth"


def load_mast3r(path: Optional[str] = None, cfg: Optional[mast3r.MASt3RConfig] = None
                ) -> Tuple[dict, mast3r.MASt3RConfig]:
    """Returns (params, model_cfg)."""
    cfg = cfg or mast3r.MASt3RConfig()
    path = path or DEFAULT_CKPT
    npz = pathlib.Path(path).with_suffix(".npz")
    if npz.exists():
        params = convert.load_npz(str(npz), cfg)
        return mast3r.cast_transformer_params(params, cfg.dtype), cfg
    if pathlib.Path(path).exists():
        params = convert.load_torch_checkpoint(path, cfg)
        return mast3r.cast_transformer_params(params, cfg.dtype), cfg
    warnings.warn(
        f"checkpoint not found at {path}; using RANDOM weights — pointmaps "
        "will be meaningless (benchmark/smoke-test mode only)"
    )
    if os.environ.get("FRODO_ENTRY_TINY"):
        import dataclasses

        # keep the caller's compute knobs — but only those EXPLICITLY set
        # (different from MASt3RConfig defaults): tiny_config() deliberately
        # defaults dtype=float32 for CPU smoke runs, and blindly copying the
        # caller's bf16 default silently flipped those to bf16 (ADVICE r3)
        base = mast3r.MASt3RConfig()
        reps = {
            k: getattr(cfg, k)
            for k in ("dtype", "head_dtype", "attention_impl")
            if getattr(cfg, k) != getattr(base, k)
        }
        cfg = dataclasses.replace(mast3r.tiny_config(), **reps)
    params = mast3r.init_params(jax.random.PRNGKey(0), cfg)
    if os.environ.get("FRODO_RANDOM_SHARE_DECODER"):
        # benchmark-mode random weights: share decoder2/head2 := decoder/
        # head1 so identical frames decode consistently and the matcher/
        # tracker run their success branches (bench.py does the same; with
        # independent random weights cross-view pointmaps never agree and
        # every frame is legitimately rejected)
        params["head2"] = params["head1"]
        params["dec_blocks2"] = params["dec_blocks"]
    return mast3r.cast_transformer_params(params, cfg.dtype), cfg


def apply_tpu_model_knobs(model_cfg: mast3r.MASt3RConfig, cfg) -> mast3r.MASt3RConfig:
    """Apply the yaml ``tpu:`` model-compute knobs to a loaded model config.

    ``tpu.dtype`` (enc/dec compute), ``tpu.head_dtype`` (DPT/desc heads —
    float32 is the reference contract, mast3r_utils.py:88; bfloat16 trades
    ~0.4% depth quantization for ~+1 FPS e2e, PERF.md r3), and
    ``tpu.attention_impl`` (xla | pallas). Missing keys leave the model
    config untouched."""
    import dataclasses

    import jax.numpy as jnp

    tpu = cfg.get("tpu", {}) or {}
    reps = {}
    if tpu.get("dtype"):
        reps["dtype"] = jnp.dtype(str(tpu["dtype"]))
    if tpu.get("head_dtype"):
        reps["head_dtype"] = jnp.dtype(str(tpu["head_dtype"]))
    if tpu.get("attention_impl"):
        reps["attention_impl"] = str(tpu["attention_impl"])
    return dataclasses.replace(model_cfg, **reps) if reps else model_cfg


def head_fingerprint(head) -> str:
    """Deterministic digest of the retrieval-head params. Stored into the
    codebook pickle by scripts/train_codebook.py so a codebook can be
    verified against the head it was trained for — a trained codebook
    silently pairing with a different head (e.g. a random-init one) must be
    flagged degraded, not recorded as real retrieval (ADVICE r2)."""
    import hashlib

    md = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(head.params):
        md.update(np.asarray(leaf, np.float32).tobytes())
    return md.hexdigest()[:16]


def load_retriever(model_cfg: mast3r.MASt3RConfig, path: Optional[str] = None,
                   codebook_path: Optional[str] = None):
    """Returns a RetrievalDatabase, or None when retrieval assets are
    missing entirely."""
    from .retrieval.asmk import Codebook
    from .retrieval.database import RetrievalDatabase
    from .retrieval.model import RetrievalHead, convert_retrieval_checkpoint

    path = path or DEFAULT_RETRIEVAL
    head = None
    if pathlib.Path(path).exists():
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = {k: np.asarray(v.float().numpy()) for k, v in ckpt["model"].items() if hasattr(v, "numpy")}
        head = RetrievalHead(convert_retrieval_checkpoint(sd), nfeat=300)

    # the codebook loads independently of the head checkpoint: a
    # self-trained one (scripts/train_codebook.py) pairs with the
    # deterministic random-init head it was trained against
    cb_file = codebook_path or str(pathlib.Path(path).parent / (
        "_".join(pathlib.Path(path).name.split("_")[:-1]) + "_codebook.pkl"))
    centroids = None
    cb_data = None
    if pathlib.Path(cb_file).exists():
        import pickle

        with open(cb_file, "rb") as f:
            cb_data = pickle.load(f)
        centroids = np.asarray(
            cb_data["centroids"] if isinstance(cb_data, dict) else cb_data.centroids
        )

    head_is_random = head is None
    if head is None:
        if centroids is None:
            warnings.warn("retrieval checkpoint/codebook not found; using random "
                          "retrieval head + codebook (loop closures will be random)")
        head = RetrievalHead.init(jax.random.PRNGKey(1), backbone_dim=model_cfg.enc_embed_dim,
                                  hdims=[min(1024, model_cfg.enc_embed_dim)], nfeat=300)
    if centroids is not None:
        # verify the codebook was trained against THIS head. Pickles written
        # by scripts/train_codebook.py carry the trainer head's fingerprint;
        # reference-shipped pickles don't — those are trusted only when the
        # head itself came from a real checkpoint (same provenance).
        fp = cb_data.get("head_fingerprint") if isinstance(cb_data, dict) else None
        if fp is not None:
            matched = fp == head_fingerprint(head)
        else:
            matched = None if head_is_random else True
        if matched is not True:
            warnings.warn(
                f"codebook {cb_file} was not trained against the loaded "
                f"retrieval head ({'fingerprint mismatch' if matched is False else 'no fingerprint; head is random-init'}); "
                "marking retrieval degraded"
            )
        return RetrievalDatabase(head, Codebook(centroids),
                                 degraded=matched is not True)
    dim = 1024 if head.params["projector"]["final"] is None else head.params["projector"]["final"]["w"].shape[1]
    cb = Codebook.random(np.random.default_rng(0), 4096, int(dim))
    # degraded=True: eval runs must record the random fallback (VERDICT:
    # numbers with random loop closures must never look like real ones)
    return RetrievalDatabase(head, cb, degraded=True)


def _cli_convert(argv):
    src, dst = argv
    cfg = mast3r.MASt3RConfig()
    params = convert.load_torch_checkpoint(src, cfg)
    convert.save_npz(params, dst)
    print(f"converted {src} -> {dst}")


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "convert":
        _cli_convert(sys.argv[2:])
