"""MASt3R inference orchestration for the SLAM layer.

Behavioral spec: ``mast3r_slam/mast3r_utils.py`` —
``mast3r_inference_mono`` (:208-231), ``mast3r_asymmetric_inference``
(:295-320), ``mast3r_decode_symmetric_batch`` (:115-174),
``mast3r_match_symmetric`` (:234-293).

All functions are pure and jittable; the model params/config ride through.
Outputs use the SLAM layer's flattened layout: X (HW, 3), C (HW, 1),
D (H, W, 24), Q (HW, 1).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import mast3r
from ..ops import matching


class AsymOut(NamedTuple):
    """One-direction decode of (frame, keyframe) + dense match."""

    idx_f2k: jax.Array  # (1, HW) int32: kf pixel -> frame linear index
    valid_match_k: jax.Array  # (1, HW, 1) bool
    Xff: jax.Array  # (HW, 3) frame pointmap (own frame)
    Cff: jax.Array  # (HW, 1)
    Qff: jax.Array  # (HW, 1)
    Xkf: jax.Array  # (HW, 3) keyframe pointmap in frame coords
    Ckf: jax.Array  # (HW, 1)
    Qkf: jax.Array  # (HW, 1)
    Dff: jax.Array  # (HW, desc) frame descriptors (for the fnn fallback)
    Dkf: jax.Array  # (HW, desc)


@partial(jax.jit, static_argnames=("cfg", "img_hw"))
def decode_mono(params, cfg, feat, pos, img_hw):
    """Self-pair decode for map init (mast3r_utils.py:208-231).

    Returns (Xii (HW,3), Cii (HW,1)).
    """
    res11, _ = mast3r.decode_and_heads(params, cfg, feat, pos, feat, pos, img_hw)
    h, w = img_hw
    Xii = res11["pts3d"].reshape(h * w, 3)
    Cii = res11["conf"].reshape(h * w, 1)
    return Xii, Cii


@partial(jax.jit, static_argnames=("model_cfg", "img_hw"))
def _model_stage(params, model_cfg, feat_f, pos_f, feat_k, pos_k, img_hw):
    # THE one jitted pair-decode program, shared by the tracker's per-frame
    # model stage and the backend's consecutive-edge half reuse. Name and
    # signature deliberately match the round-2 tracker._model_stage program
    # so the persistent compile cache still hits (a ViT-L remote compile
    # costs 10-20 min through the tunnel's compile service).
    return mast3r.decode_and_heads(
        params, model_cfg, feat_f, pos_f, feat_k, pos_k, img_hw
    )


def decode_asymmetric(params, cfg, feat_f, pos_f, feat_k, pos_k, img_hw):
    """(frame, keyframe) one-way decode (mast3r_utils.py:295-320).

    Returns per-view pointmaps/conf/desc/desc_conf with frame as view1.

    MUST delegate to the jitted ``_model_stage``: callers outside any jit
    (backend consecutive-edge half reuse, bench backend_step) otherwise run
    the full twin-decoder + heads EAGERLY — hundreds of op-by-op
    dispatches, which through the remote-TPU tunnel (~1-3 ms each) cost
    SECONDS per keyframe. Measured: the round-3 sweep's half-reuse configs
    ran 1.9 FPS vs 17.1 with the half path off, entirely from this one
    missing jit.
    """
    return _model_stage(params, cfg, feat_f, pos_f, feat_k, pos_k, img_hw)


def match_asymmetric(params, cfg, match_cfg, feat_f, pos_f, feat_k, pos_k, img_hw,
                     idx_f2k_init=None) -> AsymOut:
    """Decode + dense match (mast3r_utils.py:389-413 mast3r_match_asymmetric)."""
    res11, res21 = decode_asymmetric(params, cfg, feat_f, pos_f, feat_k, pos_k, img_hw)
    h, w = img_hw
    X11 = res11["pts3d"]  # (1, h, w, 3)
    X21 = res21["pts3d"]
    D11 = res11["desc"]
    D21 = res21["desc"]

    cold_cfg, warm_cfg = matching.split_match_cfg(match_cfg)
    idx_f2k, valid_match_k = matching.match_split(
        X11, X21, D11, D21, idx_f2k_init,
        **(warm_cfg if idx_f2k_init is not None else cold_cfg),
    )
    flat = lambda x, c: x.reshape(h * w, c)  # noqa: E731
    return AsymOut(
        idx_f2k=idx_f2k,
        valid_match_k=valid_match_k,
        Xff=flat(res11["pts3d"], 3),
        Cff=flat(res11["conf"], 1),
        Qff=flat(res11["desc_conf"], 1),
        Xkf=flat(res21["pts3d"], 3),
        Ckf=flat(res21["conf"], 1),
        Qkf=flat(res21["desc_conf"], 1),
        Dff=flat(res11["desc"], res11["desc"].shape[-1]),
        Dkf=flat(res21["desc"], res21["desc"].shape[-1]),
    )


@partial(jax.jit, static_argnames=("cfg", "img_hw"))
def decode_symmetric_batch(params, cfg, feat_i, pos_i, feat_j, pos_j, img_hw):
    """Batched symmetric decode for the backend factor graph
    (mast3r_utils.py:115-174): both directions of N pairs packed into one
    decoder batch of 2N.

    feat_i/feat_j: (N, n_tok, D). Returns X (4, N, h, w, 3), C (4, N, h, w),
    D (4, N, h, w, 24), Q (4, N, h, w) ordered [ii, ji, jj, ij].
    """
    f1 = jnp.concatenate([feat_i, feat_j], axis=0)
    p1 = jnp.concatenate([pos_i, pos_j], axis=0)
    f2 = jnp.concatenate([feat_j, feat_i], axis=0)
    p2 = jnp.concatenate([pos_j, pos_i], axis=0)
    res1, res2 = mast3r.decode_and_heads(params, cfg, f1, p1, f2, p2, img_hw)
    n = feat_i.shape[0]

    def split4(r1, r2):
        return jnp.stack([r1[:n], r2[:n], r1[n:], r2[n:]], axis=0)

    X = split4(res1["pts3d"], res2["pts3d"])
    C = split4(res1["conf"], res2["conf"])
    D = split4(res1["desc"], res2["desc"])
    Q = split4(res1["desc_conf"], res2["desc_conf"])
    return X, C, D, Q


def match_symmetric(params, cfg, match_cfg, feat_i, pos_i, feat_j, pos_j, img_hw):
    """Symmetric matching for backend edges (mast3r_utils.py:234-293).

    Returns (idx_i2j, idx_j2i, valid_match_j, valid_match_i, Qii, Qjj, Qji,
    Qij) with Q* shaped (N, HW, 1).

    Both directions of the N pairs pack into ONE decoder batch of 2N + one
    cold match of 2N (decode_symmetric_batch, the reference's strategy,
    mast3r_utils.py:137-174). An ``asym2`` alternative (two asymmetric
    N-batches through the tracker's cached pair program) looked better in
    isolated serial timings but lost the full-bench A/B twice (17.10 vs
    17.23 r3; neutral-at-best r4 sweep3) — deleted with its knob; the
    isolated-vs-e2e rank inversion is documented in PERF.md round 3.
    """
    mc = dict(match_cfg)
    mc.pop("symmetric_impl", None)  # retired knob: tolerate old configs
    # backend pair matching is never warm-started: full cold-start reach
    cold_cfg, _ = matching.split_match_cfg(mc)
    n = feat_i.shape[0]
    hw = img_hw[0] * img_hw[1]
    rs = lambda a: a.reshape(n, hw, 1)  # noqa: E731

    X, C, D, Q = decode_symmetric_batch(params, cfg, feat_i, pos_i, feat_j, pos_j, img_hw)

    X11 = jnp.concatenate([X[0], X[2]], axis=0)  # (2N, h, w, 3): ii, jj
    X21 = jnp.concatenate([X[1], X[3]], axis=0)  # ji, ij
    D11 = jnp.concatenate([D[0], D[2]], axis=0)
    D21 = jnp.concatenate([D[1], D[3]], axis=0)

    idx_1_to_2, valid_match_2 = matching.match_split(X11, X21, D11, D21, None, **cold_cfg)

    idx_i2j = idx_1_to_2[:n]
    idx_j2i = idx_1_to_2[n:]
    valid_match_j = valid_match_2[:n]
    valid_match_i = valid_match_2[n:]
    return (
        idx_i2j, idx_j2i, valid_match_j, valid_match_i,
        rs(Q[0]), rs(Q[2]), rs(Q[1]), rs(Q[3]),
    )
