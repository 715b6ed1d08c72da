"""Device-mesh sharding for multi-chip pair decoding.

The reference's only multi-device story is "run the backend process on a
second GPU" (run_vio.py:111-114) with a full second model copy. The
TPU-native replacement: ONE program, a (dp, tp) ``jax.sharding.Mesh``, and
GSPMD sharding of the heavy compute — the batched symmetric decoder pass
that builds backend factor-graph edges (mast3r_utils.py:115-174 batches 2N
pair decodes; that batch shards over dp, and the transformer's attention
heads / MLP hidden dim shard over tp so collectives ride ICI).

All functions are layout-only: they attach ``NamedSharding`` to existing
pytrees; jit + XLA insert the collectives.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = dp * tp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def default_mesh(placement: str = "overlap"):
    """The backend's (dp, tp) mesh, or None on a single chip — the auto
    layout the CLIs hand to ``SLAM(mesh=...)``.

    ``placement`` (config ``tpu.placement``):

    - ``"overlap"`` (default): the backend mesh covers devices[1:] and the
      per-frame tracker keeps device 0 to itself — the TPU-native analogue
      of the reference's backend-on-second-GPU split (run_vio.py:111-114).
      The tracker's params stay unsharded on device 0 (SLAM never shards
      them); the backend holds its own tp-sharded copy on its mesh (the
      reference also loads a second model copy per GPU, vio.py:79,199), so
      keyframe-rate decode/match/BA dispatches run on their own chips'
      streams and never stall the per-frame path.
    - ``"shared"``: one mesh over ALL devices (backend work interleaves
      with tracking on device 0 — more chips per backend op, but the
      per-frame stream pays the backend burst).
    """
    n = len(jax.devices())
    if n <= 1:
        return None
    if placement == "overlap" and n >= 2:
        rest = jax.devices()[1:]
        tp = 2 if len(rest) % 2 == 0 else 1
        return make_mesh(dp=len(rest) // tp, tp=tp, devices=rest)
    tp = 2 if n % 2 == 0 else 1
    return make_mesh(dp=n // tp, tp=tp)


def _pspec_for_path(path: str, ndim: int) -> P:
    """Tensor-parallel layout for the MASt3R transformer params.

    Megatron-style: qkv/fc1 shard the output features over tp, proj/fc2
    shard the input features, everything else replicated. Params are stacked
    per-layer (leading L axis), so feature axes shift right by one.
    """
    if ndim < 2:
        return P()
    # stacked layer weights: (L, in, out); unstacked: (in, out)
    if "attn/qkv/w" in path or "projq/w" in path or "projk/w" in path or "projv/w" in path:
        return P(*([None] * (ndim - 1) + ["tp"]))  # shard out features
    if "fc1/w" in path:
        return P(*([None] * (ndim - 1) + ["tp"]))
    if "attn/proj/w" in path or "cross_attn/proj/w" in path:
        return P(*([None] * (ndim - 2) + ["tp", None]))  # shard in features
    if "fc2/w" in path:
        return P(*([None] * (ndim - 2) + ["tp", None]))
    return P()


def _path_str(kp) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place model params on the mesh with tensor-parallel layouts."""

    def place(kp, leaf):
        spec = _pspec_for_path(_path_str(kp), np.ndim(leaf))
        # biases of tp-sharded outputs follow the feature axis
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(x, mesh: Mesh):
    """Shard a (B, ...) batch over the dp axis (pair-decode batch)."""

    def place(leaf):
        spec = P("dp", *([None] * (np.ndim(leaf) - 1))) if np.ndim(leaf) >= 1 else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, x)


def replicate(x, mesh: Mesh):
    return jax.tree.map(lambda l: jax.device_put(l, NamedSharding(mesh, P())), x)
