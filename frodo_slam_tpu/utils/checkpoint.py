"""SLAM-state checkpoint / resume.

The reference persists nothing mid-run (SURVEY.md section 5: outputs are
written only at termination; model weights load from ``checkpoints/``).
For production service deployment, this module adds full map checkpointing:
the KeyframeStore pytree, backend edge arrays, PGO state, and host-side
bookkeeping serialize to one compressed ``.npz`` + a small JSON sidecar —
restartable mid-sequence.

Uses plain numpy serialization (orbax is available in the image but brings
async machinery we don't need for a <1GB single-host state).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import jax
import numpy as np


def _flatten_with_names(tree, prefix: str):
    out = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        out[key] = np.asarray(leaf)
    return out


def save_slam_state(slam, path: str) -> str:
    """Checkpoint a ``SLAM`` instance's map state (not the model weights)."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)

    arrays = {}
    arrays.update(_flatten_with_names(slam.store, "store/"))
    arrays.update(_flatten_with_names(slam.backend.edges, "edges/"))
    arrays.update(_flatten_with_names(slam.backend.odom, "odom/"))
    arrays.update(_flatten_with_names(slam.pgo, "pgo/"))
    if slam.retrieval is not None:
        # loop-closure retrieval is map state too: without it, a resumed run
        # can never close loops against pre-checkpoint keyframes
        for k, v in slam.retrieval.state_arrays().items():
            arrays["rdb/" + k] = v
    np.savez_compressed(str(path), **arrays)

    meta = {
        "mode": slam.mode.name,
        "frame_count": slam.frame_count,
        "loss_track_counter": slam.loss_track_counter,
        "kf_timestamps": list(map(float, slam.kf_timestamps)),
        "current_T_WC": np.asarray(slam.current_T_WC).tolist(),
        "backend_pairs": [list(p) for p in slam.backend._pairs],
        "backend_odom_pairs": [list(p) for p in slam.backend._odom_pairs],
        "backend_n_odom": slam.backend._n_odom,
        "atlas_maps": len(slam.atlas),
    }
    with open(str(path) + ".json", "w") as f:
        json.dump(meta, f)
    return str(path)


def _unflatten_like(template, data, prefix: str):
    leaves_kp, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, leaf in leaves_kp:
        key = prefix + "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        arr = data[key]
        assert arr.shape == leaf.shape, f"{key}: {arr.shape} != {leaf.shape}"
        leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_slam_state(slam, path: str) -> None:
    """Restore a checkpoint into a compatibly-constructed ``SLAM``."""
    from ..slam.frame import Mode

    data = np.load(str(path))
    slam.store = _unflatten_like(slam.store, data, "store/")
    slam.backend.edges = _unflatten_like(slam.backend.edges, data, "edges/")
    slam.backend.odom = _unflatten_like(slam.backend.odom, data, "odom/")
    slam.pgo = _unflatten_like(slam.pgo, data, "pgo/")

    with open(str(path) + ".json") as f:
        meta = json.load(f)
    slam.mode = Mode[meta["mode"]]
    slam.frame_count = meta["frame_count"]
    slam.loss_track_counter = meta["loss_track_counter"]
    slam.kf_timestamps = meta["kf_timestamps"]
    slam.current_T_WC = np.asarray(meta["current_T_WC"], np.float32)
    slam.backend._pairs = [tuple(p) for p in meta["backend_pairs"]]
    slam.backend._odom_pairs = [tuple(p) for p in meta["backend_odom_pairs"]]
    slam.backend._n_odom = meta["backend_n_odom"]
    slam._idx_f2k = None
    if slam.retrieval is not None and "rdb/kf_counter" in data:
        slam.retrieval.load_state_arrays(
            {k[len("rdb/"):]: data[k] for k in data.files if k.startswith("rdb/")}
        )

    # rebuild the streaming active-KF state from the last stored keyframe
    import dataclasses

    import jax.numpy as jnp

    from ..slam import frame as frame_mod

    if int(slam.store.n_size) > 0:
        kf = frame_mod.kf_get_frame(slam.store, slam.store.last_slot())
        h, w = slam.img_hw
        # odom=None to match the pytree structure of frames from _make_frame
        slam.active_kf = dataclasses.replace(
            kf, img=jnp.zeros((1, h, w, 3), jnp.float32), odom=None
        )
