"""Headless dataset SLAM runner (the reference's ``main.py`` CLI contract).

CLI: ``python -m frodo_slam_tpu.main --dataset <path> --config <yaml>
[--calib <yaml>] [--save-as <name>] [--no-viz]`` (main.py:348-356).

Implements the *upstream* loop semantics (mono init -> track -> backend on
new keyframes -> reloc/new-map on loss; SURVEY.md section 3.4) — the fork's
own ``main.py`` drifted out of sync with its tracker API. Outputs match the
eval scripts' expectations: ``logs/<save-as>/<seq>.txt`` TUM trajectory,
``.ply`` reconstruction, keyframe PNGs (evaluate.py:23-106).
"""

from __future__ import annotations

import argparse
import pathlib
import time

import numpy as np


def run(args) -> dict:
    from .config import apply_x64_knob, make_config
    from .data import load_dataset
    from .loader import apply_tpu_model_knobs, load_mast3r, load_retriever
    from .slam.system import SLAM
    from .utils import evaluate

    cfg = make_config(args.config)
    # eval numerics default ON for dataset runs (the eval scripts' accuracy
    # contract); configs/realtime.yaml runs x64 OFF at the benched speed
    apply_x64_knob(cfg, entry_default=True)
    calib_yaml = None
    if args.calib:
        import yaml

        with open(args.calib) as f:
            calib_yaml = yaml.safe_load(f)
        cfg["use_calib"] = True

    dataset = load_dataset(
        args.dataset,
        use_calib=bool(cfg["use_calib"]),
        center_principal_point=bool(cfg["dataset"]["center_principle_point"]),
        subsample=int(cfg["dataset"]["subsample"]),
    )
    if calib_yaml is not None:
        # override the dataset's intrinsics from the --calib yaml
        # (reference main.py:175-184: width/height/calibration keys)
        from .data.datasets import Intrinsics

        dataset.use_calibration = True
        dataset.camera_intrinsics = Intrinsics.from_calib(
            dataset.img_size,
            int(calib_yaml["width"]),
            int(calib_yaml["height"]),
            list(calib_yaml["calibration"]),
            use_calib=True,
            center_principal_point=bool(cfg["dataset"]["center_principle_point"]),
        )
    (h, w), _ = dataset.get_img_shape()

    from .models import mast3r as mast3r_mod

    # yaml tpu: model-compute knobs (head_dtype / attention_impl / dtype)
    # are applied BEFORE load so the one-time weight cast uses the final
    # compute dtype (loader.py:cast_transformer_params)
    model_base = apply_tpu_model_knobs(mast3r_mod.MASt3RConfig(), cfg)
    params, model_cfg = load_mast3r(args.weights, cfg=model_base)
    retrieval = load_retriever(model_cfg) if not args.no_retrieval else None
    calib = dataset.camera_intrinsics.K_frame if (cfg["use_calib"] and dataset.has_calib()) else None

    # multi-chip: shard the backend's pair-decode batch over a (dp, tp) mesh
    # (the reference's second-GPU backend split, run_vio.py:111-114, done the
    # TPU way — one program over ICI instead of a second model copy)
    from .parallel.mesh import default_mesh

    mesh = default_mesh(str(cfg["tpu"].get("placement", "overlap")))

    slam = SLAM(
        cfg, params, model_cfg, (h, w), calib=calib, retrieval_db=retrieval,
        use_backend=True, use_reloc=retrieval is not None,
        single_thread=bool(cfg["single_thread"]), mesh=mesh,
        # the reference saves keyframe PNGs with every --save-as run
        # (main.py:332): retain host-side uint8 keyframe images when saving
        keep_keyframe_images=bool(args.save_as),
    )

    viewer = None
    if getattr(args, "viz", False):
        from .viz.web import WebViewer

        viewer = WebViewer(slam, port=int(getattr(args, "viz_port", 8090))).start()
        print(f"live viewer: http://127.0.0.1:{viewer.port}/")

    from .data.prefetch import PrefetchLoader

    loader = PrefetchLoader(dataset, slam.preprocess, depth=3, max_frames=args.max_frames)
    fps_t0, fps_count = time.time(), 0
    if bool(cfg["tpu"].get("pipelined_frontend", False)):
        # one-frame-pipelined frontend (realtime profile): each frame's
        # flags fetch overlaps the next frame's chain (grab_rgb_pipelined)
        for timestamp, dev_img in loader:
            if viewer is not None:
                viewer.wait_if_paused()
            slam.grab_rgb_pipelined(dev_img, timestamp=float(timestamp))
            fps_count += 1
            if fps_count == 30:
                print(f"FPS: {fps_count / (time.time() - fps_t0):.2f}")
                fps_t0, fps_count = time.time(), 0
        slam.flush()
    else:
        # 1-frame lookahead: grab_rgb dispatches the NEXT frame's encode
        # before its blocking flags fetch, hiding the encode +
        # preprocessing behind the per-frame host sync
        pending = None
        for timestamp, dev_img in loader:
            if viewer is not None:
                viewer.wait_if_paused()  # browser pause/step control channel
            if pending is not None:
                slam.grab_rgb(pending[1], timestamp=float(pending[0]), next_img=dev_img)
                fps_count += 1
                if fps_count == 30:
                    print(f"FPS: {fps_count / (time.time() - fps_t0):.2f}")
                    fps_t0, fps_count = time.time(), 0
            pending = (timestamp, dev_img)
        if pending is not None:
            slam.grab_rgb(pending[1], timestamp=float(pending[0]))
    slam.terminate()
    if viewer is not None:
        viewer.stop()

    retrieval_mode = (
        "none" if retrieval is None
        else ("random-fallback" if getattr(retrieval, "degraded", False) else "real")
    )
    if retrieval_mode == "random-fallback":
        print("WARNING: retrieval is running on RANDOM fallback assets — "
              "loop closures are meaningless; pass --no-retrieval or provide "
              "the trained retrieval checkpoint+codebook")

    out = {"retrieval": retrieval_mode}
    if args.save_as and getattr(dataset, "save_results", True):
        seq = pathlib.Path(args.dataset).name or "seq"
        logdir = pathlib.Path("logs") / args.save_as
        logdir.mkdir(parents=True, exist_ok=True)
        import json

        meta = {
            "sequence": seq,
            "config": str(args.config),
            "use_calib": bool(cfg["use_calib"]),
            "retrieval": retrieval_mode,  # honest degraded-mode record
            "frames": slam.frame_count,
            "keyframes": int(slam.store.n_size),
        }
        with open(logdir / f"{seq}.meta.json", "w") as f:
            json.dump(meta, f, indent=1)
        stamps, poses = slam.keyframe_poses()
        traj = evaluate.save_traj(logdir, f"{seq}.txt", stamps, poses)
        out["traj"] = str(traj)
        n_live = int(slam.store.n_size)
        slots = [k % slam.store.capacity for k in range(max(0, int(slam.store.n_total) - n_live), int(slam.store.n_total))]
        X = np.asarray(slam.store.X_canon[np.asarray(slots)])
        C = np.asarray(slam.store.C[np.asarray(slots)]) / np.maximum(
            np.asarray(slam.store.N[np.asarray(slots)])[:, None, None], 1)
        evaluate.save_reconstruction(logdir, f"{seq}.ply", poses, X, np.zeros_like(X), C)
        out["ply"] = str(logdir / f"{seq}.ply")
        # keyframe PNG dump (reference main.py:332, evaluate.py:73-85)
        evaluate.save_keyframes(logdir / "keyframes" / seq, stamps,
                                slam.kf_images[-len(stamps):])
        out["keyframes"] = str(logdir / "keyframes" / seq)
    return out


def build_parser():
    p = argparse.ArgumentParser(description="frodo-slam-tpu dataset runner")
    p.add_argument("--dataset", required=True)
    p.add_argument("--config", default="configs/base.yaml")
    p.add_argument("--calib", default=None)
    p.add_argument("--save-as", dest="save_as", default=None)
    p.add_argument("--no-viz", action="store_true", default=True)
    p.add_argument("--viz", action="store_true",
                   help="serve the live WebGL map viewer (viz/web.py)")
    p.add_argument("--viz-port", type=int, default=8090)
    p.add_argument("--weights", default=None)
    p.add_argument("--no-retrieval", action="store_true")
    p.add_argument("--max-frames", type=int, default=None)
    return p


if __name__ == "__main__":
    from .utils.log import configure

    configure("logs/slam.log")
    run(build_parser().parse_args())
