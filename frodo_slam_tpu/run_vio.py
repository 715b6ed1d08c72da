"""Robot / recorded-session VIO runner (the reference's ``run_vio.py``).

CLI contract (run_vio.py:245-277): ``--robot`` (live HTTP sensors) or
``--dataset <recorded .pkl>``, ``--config``, ``--calib``, ``--visualize``,
``--use_odometry``, ``--every_n_frames``. The reference's optional
second-GPU backend (run_vio.py:111-114) maps to ``single_thread=False``
(backend on a host thread over the same device mesh).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _load_calib_K(args, cfg):
    """Build the network-crop K from a ``--calib`` yaml and flip
    ``use_calib`` on (reference run_vio.py:94-110: the raw frames stay
    un-remapped; only ``K_frame`` is handed to the VIO)."""
    calib_path = getattr(args, "calib", None)
    if not calib_path:
        return None
    import yaml

    with open(calib_path) as f:
        intr = yaml.safe_load(f)
    from .data.datasets import Intrinsics

    ci = Intrinsics.from_calib(
        512,
        int(intr["width"]),
        int(intr["height"]),
        list(intr["calibration"]),
        use_calib=True,
    )
    cfg["use_calib"] = True
    return ci.K_frame


def run_dataset(args):
    """Replay a recorded session (run_vio.py:172-242)."""
    from .config import apply_x64_knob, make_config
    from .loader import apply_tpu_model_knobs, load_mast3r, load_retriever
    from .slam.odometry import OdometryData
    from .slam.system import SLAM

    cfg = make_config(args.config)
    if getattr(args, "use_multiple_gpu", False):
        cfg["tpu"]["placement"] = "overlap"  # reference --use_multiple_gpu
    # replay defaults to eval numerics; realtime.yaml / tpu.x64_eval: false
    # runs the benched full-speed configuration
    apply_x64_knob(cfg, entry_default=True)
    K_frame = _load_calib_K(args, cfg)
    data = OdometryData(args.dataset, wall_clock=args.wall_clock, use_odometry=args.use_odometry)

    from .models import mast3r as mast3r_mod

    params, model_cfg = load_mast3r(
        args.weights, cfg=apply_tpu_model_knobs(mast3r_mod.MASt3RConfig(), cfg))
    retrieval = load_retriever(model_cfg) if not args.no_retrieval else None

    slam = None
    viewer = None
    i = 0
    fps_t0, fps_count = time.time(), 0
    while True:
        ts, frame_img, odom_pose = data.get_frame_and_pose()
        if frame_img is None:
            break
        i += 1
        if i % args.every_n_frames != 0:
            continue
        img = np.asarray(frame_img[:, :, ::-1], np.float32) / 255.0  # BGR->RGB
        if slam is None:
            from .data.image import resize_img

            shaped = resize_img(img, 512)
            h, w = int(shaped["true_shape"][0][0]), int(shaped["true_shape"][0][1])
            from .parallel.mesh import default_mesh

            slam = SLAM(cfg, params, model_cfg, (h, w), calib=K_frame,
                        retrieval_db=retrieval,
                        use_backend=True, use_reloc=retrieval is not None,
                        single_thread=bool(cfg["single_thread"]),
                        local_opt_mode=args.use_odometry, mesh=default_mesh(str(cfg["tpu"].get("placement", "overlap"))))
            if args.visualize:
                from .viz.web import WebViewer

                viewer = WebViewer(slam).start()
                print(f"live viewer: http://127.0.0.1:{viewer.port}/")
        if viewer is not None:
            viewer.wait_if_paused()  # browser pause/step control channel
        if bool(cfg["tpu"].get("pipelined_frontend", False)):
            slam.grab_rgb_pipelined(img, timestamp=ts, odom_pose=odom_pose)
        else:
            slam.grab_rgb(img, timestamp=ts, odom_pose=odom_pose)
        fps_count += 1
        if fps_count == 30:
            print(f"FPS: {fps_count / (time.time() - fps_t0):.2f}")
            fps_t0, fps_count = time.time(), 0
    if slam is not None:
        slam.terminate()
    if viewer is not None:
        viewer.stop()
    return slam


def run_robot(args):  # pragma: no cover - hardware
    """Live robot mode (run_vio.py:67-170): poll odometry + camera."""
    from .config import apply_x64_knob, make_config
    from .loader import apply_tpu_model_knobs, load_mast3r, load_retriever
    from .slam.odometry import StraightOrSpinOdometry
    from .slam.system import SLAM

    cfg = make_config(args.config)
    if getattr(args, "use_multiple_gpu", False):
        cfg["tpu"]["placement"] = "overlap"  # reference --use_multiple_gpu
    # the live robot runs the REAL-TIME numerics by default (f32 + damped
    # BA — the reference's robot mode runs full speed, run_vio.py:67-170);
    # set tpu.x64_eval: true in the config to force eval numerics
    apply_x64_knob(cfg, entry_default=False)
    K_frame = _load_calib_K(args, cfg)
    odo = StraightOrSpinOdometry(robot_type=args.robot_type)
    odo.start()
    from .models import mast3r as mast3r_mod

    params, model_cfg = load_mast3r(
        args.weights, cfg=apply_tpu_model_knobs(mast3r_mod.MASt3RConfig(), cfg))
    retrieval = load_retriever(model_cfg) if not args.no_retrieval else None

    slam = None
    try:
        while True:
            ts, frame_img, odom_pose = odo.get_frame_and_pose()
            if frame_img is None:
                time.sleep(0.01)
                continue
            img = np.asarray(frame_img[:, :, ::-1], np.float32) / 255.0
            if slam is None:
                from .data.image import resize_img

                shaped = resize_img(img, 512)
                h, w = int(shaped["true_shape"][0][0]), int(shaped["true_shape"][0][1])
                from .parallel.mesh import default_mesh

                slam = SLAM(cfg, params, model_cfg, (h, w), calib=K_frame,
                            retrieval_db=retrieval,
                            use_backend=True, use_reloc=retrieval is not None,
                            single_thread=False, local_opt_mode=True,
                            mesh=default_mesh(str(cfg["tpu"].get("placement", "overlap"))))
                if args.visualize:
                    from .viz.web import WebViewer

                    viewer = WebViewer(slam).start()  # noqa: F841
                    print(f"live viewer: http://127.0.0.1:{viewer.port}/")
            if bool(cfg["tpu"].get("pipelined_frontend", False)):
                slam.grab_rgb_pipelined(
                    img, timestamp=ts,
                    odom_pose=odom_pose if args.use_odometry else None)
            else:
                slam.grab_rgb(img, timestamp=ts,
                              odom_pose=odom_pose if args.use_odometry else None)
    finally:
        odo.stop()
        if slam is not None:
            slam.terminate()


def build_parser():
    p = argparse.ArgumentParser(description="frodo-slam-tpu VIO runner")
    p.add_argument("--robot", action="store_true")
    p.add_argument("--robot-type", default="mini")
    p.add_argument("--dataset", default=None, help="recorded odometry .pkl")
    p.add_argument("--config", default="configs/base_no_fnn.yaml")
    p.add_argument("--calib", default=None)
    p.add_argument("--weights", default=None)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--use_odometry", action="store_true")
    p.add_argument("--wall-clock", action="store_true")
    p.add_argument("--every_n_frames", type=int, default=4)  # run_vio.py:218
    p.add_argument("--no-retrieval", action="store_true")
    # reference CLI contract (run_vio.py:245-277): backend on a second
    # device. The TPU analogue is the overlap placement (tracker keeps
    # device 0, backend mesh on devices[1:]) — already the default when
    # >1 device is visible; the flag forces it explicitly.
    p.add_argument("--use_multiple_gpu", action="store_true",
                   help="force tpu.placement=overlap (backend on devices[1:])")
    return p


if __name__ == "__main__":
    from .utils.log import configure

    configure("logs/vio.log")  # run_vio.py:272 file-sink contract
    args = build_parser().parse_args()
    if args.robot:
        run_robot(args)
    else:
        assert args.dataset, "--dataset or --robot required"
        run_dataset(args)
