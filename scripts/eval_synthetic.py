"""Synthetic-oracle end-to-end accuracy: run the FULL SLAM system against a
geometrically consistent synthetic world and report ATE RMSE vs ground truth.

No datasets and no trained weights exist in this environment (zero egress),
so the two model entry points — ``mast3r.encode_image`` and
``mast3r.decode_and_heads``, the single funnel every SLAM decode goes
through (tracker ``_model_stage``, ``decode_mono``,
``decode_symmetric_batch``) — are replaced by an ORACLE that renders
pointmaps of one fixed smooth world surface from the frame's ground-truth
camera pose (smuggled through the image pixels). Everything else is the
production stack end to end: preprocessing, the dense LM matcher + refine,
the Sim(3) tracking GN, keyframing, the backend factor graph + global BA,
trajectory export and the Sim3-aligned ATE (utils/evaluate.py).

This gives a REAL accuracy number for the full pipeline wiring (with
optional measurement noise on the pointmaps), committed per round as the
accuracy trend artifact:

    python scripts/eval_synthetic.py [--frames 40] [--noise 0.003]

Prints one JSON line: {"ate_rmse": ..., "n_kf": ..., "noise": ...}.
"""

import argparse
import json
import os
import pathlib
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("FRODO_SYNTH_CPU", "1") == "1":
    # tiny model: CPU is fine and hermetic. Must override unconditionally:
    # the environment presets JAX_PLATFORMS to a TPU tunnel platform.
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache_cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax

# FRODO_SYNTH_X64=0 runs the whole pipeline in f32 (BA solve: f32 Cholesky
# + one iterative-refinement step) for the f64-vs-f32 eval-mode A/B
if os.environ.get("FRODO_SYNTH_X64", "1") == "1":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

H, W = 32, 64
HW = H * W
POSE_SCALE = 0.1  # image encodes pose as v * POSE_SCALE + 0.5 in [0, 1]


def make_world(key):
    """A smooth textured surface ~5m ahead of the trajectory start, in world
    coordinates, in raster order (the oracle's 'every view sees point i at
    pixel i' convention — the same construction as tests/test_global_opt)."""
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    x = (uu - W / 2) / 8.0
    y = (vv - H / 2) / 8.0
    z = 5.0 + 0.8 * np.sin(uu * 0.15) + 0.5 * np.cos(vv * 0.23)
    pts_w = jnp.asarray(np.stack([x, y, z], -1).reshape(HW, 3))

    # unique smooth per-pixel descriptors: fourier features of (u, v)
    feats = []
    for k in range(6):
        feats += [np.sin((k + 1) * 0.37 * uu + k), np.cos((k + 1) * 0.29 * vv - k)]
    D = np.stack(feats * 2, -1).astype(np.float32)  # (H, W, 24)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    return pts_w, jnp.asarray(D)


def trajectory(n_frames):
    """Smooth forward arc with yaw: per-frame ground-truth Sim3 T_WC."""
    from frodo_slam_tpu.ops import lie

    poses = []
    for t in range(n_frames):
        s = t / max(n_frames - 1, 1)
        xi = jnp.asarray(
            [1.2 * s, 0.15 * np.sin(3 * s), 0.6 * s,  # translation
             0.05 * np.sin(2 * s), 0.35 * s, 0.03 * np.cos(2 * s),  # rotation
             0.0], jnp.float32)  # scale fixed (monocular gauge)
        poses.append(lie.sim3_exp(xi))
    return jnp.stack(poses)


def encode_pose_image(T_WC, marker=0):
    """Smuggle the ground-truth pose into the frame's pixels. ``marker``
    (pixel 8) selects a degradation the oracle applies to THIS frame's
    decode: 0 = clean, 1 = warped geometry but intact descriptors (the
    projective matcher fails, the fnn descriptor fallback recovers),
    2 = dead descriptors (nothing can match: a covered/blinded camera)."""
    img = np.full((H, W, 3), 0.5, np.float32)
    vals = np.asarray(T_WC, np.float32) * POSE_SCALE + 0.5
    img.reshape(-1)[: len(vals)] = vals
    img.reshape(-1)[8] = marker * POSE_SCALE + 0.5
    return img


def install_oracle(pts_w, D_desc, noise):
    """Patch the two model entry points with the world-renderer oracle."""
    from frodo_slam_tpu.models import mast3r
    from frodo_slam_tpu.ops import lie

    def decode_pose(feat):
        # feat channels 0:8 of token 0 carry the normalized pose pixels
        return feat[:, 0, :8] / (2.0 * POSE_SCALE)

    def oracle_encode(params, cfg, img, portrait=None):
        b = img.shape[0]
        n_tok = (H // cfg.patch_size) * (W // cfg.patch_size)
        # the image is ImgNorm'd: value = (raw - 0.5) / 0.5 = pose * 2 * SCALE
        pose_px = img.reshape(b, -1)[:, :9]  # 8 pose + 1 degradation marker
        feat = jnp.zeros((b, n_tok, cfg.enc_embed_dim), jnp.float32)
        feat = feat.at[:, 0, :9].set(pose_px)
        yy, xx = jnp.meshgrid(
            jnp.arange(H // cfg.patch_size), jnp.arange(W // cfg.patch_size),
            indexing="ij",
        )
        pos = jnp.broadcast_to(
            jnp.stack([yy, xx], -1).reshape(1, n_tok, 2).astype(jnp.int32),
            (b, n_tok, 2),
        )
        return feat, pos

    def render(T_WC, salt):
        X = lie.sim3_act(lie.sim3_inv(T_WC), pts_w)  # (HW, 3) camera frame
        if noise > 0:
            key = jax.random.fold_in(
                jax.random.PRNGKey(0),
                jnp.abs(jnp.sum(T_WC * 1e4)).astype(jnp.int32) + salt,
            )
            X = X + noise * jax.random.normal(key, X.shape, X.dtype)
        return X.reshape(H, W, 3)

    def oracle_decode(params, cfg, f1, p1, f2, p2, img_hw, portrait=None):
        pose1 = decode_pose(f1).astype(jnp.float32)  # (B, 8) view1 T_WC
        b = pose1.shape[0]
        marker = jnp.round(f1[:, 0, 8] / (2.0 * POSE_SCALE))  # (B,)
        X1 = jax.vmap(lambda T: render(T, 1))(pose1)  # view1 pts, view1 frame
        X2 = jax.vmap(lambda T: render(T, 2))(pose1)  # view2 pts ARE the same
        # world points, expressed in view1's frame (the asymmetric-decode
        # contract: res2 = view2's pointmap in view1 coordinates)
        ones = jnp.ones((b, H, W, 1), jnp.float32)
        desc = jnp.broadcast_to(D_desc[None], (b, H, W, D_desc.shape[-1]))

        # marker 1: strong smooth warp on view1's geometry only — the two
        # views disagree in 3D (occlusion gate kills the projective match)
        # while descriptors stay exact (the fnn fallback can recover)
        uu, vv = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                              jnp.arange(H, dtype=jnp.float32))
        warp = 0.6 * jnp.stack([jnp.sin(vv * 0.4), jnp.cos(uu * 0.3),
                                jnp.sin((uu + vv) * 0.2)], -1)
        m1 = (marker == 1)[:, None, None, None]
        X1 = jnp.where(m1, X1 + warp[None], X1)
        # marker 2: dead descriptors on view1 — neither the projective score
        # gate nor the descriptor fallback can match (a covered camera)
        m2 = (marker == 2)[:, None, None, None]
        desc1 = jnp.where(m2, -desc, desc)
        q1 = jnp.where(m2, 0.0 * ones, 4.0 * ones)

        res1 = {"pts3d": X1, "conf": 5.0 * ones, "desc": desc1, "desc_conf": q1}
        res2 = {"pts3d": X2, "conf": 5.0 * ones, "desc": desc, "desc_conf": 4.0 * ones}
        return res1, res2

    mast3r.encode_image = oracle_encode
    mast3r.decode_and_heads = oracle_decode


def run(n_frames=40, noise=0.003, single_thread=True, out_dir=None,
        per_frame=False):
    from frodo_slam_tpu.config import make_config
    from frodo_slam_tpu.models import mast3r
    from frodo_slam_tpu.slam.system import SLAM
    from frodo_slam_tpu.utils import evaluate

    key = jax.random.PRNGKey(0)
    pts_w, D_desc = make_world(key)
    install_oracle(pts_w, D_desc, noise)
    T_true = trajectory(n_frames)

    mcfg = mast3r.tiny_config()
    params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
    matching_over = {}
    if os.environ.get("FRODO_SYNTH_DILATION"):  # refine-depth accuracy A/B
        matching_over["dilation_max"] = int(os.environ["FRODO_SYNTH_DILATION"])
    if os.environ.get("FRODO_SYNTH_DILATION_WARM") is not None:
        # warm-started-frame refine reach A/B (matching.dilation_max_warm)
        matching_over["dilation_max_warm"] = int(
            os.environ["FRODO_SYNTH_DILATION_WARM"])
    if os.environ.get("FRODO_SYNTH_MAXITER_WARM") is not None:
        # warm-started-frame LM iteration cap A/B (matching.max_iter_warm)
        matching_over["max_iter_warm"] = int(
            os.environ["FRODO_SYNTH_MAXITER_WARM"])
    tracking_over = {"min_match_frac": 0.0, "Q_conf": 0.0, "max_iters": 30}
    if not per_frame:
        # keyframe every frame: the saved trajectory is keyframe poses, so
        # this makes every frame's pose part of the ATE
        tracking_over["match_frac_thresh"] = 1.1
    else:
        # sparse keyframing: this oracle's steady-state unique-match
        # fraction is ~0.24 (its pixel pitch sits near the occlusion gate,
        # a deliberate stress), so the reference 0.333 threshold would
        # keyframe every frame; 0.15 keeps most frames warm-started —
        # exercising dilation_max_warm/max_iter_warm — and the ATE is
        # computed over every tracked frame's frontend pose instead
        tracking_over["match_frac_thresh"] = 0.15
    cfg = make_config(
        tracking=tracking_over,
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 6},
        matching=matching_over,
        tpu={"max_keyframes": max(8, n_frames + 2), "max_edges": 32,
             "max_odom_edges": 8},
    )
    slam = SLAM(cfg, params, mcfg, (H, W), retrieval_db=None,
                use_backend=True, use_reloc=False, single_thread=single_thread)

    ok_count = 0
    frame_stamps, frame_poses = [], []
    for t in range(n_frames):
        img = encode_pose_image(T_true[t])
        ok, pose, new_kf = slam.grab_rgb(img, timestamp=float(t))
        ok_count += int(ok)
        if ok:
            frame_stamps.append(float(t))
            frame_poses.append(np.asarray(pose, np.float64))
    slam.terminate()

    out_dir = pathlib.Path(out_dir or tempfile.mkdtemp(prefix="synth_eval_"))
    if per_frame:
        stamps, poses = frame_stamps, np.stack(frame_poses)
    else:
        stamps, poses = slam.keyframe_poses()
    traj = evaluate.save_traj(out_dir, "synth.txt", stamps, poses)
    gt_rows = np.concatenate(
        [np.arange(n_frames, dtype=np.float64)[:, None],
         np.asarray(T_true[:, :7], np.float64)], axis=1)
    gt_path = out_dir / "synth_gt.txt"
    np.savetxt(gt_path, gt_rows, fmt="%.9f")

    rmse = evaluate.ate_rmse(str(gt_path), str(traj), max_dt=0.5)
    return {
        "ate_rmse": round(float(rmse), 6),
        "n_kf": len(slam.kf_timestamps),
        "frames_tracked_ok": ok_count,
        "noise": noise,
    }


def run_episode(noise=0.0):
    """Failure-path episode (reference tracker.py:222-276 + vio.py:29-72,
    321-328): drives the REAL accept gate, the fnn descriptor fallback, and
    the tracking-loss -> map-reset -> re-init recovery through the full
    system, returning counters that prove each path fired.

    Phases: (1) clean tracking with a real min_match_frac gate and use_fnn
    on; (2) one warped-geometry frame — the projective match dies at the
    occlusion gate, the fnn fallback recovers (used_fnn fires, accept via
    min_match_frac_fnn); (3) dead-descriptor frames — nothing matches,
    each failure attempts retrieval-seeded relocalization (strict gate
    honestly rejects a blinded camera), the loss counter runs out, the map
    resets into the atlas; (4) clean frames again — a fresh map
    re-initializes and tracks."""
    from frodo_slam_tpu.config import make_config
    from frodo_slam_tpu.models import mast3r
    from frodo_slam_tpu.retrieval.asmk import Codebook
    from frodo_slam_tpu.retrieval.database import RetrievalDatabase
    from frodo_slam_tpu.retrieval.model import RetrievalHead
    from frodo_slam_tpu.slam.system import SLAM

    key = jax.random.PRNGKey(0)
    pts_w, D_desc = make_world(key)
    install_oracle(pts_w, D_desc, noise)
    n1, n_loss, n4 = 8, 3, 6
    T_true = trajectory(n1 + n_loss + n4 + 1)

    mcfg = mast3r.tiny_config()
    params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
    cfg = make_config(
        tracking={"match_frac_thresh": 1.1, "min_match_frac": 0.05,
                  "Q_conf": 1.0, "max_iters": 30, "use_fnn": True,
                  "min_match_frac_fnn": 0.004,  # fnn subsamples 8x8: max ~1/64
                  "new_map_after_loss_track_N": 3},
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 6},
        tpu={"max_keyframes": 32, "max_edges": 32, "max_odom_edges": 8},
    )
    head = RetrievalHead.init(jax.random.PRNGKey(1),
                              backbone_dim=mcfg.enc_embed_dim,
                              hdims=[mcfg.enc_embed_dim], nfeat=32)
    db = RetrievalDatabase(
        head, Codebook.random(np.random.default_rng(0), 64, mcfg.enc_embed_dim)
    )
    slam = SLAM(cfg, params, mcfg, (H, W), retrieval_db=db,
                use_backend=True, use_reloc=True, single_thread=True)

    counters = {"fnn_frames": 0, "loss_frames": 0, "reloc_attempts": 0,
                "resets": 0, "post_reset_tracked": 0}
    real_reloc = slam._relocalize

    def counting_reloc(frame, timestamp):
        counters["reloc_attempts"] += 1
        return real_reloc(frame, timestamp)

    slam._relocalize = counting_reloc
    t = 0

    def step(marker, expect_ok=None):
        nonlocal t
        img = encode_pose_image(T_true[t], marker=marker)
        ok, pose, new_kf = slam.grab_rgb(img, timestamp=float(t))
        t += 1
        assert np.all(np.isfinite(pose))
        if expect_ok is not None:
            assert ok == expect_ok, f"frame {t - 1} marker={marker}: ok={ok}"
        return ok

    for _ in range(n1):  # phase 1: clean, real gate
        step(0, expect_ok=True)
    # phase 2: warped geometry -> projective match dies, fnn recovers
    step(1, expect_ok=True)
    assert bool(slam.last_track.used_fnn), "fnn fallback did not fire"
    counters["fnn_frames"] += 1
    # phase 3: dead descriptors -> loss counter -> map reset
    for _ in range(n_loss):
        ok = step(2, expect_ok=False)
        counters["loss_frames"] += 1
        assert not bool(slam.last_track.used_fnn) or not ok
    assert len(slam.atlas) == 1, "tracking loss did not reset the map"
    assert counters["reloc_attempts"] >= 1, "loss frames never attempted reloc"
    counters["resets"] = len(slam.atlas)
    # phase 4: clean frames -> fresh map re-initializes and tracks
    for _ in range(n4):
        if step(0, expect_ok=True):
            counters["post_reset_tracked"] += 1
    assert int(slam.store.n_size) >= n4 - 1
    slam.terminate()
    counters["n_kf_new_map"] = int(slam.store.n_size)
    return counters


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--noise", type=float, default=0.003)
    ap.add_argument("--threaded", action="store_true")
    ap.add_argument("--episode", action="store_true",
                    help="run the failure-path episode (fnn fallback + "
                         "loss->reset->re-init) instead of the ATE eval")
    ap.add_argument("--per-frame", action="store_true",
                    help="normal keyframing + per-frame-pose ATE (exercises "
                         "the warm-started matcher path)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.episode:
        print(json.dumps(run_episode(args.noise)))
    else:
        print(json.dumps(run(args.frames, args.noise,
                             single_thread=not args.threaded, out_dir=args.out,
                             per_frame=args.per_frame)))
