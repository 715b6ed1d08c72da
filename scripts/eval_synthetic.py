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

if os.environ.get("FRODO_SYNTH_CPU", "1") == "1":
    # belt and braces: when the axon sitecustomize rides PYTHONPATH it
    # imports jax at interpreter start and the env-var platform override
    # above is silently ignored; config.update wins any time before first
    # backend use (tests/conftest.py:22-26)
    jax.config.update("jax_platforms", "cpu")

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


# ---------------------------------------------------------------------------
# Plane-world oracle (calib + loop-closure modes)
#
# The identity-correspondence oracle above cannot exercise the CALIBRATED
# pipeline: the calib residual is [pixel u,v, log z] (reference
# gn_kernels.cu:2295-2414, geometry.py:63-104), which vanishes at ground
# truth only if every pointmap point lies ON its pixel's ray through K. The
# plane world renders each view by closed-form ray/plane intersection, so
# pointmaps are ray-consistent by construction AND correspondences between
# views are real (nearest-pixel, not identity) — a strictly harder, more
# realistic test of the matcher.
# ---------------------------------------------------------------------------

def make_plane_world(K):
    """World = one tilted textured plane n.X = d, ~4 m ahead of the origin.

    Returns (render, desc_of_world, token_sig):
      render(T_WC)   -> (X_cam (HW,3) on pixel rays, X_world (HW,3))
      desc_of_world(X_w) -> (HW, 24) unit descriptors, smooth fourier
                            features of the in-plane coordinates
      token_sig(T_WC)    -> (N_TOK, 24) plane descriptors at the patch-token
                            centers of this view (retrieval place signature)
    """
    from frodo_slam_tpu.ops import geometry, lie

    n = np.asarray([0.06, -0.10, 1.0], np.float32)
    n /= np.linalg.norm(n)
    d = 4.0
    e1 = np.cross([0.0, 1.0, 0.0], n)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(n, e1)
    n_j, e1_j, e2_j = jnp.asarray(n), jnp.asarray(e1), jnp.asarray(e2)

    # 12 fourier plane-waves -> 24-dim (sin, cos) descriptors. |k| in
    # [3, 18]: pixel pitch on the plane is ~ d/fx ~ 0.04, so the descriptor
    # autocorrelation stays above the 0.8 score gate at 1-pixel offsets
    # (nearest-pixel matches survive) and decays by ~5 pixels (wrong
    # matches are rejected) — mimicking trained local features.
    rng = np.random.default_rng(11)
    kmag = rng.uniform(3.0, 18.0, 12).astype(np.float32)
    kang = rng.uniform(0, 2 * np.pi, 12).astype(np.float32)
    kvec = np.stack([kmag * np.cos(kang), kmag * np.sin(kang)], -1)  # (12, 2)
    kph = rng.uniform(0, 2 * np.pi, 12).astype(np.float32)
    kvec_j, kph_j = jnp.asarray(kvec), jnp.asarray(kph)

    uv = geometry.get_pixel_coords((H, W))  # (HW, 2)
    dirs = geometry.backproject(uv, jnp.ones((HW, 1)), jnp.asarray(K))  # z=1

    def render(T_WC):
        t, s = T_WC[:3], T_WC[7]
        sRd = lie.sim3_act(T_WC, dirs) - t  # s * R @ dirs
        z = (d - jnp.dot(n_j, t)) / (sRd @ n_j)  # (HW,) depth along +z
        X_cam = z[:, None] * dirs
        X_w = lie.sim3_act(T_WC, X_cam)
        return X_cam, X_w

    def desc_of_world(X_w):
        p = jnp.stack([X_w @ e1_j, X_w @ e2_j], -1)  # (..., 2) plane coords
        phase = p @ kvec_j.T + kph_j  # (..., 12)
        f = jnp.concatenate([jnp.sin(phase), jnp.cos(phase)], -1)  # (..., 24)
        return f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    def token_sig(T_WC):
        _, X_w = render(T_WC)
        ty, tx = jnp.meshgrid(jnp.arange(H // 16), jnp.arange(W // 16),
                              indexing="ij")
        centers = ((ty * 16 + 8) * W + (tx * 16 + 8)).reshape(-1)
        return desc_of_world(X_w[centers])

    return render, desc_of_world, token_sig


def install_plane_oracle(K, noise, token_desc=False):
    """Patch the model entry points with the plane-world renderer.

    ``token_desc``: also write each view's plane descriptors at the patch
    centers into encoder-token channels 16:40 — a place signature that makes
    ASMK retrieval similarity track viewpoint overlap (the role trained
    encoder features play in the reference, retrieval_database.py:30-46)."""
    from frodo_slam_tpu.models import mast3r
    from frodo_slam_tpu.ops import lie

    render, desc_of_world, token_sig = make_plane_world(K)

    def decode_pose(feat):
        return feat[:, 0, :8] / (2.0 * POSE_SCALE)

    def oracle_encode(params, cfg, img, portrait=None):
        b = img.shape[0]
        n_tok = (H // cfg.patch_size) * (W // cfg.patch_size)
        pose_px = img.reshape(b, -1)[:, :9]
        feat = jnp.zeros((b, n_tok, cfg.enc_embed_dim), jnp.float32)
        feat = feat.at[:, 0, :9].set(pose_px)
        if token_desc:
            pose = pose_px[:, :8] / (2.0 * POSE_SCALE)
            sig = jax.vmap(token_sig)(pose)  # (b, n_tok, 24)
            feat = feat.at[:, :, 16:40].set(sig.astype(jnp.float32))
        yy, xx = jnp.meshgrid(
            jnp.arange(H // cfg.patch_size), jnp.arange(W // cfg.patch_size),
            indexing="ij",
        )
        pos = jnp.broadcast_to(
            jnp.stack([yy, xx], -1).reshape(1, n_tok, 2).astype(jnp.int32),
            (b, n_tok, 2),
        )
        return feat, pos

    def noisy(X, T_WC, salt):
        if noise <= 0:
            return X
        key = jax.random.fold_in(
            jax.random.PRNGKey(0),
            jnp.abs(jnp.sum(T_WC * 1e4)).astype(jnp.int32) + salt,
        )
        return X + noise * jax.random.normal(key, X.shape, X.dtype)

    def oracle_decode(params, cfg, f1, p1, f2, p2, img_hw, portrait=None):
        pose1 = decode_pose(f1).astype(jnp.float32)  # (B, 8) view1 T_WC
        pose2 = decode_pose(f2).astype(jnp.float32)  # (B, 8) view2 T_WC
        b = pose1.shape[0]

        def one(T1, T2):
            X1c, X1w = render(T1)
            X2c, X2w = render(T2)
            # asymmetric-decode contract: res2 = view2's pointmap expressed
            # in view1's coordinates (mast3r_utils.py:295-320)
            X21 = lie.sim3_act(lie.sim3_rel(T1, T2), X2c)
            d1 = desc_of_world(X1w)
            d2 = desc_of_world(X2w)
            return (noisy(X1c, T1, 1).reshape(H, W, 3),
                    noisy(X21, T2, 2).reshape(H, W, 3),
                    d1.reshape(H, W, 24), d2.reshape(H, W, 24))

        X11, X21, d1, d2 = jax.vmap(one)(pose1, pose2)
        ones = jnp.ones((b, H, W, 1), jnp.float32)
        res1 = {"pts3d": X11, "conf": 5.0 * ones, "desc": d1,
                "desc_conf": 4.0 * ones}
        res2 = {"pts3d": X21, "conf": 5.0 * ones, "desc": d2,
                "desc_conf": 4.0 * ones}
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
    matching_over = _synth_matching_overrides()
    tpu_over = _synth_tpu_overrides()
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
        # computed over every tracked frame's frontend pose instead.
        # FRODO_SYNTH_KF_THRESH picks an intermediate cadence (several
        # keyframes with warm frames between them — the regime where the
        # per-frame vs keyframe-rate store write-back can differ)
        tracking_over["match_frac_thresh"] = float(
            os.environ.get("FRODO_SYNTH_KF_THRESH", 0.15))
    cfg = make_config(
        tracking=tracking_over,
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 6},
        matching=matching_over,
        tpu={"max_keyframes": max(8, n_frames + 2), "max_edges": 32,
             "max_odom_edges": 8, **tpu_over},
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


def _ate_of_system(slam, T_true, n_frames, out_dir):
    from frodo_slam_tpu.utils import evaluate

    out_dir = pathlib.Path(out_dir or tempfile.mkdtemp(prefix="synth_eval_"))
    stamps, poses = slam.keyframe_poses()
    traj = evaluate.save_traj(out_dir, "synth.txt", stamps, poses)
    gt_rows = np.concatenate(
        [np.arange(n_frames, dtype=np.float64)[:, None],
         np.asarray(T_true[:, :7], np.float64)], axis=1)
    gt_path = out_dir / "synth_gt.txt"
    np.savetxt(gt_path, gt_rows, fmt="%.9f")
    return float(evaluate.ate_rmse(str(gt_path), str(traj), max_dt=0.5))


def _synth_tpu_overrides():
    """tpu: overrides shared by all harnesses. FRODO_SYNTH_HALF A/Bs the
    consecutive-edge half reuse (tpu.consecutive_half_reuse + the seeded
    warm-schedule missing-direction match): must be ATE-neutral across
    straight, calib, AND loop harnesses for the knob to stay default-on."""
    over = {}
    if os.environ.get("FRODO_SYNTH_HALF") is not None:
        over["consecutive_half_reuse"] = bool(int(os.environ["FRODO_SYNTH_HALF"]))
    if os.environ.get("FRODO_SYNTH_KF_SYNC") is not None:
        # 1 = reference-exact per-frame keyframe pointmap write-back
        # (system.py kf_sync_per_frame); 0/absent = keyframe-rate default
        over["kf_sync_per_frame"] = bool(int(os.environ["FRODO_SYNTH_KF_SYNC"]))
    return over


def _synth_matching_overrides():
    """matching: overrides shared by all harnesses (accuracy A/B knobs)."""
    over = {}
    if os.environ.get("FRODO_SYNTH_DILATION"):
        over["dilation_max"] = int(os.environ["FRODO_SYNTH_DILATION"])
    if os.environ.get("FRODO_SYNTH_DILATION_WARM") is not None:
        over["dilation_max_warm"] = int(os.environ["FRODO_SYNTH_DILATION_WARM"])
    if os.environ.get("FRODO_SYNTH_MAXITER_WARM") is not None:
        over["max_iter_warm"] = int(os.environ["FRODO_SYNTH_MAXITER_WARM"])
    if os.environ.get("FRODO_SYNTH_SEED") is not None:
        over["seed_consecutive"] = bool(int(os.environ["FRODO_SYNTH_SEED"]))
    if os.environ.get("FRODO_SYNTH_DILATION_SEED") is not None:
        over["dilation_max_seed"] = int(os.environ["FRODO_SYNTH_DILATION_SEED"])
    return over


def run_calib(n_frames=20, noise=0.003, out_dir=None):
    """CALIBRATED pipeline end-to-end on the plane world: pixel+log-depth
    tracking GN (tracker.py:467-517) + the calibrated backend window solve
    (global_opt.py:288-341) + ray constraining, through the full system."""
    from frodo_slam_tpu.config import make_config
    from frodo_slam_tpu.models import mast3r
    from frodo_slam_tpu.slam.system import SLAM

    K = np.asarray([[100.0, 0.0, W / 2], [0.0, 100.0, H / 2], [0.0, 0.0, 1.0]],
                   np.float32)
    install_plane_oracle(K, noise)
    T_true = trajectory(n_frames)

    mcfg = mast3r.tiny_config()
    params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
    cfg = make_config(
        use_calib=True,
        tracking={"min_match_frac": 0.0, "Q_conf": 0.0, "max_iters": 30,
                  "match_frac_thresh": 1.1},  # keyframe every frame
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 6},
        matching=_synth_matching_overrides(),
        tpu={"max_keyframes": max(8, n_frames + 2), "max_edges": 32,
             "max_odom_edges": 8, **_synth_tpu_overrides()},
    )
    slam = SLAM(cfg, params, mcfg, (H, W), calib=K, retrieval_db=None,
                use_backend=True, use_reloc=False, single_thread=True)
    assert bool(slam.tcfg.use_calib), "calib mode did not reach the tracker"

    ok_count = 0
    for t in range(n_frames):
        ok, pose, _ = slam.grab_rgb(encode_pose_image(T_true[t]),
                                    timestamp=float(t))
        ok_count += int(ok)
    slam.terminate()
    rmse = _ate_of_system(slam, T_true, n_frames, out_dir)
    return {
        "mode": "calib",
        "ate_rmse": round(rmse, 6),
        "n_kf": len(slam.kf_timestamps),
        "frames_tracked_ok": ok_count,
        "noise": noise,
    }


def trajectory_loop(n_frames):
    """Out-and-back arc: the camera returns to (near) its start pose, so
    the final keyframes genuinely re-observe the first ones."""
    from frodo_slam_tpu.ops import lie

    poses = []
    for t in range(n_frames):
        s = t / max(n_frames - 1, 1)
        a = np.sin(np.pi * s)  # 0 -> 1 -> 0
        xi = jnp.asarray(
            [1.1 * a, 0.08 * np.sin(2 * np.pi * s), 0.35 * a,
             0.03 * np.sin(2 * np.pi * s), 0.22 * a, 0.02 * a,
             0.0], jnp.float32)
        poses.append(lie.sim3_exp(xi))
    return jnp.stack(poses)


def run_loop(n_frames=24, noise=0.004, out_dir=None, with_retrieval=True):
    """Loop-closure accuracy on the plane world: an out-and-back trajectory
    accumulates drift from pointmap noise; with the retrieval database on,
    the backend inserts non-consecutive (loop-closure) edges between the
    revisit keyframes and the global BA pulls the loop shut
    (vio.py:124-148, global_opt.py:69-141)."""
    from frodo_slam_tpu.config import make_config
    from frodo_slam_tpu.models import mast3r
    from frodo_slam_tpu.slam.system import SLAM

    K = np.asarray([[100.0, 0.0, W / 2], [0.0, 100.0, H / 2], [0.0, 0.0, 1.0]],
                   np.float32)
    install_plane_oracle(K, noise, token_desc=True)
    T_true = trajectory_loop(n_frames)

    mcfg = mast3r.tiny_config()
    params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
    cfg = make_config(
        tracking={"min_match_frac": 0.0, "Q_conf": 0.0, "max_iters": 30,
                  "match_frac_thresh": 1.1},
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.2, "max_iters": 6},
        matching=_synth_matching_overrides(),
        tpu={"max_keyframes": max(8, n_frames + 2),
             "max_edges": max(64, 3 * n_frames), "max_odom_edges": 8,
             **_synth_tpu_overrides()},
    )
    db = None
    if with_retrieval:
        from frodo_slam_tpu.retrieval.asmk import Codebook
        from frodo_slam_tpu.retrieval.database import RetrievalDatabase
        from frodo_slam_tpu.retrieval.model import RetrievalHead

        head = RetrievalHead.init(jax.random.PRNGKey(1),
                                  backbone_dim=mcfg.enc_embed_dim,
                                  hdims=[mcfg.enc_embed_dim], nfeat=8)
        db = RetrievalDatabase(
            head, Codebook.random(np.random.default_rng(0), 64,
                                  mcfg.enc_embed_dim))
    slam = SLAM(cfg, params, mcfg, (H, W), retrieval_db=db,
                use_backend=True, use_reloc=False, single_thread=True)

    ok_count = 0
    for t in range(n_frames):
        ok, pose, _ = slam.grab_rgb(encode_pose_image(T_true[t]),
                                    timestamp=float(t))
        ok_count += int(ok)
    slam.terminate()
    pairs = list(slam.backend._pairs)
    loop_edges = [(i, j) for i, j in pairs if abs(j - i) > 1]
    # a genuine loop closure links the revisit tail to the early map
    long_edges = [(i, j) for i, j in loop_edges if abs(j - i) >= n_frames // 3]
    rmse = _ate_of_system(slam, T_true, n_frames, out_dir)
    return {
        "mode": "loop" if with_retrieval else "loop_noretrieval",
        "ate_rmse": round(rmse, 6),
        "n_kf": len(slam.kf_timestamps),
        "frames_tracked_ok": ok_count,
        "n_loop_edges": len(loop_edges),
        "n_long_loop_edges": len(long_edges),
        "noise": noise,
    }


def run_vio(n_frames=16, noise=0.002, alpha=0.5, use_odometry=True,
            out_dir=None):
    """VIO mode end to end (tracked config 5, BASELINE.md): wheel-odometry
    SE(3) factors + the scale-only PGO recover METRIC scale.

    Construction: the oracle world is rendered along a trajectory whose
    translations are the metric ground truth scaled by ``alpha`` — pure VO
    can only ever recover that alpha-scaled trajectory (the monocular
    gauge g = alpha). The odometry stream reports the TRUE metric SE(3)
    poses. With ``use_odometry``: per-keyframe odometry delta factors enter
    the backend BA (gauss_newton_rays_odom semantics) and the scale-only
    PGO (pgo.py:26-79) estimates the gauge, written into the keyframe
    Sim(3) scale channels as g = world/metric (system._apply_pgo_scale
    convention note: the BA kernel consumes the channel as a divisor,
    gn_kernels.cu:1144-1177, so metric translation = t / s).

    Metric-ness is asserted WITHOUT the Sim(3) alignment scale freedom:
    SE(3)-aligned ATE of the metric trajectory (t_i / s_i) against the
    metric ground truth must be small, while without odometry it misses by
    ~(1 - alpha) x trajectory spread. The scale CHANNEL itself is a
    transient, not alpha: the BA's odometry factors fix only the ratio
    t-gauge/s (their residual is invariant under a global Sim(3) gauge
    change), and the pinned first pose (s=1) makes their steady state the
    fully metrized map (t -> metric, s -> 1) — the PGO write-back
    (s = gauge) and the BA both keep t/s metric the whole way, which is
    the invariant this eval checks."""
    from frodo_slam_tpu.config import make_config
    from frodo_slam_tpu.models import mast3r
    from frodo_slam_tpu.slam.system import SLAM
    from frodo_slam_tpu.utils import evaluate

    key = jax.random.PRNGKey(0)
    pts_w, D_desc = make_world(key)
    install_oracle(pts_w, D_desc, noise)
    T_metric = np.asarray(trajectory(n_frames))  # Sim3 (8,): metric GT
    T_vo = T_metric.copy()
    T_vo[:, :3] *= alpha  # what monocular VO sees (world is self-consistent)

    mcfg = mast3r.tiny_config()
    params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
    cfg = make_config(
        tracking={"min_match_frac": 0.0, "Q_conf": 0.0, "max_iters": 30,
                  "match_frac_thresh": 1.1},  # keyframe per frame
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 6},
        tpu={"max_keyframes": max(8, n_frames + 2),
             "max_edges": max(32, 4 * n_frames),
             "max_odom_edges": max(8, n_frames + 2)},
    )
    slam = SLAM(cfg, params, mcfg, (H, W), retrieval_db=None,
                use_backend=True, use_reloc=False, single_thread=True,
                local_opt_mode=use_odometry)

    ok_count = 0
    for t in range(n_frames):
        img = encode_pose_image(jnp.asarray(T_vo[t]))
        odom = T_metric[t, :7].astype(np.float64) if use_odometry else None
        ok, pose, _ = slam.grab_rgb(img, timestamp=float(t), odom_pose=odom)
        ok_count += int(ok)
    slam.terminate()

    stamps, poses = slam.keyframe_poses()  # (N, 8) Sim3, world gauge
    scales = poses[:, 7]
    s_med = float(np.median(scales))
    _, poses_metric = slam.metric_keyframe_poses()  # t / s

    out_dir = pathlib.Path(out_dir or tempfile.mkdtemp(prefix="synth_vio_"))
    gt_rows = np.concatenate(
        [np.arange(n_frames, dtype=np.float64)[:, None],
         np.asarray(T_metric[:, :7], np.float64)], axis=1)
    gt_path = out_dir / "vio_gt.txt"
    np.savetxt(gt_path, gt_rows, fmt="%.9f")
    traj_raw = evaluate.save_traj(out_dir, "vio_raw.txt", stamps, poses)
    traj_met = evaluate.save_traj(out_dir, "vio_metric.txt", stamps,
                                  poses_metric)

    # SE(3)-aligned (scale-free) ATE: the metric test
    ate_se3_raw = evaluate.ate_rmse(str(gt_path), str(traj_raw),
                                    max_dt=0.5, with_scale=False)
    ate_se3_scaled = evaluate.ate_rmse(str(gt_path), str(traj_met),
                                       max_dt=0.5, with_scale=False)
    # Sim(3)-aligned control (shape correctness independent of scale)
    ate_sim3 = evaluate.ate_rmse(str(gt_path), str(traj_raw), max_dt=0.5)
    return {
        "mode": "vio" if use_odometry else "vio_no_odom",
        "alpha": alpha,
        "scale_median": round(s_med, 4),  # transient between alpha and 1
        "ate_se3_raw": round(float(ate_se3_raw), 6),
        "ate_se3_scaled": round(float(ate_se3_scaled), 6),
        "ate_sim3": round(float(ate_sim3), 6),
        "n_kf": len(stamps),
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
    ap.add_argument("--calib", action="store_true",
                    help="calibrated pipeline on the ray-consistent plane "
                         "world (pixel+log-depth GN, calib backend solve)")
    ap.add_argument("--loop", action="store_true",
                    help="loop-closure A/B on the plane world: out-and-back "
                         "trajectory with and without the retrieval database")
    ap.add_argument("--vio", action="store_true",
                    help="VIO metric-scale A/B: alpha-scaled VO world + "
                         "metric odometry, with and without odometry factors")
    ap.add_argument("--per-frame", action="store_true",
                    help="normal keyframing + per-frame-pose ATE (exercises "
                         "the warm-started matcher path)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.episode:
        print(json.dumps(run_episode(args.noise)))
    elif args.calib:
        print(json.dumps(run_calib(args.frames, args.noise, out_dir=args.out)))
    elif args.loop:
        on = run_loop(args.frames, args.noise, out_dir=args.out,
                      with_retrieval=True)
        off = run_loop(args.frames, args.noise, out_dir=args.out,
                       with_retrieval=False)
        print(json.dumps({"loop": on, "no_retrieval": off}))
    elif args.vio:
        on = run_vio(min(args.frames, 16), args.noise, out_dir=args.out,
                     use_odometry=True)
        off = run_vio(min(args.frames, 16), args.noise, out_dir=args.out,
                      use_odometry=False)
        print(json.dumps({"vio": on, "no_odom": off}))
    else:
        print(json.dumps(run(args.frames, args.noise,
                             single_thread=not args.threaded, out_dir=args.out,
                             per_frame=args.per_frame)))
