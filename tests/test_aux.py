"""Auxiliary subsystem tests: PGO scale, height prior RANSAC, odometry
motion model, IMU preintegration, ATE metric, evaluation exports."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from frodo_slam_tpu.ops import lie


def test_pgo_recovers_global_scale():
    from frodo_slam_tpu.slam.pgo import make_pose_graph, pgo_add_frame, pgo_optimize

    rng = np.random.default_rng(0)
    state = make_pose_graph(64)
    true_scale = 2.5
    pos = np.zeros(3)
    for i in range(20):
        step = rng.normal(size=3) * 0.1
        pos = pos + step
        # VO pose: translation divided by the true scale (monocular ambiguity)
        T_vo = np.concatenate([pos / true_scale, [0, 0, 0, 1], [1.0]]).astype(np.float32)
        T_od = np.concatenate([pos, [0, 0, 0, 1]]).astype(np.float32)
        state = pgo_add_frame(state, jnp.asarray(T_vo), jnp.asarray(T_od))
    state, s, ok = pgo_optimize(state)
    assert bool(ok)
    np.testing.assert_allclose(float(s), true_scale, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(state.scale[:20]), true_scale, rtol=1e-4)


def test_pgo_too_few_frames_noop():
    from frodo_slam_tpu.slam.pgo import make_pose_graph, pgo_add_frame, pgo_optimize

    state = make_pose_graph(16)
    for i in range(5):
        state = pgo_add_frame(state, jnp.ones(8), jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]))
    state, s, ok = pgo_optimize(state)
    assert not bool(ok) and float(s) == 1.0


def test_height_prior_plane():
    from frodo_slam_tpu.slam.height_prior import RectanglePlaneEstimator

    h, w = 24, 32
    rng = np.random.default_rng(1)
    # ground plane at camera height 0.5: y = 0.5 (camera y-down toward ground)
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    X = np.stack([(uu - w / 2) / 10, np.full_like(uu, 0.5), 2 + vv / 10], axis=-1)
    X += rng.normal(size=X.shape) * 0.002
    est = RectanglePlaneEstimator(corners=((0, 0), (w - 1, h - 1)), min_inliers=50,
                                  ransac_iterations=200)
    height = est.run(X.reshape(-1, 3), (h, w))
    assert height is not None
    # plane y=0.5: normal (0,1,0), d=-0.5 -> height = -d/b = +0.5
    np.testing.assert_allclose(height, 0.5, atol=0.02)

    # tilted plane -> rejected
    Xt = X.copy()
    Xt[..., 1] += Xt[..., 2] * 0.5  # ~26 degrees
    assert est.run(Xt.reshape(-1, 3), (h, w)) is None


def test_height_prior_configured_rect():
    """The yaml-exposed rectangle (config height_prior.rect) must gate which
    pixels feed the plane fit: a mildly tilted ground plane inside the band
    plus garbage outside must recover the band's height; the same estimator
    with a full-image rectangle must fail on the garbage."""
    from frodo_slam_tpu.config import make_config
    from frodo_slam_tpu.slam.height_prior import RectanglePlaneEstimator

    h, w = 32, 48
    rng = np.random.default_rng(3)
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    z = 2 + vv / 10
    # ground plane at height 0.5 with a ~1.1 degree forward tilt (within the
    # 5-degree gate): y = 0.5 + 0.02 z  ->  -d/b == 0.5 exactly
    X = np.stack([(uu - w / 2) / 10, 0.5 + 0.02 * z, z], axis=-1)
    X += rng.normal(size=X.shape) * 0.002
    rect = ((8, 20), (40, 31))  # the "ground band"
    (x0, y0), (x1, y1) = rect
    outside = np.ones((h, w), bool)
    outside[y0 : y1 + 1, x0 : x1 + 1] = False
    X[outside] = rng.normal(size=(outside.sum(), 3)) * 3.0  # non-planar clutter

    est = RectanglePlaneEstimator(corners=rect, min_inliers=50, ransac_iterations=300)
    height = est.run(X.reshape(-1, 3), (h, w))
    assert height is not None
    # 3-point RANSAC without inlier refit: the fitted tilt can be off by
    # ~0.01 rad, shifting -d/b by tilt_err * mean_z (~0.03 here)
    np.testing.assert_allclose(height, 0.5, atol=0.06)

    est_full = RectanglePlaneEstimator(corners=((0, 0), (w - 1, h - 1)),
                                       min_inliers=600, ransac_iterations=300)
    assert est_full.run(X.reshape(-1, 3), (h, w)) is None

    # the yaml knob flows through make_config
    cfg = make_config(height_prior={"rect": [[8, 20], [40, 31]]})
    assert list(map(list, cfg.height_prior.rect)) == [[8, 20], [40, 31]]


def test_web_viewer_serves_state():
    """Live web viewer (viz/web.py): serves the viewer page, a state.json
    with poses/edges, and the packed world-point buffer — the reference GL
    viewer's data contract (visualization.py:73-600) over HTTP."""
    import dataclasses
    import json
    import types
    import urllib.request

    import jax.numpy as jnp

    from frodo_slam_tpu.slam import frame as frame_mod
    from frodo_slam_tpu.viz.web import WebViewer

    hw = 16
    store = frame_mod.make_keyframe_store(4, hw, 2, 8)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-1, 1, (2, hw, 3)), jnp.float32)
    store = dataclasses.replace(
        store,
        X_canon=store.X_canon.at[:2].set(X),
        C=store.C.at[:2].set(5.0),
        N=store.N.at[:2].set(1),
        n_size=jnp.asarray(2, jnp.int32),
        n_total=jnp.asarray(2, jnp.int32),
    )
    slam = types.SimpleNamespace(
        store=store, frame_count=7,
        backend=types.SimpleNamespace(_pairs=[(0, 1)]),
    )
    v = WebViewer(slam, port=0, interval_s=0.05)  # port 0: pick a free one
    v.start()
    try:
        port = v._server.server_address[1]
        base = f"http://127.0.0.1:{port}"
        html = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"frodo-slam-tpu live map" in html

        deadline = 20
        import time as _t
        st = {}
        for _ in range(deadline * 20):
            st = json.loads(urllib.request.urlopen(base + "/state.json", timeout=10).read())
            if st["version"] > 0:
                break
            _t.sleep(0.05)
        assert st["n_kf"] == 2 and st["frames"] == 7
        assert st["edges"] == [[0, 1]]
        assert len(st["T_WC"]) == 2 and len(st["T_WC"][0]) == 8

        buf = urllib.request.urlopen(base + "/points.bin", timeout=10).read()
        pts = np.frombuffer(buf, np.float32).reshape(-1, 4)
        assert len(pts) == 2 * hw  # all points above the conf threshold
        assert np.isfinite(pts).all()
    finally:
        v.stop()


def test_web_viewer_control_channel():
    """POST /control drives pause -> step -> resume of a running loop over
    HTTP — the reference viewer's WindowMsg back-channel
    (visualization.py:88-91,130-142,305). Also covers the conf-threshold
    and teleop messages."""
    import json
    import threading
    import time as _t
    import types
    import urllib.request

    from frodo_slam_tpu.viz.web import WebViewer

    teleops = []
    slam = types.SimpleNamespace(
        store=types.SimpleNamespace(n_total=0), frame_count=0,
        backend=types.SimpleNamespace(_pairs=[]),
    )
    v = WebViewer(slam, port=0, interval_s=3600, teleop_cb=teleops.append)
    v.start()

    frames = [0]
    stop = threading.Event()

    def loop():  # the synthetic "SLAM main loop"
        while not stop.is_set():
            v.wait_if_paused()
            frames[0] += 1
            _t.sleep(0.002)

    t = threading.Thread(target=loop, daemon=True)
    t.start()
    try:
        port = v._server.server_address[1]
        base = f"http://127.0.0.1:{port}"

        def post(body):
            req = urllib.request.Request(
                base + "/control", data=json.dumps(body).encode(), method="POST"
            )
            return urllib.request.urlopen(req, timeout=10)

        def state():
            return json.loads(
                urllib.request.urlopen(base + "/state.json", timeout=10).read()
            )

        def settled(pred, timeout=5.0):
            deadline = _t.monotonic() + timeout
            while _t.monotonic() < deadline:
                if pred():
                    return True
                _t.sleep(0.01)
            return False

        # pause: the loop must stop making progress
        assert post({"action": "pause"}).status == 200
        assert state()["paused"] is True
        assert settled(lambda: v.paused)
        _t.sleep(0.05)  # let any in-flight frame drain
        n0 = frames[0]
        _t.sleep(0.15)
        assert frames[0] == n0, "loop advanced while paused"

        # step: exactly one frame is released
        post({"action": "step"})
        assert settled(lambda: frames[0] == n0 + 1)
        _t.sleep(0.15)
        assert frames[0] == n0 + 1, "step released more than one frame"

        # resume: frames flow again; paused flag clears
        post({"action": "resume"})
        assert settled(lambda: frames[0] > n0 + 5)
        assert state()["paused"] is False

        # conf threshold + teleop messages
        post({"conf_threshold": 3.5})
        assert v.conf_threshold == 3.5
        assert state()["conf_threshold"] == 3.5
        post({"teleop": "w"})
        assert settled(lambda: teleops == ["w"])

        # CSRF guard (ADVICE r4): a cross-origin control POST is rejected
        # (any web page in the operator's browser can send one — teleop
        # must not reach a robot from it); same-origin posts still pass
        import urllib.error

        evil = urllib.request.Request(
            base + "/control", data=json.dumps({"teleop": "s"}).encode(),
            method="POST", headers={"Origin": "http://evil.example"},
        )
        try:
            urllib.request.urlopen(evil, timeout=10)
            raise AssertionError("cross-origin control was accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 403
        _t.sleep(0.05)
        assert teleops == ["w"], "cross-origin teleop reached the callback"
        ok_req = urllib.request.Request(
            base + "/control", data=json.dumps({"teleop": "a"}).encode(),
            method="POST", headers={"Origin": f"http://127.0.0.1:{port}"},
        )
        assert urllib.request.urlopen(ok_req, timeout=10).status == 200
        assert settled(lambda: teleops == ["w", "a"])
    finally:
        stop.set()
        t.join(timeout=5)
        v.stop()


def test_wheel_odometry_straight_and_spin():
    from frodo_slam_tpu.slam.odometry import WheelOdometryIntegrator, pos_yaw_to_se3

    o = WheelOdometryIntegrator("mini")
    # drive straight 1s at 60 rpm -> circumference meters
    rows = [(60.0, 60.0, 60.0, 60.0, t) for t in np.linspace(0, 1, 11)]
    o.integrate_rpms(rows)
    circ = math.pi * 0.095
    np.testing.assert_allclose(o.x, circ, rtol=1e-6)
    np.testing.assert_allclose(o.y, 0.0, atol=1e-9)

    # spinning (opposite signs) must NOT translate
    o2 = WheelOdometryIntegrator("mini")
    rows = [(30.0, -30.0, 30.0, -30.0, t) for t in np.linspace(0, 1, 11)]
    o2.integrate_rpms(rows)
    assert o2.x == 0.0 and o2.y == 0.0

    # yaw update applies camera-offset compensation
    o3 = WheelOdometryIntegrator("mini")
    o3.apply_yaw(math.pi / 2)
    r = 0.075
    np.testing.assert_allclose(o3.x, r * (math.cos(math.pi / 2) - 1), atol=1e-9)
    np.testing.assert_allclose(o3.y, r * math.sin(math.pi / 2), atol=1e-9)

    # pos_yaw_to_se3 frame mapping (odometry.py:82-100): z <- x, x <- -y
    T = pos_yaw_to_se3((1.0, 2.0), 0.0)
    np.testing.assert_allclose(T[:3], [-2.0, 0.0, 1.0])


def test_imu_preintegration_constant_accel():
    from frodo_slam_tpu.slam.imu import IMUPreintegrator

    pre = IMUPreintegrator(gravity_mag=9.81)
    # stationary calibration: accel measures -g in body frame (upright)
    gyro = np.zeros((50, 3)) + 0.01  # gyro bias
    accel = np.tile(np.array([0.0, 9.81, 0.0]), (50, 1))
    pre.calibrate_static(gyro, accel)
    np.testing.assert_allclose(pre.bias_g, 0.01, atol=1e-6)

    # accelerate at 1 m/s^2 along z for 1s -> v = 1, p = 0.5
    n = 100
    dts = np.full(n, 0.01)
    gyro = np.tile(pre.bias_g, (n, 1))  # no rotation
    accel = np.tile(np.array([0.0, 9.81, 1.0]), (n, 1)) + pre.bias_a
    st = pre.update(gyro, accel, dts)
    np.testing.assert_allclose(st.v, [0, 0, 1.0], atol=5e-3)
    np.testing.assert_allclose(st.p, [0, 0, 0.5], atol=5e-3)


def test_ate_rmse_known_offset(tmp_path):
    from frodo_slam_tpu.utils.evaluate import ate_rmse, save_traj

    rng = np.random.default_rng(2)
    n = 50
    ts = np.arange(n, dtype=float)
    gt = np.cumsum(rng.normal(size=(n, 3)) * 0.1, axis=0)
    # estimate = rotated+scaled+shifted gt plus 5cm noise -> ATE ~ noise level
    from scipy.spatial.transform import Rotation  # noqa: F401

    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
    est = 1.7 * gt @ R.T + np.array([1, 2, 3]) + rng.normal(size=(n, 3)) * 0.05

    def dump(name, xyz):
        poses = np.concatenate([xyz, np.tile([0, 0, 0, 1.0], (n, 1))], axis=1)
        return save_traj(tmp_path, name, ts, poses)

    gt_f = dump("gt.txt", gt)
    est_f = dump("est.txt", est)
    rmse = ate_rmse(gt_f, est_f)
    assert 0.02 < rmse < 0.1, rmse


def test_viz_export_and_render(tmp_path):
    import matplotlib  # noqa: F401

    from frodo_slam_tpu.config import make_config
    from frodo_slam_tpu.models import mast3r
    from frodo_slam_tpu.slam.system import SLAM
    from frodo_slam_tpu.viz.visualization import SLAMViewer, export_state

    mcfg = mast3r.tiny_config()
    params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
    params["head2"] = params["head1"]
    params["dec_blocks2"] = params["dec_blocks"]
    cfg = make_config(tracking={"match_frac_thresh": 1.1, "min_match_frac": 0.0, "Q_conf": 0.0,
                                "max_iters": 5},
                      local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 1},
                      tpu={"max_keyframes": 8, "max_edges": 8, "max_odom_edges": 8})
    slam = SLAM(cfg, params, mcfg, (32, 64), retrieval_db=None, use_backend=True,
                use_reloc=False, single_thread=True)
    img = np.random.default_rng(0).uniform(0, 1, (32, 64, 3)).astype(np.float32)
    for i in range(3):
        slam.grab_rgb(img, timestamp=float(i))

    npz = export_state(slam, str(tmp_path / "state.npz"))
    data = np.load(npz)
    assert data["T_WC"].shape[1] == 8 and data["X_canon"].shape[0] == int(slam.store.n_size)

    png = SLAMViewer(conf_threshold=0.0).render(slam, str(tmp_path / "map.png"))
    assert (tmp_path / "map.png").stat().st_size > 1000


def test_slam_checkpoint_roundtrip(tmp_path):
    from frodo_slam_tpu.config import make_config
    from frodo_slam_tpu.models import mast3r
    from frodo_slam_tpu.slam.system import SLAM
    from frodo_slam_tpu.utils.checkpoint import load_slam_state, save_slam_state

    from frodo_slam_tpu.retrieval.asmk import Codebook
    from frodo_slam_tpu.retrieval.database import RetrievalDatabase
    from frodo_slam_tpu.retrieval.model import RetrievalHead

    mcfg = mast3r.tiny_config()
    params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
    params["head2"] = params["head1"]
    params["dec_blocks2"] = params["dec_blocks"]
    cfg = make_config(tracking={"match_frac_thresh": 1.1, "min_match_frac": 0.0, "Q_conf": 0.0,
                                "max_iters": 5},
                      local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 1},
                      tpu={"max_keyframes": 8, "max_edges": 8, "max_odom_edges": 8})

    def build():
        head = RetrievalHead.init(jax.random.PRNGKey(1), backbone_dim=mcfg.enc_embed_dim,
                                  hdims=[mcfg.enc_embed_dim], nfeat=8)
        db = RetrievalDatabase(head, Codebook.random(np.random.default_rng(0), 64,
                                                     mcfg.enc_embed_dim))
        return SLAM(cfg, params, mcfg, (32, 64), retrieval_db=db, use_backend=True,
                    use_reloc=False, single_thread=True)

    slam = build()
    img = np.random.default_rng(0).uniform(0, 1, (32, 64, 3)).astype(np.float32)
    for i in range(3):
        slam.grab_rgb(img, timestamp=float(i))
    ckpt = save_slam_state(slam, str(tmp_path / "state.npz"))

    slam2 = build()
    load_slam_state(slam2, ckpt)
    assert int(slam2.store.n_size) == int(slam.store.n_size)
    np.testing.assert_array_equal(np.asarray(slam2.store.T_WC), np.asarray(slam.store.T_WC))
    assert slam2.backend._pairs == slam.backend._pairs
    # loop-closure retrieval is map state: the restored db must cover the
    # pre-checkpoint keyframes
    assert slam2.retrieval.kf_ids == slam.retrieval.kf_ids
    assert slam2.retrieval.kf_counter == slam.retrieval.kf_counter
    # resumed instance keeps tracking
    ok, pose, new_kf = slam2.grab_rgb(img, timestamp=3.0)
    assert ok and np.all(np.isfinite(pose))


def test_pgo_full_sim3_pulls_poses_to_measurements():
    """pgo_optimize_full (the reference's OdomResidual variant, pgo.py:82-128):
    noisy poses + exact delta measurements -> cost drops and relative poses
    approach the measured deltas."""
    import jax
    import numpy as np

    from frodo_slam_tpu.ops import lie
    from frodo_slam_tpu.slam.pgo import pgo_optimize_full

    rng = np.random.default_rng(0)
    N = 5
    # ground-truth chain of Sim3 poses
    T = [jnp.asarray([0, 0, 0, 0, 0, 0, 1, 1], jnp.float32)]
    for i in range(1, N):
        xi = jnp.asarray(rng.normal(size=7) * 0.1, jnp.float32)
        T.append(lie.sim3_mul(T[-1], lie.sim3_exp(xi)))
    T_gt = jnp.stack(T)
    dT_gt = jax.vmap(lie.sim3_mul)(jax.vmap(lie.sim3_inv)(T_gt[:-1]), T_gt[1:])
    meas_inv = jax.vmap(lie.sim3_inv)(dT_gt)

    # perturb every pose except the first
    noise = jnp.asarray(rng.normal(size=(N, 7)) * 0.05, jnp.float32).at[0].set(0.0)
    T_noisy = jax.vmap(lie.sim3_retr)(T_gt, noise)

    w = jnp.ones((N - 1, 7), jnp.float32)
    lc_edges = jnp.zeros((1, 2), jnp.int32)
    lc_T = jnp.asarray([[0, 0, 0, 0, 0, 0, 1, 1]], jnp.float32)
    lc_active = jnp.zeros((1,), bool)

    def cost(Tp):
        d = jax.vmap(lie.sim3_mul)(jax.vmap(lie.sim3_inv)(Tp[:-1]), Tp[1:])
        r = jax.vmap(lie.sim3_log)(jax.vmap(lie.sim3_mul)(d, meas_inv))
        return float(jnp.sum(r * r))

    c0 = cost(T_noisy)
    T_new, c_final = pgo_optimize_full(
        T_noisy, meas_inv, meas_inv, w, w, lc_edges, lc_T, lc_active, iters=10
    )
    assert np.all(np.isfinite(np.asarray(T_new)))
    c1 = cost(T_new)
    assert c1 < 0.05 * c0, (c0, c1)


def test_height_prior_mask_file(tmp_path):
    """corners_from_mask_file reads both reference pickle formats:
    (2,2) rectangle corners and (N,2) polygon vertices (bounding box)."""
    import pickle

    from frodo_slam_tpu.slam.height_prior import corners_from_mask_file

    rect = np.array([[115, 230], [424, 286]])
    p1 = tmp_path / "rect_mask.pkl"
    pickle.dump(rect, open(p1, "wb"))
    assert corners_from_mask_file(str(p1)) == ((115, 230), (424, 286))

    poly = np.array([[388, 211], [91, 208], [88, 272], [383, 272], [387, 210]])
    p2 = tmp_path / "polygon_mask.pkl"
    pickle.dump(poly, open(p2, "wb"))
    assert corners_from_mask_file(str(p2)) == ((88, 208), (388, 272))


def test_height_prior_scale_target_is_map_gauge():
    """scale_targets must return the map GAUGE g = world-per-metric (the
    Sim(3) scale-channel convention of the BA odometry kernel and the PGO
    write-back; metric = t / s): a pointmap whose ground plane sits at
    g * camera_height must yield s_bar = g. The reference computes the
    inverse (camera_height / h_bar) — see the scale_targets docstring."""
    from frodo_slam_tpu.slam.height_prior import (
        RectanglePlaneEstimator, scale_targets,
    )

    h, w = 24, 32
    camera_height = 0.5
    g = 2.0  # map gauge: world units are 2x metric
    rng = np.random.default_rng(5)
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    X = np.stack([(uu - w / 2) / 10, np.full_like(uu, g * camera_height), 2 + vv / 10], axis=-1)
    X += rng.normal(size=X.shape) * 0.002
    est = RectanglePlaneEstimator(corners=((0, 0), (w - 1, h - 1)), min_inliers=50,
                                  ransac_iterations=200)
    sb = scale_targets(est, [X.reshape(-1, 3)], (h, w), camera_height)
    np.testing.assert_allclose(sb, [g], atol=0.05)
