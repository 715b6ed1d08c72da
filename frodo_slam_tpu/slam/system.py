"""The SLAM/VIO system: one host process orchestrating jitted programs.

Behavioral spec: ``mast3r_slam/vio.py`` — ``VIO.__init__`` (:163-256),
``grab_rgb`` (:287-346), tracking-loss map reset (:321-328, :258-277),
``run_backend`` worker (:75-161), ``relocalization`` (:29-72) — with the
*upstream* main-loop semantics (mono init -> track -> queue backend ->
reloc on failure) that SURVEY.md section 3.4 identifies as the contract the
stale ``main.py`` was meant to implement.

TPU design: the reference runs three processes (frontend / backend / viz)
sharing CUDA tensors through locks. Here everything is ONE process: the
tracker step and the backend BA are separate jitted programs; the backend
runs synchronously on keyframe creation (the reference's own eval mode,
``single_thread: True``, proves serialized semantics are the accuracy
contract) or asynchronously on a host thread when ``single_thread=False``.
No locks, no shared-memory mirrors: the KeyframeStore pytree is the single
source of truth.

Known reference divergence (deliberate): the reference never inserts the
FIRST keyframe into the retrieval database (only keyframes that get backend
tasks are inserted, vio.py:124-129), so its retrieval database ids are offset
from keyframe indices by one map-initialization each. We insert the init
keyframe too, and every insertion carries its keyframe index explicitly
(``RetrievalDatabase.kf_ids``) — retrieval results are true keyframe
indices even when a preempting relocalization or a backlogged backend
queue makes insertion order diverge from keyframe order.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.image import resize_img
from ..models import mast3r
from ..ops import lie
from . import frame as frame_mod
from .backend import BackendGraph
from .frame import Mode
from .global_opt import BAConfig
from .height_prior import RectanglePlaneEstimator
from .inference import decode_mono
from .pgo import make_pose_graph, pgo_add_frame, pgo_optimize
from .tracker import TrackingCfg, track_step
from ..utils.log import get_logger

log = get_logger("slam")


@jax.jit
def _apply_pgo_scale(T_WC, n_size, s, ok):
    """Write the PGO's scale estimate into every live keyframe's Sim(3)
    scale channel (the reference's post-optimize write-back,
    tracker.py:347-353 + pgo.py:195-202 / :262-274 — its endpoint-sqrt
    smoothing reduces to one global scale, pgo.py module docstring).

    Convention (deliberate divergence from the reference): the scale
    channel stores the map GAUGE g = world-translation-units per metric
    unit — the convention the BA odometry kernel consumes
    (gn_kernels.cu:1144-1177 predicts the metric delta as
    ``(1/s_j) Ri^T (tj - ti)``), so metric translation = t / s. The PGO
    solves s_pgo = metric per world unit (``s_pgo * t_vo = t_odom``,
    pgo.py:26-79), so we store ``1/s_pgo``. The reference stores s_pgo
    directly while its BA reads the channel as g — inverse conventions
    that only coincide at gauge 1, which its metric MASt3R checkpoint
    guarantees; at a general monocular gauge the two fight (verified:
    scripts/eval_synthetic.py --vio diverged until this inversion).
    Writing g also leaves tracking stationary: the Sim(3) world
    (structure AND translations) stays at gauge g, so future PGO deltas
    keep estimating the same s_pgo. Conditional on-device: no host sync,
    no-op while ``ok`` is False."""
    g = 1.0 / jnp.maximum(s.astype(T_WC.dtype), 1e-8)
    live = jnp.arange(T_WC.shape[0]) < n_size
    sc = jnp.where(ok & live, g, T_WC[:, 7])
    return T_WC.at[:, 7].set(sc)


class SLAM:
    """Single-process TPU SLAM system (``VIO`` class API of the reference)."""

    def __init__(
        self,
        cfg: Config,
        params,
        model_cfg: mast3r.MASt3RConfig,
        img_hw: Tuple[int, int],
        calib: Optional[np.ndarray] = None,
        retrieval_db=None,
        use_backend: bool = True,
        use_reloc: bool = True,
        single_thread: bool = True,
        local_opt_mode: bool = False,
        mesh=None,
        keep_keyframe_images: bool = False,
    ):
        self.cfg = cfg
        self.params = params
        # portrait input (true height > width): store every image/map
        # transposed into landscape layout and flag the model so its patch
        # embed / heads transpose in and out (the reference's
        # ManyAR_PatchEmbed + transpose_to_landscape contract,
        # dust3r/patch_embed.py:43-71, dust3r/utils/misc.py:56-108). All
        # SLAM-layer math (matching, GN, pointmaps) is orientation-agnostic.
        self.portrait = img_hw[0] > img_hw[1]
        if self.portrait:
            img_hw = (img_hw[1], img_hw[0])
            model_cfg = dataclasses.replace(model_cfg, portrait=True)
        self.model_cfg = model_cfg
        self.img_hw = img_hw
        self.hw = img_hw[0] * img_hw[1]
        self.use_backend = use_backend
        self.use_reloc = use_reloc
        self.single_thread = single_thread
        self.local_opt_mode = local_opt_mode

        t = cfg.tracking
        self.tcfg = TrackingCfg(
            min_match_frac=float(t.min_match_frac),
            use_fnn=bool(t.get("use_fnn", False)),
            min_match_frac_fnn=float(t.get("min_match_frac_fnn", 0.0008)),
            max_iters=int(t.max_iters),
            C_conf=float(t.C_conf),
            Q_conf=float(t.Q_conf),
            rel_error=float(t.rel_error),
            delta_norm=float(t.delta_norm),
            huber_k=float(t.huber),
            match_frac_thresh=float(t.match_frac_thresh),
            sigma_ray=float(t.sigma_ray),
            sigma_dist=float(t.sigma_dist),
            sigma_pixel=float(t.sigma_pixel),
            sigma_depth=float(t.sigma_depth),
            pixel_border=float(t.pixel_border),
            depth_eps=float(t.depth_eps),
            filtering_mode=str(t.filtering_mode),
            filtering_score=str(t.get("filtering_score", "median")),
            use_calib=bool(cfg.use_calib) and calib is not None,
        )
        self.match_cfg = tuple(sorted(dict(cfg.matching).items()))
        lo = cfg.local_opt
        self.ba_cfg = BAConfig(
            max_iters=int(lo.max_iters),
            sigma_ray=float(lo.get("sigma_ray_odom_mode", lo.sigma_ray)) if local_opt_mode else float(lo.sigma_ray),
            sigma_dist=float(lo.sigma_dist),
            sigma_pixel=float(lo.sigma_pixel),
            sigma_depth=float(lo.sigma_depth),
            C_conf=float(lo.C_conf),
            Q_conf=float(lo.Q_conf),
            delta_norm=float(lo.delta_norm),
            pin=int(lo.pin),
            sigma_odom_t=float(lo.get("sigma_odom_t", 1e-3)),
            sigma_odom_r=float(lo.get("sigma_odom_r", 1e-3)),
            sigma_scale_prior=float(lo.get("sigma_scale_prior", 0.1)),
            pixel_border=float(lo.pixel_border),
            depth_eps=float(lo.depth_eps),
        )

        n_tok = (img_hw[0] // model_cfg.patch_size) * (img_hw[1] // model_cfg.patch_size)
        self.store = frame_mod.make_keyframe_store(
            int(cfg.tpu.max_keyframes), self.hw, n_tok, model_cfg.enc_embed_dim
        )
        self.backend = BackendGraph(
            params, model_cfg, self.ba_cfg, self.match_cfg, img_hw,
            max_edges=int(cfg.tpu.max_edges), max_odom=int(cfg.tpu.max_odom_edges),
            Q_conf=float(lo.Q_conf), min_match_frac=float(lo.min_match_frac),
            mesh=mesh,
        )
        self.retrieval = retrieval_db
        self.K = None if calib is None else jnp.asarray(calib, jnp.float32)

        self.pgo = make_pose_graph(int(cfg.tpu.max_keyframes))
        hp = cfg.height_prior
        self.height_prior_enabled = bool(hp.enabled)
        rect = hp.get("rect", None)
        corners = None
        if rect:
            (x0, y0), (x1, y1) = rect
            corners = ((int(x0), int(y0)), (int(x1), int(y1)))
        mask_file = hp.get("mask_file", None)
        if corners is None and mask_file:
            # the reference's interactively-picked pickled region
            # (height_prior.py:36-43 + config/rect_mask.pkl)
            from .height_prior import corners_from_mask_file

            corners = corners_from_mask_file(str(mask_file))
        self.plane_estimator = RectanglePlaneEstimator(
            corners=corners,
            max_tilt_deg=float(hp.tilt_max_deg), ransac_iterations=int(hp.ransac_iters),
            inlier_thresh=float(hp.get("dist_thresh", 0.04)),
        )
        self.camera_height = float(hp.camera_height)
        # per-keyframe plane-fit cache (logical kf idx -> gauge target) +
        # the fit region's storage-layout row indices (device, built lazily)
        self._hp_cache: dict = {}
        self._hp_region_idx = None

        self._encode = jax.jit(lambda p, img: mast3r.encode_image(p, model_cfg, img))

        self.mode = Mode.INIT
        self.frame_count = 0
        self.loss_track_counter = 0
        self.kf_timestamps: List[float] = []
        # host-side uint8 keyframe images for the reference's PNG export
        # (main.py:332, evaluate.py:73-85). The device store keeps no images
        # (147k-point maps only), so export needs an explicit opt-in ring —
        # each capture is a ~1.7MB device->host fetch at keyframe rate.
        self.keep_keyframe_images = bool(keep_keyframe_images)
        self.kf_images: List[np.ndarray] = []
        self.atlas: List[dict] = []  # finished maps (main.py:187-239)
        self.active_kf: Optional[frame_mod.Frame] = None  # streaming KF state
        self.current_T_WC = np.asarray(lie.sim3_identity())
        self.last_odom_pose: Optional[np.ndarray] = None
        self._idx_f2k = None
        self.last_track = None
        self._encode_cache = None  # (img_obj, dev_img, feat, pos) lookahead
        self._backend_lock = threading.Lock()
        # Backend tasks QUEUE and the frontend never blocks on a solve — the
        # reference contract (tasks pile into a manager list, vio.py:109-115,
        # frame.py:325-327). One worker thread drains the queue serially.
        # Tasks are NEVER dropped (the reference list is unbounded): every
        # keyframe's consecutive edge, odometry factor, and retrieval-db
        # insertion must land, or later loop closures reference a map with
        # holes. ``backend_queue_max`` is a backlog WARNING threshold only.
        self._backend_tasks: queue.Queue = queue.Queue()
        self._backend_queue_max = int(cfg.tpu.get("backend_queue_max", 8))
        # held by the worker around each task: lets reloc/reset wait out the
        # IN-FLIGHT task only, preempting the pending backlog (the reference
        # backend checks RELOC mode before popping tasks, vio.py:102-107)
        self._backend_exec_lock = threading.Lock()
        self._half_reuse = bool(cfg.tpu.get("consecutive_half_reuse", True))
        # per-frame keyframe pointmap write-back (the reference fuses the
        # tracked frame into the store EVERY frame, tracker.py:325-328;
        # default here is keyframe-rate — one frame of fusion behind —
        # because an eager .at[slot].set on the 300-slot store copies the
        # whole buffer per channel: ~4 extra device copies per frame.
        # Oracle A/B (PERF.md round 4): ATE-identical on the straight
        # harness; knob preserved for parity experiments.
        self._kf_sync_per_frame = bool(cfg.tpu.get("kf_sync_per_frame", False))
        self._backend_worker: Optional[threading.Thread] = None
        self._map_epoch = 0  # bumped on reset(); stale backend merges are dropped
        # one-frame pipelined frontend state (grab_rgb_pipelined/flush)
        self._pending = None
        self._pending_result = None

    # -- lifecycle -----------------------------------------------------------

    def reset(self):
        """Full map reset on tracking loss (vio.py:258-277): new keyframe
        buffer, backend/retrieval cleared, mode back to INIT. The finished
        map is retained in ``self.atlas`` (the multi-map behavior of
        main.py:227-239: old keyframe buffers are kept for export)."""
        # pending tasks reference the dead map: discard them, wait out only
        # the in-flight one (its merge is dropped by the epoch guard anyway)
        self._join_backend(discard_pending=True)
        self._map_epoch += 1
        if int(self.store.n_size) > 0:
            stamps, poses = self.keyframe_poses()
            self.atlas.append({"timestamps": stamps, "T_WC": poses,
                               "images": self.kf_images[-len(stamps):]})
            log.warning("map reset: archiving %d keyframes to atlas #%d",
                        len(stamps), len(self.atlas))
        cap = self.store.capacity
        n_tok = self.store.feat.shape[1]
        enc_dim = self.store.feat.shape[2]
        self.store = frame_mod.make_keyframe_store(cap, self.hw, n_tok, enc_dim)
        self.backend.reset()
        if self.retrieval is not None:
            self.retrieval.reset()
        self.pgo = make_pose_graph(cap)
        self.mode = Mode.INIT
        self.loss_track_counter = 0
        self.kf_timestamps = []
        self.kf_images = []
        self._hp_cache = {}
        self._pending = None  # a pending pipelined frame references the dead map
        self._pending_result = None
        self._idx_f2k = None
        self.last_odom_pose = None
        self.active_kf = None

    def terminate(self):
        if self._pending is not None or self._pending_result is not None:
            self.flush()
        self.mode = Mode.TERMINATED
        self._join_backend()
        if self._backend_worker is not None:
            if self._backend_worker.is_alive():
                self._backend_tasks.put(None)  # stop sentinel
            self._backend_worker.join()
            self._backend_worker = None

    def _join_backend(self, discard_pending: bool = False):
        """Wait until the backend is idle (queue drained, no task running).

        ``discard_pending`` drops queued-but-unstarted tasks first (used by
        reset(): they reference the dead map) while still waiting out the
        in-flight one. Waits WITHOUT a deadline: clearing/mutating state
        while a task is still running is a data race (a first-solve jit
        through the remote-TPU tunnel can exceed any fixed timeout); a
        long-running task is logged every 60s instead of abandoned."""
        q = self._backend_tasks
        if discard_pending:
            while True:
                try:
                    task = q.get_nowait()
                except queue.Empty:
                    break
                q.task_done()
                if task is not None:
                    log.warning("map reset: discarded pending backend task kf=%s",
                                task[0])
        waited = 0.0
        with q.all_tasks_done:
            while q.unfinished_tasks:
                if not q.all_tasks_done.wait(timeout=60.0):
                    waited += 60.0
                    log.warning("backend task still running after %.0fs; waiting",
                                waited)

    def _backend_worker_loop(self):
        """Drain the task queue serially (run_backend loop, vio.py:86-157)."""
        while True:
            task = self._backend_tasks.get()
            try:
                if task is None:
                    return
                with self._backend_exec_lock:
                    self._backend_step(*task)
            except Exception:
                log.exception("backend task kf=%s failed", task[0])
            finally:
                self._backend_tasks.task_done()

    # -- frame path ----------------------------------------------------------

    def preprocess(self, img: np.ndarray) -> np.ndarray:
        """Host preprocessing: resize/normalize to the network input (and
        transpose portrait frames into the landscape storage layout).
        Exposed so a PrefetchLoader can run it (and the device upload)
        ahead of time."""
        h, w = self.img_hw  # landscape storage shape
        true_shape = (w, h) if self.portrait else (h, w)
        normalized = False
        if img.shape[:2] != true_shape and img.shape[:2] != (h, w):
            img = resize_img(img, max(self.img_hw))["img"][0]  # ImgNorm'd
            normalized = True
        if self.portrait and img.shape[:2] == true_shape:
            img = np.swapaxes(img, 0, 1)
        if not normalized:
            img = (img.astype(np.float32) - 0.5) / 0.5 if img.max() <= 1.0 else img
        return img[None] if img.ndim == 3 else img

    def _make_frame(self, img, T_WC) -> frame_mod.Frame:
        if self._encode_cache is not None and self._encode_cache[0] is img:
            # encode was already dispatched last frame (grab_rgb next_img
            # lookahead): it overlapped the previous frame's flags fetch
            _, dev_img, feat, pos = self._encode_cache
            self._encode_cache = None
        else:
            dev_img, feat, pos = self._encode_frame(img)
        return frame_mod.make_empty_frame(self.frame_count, dev_img, feat, pos, T_WC=T_WC)

    def _encode_frame(self, img):
        """Preprocess + upload + dispatch the ViT encode for one frame."""
        if isinstance(img, jax.Array) and img.ndim == 4:
            dev_img = img  # pre-uploaded by a PrefetchLoader
        else:
            dev_img = jnp.asarray(self.preprocess(np.asarray(img)))
        feat, pos = self._encode(self.params, dev_img)
        return dev_img, feat, pos

    def _capture_kf_image(self, frame: frame_mod.Frame):
        """Fetch + denormalize the new keyframe's image into the host ring
        (the reference keeps ``uimg`` per keyframe, frame.py:17-44)."""
        if not self.keep_keyframe_images:
            return
        img = np.asarray(frame.img[0])  # ImgNorm'd (H, W, 3)
        if self.portrait:
            img = np.swapaxes(img, 0, 1)
        self.kf_images.append(
            (np.clip(img * 0.5 + 0.5, 0.0, 1.0) * 255).astype(np.uint8)
        )

    def init_tracking(self, frame: frame_mod.Frame, timestamp: float):
        """Mono-inference map init (tracker.py:137-155)."""
        X, C = decode_mono(self.params, self.model_cfg, frame.feat, frame.pos, self.img_hw)
        Xn, Cn, Nn, Un = frame_mod.update_pointmap(
            frame.X_canon, frame.C, frame.N, frame.N_updates, X, C,
            self.tcfg.filtering_mode, self.tcfg.filtering_score,
        )
        frame = dataclasses.replace(frame, X_canon=Xn, C=Cn, N=Nn, N_updates=Un)
        self.active_kf = frame
        self.store = frame_mod.kf_append(self.store, frame)
        self.kf_timestamps.append(timestamp)
        self._capture_kf_image(frame)
        if self.retrieval is not None:
            self.retrieval.update(frame.feat, add_after_query=True,
                                  k=int(self.cfg.retrieval.k),
                                  min_thresh=float(self.cfg.retrieval.min_thresh),
                                  kf_id=len(self.kf_timestamps) - 1)
        self.mode = Mode.TRACKING
        self.current_T_WC = np.asarray(frame.T_WC)

    def grab_rgb(self, img: np.ndarray, timestamp: Optional[float] = None,
                 odom_pose: Optional[np.ndarray] = None, next_img=None):
        """Process one RGB frame (vio.py:287-346).

        ``next_img``: optional lookahead frame. Its encode is DISPATCHED
        after this frame's tracking programs but before the blocking flags
        fetch, so the ~3 ms ViT encode (and the host preprocessing) rides
        the fetch latency instead of serializing in front of the next
        frame's matcher. Pass the same array object to the next grab_rgb.

        Returns (success, T_WC (8,) Sim3, new_kf).
        """
        timestamp = time.time() if timestamp is None else timestamp
        pend = self._dispatch_track(img, timestamp, odom_pose, next_img)
        if pend is None:  # INIT path resolved synchronously
            return True, self.current_T_WC, True
        return self._finalize_track(pend)

    def grab_rgb_pipelined(self, img: np.ndarray,
                           timestamp: Optional[float] = None,
                           odom_pose: Optional[np.ndarray] = None):
        """One-frame-deep pipelined frontend: returns the PREVIOUS frame's
        result (or None on the very first call) and dispatches this frame's
        device chain before blocking on anything.

        Why: ``grab_rgb``'s per-frame flags fetch waits for the frame's
        whole device chain, so the strictly-synchronous loop runs at
        chain-latency, not chain-throughput (BENCH synced_fps 14 vs 21.7
        async, VERDICT r4 weak #3). Deferring the fetch ONE frame lets
        frame i's chain execute while the host returns to the caller;
        by the next call the chain is (mostly) done and the fetch is
        cheap. All host bookkeeping (keyframe append, backend task,
        loss/reloc) happens at resolve time — BEFORE the next frame's
        dispatch — so keyframe selection, idx reset, and the matcher's
        target keyframe are exactly the sequential semantics, one frame
        deferred. The reference's frontend has the same freshness: its
        pose reads come from shared memory the backend wrote earlier
        (frame.py:309-323), never from a same-frame sync.

        Call ``flush()`` after the last frame to resolve the final result.

        Returns (ok, T_WC, new_kf) of the PREVIOUS frame, or None.
        """
        timestamp = time.time() if timestamp is None else timestamp
        out = self.flush()
        pend = self._dispatch_track(img, timestamp, odom_pose, None)
        if pend is None:  # INIT resolved synchronously; deliver next call
            self._pending_result = (True, self.current_T_WC, True)
        else:
            self._pending = pend
        return out

    def flush(self):
        """Resolve the pending pipelined frame, if any (grab_rgb_pipelined)."""
        if self._pending_result is not None:
            out, self._pending_result = self._pending_result, None
            return out
        if self._pending is None:
            return None
        pend, self._pending = self._pending, None
        return self._finalize_track(pend)

    def _dispatch_track(self, img, timestamp, odom_pose, next_img):
        """Device-side half of a frame: encode + track dispatches, NO host
        sync. Returns the pending tuple for :meth:`_finalize_track`, or
        None when the frame was an INIT frame (handled synchronously)."""
        frame = self._make_frame(img, jnp.asarray(self.current_T_WC, jnp.float32))

        if self.mode == Mode.INIT:
            if next_img is not None:
                self._encode_cache = (next_img, *self._encode_frame(next_img))
            self.init_tracking(frame, timestamp)
            self.last_odom_pose = odom_pose
            self.frame_count += 1
            return None

        with self._backend_lock:
            prev_kf = self.active_kf
            kf_next, fused, res = track_step(
                self.params, self.model_cfg, self.tcfg, self.match_cfg, self.img_hw,
                self.active_kf, frame, self._idx_f2k, self.K,
            )
            self.active_kf = kf_next
        self._idx_f2k = res.idx_f2k
        self.last_track = res  # host-inspectable per-frame flags (used_fnn etc.)
        if next_img is not None:
            # lookahead: dispatch the NEXT frame's preprocessing + encode now
            # so it overlaps the flags fetch below (the per-frame host sync)
            self._encode_cache = (next_img, *self._encode_frame(next_img))
        return (frame, prev_kf, fused, res, timestamp, odom_pose)

    def _finalize_track(self, pend):
        """Host-side half: ONE flags fetch, then all bookkeeping (keyframe
        write-back/append, loss/reloc/reset, PGO, backend task)."""
        frame, prev_kf, fused, res, timestamp, odom_pose = pend
        flags = np.asarray(res.flags)  # ONE host sync serves every flag below
        ok = bool(flags[1] > 0)
        new_kf = bool(flags[2] > 0)
        used_fnn = bool(flags[19] > 0)
        if ok and not new_kf and self._kf_sync_per_frame:
            with self._backend_lock:
                # reference-exact per-frame write-back of the active KF's
                # fused pointmap (tracker.py:325-328); opt-in, see __init__
                slot = self.store.last_slot()
                kf_now = self.active_kf
                self.store = dataclasses.replace(
                    self.store,
                    X_canon=self.store.X_canon.at[slot].set(kf_now.X_canon),
                    C=self.store.C.at[slot].set(kf_now.C),
                    N=self.store.N.at[slot].set(kf_now.N),
                    N_updates=self.store.N_updates.at[slot].set(kf_now.N_updates),
                )
                self._hp_cache.pop(len(self.kf_timestamps) - 1, None)
        if new_kf:
            with self._backend_lock:
                # sync the outgoing keyframe's fused pointmap into the store
                # (the reference writes it back every frame,
                # tracker.py:325-328; here at keyframe rate, one frame of
                # fusion behind — negligible for a many-frame average)
                slot = self.store.last_slot()
                self.store = dataclasses.replace(
                    self.store,
                    X_canon=self.store.X_canon.at[slot].set(prev_kf.X_canon),
                    C=self.store.C.at[slot].set(prev_kf.C),
                    N=self.store.N.at[slot].set(prev_kf.N),
                    N_updates=self.store.N_updates.at[slot].set(prev_kf.N_updates),
                )
                # the outgoing keyframe's stored pointmap just changed (its
                # final fused state): its cached plane fit is stale
                self._hp_cache.pop(len(self.kf_timestamps) - 1, None)
                self.store = frame_mod.kf_append(self.store, fused)

        if not ok:
            self._idx_f2k = None
            self.loss_track_counter += 1
            log.info("tracking failed at t=%.3f (consecutive losses: %d, "
                     "match_frac=%.4f)", timestamp, self.loss_track_counter,
                     float(flags[0]))
            relocalized = False
            if self.use_reloc and self.retrieval is not None and len(self.kf_timestamps) > 1:
                relocalized = self._relocalize(frame, timestamp)
            if relocalized:
                log.info("relocalized at t=%.3f", timestamp)
                self.loss_track_counter = 0
                ok = True
            elif self.loss_track_counter >= int(self.cfg.tracking.new_map_after_loss_track_N):
                self.reset()
                self.init_tracking(frame, timestamp)
                self.frame_count += 1
                return False, self.current_T_WC, True
        else:
            self.loss_track_counter = 0
            self.current_T_WC = flags[3:11].copy()
            if new_kf:
                self.kf_timestamps.append(timestamp)
                self._capture_kf_image(fused)
                self._idx_f2k = None
                odom_factor = None
                if odom_pose is not None and self.last_odom_pose is not None and len(self.kf_timestamps) > 1:
                    delta = lie.se3_mul(
                        lie.se3_inv(jnp.asarray(self.last_odom_pose[:7], jnp.float32)),
                        jnp.asarray(odom_pose[:7], jnp.float32),
                    )
                    n = len(self.kf_timestamps)
                    odom_factor = (n - 2, n - 1, np.asarray(delta))
                    self.last_odom_pose = odom_pose
                if self.local_opt_mode and odom_pose is not None:
                    self.pgo = pgo_add_frame(
                        self.pgo, jnp.asarray(self.current_T_WC), jnp.asarray(odom_pose[:7])
                    )
                    self.pgo, s, pgo_ok = pgo_optimize(self.pgo)
                    # write the map gauge 1/s_pgo back into the keyframe
                    # poses' Sim(3) scale channel (the reference applies
                    # its PGO result via get_kf_poses() +
                    # keyframes.update_T_WCs, tracker.py:347-353,
                    # pgo.py:195-202): the exported SE3 trajectory stays
                    # at VO gauge, the pose SCALES carry the gauge so the
                    # metric trajectory is t / s — see _apply_pgo_scale
                    # for the convention note. Conditional on-device (no
                    # host sync); a no-op until the PGO has >10 frames.
                    self.store = dataclasses.replace(
                        self.store,
                        T_WC=_apply_pgo_scale(self.store.T_WC,
                                              self.store.n_size, s, pgo_ok),
                    )
                if self.use_backend:
                    # consecutive-edge half reuse: hand the backend the
                    # tracker's direction of this pair's decode+match. Not
                    # valid when the fnn fallback fired (the raw projective
                    # match was too sparse — let the backend cold-match
                    # both). Config-gated: see configs/base.yaml tpu.
                    # consecutive_half_reuse for the measured remote-tunnel
                    # async pathology that keeps this off by default.
                    half = (res.pair_half if self._half_reuse and not used_fnn
                            else None)
                    self._run_backend(len(self.kf_timestamps) - 1, odom_factor,
                                      half)
        if odom_pose is not None and self.last_odom_pose is None:
            self.last_odom_pose = odom_pose

        self.frame_count += 1
        return ok, self.current_T_WC, new_kf

    # -- backend ---------------------------------------------------------------

    def _solve_window(self, store, s_bar=None):
        """Dispatch the global window solve: calibrated pixel/log-depth GN
        when a calibration is in use, ray-alignment GN otherwise
        (vio.py:154-157). Returns (uniq, p, T_new) or None."""
        if self.tcfg.use_calib and self.K is not None:
            return self.backend.solve_window_calib(store, self.K, s_bar)
        return self.backend.solve_window_rays(store, s_bar)

    def _solve_backend(self, s_bar=None):
        """Serialized solve + write-back on the live store."""
        win = self._solve_window(self.store, s_bar)
        if win is None:
            return self.store
        return self.backend._write_back(self.store, *win)

    def _height_prior_s_bar(self, store):
        """Per-keyframe metric-scale targets from the ground-plane fit
        (global_opt.py:212-224).

        Unlike the reference — which refits every window keyframe's plane on
        every backend task (and would pull each full pointmap host-side here)
        — fits are CACHED per keyframe and invalidated when the keyframe's
        stored pointmap changes (the fused write-back at the next keyframe;
        see grab_rgb), and only the fit-region rows (<= max_subsample of
        147k) cross device->host. Backend task cost is therefore independent
        of the window size: at most the one or two dirty keyframes refit per
        task (VERDICT r4 weak #5)."""
        if not self.height_prior_enabled:
            return None
        uniq = self.backend.unique_kf_idx()
        if not uniq:
            return None
        h, w = self.img_hw
        if self._hp_region_idx is None:
            true_hw = (w, h) if self.portrait else (h, w)
            flat_true = self.plane_estimator.region_indices(true_hw)
            if self.portrait:
                # the region is selected in TRUE-image pixels; storage is
                # landscape-transposed (storage[x, y] = true[y, x]), so the
                # true flat index y*true_w + x maps to storage flat x*w + y
                tx = flat_true % h
                ty = flat_true // h
                flat_storage = tx * w + ty
            else:
                flat_storage = flat_true
            self._hp_region_idx = jnp.asarray(flat_storage, jnp.int32)
        s_bar = np.full(max(uniq) + 1, -1.0, np.float32)
        for k in uniq:
            v = self._hp_cache.get(k)
            if v is None:
                slot = int(k) % store.capacity
                pts = np.asarray(store.X_canon[slot][self._hp_region_idx])
                h_bar = self.plane_estimator.run_points(pts)
                # gauge-target convention: see height_prior.scale_targets
                v = float(h_bar / self.camera_height) if (
                    h_bar is not None and h_bar > 1e-6) else -1.0
                self._hp_cache[k] = v
            s_bar[k] = v
        return s_bar

    def _backend_step(self, idx: int, odom_factor, pair_half=None):
        """One backend task (run_backend loop body, vio.py:109-157).

        Threaded mode works on a SNAPSHOT of the keyframe store (jax arrays
        are immutable, so a snapshot is just capturing the pytree reference)
        and merges the solved window poses back under the lock at the end —
        the frontend keeps tracking through the whole retrieval + decode +
        solve, reproducing the reference's genuine frontend/backend
        concurrency (vio.py:75-161) without shared-memory mirrors. In
        single_thread mode the same code runs on the frontend thread, where
        snapshot == live store, reproducing the serialized eval contract."""
        with self._backend_lock:
            store = self.store  # snapshot (immutable pytree)
            epoch = self._map_epoch

        kf_idx: List[int] = [idx - 1 - j for j in range(min(1, idx))]
        if self.retrieval is not None:
            slot = int(idx) % store.capacity
            feat = store.feat[slot][None]
            retrieved = self.retrieval.update(
                feat, add_after_query=True, k=int(self.cfg.retrieval.k),
                min_thresh=float(self.cfg.retrieval.min_thresh), kf_id=idx,
            )
            kf_idx += retrieved
        kf_set = set(kf_idx)
        kf_set.discard(idx)
        if pair_half is not None and idx >= 1 and (idx - 1) in kf_set:
            # the tracker already decoded+matched its direction of this
            # consecutive pair: only the missing direction is computed
            self.backend.add_consecutive_half(store, idx - 1, idx, pair_half)
            kf_set.discard(idx - 1)
        kf_list = sorted(kf_set)
        if kf_list:
            self.backend.add_factors(store, kf_list, [idx] * len(kf_list))
        if odom_factor is not None:
            self.backend.add_odometry_factors(*odom_factor)

        win = self._solve_window(store, self._height_prior_s_bar(store))
        if win is None:
            return
        uniq, p, T_new = win

        with self._backend_lock:
            if epoch != self._map_epoch:
                return  # the map was reset while we solved: drop the result
            pin = self.ba_cfg.pin
            live_total = int(self.store.n_total)
            live_oldest = max(0, live_total - self.store.capacity)
            free = [(n, k) for n, k in enumerate(uniq[:p])
                    if n >= pin and live_oldest <= k < live_total]
            if free:
                rows = jnp.asarray([n for n, _ in free])
                slots = jnp.asarray([k % self.store.capacity for _, k in free])
                self.store = frame_mod.kf_update_T_WCs(self.store, T_new[rows], slots)
            # the backend moved the newest keyframe's pose: refresh the
            # streaming active-KF state so the next track uses it
            # (global_opt.py:285-286 analogue). In threaded mode the newest
            # live keyframe may postdate the snapshot; only merge when it was
            # actually part of the solved window.
            n_latest = len(self.kf_timestamps) - 1
            if n_latest in uniq[:p]:
                w = uniq.index(n_latest)
                self.active_kf = dataclasses.replace(self.active_kf, T_WC=T_new[w])
                if self.single_thread or n_latest == idx:
                    self.current_T_WC = np.asarray(T_new[w])

    def _run_backend(self, idx: int, odom_factor, pair_half=None):
        if self.single_thread:
            self._backend_step(idx, odom_factor, pair_half)
            return
        # never block the frontend: enqueue and return (vio.py:333-343).
        # No drops: a dropped task would punch a hole in the map (its
        # consecutive edge, odometry factor, and retrieval-db entry are all
        # load-bearing for later loop closures). Backlog is transient — one
        # solve (~45 ms) per keyframe (~0.5 s cadence) — so warn, don't cull.
        if self._backend_tasks.qsize() >= self._backend_queue_max:
            log.warning("backend backlog: %d tasks pending (solves slower "
                        "than the keyframe cadence)",
                        self._backend_tasks.qsize())
        if self._backend_worker is None or not self._backend_worker.is_alive():
            self._backend_worker = threading.Thread(
                target=self._backend_worker_loop, daemon=True,
                name="frodo-backend",
            )
            self._backend_worker.start()
        self._backend_tasks.put((idx, odom_factor, pair_half))

    # -- relocalization ---------------------------------------------------------

    def _relocalize(self, frame: frame_mod.Frame, timestamp: float) -> bool:
        """Retrieval-seeded relocalization (vio.py:29-72)."""
        # Runs on the frontend thread and mutates backend/retrieval state:
        # PREEMPT the pending backlog — hold the worker's per-task lock, so
        # only the in-flight task is waited out, never the whole queue (the
        # reference backend services RELOC before popping optimizer tasks,
        # vio.py:102-107; under backlog, draining first would stall the
        # frontend for many solves exactly when tracking is already lost).
        # Pending tasks stay valid: reloc appends a keyframe, resets nothing,
        # and retrieval ids are explicit (database.kf_ids), so the
        # out-of-order insertion cannot skew later retrievals.
        with self._backend_exec_lock, self._backend_lock:
            retrieved = self.retrieval.update(
                frame.feat, add_after_query=False, k=int(self.cfg.retrieval.k),
                min_thresh=float(self.cfg.retrieval.min_thresh),
            )
            if not retrieved:
                return False
            self.store = frame_mod.kf_append(self.store, frame)
            self.kf_timestamps.append(timestamp)
            n_kf = len(self.kf_timestamps)
            ok = self.backend.add_factors(
                self.store, [n_kf - 1] * len(retrieved), list(retrieved),
                min_match_frac=float(self.cfg.reloc.min_match_frac),
                is_reloc=bool(self.cfg.reloc.strict),
            )
            if not ok:
                # pop the tentatively-added keyframe (vio.py:63-65)
                self.store = dataclasses.replace(
                    self.store, n_total=self.store.n_total - 1,
                    n_size=self.store.n_size - 1,
                )
                self.kf_timestamps.pop()
                return False
            self._capture_kf_image(frame)
            self.retrieval.update(frame.feat, add_after_query=True,
                                  k=int(self.cfg.retrieval.k),
                                  min_thresh=float(self.cfg.retrieval.min_thresh),
                                  kf_id=n_kf - 1)
            # seed pose from the first retrieved keyframe (vio.py:66)
            seed_slot = int(retrieved[0]) % self.store.capacity
            self.store = frame_mod.kf_update_T_WCs(
                self.store, self.store.T_WC[seed_slot][None],
                jnp.asarray([(n_kf - 1) % self.store.capacity]),
            )
            self.store = self._solve_backend()
            self.current_T_WC = np.asarray(self.store.T_WC[self.store.last_slot()])
            self.active_kf = dataclasses.replace(
                frame, T_WC=self.store.T_WC[self.store.last_slot()]
            )
        return True

    # -- export -----------------------------------------------------------------

    def keyframe_poses(self) -> Tuple[List[float], np.ndarray]:
        """(timestamps, (N, 8) Sim3 poses) of live keyframes, oldest first."""
        n = int(self.store.n_size)
        total = int(self.store.n_total)
        logical = list(range(max(0, total - n), total))
        slots = [k % self.store.capacity for k in logical]
        poses = np.asarray(self.store.T_WC[jnp.asarray(slots)])
        stamps = self.kf_timestamps[-n:]
        return stamps, poses

    def metric_keyframe_poses(self) -> Tuple[List[float], np.ndarray]:
        """(timestamps, (N, 8) poses) with translations converted to metric
        units: t / s, where the Sim(3) scale channel s is the map gauge
        (world units per metric — see ``_apply_pgo_scale``). The gauge is
        estimated by the scale-only PGO and the BA's odometry factors; with
        neither active s stays 1 and this equals ``keyframe_poses``."""
        stamps, poses = self.keyframe_poses()
        out = poses.copy()
        s = np.maximum(poses[:, 7:8], 1e-8)
        out[:, :3] = poses[:, :3] / s
        return stamps, out

    def get_pose(self) -> np.ndarray:
        return self.current_T_WC


VIO = SLAM  # reference-compatible alias (vio.py:163)
