"""Benchmark: END-TO-END per-frame throughput of the flagship pipeline.

Measures what one streamed frame really costs in the reference system
(vio.py:287-346 + the backend loop vio.py:109-157):

- every frame: ViT-L encode + asymmetric two-view decode + both heads +
  dense matching + Sim(3) Gauss-Newton + keyframe update (the tracker hot
  path, reference tracker.py:161-368), as chained jitted programs;
- every ``KF_EVERY`` frames (a realistic keyframe cadence): keyframe
  insertion + backend work — batched symmetric pair decode + dense match +
  bidirectional gating (with its real host sync) + edge-row insertion +
  the global ray-alignment GN solve over a steady-state-sized pose window
  (reference global_opt.py:69-141, 226-286).

The backend window is prefilled with a synthetic consistent world at
steady-state size (64 poses, 63 consecutive two-way pairs) and its poses
are re-perturbed before every solve so each solve performs real iterations
— a 30-frame bench would otherwise measure an empty early-sequence backend.

Baseline of record: the reference runs ~15 FPS END-TO-END on an RTX 4090
(MASt3R-SLAM paper, linked at reference README.md:15; BASELINE.md) — the
repo itself commits no numbers. ``vs_baseline`` = our FPS / 15.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Honesty notes: x64 stays OFF (the tracking path is f32/bf16 end to end;
int64 index creep measurably slows the matcher gathers on TPU), so the BA
solve runs its f32+damping variant rather than the f64 eval-mode solve
(measured 11.3x slower — PERF.md round 4). Random weights with
decoder2:=decoder1 sharing make identical frames decode consistently
(real trained weights' regime); frames are smooth textured synthetics.
Two DECORRELATED frames run a second program variant with the real accept
gate + fnn fallback, so the reject branch is exercised and timed in-loop
(the synthetic regime's fractions cannot drive the gate organically —
PERF.md round-4 postmortem). Timing, two passes:

1. PIPELINED production pattern (the ``grab_rgb_pipelined`` loop,
   system.py): one flags fetch per frame, deferred one frame so it
   overlaps the next frame's chain; the keyframe decision comes from the
   REAL unique-match policy (flags[2]) with ``KF_EVERY`` as a cadence cap,
   and the realized cadence is recorded (``kf_frames``). Yields
   ``synced_fps`` + per-frame p50/p99.
2. Async headline: one chained dispatch stream, flags fetched once at the
   end, keyframing at exactly the frames pass 1's policy chose — the
   round-1..4 headline methodology, comparable across rounds.

The keyframe-rate backend runs on a worker thread by DEFAULT (the
production robot mode, single_thread=False — and the architecture
equivalent of the reference's separate backend process);
``FRODO_BENCH_THREADED=0`` forces the inline eval contract.
``mfu_pct`` reports achieved model FLOP/s (XLA cost analysis of the two
model programs x headline FPS) against the v5e bf16 peak.
"""

import json
import os
import queue
import sys
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from frodo_slam_tpu.config import make_config  # noqa: E402
from frodo_slam_tpu.models import mast3r  # noqa: E402
from frodo_slam_tpu.ops import lie  # noqa: E402
from frodo_slam_tpu.slam import frame as frame_mod  # noqa: E402
from frodo_slam_tpu.slam.backend import (  # noqa: E402
    _ingest_pairs, _invert_match, _write_pair_rows,
)
from frodo_slam_tpu.slam.global_opt import (  # noqa: E402
    BAConfig, Edges, _edges_pre, empty_odom_edges, solve_gn_rays,
)
from frodo_slam_tpu.ops import matching as matching_ops  # noqa: E402
from frodo_slam_tpu.slam.inference import (  # noqa: E402
    decode_asymmetric, decode_mono, match_symmetric,
)
from frodo_slam_tpu.slam.tracker import TrackingCfg, track_step  # noqa: E402

BASELINE_FPS = 15.0  # reference end-to-end on RTX 4090 (external, BASELINE.md)
KF_EVERY = 8  # keyframe cadence (reference: unique-match-driven, ~5-10 frames)
WINDOW = 64  # steady-state backend pose window (bucketed, global_opt window)


def _synthetic_frames(rng, h, w, n_frames):
    """Smooth textured frames (sum of low-frequency waves + mild noise):
    real camera frames are spatially smooth, which keeps the matcher's
    warm-started gathers local; white noise is a pathological worst case."""
    yy, xx = np.mgrid[0 : h + 8, 0 : w + 8].astype(np.float32)
    base = np.zeros((h + 8, w + 8, 3), np.float32)
    for _ in range(8):
        fy, fx = rng.uniform(0.2, 3.0, 2)
        ph = rng.uniform(0, 2 * np.pi, 3).astype(np.float32)
        base += np.sin(
            fy * yy[..., None] / h * 2 * np.pi + fx * xx[..., None] / w * 2 * np.pi + ph
        ) * rng.uniform(0.1, 0.4)
    base += rng.normal(size=base.shape).astype(np.float32) * 0.05
    base = np.clip(base, -1, 1).astype(np.float32)
    return [jnp.asarray(base[i % 8 : i % 8 + h, i % 8 : i % 8 + w][None]) for i in range(n_frames)]


def _steady_state_window(hw, n_poses):
    """Consistent synthetic world at steady-state window size: one shared
    cloud seen by every pose, consecutive two-way edges with identity
    correspondences (tests/test_global_opt.py:24-53 construction)."""
    key = jax.random.PRNGKey(7)
    kp, kx = jax.random.split(key)
    pts_w = jax.random.uniform(kp, (hw, 3), minval=-2.0, maxval=2.0) + jnp.array([0, 0, 6.0])
    xis = jax.random.normal(kx, (n_poses, 7)) * jnp.array(
        [0.3, 0.3, 0.3, 0.15, 0.15, 0.15, 0.05]
    )
    T_true = jax.vmap(lie.sim3_exp)(xis).astype(jnp.float32)
    X = jax.vmap(lambda T: lie.sim3_act(lie.sim3_inv(T), pts_w))(T_true).astype(jnp.float32)
    C = jnp.full((n_poses, hw, 1), 5.0, jnp.float32)

    ii, jj = [], []
    for k in range(n_poses - 1):
        ii += [k, k + 1]
        jj += [k + 1, k]
    e = 2 * n_poses  # pad rows to an even bucket; last 2 rows are the live pair slot
    pad = e - len(ii)
    edges = Edges(
        ii=jnp.asarray(ii + [0] * pad, jnp.int32),
        jj=jnp.asarray(jj + [0] * pad, jnp.int32),
        idx=jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32), (e, hw)),
        valid=jnp.concatenate(
            [jnp.ones((len(ii), hw), bool), jnp.zeros((pad, hw), bool)]
        ),
        Q=jnp.full((e, hw), 4.0, jnp.float32),
        active=jnp.asarray([True] * len(ii) + [False] * pad),
    )
    # pre-fill the pose-independent edge cache, exactly as the production
    # backend does at insertion (backend._pair_cache): solves must not pay
    # the per-edge matched-point gather (460 ms at this window size)
    XiT, w0 = jax.jit(_edges_pre, static_argnames="cfg")(BAConfig(), X, C, edges)
    edges = edges._replace(XiT=XiT, w0=w0)
    return T_true, X, C, edges


def main():
    tiny = bool(os.environ.get("FRODO_BENCH_TINY"))
    # Fail FAST when the backend cannot initialize: the remote-TPU tunnel
    # hangs indefinitely at backend init when wedged (BENCH_r02 post-mortem
    # — rc=1 only after importing the full pipeline; a wedged tunnel must
    # yield a bounded, parseable artifact). The probe runs in a killable
    # subprocess; on failure print ONE diagnosable JSON line and exit 1.
    from frodo_slam_tpu.utils.backend_probe import ensure_backend_reachable

    try:
        ensure_backend_reachable()
    except RuntimeError as e:
        print(json.dumps({
            "metric": "e2e_fps_tiny" if tiny else "e2e_fps_vitL_288x512",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": f"backend unavailable: {e}",
        }))
        sys.exit(1)
    if tiny:
        mcfg, (h, w), n_frames, window = mast3r.tiny_config(), (32, 64), 8, 8
    else:
        # 128 frames: the timed loop carries two genuine tunnel syncs (the
        # warmed sync_ms probe's value varies 30 ms - 1 s between windows,
        # PERF.md round 3); more frames dilute that fixed cost so A/B deltas
        # of ~1 ms/frame stay resolvable even in degraded fetch windows
        mcfg, (h, w), n_frames, window = mast3r.MASt3RConfig(), (288, 512), 128, WINDOW
    if os.environ.get("FRODO_BENCH_FRAMES"):
        n_frames = max(4, int(os.environ["FRODO_BENCH_FRAMES"]))

    # A/B overrides (VERDICT r2 #2): every pending perf lever is selectable
    # from the environment so one long-lived TPU process can sweep the matrix
    # (the tunnel wedges when processes die mid-use — keep runs few and long)
    import dataclasses as _dc

    if os.environ.get("FRODO_BENCH_ATTN"):
        mcfg = _dc.replace(mcfg, attention_impl=os.environ["FRODO_BENCH_ATTN"])
    if os.environ.get("FRODO_BENCH_HEAD_DTYPE"):
        mcfg = _dc.replace(
            mcfg, head_dtype=jnp.dtype(os.environ["FRODO_BENCH_HEAD_DTYPE"]))

    cfg = make_config()
    match_cfg_d = dict(cfg.matching)
    if os.environ.get("FRODO_BENCH_REFINE"):
        match_cfg_d["refine_impl"] = os.environ["FRODO_BENCH_REFINE"]
    if os.environ.get("FRODO_BENCH_DILATION"):
        match_cfg_d["dilation_max"] = int(os.environ["FRODO_BENCH_DILATION"])
    if os.environ.get("FRODO_BENCH_DILATION_WARM") is not None:
        match_cfg_d["dilation_max_warm"] = int(
            os.environ["FRODO_BENCH_DILATION_WARM"])
    if os.environ.get("FRODO_BENCH_MAXITER_WARM") is not None:
        match_cfg_d["max_iter_warm"] = int(
            os.environ["FRODO_BENCH_MAXITER_WARM"])
    if os.environ.get("FRODO_BENCH_NO_SEED"):
        # half reuse WITHOUT the inverse-match seed (cold match for the
        # missing direction): isolates _invert_match + the warm schedule
        # from the rest of the half path
        match_cfg_d["seed_consecutive"] = False
    # consecutive-edge half reuse: default follows the config knob
    # (tpu.consecutive_half_reuse, ON — 20.2 vs 17.2 FPS in the round-3
    # sweep, base.yaml); FRODO_BENCH_HALF=1 / NO_HALF=1 force
    if os.environ.get("FRODO_BENCH_HALF"):
        use_half = True
    elif os.environ.get("FRODO_BENCH_NO_HALF"):
        use_half = False
    else:
        use_half = bool(cfg.tpu.get("consecutive_half_reuse", False))
    match_cfg = tuple(sorted(match_cfg_d.items()))
    # Random weights admit NO cross-image geometric consistency: the
    # matcher's dist/convergence gates zero match_frac on every non-self
    # pair (measured: flags[0] == 0.000000 on all synthetic frames even
    # with the descriptor gate disabled — scratch/bench_frac_probe.py), so
    # the real accept gate cannot discriminate here and flipping it on
    # cascades the whole bench into a fake all-cold+fnn regime (14.8 FPS,
    # sweep3). The honest split (VERDICT r3 weak #3): normal frames run
    # gate-off (the tracked steady state real weights produce), and the two
    # DECORRELATED frames below run a second program variant with the REAL
    # gate + fnn fallback — so the reject branch (fnn match, gate miss,
    # cold restart) is genuinely exercised and timed inside the loop.
    base_tcfg = dict(
        max_iters=int(cfg.tracking.max_iters),
        Q_conf=0.0,  # random-weight desc confidences are uncalibrated
        match_frac_thresh=float(cfg.tracking.match_frac_thresh),
    )
    tcfg = TrackingCfg(min_match_frac=0.0, **base_tcfg)
    tcfg_gate = TrackingCfg(
        min_match_frac=float(cfg.tracking.min_match_frac),
        use_fnn=bool(cfg.tracking.use_fnn),
        min_match_frac_fnn=float(cfg.tracking.min_match_frac_fnn),
        **base_tcfg,
    )
    ba_cfg = BAConfig(
        max_iters=int(cfg.local_opt.max_iters),
        pin=1,
        delta_norm=float(cfg.local_opt.delta_norm),
    )

    params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
    # share decoder2/head2 := decoder/head1: with independent random weights
    # the two decoded views are geometrically inconsistent, so the LM matcher
    # wanders and its gathers scatter — a regime real (trained) weights never
    # produce. Sharing makes identical frames decode identically, which is
    # what a converged matcher sees on real sequences.
    params["head2"] = params["head1"]
    params["dec_blocks2"] = params["dec_blocks"]
    params = mast3r.cast_transformer_params(params, mcfg.dtype)
    hw = h * w

    rng = np.random.default_rng(0)
    frames = _synthetic_frames(rng, h, w, n_frames)
    # two DECORRELATED frames (independent wave field) so the accept gate
    # genuinely misses and the fnn descriptor fallback fires inside the
    # timed loop (VERDICT r3 weak #3) — placed off the keyframe cadence
    bad = _synthetic_frames(np.random.default_rng(12345), h, w, 2)
    bad_idx = ()
    if n_frames >= 16 and not os.environ.get("FRODO_BENCH_NO_BAD_FRAMES"):
        # decorrelated frames must sit OFF the keyframe cadence: at i % KF
        # == 0 the keyframe branch takes precedence and a gate-rejected
        # frame would drive backend_step as if it were a keyframe (ADVICE
        # r4) — bump until clear of the cadence
        def off_cadence(i):
            while i % KF_EVERY == 0:
                i += 1
            return i

        bad_idx = (off_cadence(n_frames // 3 + 1),
                   off_cadence(2 * n_frames // 3 + 1))
        assert all(i % KF_EVERY for i in bad_idx) and bad_idx[0] != bad_idx[1]
        for k, b in zip(bad_idx, bad):
            frames[k] = b

    import dataclasses

    @jax.jit
    def encode(params, img):
        return mast3r.encode_image(params, mcfg, img)

    def full_step(params, kf, img, idx_init, gated=False):
        """encode + track as chained async dispatches per frame (encode |
        decode+heads | matcher | bookkeeping). Program boundaries reset XLA
        layout/fusion choices; a monolithic single jit ran the matcher ~2.5x
        slower (87 vs 65 ms/frame on v5e)."""
        feat, pos = encode(params, img)
        fr = frame_mod.make_empty_frame(0, img, feat, pos)
        return track_step(params, mcfg, tcfg_gate if gated else tcfg,
                          match_cfg, (h, w), kf, fr, idx_init)

    # ---- backend (keyframe-rate) programs ----------------------------------
    T_true, X_win, C_win, edges0 = _steady_state_window(hw, window)
    odom0 = empty_odom_edges(1)
    s_bar = jnp.full((window,), -1.0, jnp.float32)
    live_rows = jnp.int32(2 * (window - 1))  # the pair slot the live KF writes
    # per-KF constants hoisted out of backend_step: each jnp scalar/ones
    # creation is an eager RPC through the remote tunnel
    n_one = jnp.ones((1,), jnp.int32)
    zero_f32 = jnp.float32(0.0)
    kf_i_id = jnp.int32(window - 2)
    kf_j_id = jnp.int32(window - 1)

    @jax.jit
    def perturb(key):
        noise = (
            jax.random.normal(key, (window, 7))
            * jnp.array([0.05] * 3 + [0.02] * 3 + [0.01])
        ).at[0].set(0.0).astype(jnp.float32)
        return jax.vmap(lie.sim3_retr)(T_true, noise)

    @jax.jit
    def ba_solve(T_init, edges):
        return solve_gn_rays(ba_cfg, 1, T_init, X_win, C_win, edges, odom0, s_bar)

    # A/B (FRODO_BENCH_HALF_COPY=1): decouple the half-reuse path from the
    # tracker stream by copying pair_half into FRESH buffers at keyframe
    # rate. Hypothesis for the measured 8.7-vs-17.1 async stall (PERF.md
    # round 3): the backend chain consuming tracker-stream outputs holds
    # those buffers in-use for its whole ~200 ms, blocking the per-frame
    # stream's buffer reuse/donation; a ~1 ms copy releases the dependency
    # as soon as the producer finishes.
    copy_half = bool(os.environ.get("FRODO_BENCH_HALF_COPY"))
    copy_prog = jax.jit(lambda t: jax.tree.map(jnp.copy, t))

    def backend_step(edges, feat_i, pos_i, feat_j, pos_j, key, pair_half=None):
        """One keyframe's backend work (vio.py:109-157). Production
        consecutive-edge path (system._backend_step): the tracker's half of
        the pair decode+match is REUSED (TrackResult.pair_half), so the
        backend decodes and cold-matches only the missing (i, j) direction.
        The full symmetric path (no half) is what reloc/loop-closure pairs
        pay; the bench takes the consecutive path, like the real per-KF
        stream."""
        cold_cfg, _ = matching_ops.split_match_cfg(match_cfg_d)
        seed_cfg = matching_ops.seed_match_cfg(match_cfg_d)
        if pair_half is not None and copy_half:
            pair_half = copy_prog(pair_half)
        if pair_half is not None:
            idx_j2i, vm_i, Qjj, Qij = pair_half
            res11, res21 = decode_asymmetric(
                params, mcfg, feat_i, pos_i, feat_j, pos_j, (h, w))
            if match_cfg_d.get("seed_consecutive", True):
                (idx_seed, seeded), mcfg_dir = (
                    _invert_match(idx_j2i.astype(jnp.int32), vm_i), seed_cfg)
            else:
                (idx_seed, seeded), mcfg_dir = (None, None), cold_cfg
            idx_i2j, vm_j = matching_ops.match_split(
                res11["pts3d"], res21["pts3d"], res11["desc"], res21["desc"],
                idx_seed, **mcfg_dir)
            if seeded is not None:  # drop identity-hole seeds (backend.py)
                vm_j = vm_j & seeded[..., None]
            Qii = res11["desc_conf"].reshape(1, h * w, 1)
            Qji = res21["desc_conf"].reshape(1, h * w, 1)
        else:
            (idx_i2j, idx_j2i, vm_j, vm_i, Qii, Qjj, Qji, Qij) = (
                match_symmetric(params, mcfg, match_cfg_d, feat_i, pos_i, feat_j, pos_j, (h, w))
            )
        (Qj, Qi, valid_j, valid_i, fracs, XiT_r0, w0_r0, XiT_r1, w0_r1) = (
            _ingest_pairs(
                zero_f32, zero_f32, zero_f32,
                X_win[window - 2 : window - 1], C_win[window - 2 : window - 1],
                n_one,
                X_win[window - 1 : window], C_win[window - 1 : window], n_one,
                idx_i2j.astype(jnp.int32), idx_j2i.astype(jnp.int32),
                vm_j, vm_i, Qii, Qjj, Qji, Qij,
            )
        )
        # consecutive-pair insertion never reads the gate fractions, so
        # add_factors skips this host sync (backend.py need_fracs); keep the
        # device-side fracs value flowing but do not fetch it
        edges = _write_pair_rows(
            edges, live_rows, kf_i_id, kf_j_id,
            idx_i2j[0], idx_j2i[0], valid_j[0, :, 0], valid_i[0, :, 0],
            Qj[0, :, 0], Qi[0, :, 0],
            cache=(XiT_r0[0], w0_r0[0], XiT_r1[0], w0_r1[0]),
        )
        T_new = ba_solve(perturb(key), edges)
        return edges, T_new, fracs

    # ---- init + warmup ------------------------------------------------------
    feat, pos = encode(params, frames[0])
    f0 = frame_mod.make_empty_frame(0, frames[0], feat, pos)
    X0, C0 = decode_mono(params, mcfg, feat, pos, (h, w))
    Xn, Cn, Nn, Un = frame_mod.update_pointmap(f0.X_canon, f0.C, f0.N, f0.N_updates, X0, C0)
    kf = dataclasses.replace(f0, X_canon=Xn, C=Cn, N=Nn, N_updates=Un)

    # warm BOTH tracking program variants (idx_init=None vs array) and the
    # full backend step; without these the timed loop measures compiles
    # flag fetches go through np.asarray(res.flags) — the ARRAY fetch path.
    # float(res.match_frac) = flags[0] is an eager indexing dispatch + a
    # SCALAR fetch, and the tunnel's scalar/tiny-RPC path degrades
    # independently of the array path (2026-08-19: float() 125-612 s while
    # any np.asarray fetch, even (1,), stayed ~30 ms —
    # scratch/fetch_size_probe.py). The production loop already does this
    # (system.grab_rgb: one flags fetch per frame).
    kf_w, fused, res = full_step(params, kf, frames[1], None)
    _ = np.asarray(res.flags)
    kf_w, fused, res = full_step(params, kf_w, frames[1], res.idx_f2k)
    _ = np.asarray(res.flags)
    if bad_idx:
        # warm the REAL-gate + fnn program variant the decorrelated frames
        # take (both idx_init shapes)
        _, _, res_g = full_step(params, kf_w, frames[1], res.idx_f2k, gated=True)
        _ = np.asarray(res_g.flags)
        _, _, res_g = full_step(params, kf_w, frames[1], None, gated=True)
        _ = np.asarray(res_g.flags)
    # warm up on a COPY: _write_pair_rows donates its edge buffers, and the
    # timed loop below must start from intact edges0. Warm BOTH backend
    # variants (full symmetric for loop closures, half-reuse for the
    # consecutive stream)
    edges, T_new, _ = backend_step(
        jax.tree.map(jnp.copy, edges0),
        kf_w.feat, kf_w.pos, fused.feat, fused.pos, jax.random.PRNGKey(1)
    )
    T_new.block_until_ready()
    edges, T_new, _ = backend_step(
        jax.tree.map(jnp.copy, edges0),
        kf_w.feat, kf_w.pos, fused.feat, fused.pos, jax.random.PRNGKey(1),
        pair_half=res.pair_half,
    )
    T_new.block_until_ready()
    kf = kf_w

    # tunnel-health context: one warmed small device->host sync, timed. The
    # remote tunnel's fetch path varies by orders of magnitude between
    # sessions (2026-08-18: 5-70 s per scalar fetch vs 36 ms in round 2);
    # recording it beside the FPS makes a pathological-window number
    # diagnosable instead of mysterious (scripts/tunnel_probe.py).
    t_sync = time.perf_counter()
    _ = np.asarray(res.flags)
    sync_ms = (time.perf_counter() - t_sync) * 1e3

    # FRODO_BENCH_TRACK_ONLY=1: skip the keyframe-rate backend work in the
    # timed loops — the per-frame tracker path alone. This is the projected
    # e2e FPS of the multi-chip overlap placement (tpu.placement: overlap,
    # parallel/mesh.py), where the backend's decode+match+BA run on their
    # own device subset and the per-frame stream never absorbs them (minus
    # the small cross-device keyframe-feature transfer).
    track_only = bool(os.environ.get("FRODO_BENCH_TRACK_ONLY"))
    # Keyframe-rate backend on a worker thread (DEFAULT): the production
    # robot mode (single_thread=False) and the architecture-equivalent of
    # the reference's separate backend process — its 15 FPS baseline never
    # pays backend dispatch on the frontend thread either. Measured on one
    # chip: 28.6 threaded vs 24.2 inline, better p99 (108 vs 184 ms) —
    # the overlap is worth +4.4 FPS even sharing the chip (PERF.md r5).
    # FRODO_BENCH_THREADED=0 forces the inline eval contract
    # (single_thread=True) for A/Bs.
    threaded = os.environ.get("FRODO_BENCH_THREADED", "1") not in ("0", "")
    # FRODO_BENCH_KF_CAP_ONLY=1: fixed KF_EVERY cadence (the round-1..4
    # methodology) instead of the real unique-match policy — for
    # cross-config A/Bs where the policy's cadence response would confound
    # the lever under test (e.g. bf16 heads shift the synthetic regime's
    # unique fractions across the threshold: kf_frames 15 -> 34, PERF.md
    # round-5 cadence note)
    kf_cap_only = bool(os.environ.get("FRODO_BENCH_KF_CAP_ONLY"))

    class BenchBackend:
        """Keyframe-rate backend driver: inline (the eval single_thread
        contract) or on a worker thread (the production robot mode)."""

        def __init__(self, edges, threaded):
            self.edges = edges
            self.T_new = None
            self.threaded = threaded
            if threaded:
                self.q = queue.Queue()
                self.t = threading.Thread(target=self._loop, daemon=True)
                self.t.start()

        def _loop(self):
            while True:
                task = self.q.get()
                try:
                    if task is None:
                        return
                    self._run(*task)
                finally:
                    self.q.task_done()

        def _run(self, *task):
            self.edges, self.T_new, _ = backend_step(self.edges, *task)

        def submit(self, *task):
            if self.threaded:
                self.q.put(task)
            else:
                self._run(*task)

        def drain(self):
            if self.threaded:
                self.q.join()
                self.q.put(None)
                self.t.join()
            if self.T_new is not None:
                self.T_new.block_until_ready()

    # ---- pass 1: pipelined production pattern ------------------------------
    # The grab_rgb_pipelined loop (system.py): per frame, resolve the
    # PREVIOUS frame's flags (the one host sync — by now its chain has been
    # executing for a whole frame period), make the REAL keyframe decision
    # from them (the unique-match policy flags[2], tracker.py:445-453, with
    # KF_EVERY as a cadence CAP — VERDICT r4 weak #4), run the keyframe's
    # backend work, then dispatch this frame's chain. Per-frame wall
    # latencies give p50/p99 and synced_fps; the realized keyframe cadence
    # (kf_frames) is replayed by the async pass so both passes time the
    # same work.
    # snapshot BEFORE use: _write_pair_rows DONATES edge buffers
    edges_async = jax.tree.map(jnp.copy, edges0)
    bk = BenchBackend(edges0, threaded)
    idx_init = res.idx_f2k
    pending = None  # (frame index, TrackResult, fused frame)
    prev_kf = kf
    kf_frames, lat, n_fnn, n_miss = [], [], 0, 0
    last_kf = 1

    def resolve(pending, idx_init, prev_kf, kf):
        """Host bookkeeping for the previously-dispatched frame."""
        nonlocal n_fnn, n_miss, last_kf
        j, res_j, fused_j = pending
        flags = np.asarray(res_j.flags)  # the ONE per-frame host sync
        if flags[19] > 0:
            n_fnn += 1
        if j in bad_idx:
            if flags[1] <= 0:
                # count rejects of the gated (decorrelated) frames only:
                # ungated frames' `ok` is structurally false in the
                # synthetic regime (zero valid matches -> empty GN)
                n_miss += 1
            idx_init = None  # production cold-restarts after a reject
        elif ((not kf_cap_only) and flags[2] > 0) or (j - last_kf >= KF_EVERY):
            # new keyframe: by the real unique-match policy (in which case
            # the device-side kf state already switched to the fused frame,
            # tracker.py:455-459) or the cadence cap
            kf_frames.append(j)
            if not track_only:
                bk.submit(prev_kf.feat, prev_kf.pos, fused_j.feat,
                          fused_j.pos, jax.random.PRNGKey(j),
                          (res_j.pair_half if use_half else None))
            prev_kf = kf
            last_kf = j
            idx_init = None
        return idx_init, prev_kf

    for i in range(2, n_frames):
        t_f = time.perf_counter()
        if pending is not None:
            idx_init, prev_kf = resolve(pending, idx_init, prev_kf, kf)
        kf, fused, res = full_step(params, kf, frames[i], idx_init,
                                   gated=(i in bad_idx))
        idx_init = res.idx_f2k
        pending = (i, res, fused)
        lat.append(time.perf_counter() - t_f)
    resolve(pending, idx_init, prev_kf, kf)
    bk.drain()
    # pass 1 is the first timed execution in the process: the remote
    # tunnel's executable-warmup artifact makes the first ~handful of
    # chained calls 30-450x slow (PERF.md round-4 isolated-measurement
    # hazard). Trim the first frames from the LATENCY statistics (the
    # loop still ran them); the throughput number uses the same trim.
    warm_cut = min(12, max(0, len(lat) - 16))
    lat_t = lat[warm_cut:]
    fps_pipe = len(lat_t) / sum(lat_t)
    lat_ms = np.sort(np.asarray(lat_t)) * 1e3
    p50 = float(lat_ms[len(lat_ms) // 2])
    p99 = float(lat_ms[min(len(lat_ms) - 1, int(len(lat_ms) * 0.99))])

    # ---- pass 2: async headline (replaying pass 1's keyframe cadence) ------
    # One chained dispatch stream, flags fetched once at the end (the
    # round-1..4 headline methodology, comparable across rounds). Keyframes
    # happen at exactly the frames the REAL policy chose in pass 1.
    kf_set = set(kf_frames)
    bk2 = BenchBackend(edges_async, threaded)
    idx_init = None
    last = None
    prev_kf = kf
    t0 = time.perf_counter()
    for i in range(2, n_frames):
        kf, fused, res = full_step(params, kf, frames[i], idx_init,
                                   gated=(i in bad_idx))
        idx_init = res.idx_f2k
        last = res
        if i in kf_set:
            if not track_only:
                bk2.submit(prev_kf.feat, prev_kf.pos, fused.feat, fused.pos,
                           jax.random.PRNGKey(i),
                           (res.pair_half if use_half else None))
            prev_kf = kf
            idx_init = None
        elif i in bad_idx:
            # the decorrelated frame was rejected by the gate (kf kept on
            # device); production cold-restarts matching on the next frame
            idx_init = None
    _ = np.asarray(last.flags)
    bk2.drain()
    dt = time.perf_counter() - t0
    fps = (n_frames - 2) / dt

    # ---- model-FLOP utilization (VERDICT r4 next #8) -----------------------
    # XLA's own cost analysis of the two model programs (encode + paired
    # decode/heads) -> model TFLOP/frame; MFU = achieved model FLOP/s over
    # the v5e bf16 peak. Tracked per round in PERF.md like ATE.
    V5E_BF16_PEAK = 197e12
    model_tflop = None
    mfu_pct = None
    try:
        fl_e = encode.lower(params, frames[0]).compile().cost_analysis()
        from frodo_slam_tpu.slam.inference import _model_stage

        fl_m = _model_stage.lower(
            params, mcfg, kf.feat, kf.pos, fused.feat, fused.pos, (h, w)
        ).compile().cost_analysis()
        flops = float(fl_e.get("flops", 0.0)) + float(fl_m.get("flops", 0.0))
        if flops > 0:
            model_tflop = flops / 1e12
            mfu_pct = 100.0 * flops * fps / V5E_BF16_PEAK
    except Exception:  # noqa: BLE001 - cost analysis is best-effort
        pass

    out = {
        "metric": (
            ("track_only_fps_vitL_288x512" if track_only else "e2e_fps_vitL_288x512")
            if not tiny else "e2e_fps_tiny"
        ),
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "frames": n_frames - 2,
        "sync_ms": round(sync_ms, 1),
        "p50_ms": round(p50, 2),
        "p99_ms": round(p99, 2),
        # pass-1 throughput: the per-frame-synced production pattern
        "synced_fps": round(fps_pipe, 3),
        "fnn_frames": n_fnn,
        "gate_miss_frames": n_miss,
        "kf_frames": len(kf_frames),
        "threaded": threaded,
    }
    if model_tflop is not None:
        out["model_tflop_frame"] = round(model_tflop, 4)
        out["mfu_pct"] = round(mfu_pct, 2)
    print(json.dumps(out))

    if os.environ.get("FRODO_BENCH_DEBUG_CACHE"):
        # a jit trace-cache that scales with the keyframe count means a
        # per-call RETRACE (Python tracing of the ViT-L decoder costs
        # seconds; it then HITS the compile cache, so JAX_LOG_COMPILES
        # stays silent — the round-3 half-reuse regression's signature)
        from frodo_slam_tpu.slam import inference as inf_mod
        from frodo_slam_tpu.slam import backend as backend_mod
        for name, fn in (
            ("_model_stage", inf_mod._model_stage),
            ("decode_symmetric_batch", inf_mod.decode_symmetric_batch),
            ("match", matching_ops.match),
            ("_invert_match", _invert_match),
            ("_ingest_pairs", _ingest_pairs),
            ("_write_pair_rows", _write_pair_rows),
            ("track_step_post", __import__("frodo_slam_tpu.slam.tracker",
                                           fromlist=["track_step_post"]).track_step_post),
            ("encode", encode),
            ("ba_solve", ba_solve),
        ):
            try:
                print(f"cache[{name}] = {fn._cache_size()}", file=sys.stderr)
            except Exception as exc:  # noqa: BLE001
                print(f"cache[{name}] ? {exc}", file=sys.stderr)


if __name__ == "__main__":
    main()
