"""In-situ per-stage timing of the bench keyframe step (TPU diagnosis).

Round-3 mystery: isolated component timings say the half-reuse backend path
is CHEAPER than match_symmetric (decode 21 vs 114 ms, match 48/35 vs
~0-incremental), yet e2e bench says half costs +350 ms/KF. This replicates
the bench loop exactly and inserts ONE TINY FETCH after each backend stage
(block_until_ready does NOT synchronize the remote tunnel; only fetches
do), so each stage's serial in-situ cost becomes visible. The ~0.2 s fetch
overhead is constant per stage and cancels in the half-vs-nohalf diff.

Usage (TPU): python scratch/e2e_stage_diag.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax
import jax.numpy as jnp
import numpy as np

import dataclasses

from frodo_slam_tpu.config import make_config
from frodo_slam_tpu.models import mast3r
from frodo_slam_tpu.ops import matching as matching_ops
from frodo_slam_tpu.slam import frame as frame_mod
from frodo_slam_tpu.slam.backend import _ingest_pairs, _invert_match, _write_pair_rows
from frodo_slam_tpu.slam.global_opt import BAConfig, empty_odom_edges, solve_gn_rays
from frodo_slam_tpu.slam.inference import decode_asymmetric, decode_mono, match_symmetric
from frodo_slam_tpu.slam.tracker import TrackingCfg, track_step

from bench import _steady_state_window, _synthetic_frames

mcfg, (h, w), n_frames, window = mast3r.MASt3RConfig(), (288, 512), 28, 64
KF_EVERY = 8
cfg = make_config()
match_cfg_d = dict(cfg.matching)
match_cfg = tuple(sorted(match_cfg_d.items()))
tcfg = TrackingCfg(
    min_match_frac=0.0, max_iters=int(cfg.tracking.max_iters), Q_conf=0.0,
    match_frac_thresh=float(cfg.tracking.match_frac_thresh),
)
ba_cfg = BAConfig(max_iters=int(cfg.local_opt.max_iters), pin=1,
                  delta_norm=float(cfg.local_opt.delta_norm))

params = mast3r.init_params(jax.random.PRNGKey(0), mcfg)
params["head2"] = params["head1"]
params["dec_blocks2"] = params["dec_blocks"]
params = mast3r.cast_transformer_params(params, mcfg.dtype)
hw = h * w

rng = np.random.default_rng(0)
frames = _synthetic_frames(rng, h, w, n_frames)

T_true, X_win, C_win, edges0 = _steady_state_window(hw, window)
odom0 = empty_odom_edges(1)
s_bar = jnp.full((window,), -1.0, jnp.float32)
live_rows = jnp.int32(2 * (window - 1))
from frodo_slam_tpu.ops import lie


@jax.jit
def encode(params, img):
    return mast3r.encode_image(params, mcfg, img)


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


def full_step(params, kf, img, idx_init):
    feat, pos = encode(params, img)
    fr = frame_mod.make_empty_frame(0, img, feat, pos)
    return track_step(params, mcfg, tcfg, match_cfg, (h, w), kf, fr, idx_init)


def sync(x):
    _ = np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


STAGES = {}


def stage(name, fn):
    t0 = time.perf_counter()
    out = fn()
    sync(out)
    dt = time.perf_counter() - t0
    STAGES.setdefault(name, []).append(dt * 1e3)
    return out


def run(use_half):
    global STAGES
    STAGES = {}
    cold_cfg, warm_cfg = matching_ops.split_match_cfg(match_cfg_d)

    feat, pos = encode(params, frames[0])
    f0 = frame_mod.make_empty_frame(0, frames[0], feat, pos)
    X0, C0 = decode_mono(params, mcfg, feat, pos, (h, w))
    Xn, Cn, Nn, Un = frame_mod.update_pointmap(f0.X_canon, f0.C, f0.N, f0.N_updates, X0, C0)
    kf = dataclasses.replace(f0, X_canon=Xn, C=Cn, N=Nn, N_updates=Un)

    # warm all program variants
    kf_w, fused, res = full_step(params, kf, frames[1], None)
    sync(res.match_frac)
    kf_w, fused, res = full_step(params, kf_w, frames[1], res.idx_f2k)
    sync(res.match_frac)
    for ph in (None, res.pair_half):
        if ph is not None:
            idx_j2i, vm_i, Qjj, Qij = ph
            r11, r21 = decode_asymmetric(params, mcfg, kf_w.feat, kf_w.pos,
                                         fused.feat, fused.pos, (h, w))
            seed, _seeded = _invert_match(idx_j2i.astype(jnp.int32), vm_i)
            ii2j, vj = matching_ops.match(r11["pts3d"], r21["pts3d"],
                                          r11["desc"], r21["desc"], seed, **warm_cfg)
            sync(ii2j)
        else:
            out = match_symmetric(params, mcfg, match_cfg_d, kf_w.feat, kf_w.pos,
                                  fused.feat, fused.pos, (h, w))
            sync(out[0])
    # warm ingest/write/solve too (the first diag run paid 2.5 + 6.0 s of
    # uncached ingest/write on its first keyframe); use a COPY of edges0 —
    # _write_pair_rows donates its edge buffers
    (idx_i2j_w, idx_j2i_w, vm_j_w, vm_i_w, Qii_w, Qjj_w, Qji_w, Qij_w) = out
    n_one = jnp.ones((1,), jnp.int32)
    ing = _ingest_pairs(
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
        X_win[window - 2: window - 1], C_win[window - 2: window - 1], n_one,
        X_win[window - 1: window], C_win[window - 1: window], n_one,
        idx_i2j_w.astype(jnp.int32), idx_j2i_w.astype(jnp.int32),
        vm_j_w, vm_i_w, Qii_w, Qjj_w, Qji_w, Qij_w)
    (Qj, Qi, valid_j, valid_i, fracs, XiT_r0, w0_r0, XiT_r1, w0_r1) = ing
    edges_w = _write_pair_rows(
        jax.tree.map(jnp.copy, edges0), live_rows,
        jnp.int32(window - 2), jnp.int32(window - 1),
        idx_i2j_w[0], idx_j2i_w[0], valid_j[0, :, 0], valid_i[0, :, 0],
        Qj[0, :, 0], Qi[0, :, 0],
        cache=(XiT_r0[0], w0_r0[0], XiT_r1[0], w0_r1[0]))
    T = ba_solve(perturb(jax.random.PRNGKey(1)), edges_w)
    sync(T)
    kf = kf_w

    t_all0 = time.perf_counter()
    idx_init = res.idx_f2k
    prev_kf = kf
    edges = jax.tree.map(jnp.copy, edges0)  # donated per write; keep edges0 intact
    for i in range(2, n_frames):
        kf, fused, res = full_step(params, kf, frames[i], idx_init)
        idx_init = res.idx_f2k
        if i % KF_EVERY == 0:
            sync(res.match_frac)  # drain the per-frame stream first
            stage("syncfloor", lambda: res.match_frac)  # pure fetch cost
            feat_i, pos_i = prev_kf.feat, prev_kf.pos
            feat_j, pos_j = fused.feat, fused.pos
            if use_half:
                idx_j2i, vm_i, Qjj, Qij = res.pair_half
                r = stage("decode_asym", lambda: decode_asymmetric(
                    params, mcfg, feat_i, pos_i, feat_j, pos_j, (h, w)))
                res11, res21 = r
                (seed, _seeded) = stage("invert", lambda: _invert_match(
                    idx_j2i.astype(jnp.int32), vm_i))
                mj = stage("match_dir", lambda: matching_ops.match(
                    res11["pts3d"], res21["pts3d"], res11["desc"], res21["desc"],
                    seed, **warm_cfg))
                idx_i2j, vm_j = mj
                Qii = res11["desc_conf"].reshape(1, h * w, 1)
                Qji = res21["desc_conf"].reshape(1, h * w, 1)
            else:
                out = stage("match_symmetric", lambda: match_symmetric(
                    params, mcfg, match_cfg_d, feat_i, pos_i, feat_j, pos_j, (h, w)))
                (idx_i2j, idx_j2i, vm_j, vm_i, Qii, Qjj, Qji, Qij) = out
            n_one = jnp.ones((1,), jnp.int32)
            ing = stage("ingest", lambda: _ingest_pairs(
                jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
                X_win[window - 2: window - 1], C_win[window - 2: window - 1], n_one,
                X_win[window - 1: window], C_win[window - 1: window], n_one,
                idx_i2j.astype(jnp.int32), idx_j2i.astype(jnp.int32),
                vm_j, vm_i, Qii, Qjj, Qji, Qij))
            (Qj, Qi, valid_j, valid_i, fracs, XiT_r0, w0_r0, XiT_r1, w0_r1) = ing
            edges = stage("write", lambda: _write_pair_rows(
                edges, live_rows, jnp.int32(window - 2), jnp.int32(window - 1),
                idx_i2j[0], idx_j2i[0], valid_j[0, :, 0], valid_i[0, :, 0],
                Qj[0, :, 0], Qi[0, :, 0],
                cache=(XiT_r0[0], w0_r0[0], XiT_r1[0], w0_r1[0])))
            T_new = stage("solve", lambda: ba_solve(
                perturb(jax.random.PRNGKey(i)), edges))
            prev_kf = kf
            idx_init = None
    sync(res.match_frac)
    total = time.perf_counter() - t_all0
    print(f"== use_half={use_half}: total {total:.2f}s for {n_frames-2} frames ==")
    for name, xs in STAGES.items():
        print(f"  {name}: " + " ".join(f"{x:.0f}" for x in xs) + " ms")


run(False)
run(True)
print("backend:", jax.default_backend())
