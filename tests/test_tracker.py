"""Tracker unit tests: Gauss-Newton pose recovery on synthetic data, pointmap
fusion filters, and the keyframe ring buffer."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from frodo_slam_tpu.ops import lie
from frodo_slam_tpu.slam import frame as frame_mod
from frodo_slam_tpu.slam.tracker import (
    TrackingCfg,
    opt_pose_calib_sim3,
    opt_pose_ray_dist_sim3,
)

jax.config.update("jax_default_matmul_precision", "highest")


def _synthetic_scene(key, n=2000):
    kx, kp = jax.random.split(key)
    # points in front of the camera (f32 like the production path)
    X = jax.random.uniform(
        kx, (n, 3), jnp.float32, minval=-1.0, maxval=1.0
    ) + jnp.array([0.0, 0.0, 3.0], jnp.float32)
    xi = jnp.array([0.05, -0.03, 0.08, 0.02, -0.01, 0.03, 0.04], jnp.float32)
    T_true = lie.sim3_exp(xi)  # true T_CkCf
    return X, T_true


def test_gn_ray_dist_recovers_pose():
    key = jax.random.PRNGKey(0)
    Xf, T_true = _synthetic_scene(key)
    Xk = lie.sim3_act(T_true, Xf)  # kf observes transformed points

    cfg = TrackingCfg(max_iters=50)
    T_WCk = lie.sim3_identity()
    T_WCf = lie.sim3_identity()  # init at identity relative pose
    Qk = jnp.full((Xf.shape[0], 1), 4.0)
    valid = jnp.ones((Xf.shape[0], 1), bool)

    T_WCf_new, T_CkCf, ok = opt_pose_ray_dist_sim3(cfg, Xf, Xk, T_WCf, T_WCk, Qk, valid)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(T_CkCf), np.asarray(T_true), atol=1e-4)
    # T_WCf = T_WCk * T_CkCf
    np.testing.assert_allclose(np.asarray(T_WCf_new), np.asarray(T_true), atol=1e-4)


def test_gn_ray_dist_ignores_masked_outliers():
    key = jax.random.PRNGKey(1)
    Xf, T_true = _synthetic_scene(key)
    Xk = lie.sim3_act(T_true, Xf)
    # corrupt 30% of points but mark them invalid
    n = Xf.shape[0]
    bad = jax.random.bernoulli(jax.random.PRNGKey(2), 0.3, (n, 1))
    Xk = jnp.where(bad, Xk + 5.0, Xk)

    cfg = TrackingCfg(max_iters=50)
    Qk = jnp.full((n, 1), 4.0)
    T_WCf_new, T_CkCf, ok = opt_pose_ray_dist_sim3(
        cfg, Xf, Xk, lie.sim3_identity(), lie.sim3_identity(), Qk, ~bad
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(T_CkCf), np.asarray(T_true), atol=1e-4)


def test_gn_calib_recovers_pose():
    h, w = 48, 64
    K = jnp.array([[60.0, 0.0, 32.0], [0.0, 60.0, 24.0], [0.0, 0.0, 1.0]])
    from frodo_slam_tpu.ops.geometry import backproject, get_pixel_coords

    uv = get_pixel_coords((h, w))
    z = 2.0 + 0.5 * jnp.sin(uv[:, 0:1] * 0.1) + 0.3 * jnp.cos(uv[:, 1:2] * 0.07)
    Xk = backproject(uv, z, K)

    xi = jnp.array([0.02, -0.01, 0.03, 0.01, -0.005, 0.01, 0.02])
    T_true = lie.sim3_exp(xi)  # T_CkCf
    Xf = lie.sim3_act(lie.sim3_inv(T_true), Xk)

    cfg = TrackingCfg(max_iters=50, use_calib=True)
    n = Xk.shape[0]
    Qk = jnp.full((n, 1), 4.0)
    valid = jnp.ones((n, 1), bool)
    meas_k = jnp.concatenate([uv, jnp.log(Xk[:, 2:3])], axis=-1)
    valid_meas = Xk[:, 2:3] > cfg.depth_eps

    T_WCf_new, T_CkCf, ok = opt_pose_calib_sim3(
        cfg, Xf, Xk, lie.sim3_identity(), lie.sim3_identity(), Qk, valid,
        meas_k, valid_meas, K, (h, w),
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(T_CkCf), np.asarray(T_true), atol=1e-4)


def test_update_pointmap_weighted():
    hw = 16
    X0 = jnp.zeros((hw, 3))
    C0 = jnp.zeros((hw, 1))
    N = jnp.asarray(0, jnp.int32)
    U = jnp.asarray(0, jnp.int32)
    X1 = jnp.ones((hw, 3))
    C1 = jnp.full((hw, 1), 2.0)

    # first observation initializes
    Xn, Cn, Nn, Un = frame_mod.update_pointmap(X0, C0, N, U, X1, C1, "weighted_pointmap")
    np.testing.assert_array_equal(np.asarray(Xn), np.asarray(X1))
    assert int(Nn) == 1 and int(Un) == 1

    # second fuses with confidence weights
    X2 = jnp.full((hw, 3), 4.0)
    C2 = jnp.full((hw, 1), 2.0)
    Xn2, Cn2, Nn2, Un2 = frame_mod.update_pointmap(Xn, Cn, Nn, Un, X2, C2, "weighted_pointmap")
    np.testing.assert_allclose(np.asarray(Xn2), 2.5)  # (2*1 + 2*4)/4
    np.testing.assert_allclose(np.asarray(Cn2), 4.0)
    assert int(Nn2) == 2


class _RefFrameOracle:
    """Stateful numpy transcription of the reference fusion semantics
    (``Frame.update_pointmap`` + ``get_score``, reference frame.py:93-165):
    init at N==0 sets N=N_updates=1 (and a score for best_score); ``first``
    replaces once more at N_updates==1; ``best_score`` replaces whenever the
    new observation's median/mean confidence beats the carried score."""

    def __init__(self, mode, score_mode="median"):
        self.mode, self.score_mode = mode, score_mode
        self.X = self.C = None
        self.N = self.N_updates = 0
        self.score = None

    def _score(self, C):
        return np.median(C) if self.score_mode == "median" else np.mean(C)

    def update(self, X, C):
        if self.N == 0:
            self.X, self.C, self.N, self.N_updates = X.copy(), C.copy(), 1, 1
            if self.mode == "best_score":
                self.score = self._score(C)
            return
        if self.mode == "first":
            if self.N_updates == 1:
                self.X, self.C, self.N = X.copy(), C.copy(), 1
        elif self.mode == "recent":
            self.X, self.C, self.N = X.copy(), C.copy(), 1
        elif self.mode == "best_score":
            s = self._score(C)
            if s > self.score:
                self.X, self.C, self.N, self.score = X.copy(), C.copy(), 1, s
        elif self.mode == "indep_conf":
            m = C > self.C
            self.X = np.where(np.repeat(m, 3, axis=-1), X, self.X)
            self.C = np.where(m, C, self.C)
            self.N = 1
        elif self.mode == "weighted_pointmap":
            self.X = (self.C * self.X + C * X) / (self.C + C)
            self.C = self.C + C
            self.N += 1
        elif self.mode == "weighted_spherical":
            def sph(P):
                r = np.linalg.norm(P, axis=-1, keepdims=True)
                return np.concatenate(
                    [r, np.arctan2(P[..., 1:2], P[..., 0:1]),
                     np.arccos(P[..., 2:3] / r)], axis=-1)
            s = (self.C * sph(self.X) + C * sph(X)) / (self.C + C)
            r, phi, th = s[..., 0:1], s[..., 1:2], s[..., 2:3]
            self.X = np.concatenate(
                [r * np.sin(th) * np.cos(phi), r * np.sin(th) * np.sin(phi),
                 r * np.cos(th)], axis=-1)
            self.C = self.C + C
            self.N += 1
        self.N_updates += 1


@pytest.mark.parametrize("mode", [
    "first", "recent", "best_score", "indep_conf", "weighted_pointmap",
    "weighted_spherical",
])
@pytest.mark.parametrize("score_mode", ["median", "mean"])
def test_update_pointmap_parity_all_modes(mode, score_mode):
    """All 6 reference fusion filters match the stateful oracle over a
    5-observation sequence (incl. a low-confidence obs that best_score must
    reject and a high-confidence one it must take)."""
    if mode != "best_score" and score_mode == "mean":
        pytest.skip("score_mode only affects best_score")
    rng = np.random.default_rng(3)
    hw = 32
    ref = _RefFrameOracle(mode, score_mode)
    X = jnp.zeros((hw, 3)); C = jnp.zeros((hw, 1))
    N = jnp.asarray(0, jnp.int32); U = jnp.asarray(0, jnp.int32)
    conf_scales = [1.0, 0.5, 3.0, 0.2, 2.0]  # drives best_score both ways
    for k, cs in enumerate(conf_scales):
        Xo = rng.normal(size=(hw, 3)).astype(np.float32)
        Xo[:, 2] = np.abs(Xo[:, 2]) + 1.0  # positive z keeps arccos stable
        Co = (rng.uniform(0.5, 1.5, size=(hw, 1)) * cs).astype(np.float32)
        ref.update(Xo, Co)
        X, C, N, U = frame_mod.update_pointmap(
            X, C, N, U, jnp.asarray(Xo), jnp.asarray(Co), mode, score_mode)
        np.testing.assert_allclose(np.asarray(X), ref.X, rtol=1e-5, atol=1e-6,
                                   err_msg=f"X diverged at obs {k}")
        np.testing.assert_allclose(np.asarray(C), ref.C, rtol=1e-5, atol=1e-6)
        assert int(N) == ref.N, f"N at obs {k}"
        assert int(U) == ref.N_updates


def test_keyframe_ring_buffer():
    hw, n_tok, enc = 16, 4, 8
    store = frame_mod.make_keyframe_store(3, hw, n_tok, enc)

    def mk(i):
        return frame_mod.Frame(
            frame_id=jnp.asarray(i, jnp.int32),
            img=jnp.zeros((1, 1, 1, 3)),
            T_WC=lie.sim3_exp(jnp.arange(7, dtype=jnp.float32) * 0.01 * i),
            X_canon=jnp.full((hw, 3), float(i)),
            C=jnp.ones((hw, 1)),
            feat=jnp.full((1, n_tok, enc), float(i)),
            pos=jnp.zeros((1, n_tok, 2), jnp.int32),
            N=jnp.asarray(1, jnp.int32),
            N_updates=jnp.asarray(1, jnp.int32),
        )

    for i in range(5):
        store = frame_mod.kf_append(store, mk(i))

    assert int(store.n_total) == 5
    assert int(store.n_size) == 3
    # ring: slots hold frames 3, 4, 2
    np.testing.assert_array_equal(np.asarray(store.frame_id), [3, 4, 2])
    assert int(store.last_slot()) == 4 % 3
    kf = frame_mod.kf_get_frame(store, store.last_slot())
    assert int(kf.frame_id) == 4
