"""IMU preintegration (standalone module, as in the reference).

Behavioral spec: ``mast3r_slam/imu.py`` — ``RealTimeIMUIntegrator``
(:94-589): static calibration of gyro/accel biases and a gravity-aligned
initial rotation via the Rodrigues double-vector construction (:22-92,
:167-277), then batched preintegration of (gyro, accel) samples
(:327-428, pypose ``IMUPreintegrator`` in the reference). Like the
reference, this module is standalone — not wired into the tracker (SURVEY.md
notes no other file imports it).

TPU design: preintegration is a ``lax.scan`` over the sample batch — the
classic on-manifold recursion
    R_{k+1} = R_k Exp((w_k - b_g) dt)
    v_{k+1} = v_k + (R_k (a_k - b_a) + g) dt
    p_{k+1} = p_k + v_k dt + 0.5 (R_k (a_k - b_a) + g) dt^2
jitted once and reused for every polling batch.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie


def rotation_aligning(v_from: np.ndarray, v_to: np.ndarray) -> np.ndarray:
    """Rotation matrix sending unit vector ``v_from`` to ``v_to`` (the
    Rodrigues construction of imu.py:22-92)."""
    a = v_from / np.linalg.norm(v_from)
    b = v_to / np.linalg.norm(v_to)
    v = np.cross(a, b)
    c = float(a @ b)
    if np.linalg.norm(v) < 1e-12:
        return np.eye(3) if c > 0 else -np.eye(3)
    K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + K + K @ K * (1.0 / (1.0 + c))


@jax.jit
def preintegrate(q0: jax.Array, v0: jax.Array, p0: jax.Array,
                 gyro: jax.Array, accel: jax.Array, dts: jax.Array,
                 bias_g: jax.Array, bias_a: jax.Array, gravity: jax.Array):
    """Integrate a batch of IMU samples (imu.py:327-428).

    q0 (4,) scalar-last world-from-body rotation; gyro/accel (N, 3); dts (N,).
    Returns (q, v, p) after the batch.
    """

    def step(carry, inp):
        q, v, p = carry
        w, a, dt = inp
        a_w = lie.quat_act(q, a - bias_a) + gravity
        p_new = p + v * dt + 0.5 * a_w * dt * dt
        v_new = v + a_w * dt
        q_new = lie.quat_mul(q, lie.so3_exp((w - bias_g) * dt))
        q_new = q_new / jnp.linalg.norm(q_new)
        return (q_new, v_new, p_new), None

    (q, v, p), _ = jax.lax.scan(step, (q0, v0, p0), (gyro, accel, dts))
    return q, v, p


@dataclasses.dataclass
class IMUState:
    q: np.ndarray  # (4,) scalar-last
    v: np.ndarray  # (3,)
    p: np.ndarray  # (3,)
    t: float


class IMUPreintegrator:
    """Host wrapper holding biases/gravity + the jitted scan."""

    def __init__(self, gravity_mag: float = 9.81):
        self.bias_g = np.zeros(3, np.float32)
        self.bias_a = np.zeros(3, np.float32)
        self.gravity = np.array([0.0, -gravity_mag, 0.0], np.float32)
        self.state = IMUState(np.array([0, 0, 0, 1], np.float32), np.zeros(3, np.float32),
                              np.zeros(3, np.float32), 0.0)

    def calibrate_static(self, gyro: np.ndarray, accel: np.ndarray):
        """Static-pose calibration (imu.py:167-277): gyro bias = mean rate;
        initial rotation aligns the mean specific force with -gravity; accel
        bias = residual in the aligned frame."""
        self.bias_g = gyro.mean(0).astype(np.float32)
        mean_acc = accel.mean(0)
        R0 = rotation_aligning(mean_acc / np.linalg.norm(mean_acc),
                               -self.gravity / np.linalg.norm(self.gravity))
        from ..ops.lie import R_to_quat

        q0 = np.asarray(R_to_quat(jnp.asarray(R0, jnp.float32)))
        self.state.q = q0.astype(np.float32)
        # accel bias in body frame: what remains after gravity compensation
        g_body = np.asarray(lie.quat_act(lie.quat_inv(jnp.asarray(q0)), jnp.asarray(-self.gravity)))
        self.bias_a = (mean_acc - g_body).astype(np.float32)

    def update(self, gyro: np.ndarray, accel: np.ndarray, dts: np.ndarray) -> IMUState:
        q, v, p = preintegrate(
            jnp.asarray(self.state.q), jnp.asarray(self.state.v), jnp.asarray(self.state.p),
            jnp.asarray(gyro, jnp.float32), jnp.asarray(accel, jnp.float32),
            jnp.asarray(dts, jnp.float32),
            jnp.asarray(self.bias_g), jnp.asarray(self.bias_a), jnp.asarray(self.gravity),
        )
        self.state = IMUState(np.asarray(q), np.asarray(v), np.asarray(p),
                              self.state.t + float(np.sum(dts)))
        return self.state


class RealTimeIMUIntegrator:  # pragma: no cover - hardware
    """REST-polling real-time integrator (imu.py:94-589); requires
    ``requests``. Poll loop gathers (gyro, accel, ts) rows and feeds
    :class:`IMUPreintegrator` in batches."""

    def __init__(self, api: str = "http://localhost:8000/imu", poll_s: float = 0.05,
                 calib_samples: int = 200):
        self.api = api
        self.poll_s = poll_s
        self.calib_samples = calib_samples
        self.pre = IMUPreintegrator()
        self._running = False
        self._thread = None
        self._last_ts: Optional[float] = None

    def start(self):
        import threading

        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._running = False
        if self._thread:
            self._thread.join(timeout=2.0)

    def get_state(self) -> IMUState:
        return self.pre.state

    def _fetch(self) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        import requests

        try:
            rows = requests.get(self.api, timeout=2.0).json().get("imu", [])
        except Exception:
            return None
        rows = [r for r in rows if self._last_ts is None or r[-1] > self._last_ts]
        if not rows:
            return None
        arr = np.asarray(rows, np.float64)
        gyro, accel, ts = arr[:, 0:3], arr[:, 3:6], arr[:, 6]
        prev = self._last_ts if self._last_ts is not None else ts[0]
        dts = np.diff(np.concatenate([[prev], ts]))
        self._last_ts = float(ts[-1])
        return gyro, accel, dts

    def _loop(self):
        calib_g, calib_a = [], []
        while self._running:
            batch = self._fetch()
            if batch is None:
                time.sleep(self.poll_s)
                continue
            gyro, accel, dts = batch
            if len(calib_g) * 1.0 < self.calib_samples:
                calib_g.append(gyro)
                calib_a.append(accel)
                if sum(len(g) for g in calib_g) >= self.calib_samples:
                    self.pre.calibrate_static(np.vstack(calib_g), np.vstack(calib_a))
                time.sleep(self.poll_s)
                continue
            self.pre.update(gyro, accel, dts)
            time.sleep(self.poll_s)
