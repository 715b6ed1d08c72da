"""Measure the eval-mode f64 BA solve cost on the TPU (VERDICT r2 #7).

With ``jax_enable_x64`` (the eval default, main.py), ``solve_gn_rays``
assembles and factorizes its (7P x 7P) normal equations in f64 — emulated
on TPU (no native f64 ALUs) — matching the reference's double-precision
Eigen solve (gn_kernels.cu:163-199). The real-time path (bench.py) stays
f32+damping. This script times the SAME steady-state 64-pose window solve
under both flags, each in its own subprocess (the x64 flag is global), with
the honest chained-dispatch methodology (N solves chained on evolving
poses, one tiny fetch at the end).

Usage (on the TPU):  python scripts/profile_f64_ba.py
Child mode:          FRODO_PROF_BA_CHILD={0|1} (x64 off/on)
Prints per-mode JSON and a combined summary line.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

WINDOW = int(os.environ.get("FRODO_PROF_BA_WINDOW", "64"))
REPS = int(os.environ.get("FRODO_PROF_BA_REPS", "20"))
HW = int(os.environ.get("FRODO_PROF_BA_HW", str(288 * 512)))


def child(x64: bool) -> None:
    import jax

    if x64:
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from bench import _steady_state_window
    from frodo_slam_tpu.ops import lie
    from frodo_slam_tpu.slam.global_opt import BAConfig, empty_odom_edges, solve_gn_rays

    # full production row count by default: the solve cost is dominated by
    # the per-edge reduction over hw matched rows
    hw = HW
    T_true, X_win, C_win, edges = _steady_state_window(hw, WINDOW)
    ba_cfg = BAConfig(max_iters=10, pin=1, delta_norm=1e-10)
    odom0 = empty_odom_edges(1)
    s_bar = jnp.full((WINDOW,), -1.0, jnp.float32)

    # big arrays must be jit ARGUMENTS: closure constants are embedded in
    # the lowered HLO and the remote-compile service rejects the request
    # (HTTP 413) at this window size
    @jax.jit
    def perturb(T_true, key):
        noise = (
            jax.random.normal(key, (WINDOW, 7), jnp.float32)
            * jnp.asarray([0.05] * 3 + [0.02] * 3 + [0.01], jnp.float32)
        ).at[0].set(0.0)
        return jax.vmap(lie.sim3_retr)(T_true, noise).astype(jnp.float32)

    @jax.jit
    def solve(T_init, X_win, C_win, edges):
        return solve_gn_rays(ba_cfg, 1, T_init, X_win, C_win, edges, odom0, s_bar)

    import numpy as np

    key = jax.random.PRNGKey(0)
    T = solve(perturb(T_true, key), X_win, C_win, edges)  # warm both programs
    np.asarray(T[0, :1])

    t0 = time.perf_counter()
    for i in range(REPS):
        T = solve(perturb(T_true, jax.random.fold_in(key, i)), X_win, C_win, edges)
    np.asarray(T[0, :1])  # one tiny sync at the end
    dt = (time.perf_counter() - t0) / REPS
    print(json.dumps({
        "mode": "f64" if x64 else "f32",
        "solve_ms": round(dt * 1e3, 2),
        "window": WINDOW,
        "reps": REPS,
        "backend": jax.default_backend(),
    }))


def main() -> None:
    if os.environ.get("FRODO_PROF_BA_CHILD") is not None:
        child(os.environ["FRODO_PROF_BA_CHILD"] == "1")
        return
    results = {}
    for flag in ("0", "1"):
        env = dict(os.environ)
        env["FRODO_PROF_BA_CHILD"] = flag
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True,
        )
        lines = proc.stdout.strip().splitlines()
        try:
            rec = json.loads(lines[-1]) if lines else {}
        except json.JSONDecodeError:
            rec = {}
        if not rec:
            # child produced no JSON: surface its failure, don't print "{}".
            # Keep the exception line itself, not the traceback footer
            # (the sweep2 run only captured jax's "frames removed" banner).
            err_lines = [
                ln for ln in proc.stderr.strip().splitlines()
                if ln and not ln.startswith((" ", "For simplicity", "----"))
            ]
            rec = {"error": err_lines[-4:], "rc": proc.returncode}
        results[{"0": "f32", "1": "f64"}[flag]] = rec
        print(json.dumps(rec), flush=True)
    f32 = results.get("f32", {}).get("solve_ms")
    f64 = results.get("f64", {}).get("solve_ms")
    if f32 and f64:
        print(json.dumps({"summary": "f64_vs_f32_ba_solve",
                          "f32_ms": f32, "f64_ms": f64,
                          "ratio": round(f64 / f32, 2)}))


if __name__ == "__main__":
    main()
