"""Benchmark: 4096-member Van der Pol ensemble vs scipy+extensisq 1-core.

North-star metric from BASELINE.json: wall-clock speedup of a vmapped
4096-member Van der Pol ensemble on one TPU chip over scipy's solve_ivp
driving the reference extensisq BS5 on one CPU core, at identical
rtol/atol.  Prints ONE JSON line.

The scipy side times a sample of members and extrapolates linearly
(members are independent solves; scipy cost is linear in member count).
"""
import json
import sys
import time

import numpy as np


MU = 3.0
T_END = 10.0
RTOL, ATOL = 1e-6, 1e-9
N_MEMBERS = 4096
SCIPY_SAMPLE = 64


def tpu_side():
    import jax
    import jax.numpy as jnp
    from extensisq_tpu.solve import solve_ensemble
    from extensisq_tpu import BS5

    def vdp(t, y):
        return jnp.stack([y[1], MU * (1 - y[0] ** 2) * y[1] - y[0]])

    y0 = jnp.stack([jnp.linspace(1.5, 2.5, N_MEMBERS),
                    jnp.zeros(N_MEMBERS)], axis=1)
    run = jax.jit(lambda Y: solve_ensemble(
        vdp, (0.0, T_END), Y, method=BS5, rtol=RTOL, atol=ATOL))
    # warm-up: compile + 2 full runs (the axon tunnel's
    # block_until_ready can under-synchronize; a host fetch of the
    # result forces completion)
    for _ in range(2):
        out = run(y0)
        np.asarray(out.y)
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = run(y0)
        np.asarray(out.y)
    dt = (time.perf_counter() - t0) / n_rep
    assert bool(jnp.all(out.status == 1)), "ensemble did not finish"
    total_steps = int(out.nsteps.sum())
    total_fev = int(out.nfev.sum())
    yf = np.asarray(out.y)
    return dt, total_steps, total_fev, yf


def scipy_side(yf_tpu):
    sys.path.insert(0, "/root/reference")
    from scipy.integrate import solve_ivp as scipy_solve
    from extensisq import BS5 as refBS5

    def vdp(t, y):
        return np.array([y[1], MU * (1 - y[0] ** 2) * y[1] - y[0]])

    x0 = np.linspace(1.5, 2.5, N_MEMBERS)
    idx = np.linspace(0, N_MEMBERS - 1, SCIPY_SAMPLE).astype(int)
    t0 = time.perf_counter()
    max_err = 0.0
    for i in idx:
        r = scipy_solve(vdp, (0.0, T_END), [x0[i], 0.0], method=refBS5,
                        rtol=RTOL, atol=ATOL)
        assert r.success
        max_err = max(max_err, float(np.max(np.abs(r.y[:, -1]
                                                   - yf_tpu[i]))))
    dt_sample = time.perf_counter() - t0
    dt_full = dt_sample * (N_MEMBERS / len(idx))
    return dt_full, max_err, dt_sample, len(idx)


def host_provenance():
    """CPU model / core count of the scipy-side host: the extrapolated
    baseline halved between rounds 3 and 4 purely from a host
    reallocation, so the artifact must record where the baseline ran
    (VERDICT r4 weak #6)."""
    import os
    model = None
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.lower().startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return {"cpu_model": model, "cpu_count": os.cpu_count()}


def fused_side():
    """Secondary metrics: the single-kernel Pallas solver — plain f32
    at its fast-mode tolerances, and the mixed-precision (compensated
    dots + double-single carry) mode at the OFFICIAL benchmark
    tolerances, where it reaches f64-class global accuracy at roughly
    half the wall time of the XLA f64 path."""
    import jax
    import numpy as np
    from extensisq_tpu.ops import solve_fused_erk
    from extensisq_tpu import BS5

    import jax.numpy as jnp

    def vdp(t, y):
        return jnp.stack([y[1], MU * (1 - y[0] ** 2) * y[1] - y[0]])

    y0 = np.stack([np.linspace(1.5, 2.5, N_MEMBERS),
                   np.zeros(N_MEMBERS)], axis=1).astype(np.float32)

    def timed(run):
        for _ in range(2):
            out = run(y0)
            np.asarray(out[0])
        t0 = time.perf_counter()
        n_rep = 10
        for _ in range(n_rep):
            out = run(y0)
            np.asarray(out[0])
        dt = (time.perf_counter() - t0) / n_rep
        assert bool(np.all(np.asarray(out[1]) == 1))
        return dt

    dt_f32 = timed(jax.jit(lambda Y: solve_fused_erk(
        vdp, (0.0, T_END), Y, method=BS5, rtol=1e-4, atol=1e-6,
        block_members=1024)))
    dt_comp = timed(jax.jit(lambda Y: solve_fused_erk(
        vdp, (0.0, T_END), Y, method=BS5, rtol=RTOL, atol=ATOL,
        block_members=1024, compensated=True)))
    return dt_f32, dt_comp


def fused_swag_side():
    """Compensated fused SWAG at the official tolerances: the whole
    ~42k-step Van der Pol mu=1e3 horizon in one kernel at rtol 1e-6 /
    atol 1e-9 (DS y/t carries + Neumaier increment sums; plain f32
    drifts ~5e-4 here, compensated holds ~2e-7 vs f64)."""
    import jax
    import jax.numpy as jnp
    from extensisq_tpu.ops.fused_adams import solve_fused_adams

    mu = 1000.0

    def f(t, y):
        return jnp.stack([y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]])

    B = 256
    Y0 = np.stack([np.linspace(1.9, 2.1, B), np.zeros(B)],
                  axis=1).astype(np.float32)
    run = jax.jit(lambda Y: solve_fused_adams(
        f, (0.0, 20.0), Y, rtol=1e-6, atol=1e-9, block_members=256,
        max_steps=400_000, compensated=True))
    for _ in range(2):
        out = run(Y0)
        np.asarray(out[0])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run(Y0)
        np.asarray(out[0])
    dt = (time.perf_counter() - t0) / reps
    assert bool(np.all(np.asarray(out[1]) == 1))
    return dt


def fused_esdirk_side():
    """Implicit fused kernel: pendulum-DAE ensemble ms/step (round-1's
    dispatch-bound config 4b ran at 2.7 ms/step on the XLA path)."""
    import warnings
    import jax
    import jax.numpy as jnp
    from extensisq_tpu.ops.fused_esdirk import solve_fused_esdirk
    from extensisq_tpu import Kv3I
    from extensisq_tpu.steppers import build_stepper
    from extensisq_tpu.types import IVPParams

    g = 9.81

    def pend(t, s):
        x, ya, vx, vy, lam = s[0], s[1], s[2], s[3], s[4]
        return jnp.stack([
            vx, vy, -lam * x, -lam * ya - g,
            vx ** 2 + vy ** 2 - lam * (x ** 2 + ya ** 2) - g * ya])

    B = 4096
    ths = np.linspace(0.2, 1.2, B)
    Y0 = np.stack([np.sin(ths), -np.cos(ths), np.zeros(B),
                   np.zeros(B), np.zeros(B)], axis=1)
    M = np.array([1.0, 1.0, 1.0, 1.0, 0.0])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        stepper = build_stepper(Kv3I, pend, 5, np.float64,
                                M=np.diag(M))
    params = IVPParams(t_bound=jnp.asarray(10.0),
                       direction=jnp.asarray(1.0),
                       rtol=jnp.asarray(1e-4), atol=jnp.asarray(1e-6),
                       max_step=jnp.asarray(np.inf))
    states = jax.vmap(lambda y: stepper.init(0.0, y, params))(
        jnp.asarray(Y0))
    Y0f = np.asarray(states.y).astype(np.float32)
    YP0 = np.asarray(states.yp).astype(np.float32)
    run = jax.jit(lambda Y, YP: solve_fused_esdirk(
        pend, (0.0, 10.0), Y, method=Kv3I, M=M, yp0_batch=YP,
        rtol=1e-4, atol=1e-6, block_members=1024))
    for _ in range(2):
        out = run(Y0f, YP0)
        np.asarray(out[0])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run(Y0f, YP0)
        np.asarray(out[0])
    dt = (time.perf_counter() - t0) / reps
    assert bool(np.all(np.asarray(out[1]) == 1))
    return dt / int(np.asarray(out[2]).max())


def main():
    tpu_dt, total_steps, total_fev, yf = tpu_side()
    scipy_dt, max_err, scipy_raw_s, n_sample = scipy_side(yf)
    try:
        fused_dt, fused_comp_dt = fused_side()
    except Exception:
        fused_dt = fused_comp_dt = None
    try:
        esdirk_ms_per_step = fused_esdirk_side() * 1e3
    except Exception:
        esdirk_ms_per_step = None
    try:
        swag_comp_dt = fused_swag_side()
    except Exception:
        swag_comp_dt = None
    speedup = scipy_dt / tpu_dt
    print(json.dumps({
        "metric": "vdp4096_ensemble_speedup_vs_scipy_1core",
        "value": round(speedup, 2),
        "unit": "x",
        "vs_baseline": round(speedup / 100.0, 3),
        "detail": {
            "tpu_wall_s": round(tpu_dt, 6),
            "scipy_wall_s_extrapolated": round(scipy_dt, 3),
            "scipy_wall_s_measured_sample": round(scipy_raw_s, 3),
            "scipy_sample_members": n_sample,
            "scipy_extrapolation_factor": round(N_MEMBERS / n_sample,
                                                2),
            "baseline_host": host_provenance(),
            "steps_per_s": round(total_steps / tpu_dt, 1),
            "rhs_evals_per_s": round(total_fev / tpu_dt, 1),
            "members": N_MEMBERS,
            "endpoint_agreement_max_abs": max_err,
            "rtol": RTOL, "atol": ATOL,
            "fused_pallas_f32_rtol1e-4_wall_s":
                round(fused_dt, 6) if fused_dt else None,
            "fused_pallas_compensated_official_tol_wall_s":
                round(fused_comp_dt, 6) if fused_comp_dt else None,
            "fused_esdirk_pendulum_dae_ms_per_step":
                round(esdirk_ms_per_step, 4)
                if esdirk_ms_per_step else None,
            "fused_swag_compensated_official_tol_wall_s":
                round(swag_comp_dt, 6) if swag_comp_dt else None,
        },
    }))


if __name__ == "__main__":
    main()
