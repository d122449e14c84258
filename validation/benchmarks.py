"""The five BASELINE.json benchmark configurations on real hardware.

Each config reports TPU wall time, throughput, and an extrapolated
one-core scipy+reference-extensisq comparison on a member sample.
The official single-line metric remains bench.py; this script documents
the breadth of the performance claim.

Run: python validation/benchmarks.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from extensisq_tpu import (solve, solve_ensemble, solve_windowed, BS5,
                           SWAG, Fi5N, Kv3I, SSV2stab, CFMR7osc, TRBDF2)
from extensisq_tpu.parallel import (brusselator_2d_rhs,
                                    brusselator_rho_bound)


def time_tpu(run, *args, reps=5):
    out = run(*args)
    np.asarray(jax.tree.leaves(out)[0])
    out = run(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(*args)
        np.asarray(jax.tree.leaves(out)[1])
    return (time.perf_counter() - t0) / reps, out


def time_scipy(fun_np, spans, y0s, method_name, sample, total, rtol,
               atol, **kw):
    sys.path.insert(0, "/root/reference")
    from scipy.integrate import solve_ivp as ss
    import extensisq as ref
    m = getattr(ref, method_name)
    t0 = time.perf_counter()
    for i in range(sample):
        r = ss(fun_np, spans, y0s[i], method=m, rtol=rtol, atol=atol,
               **kw)
        assert r.success
    return (time.perf_counter() - t0) * (total / sample)


def config1():
    """exponential decay, 3 states, BS5, 4096 members"""
    B = 4096
    A = np.array([-0.5, -1.0, -2.0])

    def f(t, y):
        return jnp.asarray(A) * y

    Y0 = jnp.asarray(1.0 + 0.5 * np.random.RandomState(0).rand(B, 3))
    run = jax.jit(lambda Y: solve_ensemble(f, (0.0, 10.0), Y, method=BS5,
                                           rtol=1e-6, atol=1e-9))
    dt, out = time_tpu(run, Y0)
    sc = time_scipy(lambda t, y: A * y, (0, 10.0), np.asarray(Y0),
                    "BS5", 48, B, 1e-6, 1e-9)
    print(f"1 exp-decay BS5 x{B}:      tpu {dt*1e3:7.1f} ms | "
          f"scipy-1core ~{sc:6.1f} s | speedup {sc/dt:7.0f}x")

    # 1b: MID-SIZE nonstiff systems (states on the lane axis) — a
    # 256-state advection-reaction MoL ensemble through the fused
    # grid-layout ERK kernel vs the XLA device path.
    from extensisq_tpu.ops import solve_fused_erk_grid
    ngr = 256
    cg = 1.0

    def fisher_g(t, y):
        return (-cg * (y - jnp.roll(y, 1, -1)) * ngr
                + y * (1.0 - y))

    def fisher_v(t, y):
        return (-cg * (y - jnp.roll(y, 1)) * ngr
                + y * (1.0 - y))

    Bg = 64
    xg = np.linspace(0, 1, ngr, endpoint=False)
    amps = np.linspace(0.2, 0.8, Bg)
    YG = (0.5 + 0.4 * amps[:, None]
          * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)
    rung = jax.jit(lambda Y: solve_fused_erk_grid(
        fisher_g, (0.0, 2.0), Y, rtol=1e-5, atol=1e-7,
        block_members=64))
    dtg, outg = time_tpu(rung, YG, reps=3)
    assert np.all(np.asarray(outg[1]) == 1)
    runx = jax.jit(lambda Y: solve_ensemble(
        fisher_v, (0.0, 2.0), Y, method=BS5, rtol=1e-5, atol=1e-7))
    dtx, outx = time_tpu(runx, jnp.asarray(YG, jnp.float64), reps=3)
    assert bool(np.all(np.asarray(outx.status) == 1))
    dgr = float(np.max(np.abs(np.asarray(outg[0])
                              - np.asarray(outx.y))))
    assert dgr < 1e-3, f"grid ERK endpoint drift vs XLA: {dgr}"
    print(f"1b advec-MoL n={ngr} BS5 x{Bg}: fused-grid {dtg*1e3:7.1f}"
          f" ms vs XLA device path {dtx*1e3:7.1f} ms "
          f"({dtx/dtg:4.1f}x); endpoint |d| {dgr:.1e}")

    # 1c: NON-SMOOTH ensemble through the fused CKdisc cascade vs the
    # XLA device path (sign-switching decay, step counts must track)
    from extensisq_tpu.ops import solve_fused_ckdisc
    from extensisq_tpu import CKdisc

    def swdec_rows(t, y):
        sw = jnp.where(jnp.sin(3.0 * t) >= 0.0, 1.0, -1.0)
        return jnp.stack([(-sw - 0.5) * y[0],
                          (sw - 0.5) * y[1]])

    Bc = 1024
    Y0c = (1.0 + 0.5 * np.random.RandomState(1)
           .rand(Bc, 2)).astype(np.float32)
    runc = jax.jit(lambda Y: solve_fused_ckdisc(
        swdec_rows, (0.0, 5.0), Y, rtol=1e-4, atol=1e-7,
        block_members=1024))
    dtc, outc = time_tpu(runc, Y0c, reps=3)
    assert np.all(np.asarray(outc[1]) == 1)
    runcx = jax.jit(lambda Y: solve_ensemble(
        swdec_rows, (0.0, 5.0), Y, method=CKdisc, rtol=1e-4,
        atol=1e-7))
    dtcx, outcx = time_tpu(runcx, jnp.asarray(Y0c, jnp.float64),
                           reps=3)
    assert bool(np.all(np.asarray(outcx.status) == 1))
    dsc = int(np.max(np.abs(np.asarray(outc[2])
                            - np.asarray(outcx.nsteps))))
    dyc = float(np.max(np.abs(np.asarray(outc[0])
                              - np.asarray(outcx.y))))
    # Root-caused (validation/ckdisc_drift.py, hw 2026-08-21): the
    # f64-conformance XLA stepper merely run in f32 drifts 3.21e-3 on
    # this problem — the same magnitude as the fused kernel's 3.15e-3
    # — and hw blocks of 128 vs 1024 members are BIT-identical.  The
    # drift is the f32 resolution floor of the sign-switching cascade
    # at rtol 1e-4, not a Mosaic/fma artifact; gate = measured+1.6x.
    assert dyc < 5e-3, f"fused CKdisc endpoint drift: {dyc}"
    print(f"1c non-smooth CKdisc x{Bc}: fused {dtc*1e3:7.1f} ms vs "
          f"XLA device path {dtcx*1e3:7.1f} ms ({dtcx/dtc:4.1f}x); "
          f"step max|d| {dsc}, endpoint |d| {dyc:.1e}")
    return {"1_tpu_ms": dt * 1e3, "1_speedup_vs_scipy": sc / dt,
            "1b_grid_erk_fused_ms": dtg * 1e3,
            "1b_grid_erk_xla_ms": dtx * 1e3,
            "1b_grid_erk_speedup": dtx / dtg,
            "1c_ckdisc_fused_ms": dtc * 1e3,
            "1c_ckdisc_xla_ms": dtcx * 1e3,
            "1c_ckdisc_speedup": dtcx / dtc,
            "1c_step_maxd": dsc}


def config2():
    """Van der Pol mu=1000, SWAG (ode113 analog), 256 members.

    ~55k adaptive steps per 30 time units: one XLA program running for
    minutes trips the remote worker's watchdog, so the horizon is
    integrated in windows with the state fed forward (the natural
    long-horizon pattern on this backend)."""
    B = 256
    mu = 1000.0
    window = 5.0
    n_windows = 4                     # short programs: the vmapped
                                      # ensemble runs minutes per 30-unit
                                      # window, tripping the watchdog

    def f(t, y):
        return jnp.stack([y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]])

    Y0 = jnp.stack([jnp.linspace(1.9, 2.1, B), jnp.zeros(B)], axis=1)

    def full(Y):
        out = solve_windowed(f, (0.0, n_windows * window), Y, n_windows,
                             method=SWAG, ensemble=True, rtol=1e-6,
                             atol=1e-9, max_steps=120_000)
        assert bool(jnp.all(out.status == 1))
        return out.y, int(out.nsteps.max())

    full(Y0)                          # warm-up/compile
    t0 = time.perf_counter()
    yref, steps = full(Y0)
    dt = time.perf_counter() - t0
    sc = time_scipy(
        lambda t, y: [y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]],
        (0, n_windows * window), np.asarray(Y0), "SWAG", 1, B,
        1e-6, 1e-9)
    # 2b: the fused Pallas SWAG kernel — the whole 43k-step horizon in
    # ONE kernel (no windowing, no per-iteration dispatch), f32 fast
    # path at rtol 1e-4
    from extensisq_tpu.ops.fused_adams import solve_fused_adams
    runf = jax.jit(lambda Y: solve_fused_adams(
        f, (0.0, n_windows * window), Y, rtol=1e-4, atol=1e-6,
        block_members=256))
    Y0f = np.asarray(Y0, np.float32)
    dtf, outf = time_tpu(runf, Y0f, reps=2)
    stf = np.asarray(outf[1])
    nsf = np.asarray(outf[2])
    assert np.all(stf == 1)
    print(f"2b VdP mu=1e3 fused-SWAG x{B} (t=20, rtol 1e-4): "
          f"tpu {dtf:7.2f} s ({dtf / max(int(nsf.max()), 1) * 1e6:.0f} "
          f"us/step, {int(nsf.max())} steps max)")

    # 2c: compensated fused SWAG at the OFFICIAL tolerances — the DS
    # y/t carries + Neumaier increment sums hold rtol 1e-6/atol 1e-9
    # over the whole ~42k-step horizon (plain f32 drifts ~5e-4; the
    # machine check below pins the compensated endpoint to the f64
    # windowed path)
    runc = jax.jit(lambda Y: solve_fused_adams(
        f, (0.0, n_windows * window), Y, rtol=1e-6, atol=1e-9,
        block_members=256, max_steps=400_000, compensated=True))
    dtc, outc = time_tpu(runc, Y0f, reps=2)
    stc = np.asarray(outc[1])
    assert np.all(stc == 1)
    dcomp = float(np.max(np.abs(np.asarray(outc[0])
                                - np.asarray(yref))))
    assert dcomp < 5e-6, f"compensated fused SWAG drift: {dcomp}"
    print(f"2c VdP mu=1e3 fused-SWAG compensated x{B} (t=20, rtol "
          f"1e-6/atol 1e-9): tpu {dtc:7.2f} s, endpoint |d| vs f64 "
          f"{dcomp:.1e}")

    # 2d: MID-SIZE systems (the n ~ 16-512 hole: too big for the
    # row-unrolled kernel, below sharding scale) — 256-state
    # method-of-lines heat ensemble, states on the lane axis.  The
    # XLA twin runs the same problem through the device driver.
    from extensisq_tpu.ops.fused_adams_grid import solve_fused_adams_grid
    ngr = 256
    Dg, dxg = 0.01, 1.0 / 256

    def heat_g(t, y):
        return Dg * (jnp.roll(y, 1, -1) + jnp.roll(y, -1, -1)
                     - 2.0 * y) / dxg ** 2

    def heat_v(t, y):
        return Dg * (jnp.roll(y, 1) + jnp.roll(y, -1)
                     - 2.0 * y) / dxg ** 2

    Bg = 32
    xg = np.linspace(0, 1, ngr, endpoint=False)
    amps = np.linspace(0.5, 1.5, Bg)
    YG = (amps[:, None] * np.sin(2 * np.pi * xg)[None, :]
          + 0.3 * np.cos(4 * np.pi * xg)[None, :]).astype(np.float32)
    rung = jax.jit(lambda Y: solve_fused_adams_grid(
        heat_g, (0.0, 0.25), Y, rtol=1e-4, atol=1e-6, k_max=6,
        block_members=32))
    dtg, outg = time_tpu(rung, YG, reps=3)
    assert np.all(np.asarray(outg[1]) == 1)
    nsg = int(np.asarray(outg[2]).max())
    runx = jax.jit(lambda Y: solve_ensemble(
        heat_v, (0.0, 0.25), Y, method=SWAG, rtol=1e-4, atol=1e-6,
        k_max=6))
    dtx2, outx2 = time_tpu(runx, jnp.asarray(YG, jnp.float64),
                           reps=3)
    assert bool(np.all(np.asarray(outx2.status) == 1))
    dg = float(np.max(np.abs(np.asarray(outg[0])
                             - np.asarray(outx2.y))))
    assert dg < 1e-3, f"grid SWAG endpoint drift vs XLA: {dg}"
    print(f"2d heat-MoL n={ngr} SWAG x{Bg}: fused-grid {dtg*1e3:7.1f}"
          f" ms ({nsg} steps) vs XLA device path {dtx2*1e3:7.1f} ms "
          f"({dtx2/dtg:4.1f}x); endpoint |d| {dg:.1e}")

    print(f"2 VdP mu=1e3 SWAG x{B} (t=20): tpu {dt:7.1f} s | "
          f"scipy-1core ~{sc:6.1f} s | speedup {sc/dt:7.0f}x "
          f"(~{steps} steps/member)")
    return {"2_xla_windowed_s": dt, "2_speedup_vs_scipy": sc / dt,
            "2b_fused_rtol1e-4_s": dtf,
            "2c_fused_compensated_rtol1e-6_s": dtc,
            "2c_endpoint_d_vs_f64": dcomp,
            "2d_grid_swag_fused_ms": dtg * 1e3,
            "2d_grid_swag_xla_ms": dtx2 * 1e3,
            "2d_grid_swag_speedup": dtx2 / dtg}


def config3():
    """Kepler orbits, Fi5N RKN, 2048 members"""
    B = 2048
    ecc = np.linspace(0.1, 0.7, B)
    y0 = np.stack([1 - ecc, np.zeros(B), np.zeros(B),
                   np.sqrt((1 + ecc) / (1 - ecc))], axis=1)

    def f(t, y):
        r2 = y[0] ** 2 + y[1] ** 2
        a = -r2 ** -1.5
        return jnp.stack([y[2], y[3], a * y[0], a * y[1]])

    run = jax.jit(lambda Y: solve_ensemble(
        f, (0.0, 2 * np.pi), Y, method=Fi5N, rtol=1e-9, atol=1e-12))
    dt, out = time_tpu(run, jnp.asarray(y0))
    assert bool(jnp.all(out.status == 1))
    sc = time_scipy(
        lambda t, y: [y[2], y[3],
                      -(y[0]**2 + y[1]**2) ** -1.5 * y[0],
                      -(y[0]**2 + y[1]**2) ** -1.5 * y[1]],
        (0, 2 * np.pi), y0, "Fi5N", 16, B, 1e-9, 1e-12)
    print(f"3 Kepler Fi5N x{B}:       tpu {dt*1e3:7.1f} ms | "
          f"scipy-1core ~{sc:6.1f} s | speedup {sc/dt:7.0f}x")
    dt3 = dt

    # Pleiades: 7 bodies, 28 states, perturbed-IC ensemble; the
    # oscillatory-problem method CFMR7osc on the first-order form
    Bp = 512
    masses = jnp.arange(1.0, 8.0)
    q0 = np.array([3, 3, -1, -3, 2, -2, 2,
                   3, -3, 2, 0, 0, -4, 4], dtype=float)
    v0 = np.array([0, 0, 0, 0, 0, 1.75, -1.5,
                   0, 0, 0, -1.25, 1, 0, 0], dtype=float)

    def accel(q):
        x, ya = q[:7], q[7:]
        dx = x[None, :] - x[:, None]
        dy = ya[None, :] - ya[:, None]
        r2 = dx * dx + dy * dy + jnp.eye(7)
        w = masses[None, :] * r2 ** -1.5 * (1.0 - jnp.eye(7))
        return jnp.concatenate([(w * dx).sum(1), (w * dy).sum(1)])

    def fpl(t, y):
        return jnp.concatenate([y[14:], accel(y[:14])])

    rng = np.random.RandomState(1)
    Y0p = jnp.asarray(np.concatenate([q0, v0])[None, :]
                      + 1e-3 * rng.randn(Bp, 28))
    runp = jax.jit(lambda Y: solve_ensemble(
        fpl, (0.0, 3.0), Y, method=CFMR7osc, rtol=1e-9, atol=1e-12))
    dt, out = time_tpu(runp, Y0p, reps=2)
    assert bool(jnp.all(out.status == 1))
    print(f"3b Pleiades CFMR7osc x{Bp}: tpu {dt*1e3:7.1f} ms "
          f"({int(out.nsteps.max())} steps max)")

    # fused single-kernel RKN (mixed precision) on the Kepler ensemble
    from extensisq_tpu.ops import solve_fused_rkn

    def acc2(t, u, v):
        r2 = u[0] ** 2 + u[1] ** 2
        aa = -r2 ** -1.5
        return jnp.stack([aa * u[0], aa * u[1]])

    runf = jax.jit(lambda Y: solve_fused_rkn(
        acc2, (0.0, 2 * np.pi), Y, method=Fi5N, rtol=1e-7, atol=1e-9,
        compensated=True))
    dtf, outf = time_tpu(runf, jnp.asarray(y0), reps=5)
    assert bool(jnp.all(outf[1] == 1))
    print(f"3c Kepler fused-RKN x{B} (rtol 1e-7): tpu {dtf*1e3:7.1f} ms")
    return {"3_kepler_tpu_ms": dt3 * 1e3, "3b_pleiades_tpu_ms": dt * 1e3,
            "3c_fused_rkn_ms": dtf * 1e3}


def config4():
    """Robertson stiff, Kv3I ESDIRK with batched Newton, 512 members"""
    B = 512

    def f(t, y, k1):
        return jnp.stack([-k1 * y[0] + 1e4 * y[1] * y[2],
                          k1 * y[0] - 1e4 * y[1] * y[2]
                          - 3e7 * y[1] ** 2,
                          3e7 * y[1] ** 2])

    k1s = jnp.asarray(np.linspace(0.03, 0.05, B))
    Y0 = jnp.tile(jnp.array([1.0, 0.0, 0.0]), (B, 1))
    run = jax.jit(lambda Y, K: solve_ensemble(
        f, (0.0, 1e6), Y, params_batch=K, method=Kv3I, rtol=1e-6,
        atol=1e-8))
    dt, out = time_tpu(run, Y0, k1s, reps=2)
    assert bool(jnp.all(out.status == 1))
    sc = time_scipy(
        lambda t, y: [-0.04 * y[0] + 1e4 * y[1] * y[2],
                      0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                      3e7 * y[1] ** 2],
        (0, 1e6), np.asarray(Y0), "Kv3I", 2, B, 1e-6, 1e-8)
    print(f"4 Robertson Kv3I x{B}:     tpu {dt*1e3:7.1f} ms | "
          f"scipy-1core ~{sc:6.1f} s | speedup {sc/dt:7.0f}x")

    # 4a-fused: the same Robertson ensemble entirely in one kernel
    # (f32 fast path at rtol 1e-4; endpoint agrees with the reference
    # implementation to ~4e-5 rel at t=1e6, 172 vs 174 steps)
    from extensisq_tpu.ops.fused_esdirk import solve_fused_esdirk

    def rob_rows(t, y):
        return jnp.stack([-0.04 * y[0] + 1e4 * y[1] * y[2],
                          0.04 * y[0] - 1e4 * y[1] * y[2]
                          - 3e7 * y[1] ** 2,
                          3e7 * y[1] ** 2])

    Y0f = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (B, 1))
    Y0f[:, 0] = np.linspace(0.9, 1.1, B)
    runf = jax.jit(lambda Y: solve_fused_esdirk(
        rob_rows, (0.0, 1e6), Y, method=Kv3I, rtol=1e-4, atol=1e-8,
        block_members=512))
    dtf, outf = time_tpu(runf, Y0f, reps=3)
    assert np.all(np.asarray(outf[1]) == 1)
    print(f"4a-fused Robertson x{B} (rtol 1e-4, t=1e6): "
          f"tpu {dtf*1e3:7.1f} ms "
          f"({int(np.asarray(outf[2]).max())} steps max)")
    dtf4a = dtf

    # index-1 Cartesian pendulum DAE ensemble, Kv3I + mass matrix:
    # state (x, y, vx, vy, lam), M = diag(1,1,1,1,0); the algebraic row
    # is the twice-differentiated length constraint.  (TRBDF2 is
    # marginal on this problem in the reference too: its FD-Jacobian
    # default rejects it and the analytic-jac run needs ~93k evals.)
    Bd = 256
    gg = 9.81
    Md = jnp.diag(jnp.array([1.0, 1.0, 1.0, 1.0, 0.0]))

    def pend(t, s, theta0):
        x, ya, vx, vy, lam = s
        return jnp.stack([
            vx, vy, -lam * x, -lam * ya - gg,
            vx ** 2 + vy ** 2 - lam * (x ** 2 + ya ** 2) - gg * ya])

    th = jnp.asarray(np.linspace(0.2, 1.2, Bd))
    Y0d = jnp.stack([jnp.sin(th), -jnp.cos(th),
                     jnp.zeros(Bd), jnp.zeros(Bd),
                     jnp.zeros(Bd)], axis=1)
    rund = jax.jit(lambda Y, T: solve_ensemble(
        pend, (0.0, 10.0), Y, params_batch=T, method=Kv3I,
        rtol=1e-6, atol=1e-8, M=Md))
    dt, out = time_tpu(rund, Y0d, th, reps=2)
    assert bool(jnp.all(out.status == 1))
    # length constraint preserved to tolerance at the endpoint
    drift = jnp.abs(out.y[:, 0] ** 2 + out.y[:, 1] ** 2 - 1.0).max()
    print(f"4b pendulum DAE Kv3I x{Bd}:  tpu {dt*1e3:7.1f} ms "
          f"({int(out.nsteps.max())} steps max, "
          f"|len drift| {float(drift):.1e})")

    # 4c: the fused Pallas implicit kernel on the same DAE ensemble
    # (f32 fast path at rtol 1e-4): whole per-stage-Newton integration
    # in ONE kernel; round-1's dispatch-bound 2.7 ms/step becomes
    # ~0.06 ms/step on v5e
    from extensisq_tpu.ops.fused_esdirk import solve_fused_esdirk
    from extensisq_tpu.steppers import build_stepper
    from extensisq_tpu.types import IVPParams

    def pend_rows(t, s):
        x, ya, vx, vy, lam = s[0], s[1], s[2], s[3], s[4]
        return jnp.stack([
            vx, vy, -lam * x, -lam * ya - gg,
            vx ** 2 + vy ** 2 - lam * (x ** 2 + ya ** 2) - gg * ya])

    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        stepper = build_stepper(Kv3I, pend_rows, 5, np.float64,
                                M=np.asarray(Md))
    pinit = IVPParams(t_bound=jnp.asarray(10.0),
                      direction=jnp.asarray(1.0),
                      rtol=jnp.asarray(1e-4), atol=jnp.asarray(1e-6),
                      max_step=jnp.asarray(np.inf))
    sts = jax.vmap(lambda y: stepper.init(0.0, y, pinit))(Y0d)
    Y0f = np.asarray(sts.y).astype(np.float32)
    YP0f = np.asarray(sts.yp).astype(np.float32)
    runf = jax.jit(lambda Y, YP: solve_fused_esdirk(
        pend_rows, (0.0, 10.0), Y, method=Kv3I,
        M=np.diag(np.asarray(Md)), yp0_batch=YP, rtol=1e-4,
        atol=1e-6, block_members=256))
    dtf, outf = time_tpu(runf, Y0f, YP0f, reps=3)
    stf = np.asarray(outf[1])
    nsf = np.asarray(outf[2])
    assert np.all(stf == 1)
    print(f"4c pendulum DAE fused x{Bd} (rtol 1e-4): "
          f"tpu {dtf*1e3:7.1f} ms "
          f"({dtf / max(int(nsf.max()), 1) * 1e3:.3f} ms/step, "
          f"{int(nsf.max())} steps max)")

    # 4d: MID-SIZE implicit (the last layout hole): 128-state stiff
    # periodic reaction-diffusion ensemble through the grid-layout
    # ESDIRK kernel (tridiagonal Newton matrices via in-kernel
    # 4-color JVPs + parallel cyclic reduction) vs the XLA device
    # path.  Step counts inflate ~3x at the large-h steady-state tail
    # (f32 RHS cancellation noise caps h there) — the endpoint stays
    # at tolerance scale and the wall-time win is what ships.
    from extensisq_tpu.ops import solve_fused_esdirk_grid
    ngr2 = 128
    Dg2, dxg2 = 1.0, 1.0 / 128

    def rdiff_g(t, y):
        return (Dg2 * (jnp.roll(y, 1, -1) + jnp.roll(y, -1, -1)
                       - 2.0 * y) / dxg2 ** 2 + y * y * (1.0 - y))

    def rdiff_v(t, y):
        return (Dg2 * (jnp.roll(y, 1) + jnp.roll(y, -1)
                       - 2.0 * y) / dxg2 ** 2 + y * y * (1.0 - y))

    Bg2 = 32
    xg2 = np.linspace(0, 1, ngr2, endpoint=False)
    amps2 = np.linspace(0.3, 0.7, Bg2)
    YG2 = (0.5 + 0.4 * amps2[:, None]
           * np.sin(2 * np.pi * xg2)[None, :]).astype(np.float32)
    rung2 = jax.jit(lambda Y: solve_fused_esdirk_grid(
        rdiff_g, (0.0, 1.0), Y, rtol=1e-4, atol=1e-6,
        block_members=32))
    dtg2, outg2 = time_tpu(rung2, YG2, reps=3)
    assert np.all(np.asarray(outg2[1]) == 1)
    runx2 = jax.jit(lambda Y: solve_ensemble(
        rdiff_v, (0.0, 1.0), Y, method=Kv3I, rtol=1e-4, atol=1e-6))
    dtx2, outx2 = time_tpu(runx2, jnp.asarray(YG2, jnp.float64),
                           reps=3)
    assert bool(np.all(np.asarray(outx2.status) == 1))
    dg2 = float(np.max(np.abs(np.asarray(outg2[0])
                              - np.asarray(outx2.y))))
    assert dg2 < 1e-3, f"grid ESDIRK endpoint drift vs XLA: {dg2}"
    print(f"4d rdiff-MoL n={ngr2} Kv3I x{Bg2}: fused-grid "
          f"{dtg2*1e3:7.1f} ms vs XLA device path {dtx2*1e3:7.1f} ms "
          f"({dtx2/dtg2:4.1f}x); endpoint |d| {dg2:.1e}")
    return {"4a_fused_robertson_ms": dtf4a * 1e3,
            "4c_fused_dae_ms_per_step":
                dtf / max(int(nsf.max()), 1) * 1e3,
            "4d_grid_esdirk_fused_ms": dtg2 * 1e3,
            "4d_grid_esdirk_xla_ms": dtx2 * 1e3,
            "4d_grid_esdirk_speedup": dtx2 / dtg2}


def config5():
    """2-D Brusselator: one 131k-state system + a 10k-member ensemble
    of 2k-state systems, SSV2stab"""
    shape = (256, 256)
    rhs = brusselator_2d_rhs(shape, alpha=0.02)
    rho = brusselator_rho_bound(shape, alpha=0.02)
    ny, nx = shape
    xg, yg = np.meshgrid(np.linspace(0, 1, nx, endpoint=False),
                         np.linspace(0, 1, ny, endpoint=False))
    u0 = 1.0 + 0.5 * np.sin(2 * np.pi * xg) * np.sin(2 * np.pi * yg)
    v0 = 3.0 + 0.1 * np.cos(2 * np.pi * xg)
    y0 = jnp.asarray(np.concatenate([u0.ravel(), v0.ravel()]))
    run = jax.jit(lambda y: solve(rhs, (0.0, 1.0), y, method=SSV2stab,
                                  rtol=1e-4, atol=1e-7, rho_jac=rho))
    dt, out = time_tpu(run, y0)
    dt5a = dt
    n_states = 2 * ny * nx
    print(f"5a Brusselator {n_states} states: tpu {dt*1e3:7.1f} ms "
          f"({int(out.nsteps)} steps, {int(out.nfev)} evals)")

    # ensemble: 10k members of a 32x32 grid (20.9M states total)
    shape_s = (32, 32)
    rhs_s = brusselator_2d_rhs(shape_s, alpha=0.02)
    rho_s = brusselator_rho_bound(shape_s, alpha=0.02)
    Bm = 10_000
    xg, yg = np.meshgrid(np.linspace(0, 1, 32, endpoint=False),
                         np.linspace(0, 1, 32, endpoint=False))
    amps = np.linspace(0.1, 0.6, Bm)
    u0 = 1.0 + amps[:, None] * np.sin(2 * np.pi * xg).ravel()[None, :]
    v0 = 3.0 + 0.1 * np.cos(2 * np.pi * xg).ravel()[None, :] \
        * np.ones((Bm, 1))
    Y0 = jnp.asarray(np.concatenate([u0, v0], axis=1))
    runE = jax.jit(lambda Y: solve_ensemble(
        rhs_s, (0.0, 1.0), Y, method=SSV2stab, rtol=1e-4, atol=1e-7,
        rho_jac=rho_s))
    dt, out = time_tpu(runE, Y0, reps=2)
    print(f"5b Brusselator x{Bm} (2048 states each): "
          f"tpu {dt*1e3:7.1f} ms, all ok: "
          f"{bool(jnp.all(out.status == 1))}")

    # fused single-kernel RKC on the 131k-state grid (f32 fast path)
    from extensisq_tpu.ops.fused_rkc import solve_fused_rkc, roll

    def fun_grid(t, uv):
        lap = (roll(uv, 1, 1) + roll(uv, -1, 1)
               + roll(uv, 1, 2) + roll(uv, -1, 2) - 4.0 * uv) / dx_g**2
        u, v = uv[0], uv[1]
        uv2 = u * u * v
        return jnp.stack([1.0 + uv2 - 4.0 * u + 0.02 * lap[0],
                          3.0 * u - uv2 + 0.02 * lap[1]])

    dx_g = 1.0 / nx
    rho_c = 8.0 * 0.02 / dx_g**2 + 2.0 + 3.0
    # re-derive the 256x256 grid ICs (u0/v0 were reassigned by 5b)
    xg2, yg2 = np.meshgrid(np.linspace(0, 1, nx, endpoint=False),
                           np.linspace(0, 1, ny, endpoint=False))
    u0g = 1.0 + 0.5 * np.sin(2 * np.pi * xg2) * np.sin(2 * np.pi * yg2)
    v0g = 3.0 + 0.1 * np.cos(2 * np.pi * xg2)
    Y0g = jnp.asarray(np.stack([u0g, v0g]), jnp.float32)
    runF = jax.jit(lambda y: solve_fused_rkc(
        fun_grid, (0.0, 1.0), y, rho_c, rtol=1e-4, atol=1e-7))
    dtf, outf = time_tpu(runF, Y0g, reps=5)
    print(f"5c Brusselator {n_states} states fused-RKC: "
          f"tpu {dtf*1e3:7.1f} ms ({int(outf[2])} steps, "
          f"{int(outf[3])} evals, status {int(outf[1])})")

    # 5d: member-batched fused RKC — an ensemble of PDE grids in ONE
    # pallas_call (one member-block per program instance), vs the
    # vmapped XLA f64 ensemble path on identical problems
    from extensisq_tpu.ops.fused_rkc import solve_fused_rkc_ensemble

    nyE, nxE = 64, 128
    dxE = 1.0 / nxE
    ME = 64
    TFE = 4.0

    def fun_gridE(t, uv, p):
        lap = (roll(uv, 1, 1) + roll(uv, -1, 1)
               + roll(uv, 1, 2) + roll(uv, -1, 2) - 4.0 * uv) / dxE**2
        u, v = uv[0], uv[1]
        uv2 = u * u * v
        return jnp.stack([1.0 + uv2 - (p[0] + 1.0) * u + 0.02 * lap[0],
                          p[0] * u - uv2 + 0.02 * lap[1]])

    rhoE = 8.0 * 0.02 / dxE**2 + 2.0 + 3.5
    xgE = np.linspace(0, 1, nxE, endpoint=False)
    BsE = np.linspace(2.8, 3.5, ME)
    Y0E = np.zeros((ME, 2, nyE, nxE))
    for i in range(ME):
        Y0E[i, 0] = 1.0 + 0.3 * np.sin(2 * np.pi * xgE)[None, :]
        Y0E[i, 1] = 3.0
    parE = jnp.asarray(BsE[:, None], jnp.float32)
    Y0Ej = jnp.asarray(Y0E, jnp.float32)
    runE4 = jax.jit(lambda Y, P: solve_fused_rkc_ensemble(
        fun_gridE, (0.0, TFE), Y, rhoE, params=P,
        rtol=1e-4, atol=1e-7))
    dte, oute = time_tpu(runE4, Y0Ej, parE, reps=5)
    nsE = np.asarray(oute[2])
    okE = bool(np.all(np.asarray(oute[1]) == 1))

    def fun_flatE(t, y, Bv):
        return fun_gridE(t, y.reshape(2, nyE, nxE), (Bv,)).reshape(-1)

    runEX = jax.jit(lambda Y: solve_ensemble(
        fun_flatE, (0.0, TFE), Y,
        params_batch=jnp.asarray(BsE, jnp.float64),
        method=SSV2stab, rtol=1e-4, atol=1e-7,
        rho_jac=lambda t, y: rhoE))
    dtx, outx = time_tpu(runEX, jnp.asarray(Y0E.reshape(ME, -1),
                                            jnp.float64), reps=5)
    nsX = np.asarray(outx.nsteps)
    dstep = int(np.max(np.abs(nsE - nsX)))
    errE = float(np.max(np.abs(
        np.asarray(oute[0]).reshape(ME, -1) - np.asarray(outx.y))))
    # machine-checked: fused per-member step counts track the XLA
    # path.  The residual divergence is NOT a layout defect: the
    # ensemble kernel is BIT-IDENTICAL to the single-grid kernel on
    # this problem (r4 root-cause experiment + the standing bit-parity
    # test), so what remains is f32-vs-f64 trajectory separation —
    # this Brusselator sits in its oscillatory limit-cycle regime
    # (B up to 3.5 > 1 + A^2), where the f32 RHS rounding (~6e-8
    # relative per eval; the DS carry protects y, but fun sees f32
    # arguments) is amplified exponentially over the t=4 horizon.
    # At 32x64/4-member scale the same config measures <= 1 step /
    # 4e-5.  Gates are measured(5 / 1.06e-3)+margin, NOT loose caps.
    assert dstep <= 6, f"fused/XLA step counts diverged: {dstep}"
    assert errE < 2e-3, f"fused/XLA endpoint drift: {errE}"
    print(f"5d Brusselator ensemble x{ME} ({2*nyE*nxE} states each, "
          f"t=0..{TFE}) fused: {dte*1e3:7.1f} ms vs XLA {dtx*1e3:7.1f}"
          f" ms ({dtx/dte:4.1f}x); all ok {okE}, step max|d| {dstep}, "
          f"endpoint |d| {errE:.1e}")

    # 5e: the same fused ensemble with NO spectral-radius bound — the
    # in-kernel nonlinear power iteration (sommeijer.py:331-398)
    # estimates rho per member; machine-checked against 5d's bounded
    # run (the estimate must not change the integration materially)
    runE5 = jax.jit(lambda Y, P: solve_fused_rkc_ensemble(
        fun_gridE, (0.0, TFE), Y, None, params=P,
        rtol=1e-4, atol=1e-7))
    dtp, outp = time_tpu(runE5, Y0Ej, parE, reps=5)
    okP = bool(np.all(np.asarray(outp[1]) == 1))
    nsP = np.asarray(outp[2])
    nsigP = int(np.asarray(outp[4]).max())
    dstepP = int(np.max(np.abs(nsP - nsX)))
    errP = float(np.max(np.abs(
        np.asarray(outp[0]).reshape(ME, -1) - np.asarray(outx.y))))
    assert okP, "power-iteration ensemble did not finish"
    assert dstepP <= 8, f"power-rho step counts diverged: {dstepP}"
    assert errP < 2e-3, f"power-rho endpoint drift: {errP}"
    print(f"5e same ensemble, IN-KERNEL power-iteration rho: "
          f"{dtp*1e3:7.1f} ms (max nfesig {nsigP}); step max|d| "
          f"{dstepP}, endpoint |d| {errP:.1e}")
    return {"5a_xla_131k_ms": dt5a * 1e3, "5c_fused_131k_ms": dtf * 1e3,
            "5d_fused_ms": dte * 1e3, "5d_xla_ms": dtx * 1e3,
            "5d_speedup": dtx / dte, "5d_step_maxd": dstep,
            "5d_endpoint_d": errE,
            "5e_fused_power_rho_ms": dtp * 1e3,
            "5e_step_maxd": dstepP, "5e_max_nfesig": nsigP}


def config6():
    """LONG-HORIZON mid-size grid kernels: the per-step asymptote.

    The short-horizon grid rows (1b: 1.5x, 2d: 1.9x) are launch-bound
    (~25-30 ms tunnel launch vs ~450-step trajectories); the per-step
    claim in docs/PARITY.md is 5-20x.  This config integrates >= 5k
    steps so launch overhead amortizes below 10% and the end-to-end
    number IS the per-step ratio.  The XLA twin runs the identical
    problem through the device driver, windowed (one jit call per
    window, state fed forward) to stay inside the remote worker's
    watchdog — the same pattern config2 uses for the f64 path.
    """
    from extensisq_tpu.ops import solve_fused_erk_grid
    from extensisq_tpu.ops.fused_adams_grid import solve_fused_adams_grid

    # 6a: advection-reaction (Fisher) n=256, BS5, t=0..30 — CFL-bound
    # explicit stepping, ~5-6k accepted steps per member.
    ngr, cg = 256, 1.0

    def fisher_g(t, y):
        return (-cg * (y - jnp.roll(y, 1, -1)) * ngr
                + y * (1.0 - y))

    Bg = 64
    xg = np.linspace(0, 1, ngr, endpoint=False)
    amps = np.linspace(0.2, 0.8, Bg)
    YG = (0.5 + 0.4 * amps[:, None]
          * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)
    # t=0..42: real Mosaic takes ~129 steps/unit here (interpret-mode
    # calibration said ~190 — hardware fma contraction walks a
    # slightly larger CFL-plateau step), so 30 units only gave 3858
    # steps; 42 clears the >= 5000 amortization gate on hardware.
    TF6 = 42.0
    rung = jax.jit(lambda Y: solve_fused_erk_grid(
        fisher_g, (0.0, TF6), Y, rtol=1e-5, atol=1e-7,
        block_members=64, max_steps=40_000))
    dtg, outg = time_tpu(rung, YG, reps=2)
    assert np.all(np.asarray(outg[1]) == 1)
    nsg = int(np.asarray(outg[2]).max())
    assert nsg >= 5000, f"6a horizon too short to amortize: {nsg}"

    nwin = 6

    def xla_win(Y):
        out = solve_windowed(fisher_g, (0.0, TF6), Y, nwin,
                             method=BS5, ensemble=True, rtol=1e-5,
                             atol=1e-7, max_steps=40_000)
        assert bool(jnp.all(out.status == 1))
        return out

    xla_win(jnp.asarray(YG, jnp.float64))          # warm-up
    t0 = time.perf_counter()
    outx = xla_win(jnp.asarray(YG, jnp.float64))
    np.asarray(outx.y)
    dtx = time.perf_counter() - t0
    dgr = float(np.max(np.abs(np.asarray(outg[0])
                              - np.asarray(outx.y))))
    # f32 kernel vs f64 driver over a 30-unit reaction horizon; the
    # solution is an O(1) travelling front, drift stays ~1e-3
    assert dgr < 5e-3, f"6a long-horizon endpoint drift: {dgr}"
    print(f"6a advec-MoL n={ngr} BS5 x{Bg} t=0..{TF6:.0f} "
          f"({nsg} steps): fused-grid {dtg*1e3:8.1f} ms "
          f"({dtg / nsg * 1e6:.0f} us/step) vs XLA windowed "
          f"{dtx*1e3:8.1f} ms ({dtx/dtg:4.1f}x); endpoint |d| "
          f"{dgr:.1e}")

    # 6b: heat MoL n=256, SWAG, t=0..6 — high-order Adams on a
    # diffusion spectrum, >= 5k steps.
    Dg, dxg = 0.01, 1.0 / 256

    def heat_g(t, y):
        return Dg * (jnp.roll(y, 1, -1) + jnp.roll(y, -1, -1)
                     - 2.0 * y) / dxg ** 2

    Bh = 32
    ampsh = np.linspace(0.5, 1.5, Bh)
    YH = (ampsh[:, None] * np.sin(2 * np.pi * xg)[None, :]
          + 0.3 * np.cos(4 * np.pi * xg)[None, :]).astype(np.float32)
    TH6 = 6.0
    runh = jax.jit(lambda Y: solve_fused_adams_grid(
        heat_g, (0.0, TH6), Y, rtol=1e-4, atol=1e-6, k_max=6,
        block_members=32, max_steps=60_000))
    dth, outh = time_tpu(runh, YH, reps=2)
    assert np.all(np.asarray(outh[1]) == 1)
    nsh = int(np.asarray(outh[2]).max())
    assert nsh >= 5000, f"6b horizon too short to amortize: {nsh}"

    def xla_winh(Y):
        out = solve_windowed(heat_g, (0.0, TH6), Y, nwin,
                             method=SWAG, ensemble=True, rtol=1e-4,
                             atol=1e-6, k_max=6, max_steps=60_000)
        assert bool(jnp.all(out.status == 1))
        return out

    xla_winh(jnp.asarray(YH, jnp.float64))         # warm-up
    t0 = time.perf_counter()
    outhx = xla_winh(jnp.asarray(YH, jnp.float64))
    np.asarray(outhx.y)
    dthx = time.perf_counter() - t0
    dh = float(np.max(np.abs(np.asarray(outh[0])
                             - np.asarray(outhx.y))))
    assert dh < 1e-3, f"6b long-horizon endpoint drift: {dh}"
    print(f"6b heat-MoL n={ngr} SWAG x{Bh} t=0..{TH6:.0f} "
          f"({nsh} steps): fused-grid {dth*1e3:8.1f} ms "
          f"({dth / nsh * 1e6:.0f} us/step) vs XLA windowed "
          f"{dthx*1e3:8.1f} ms ({dthx/dth:4.1f}x); endpoint |d| "
          f"{dh:.1e}")
    return {"6a_long_grid_erk_fused_ms": dtg * 1e3,
            "6a_long_grid_erk_xla_ms": dtx * 1e3,
            "6a_long_grid_erk_speedup": dtx / dtg,
            "6a_steps": nsg,
            "6b_long_grid_swag_fused_ms": dth * 1e3,
            "6b_long_grid_swag_xla_ms": dthx * 1e3,
            "6b_long_grid_swag_speedup": dthx / dth,
            "6b_steps": nsh}


def config7():
    """Differentiable + sharded fused paths: stiff fused forward
    sensitivities (the reference's flagship sens workload,
    /root/reference/tests/test_sens.py Robertson/CVODES), jax.grad
    through solve_fused_final, and solve_fused_sharded counter parity
    on a real-device mesh."""
    from extensisq_tpu.ops.fused_sens import (solve_fused_sens,
                                              solve_fused_final)
    from extensisq_tpu.ops import solve_fused
    from extensisq_tpu.parallel import solve_fused_sharded
    from jax.sharding import Mesh

    # 7a: fused STIFF forward sensitivities — a 512-member Robertson
    # k1-sweep through the simultaneous-corrector ESDIRK kernel
    # (block_base Newton: ONE 3x3 factor solves the 1+3 variational
    # blocks).  Spot member 0 (nominal params) against the CVODES
    # table, column-scaled.
    Bs = 512

    def rob_rows(t, y, p):
        k1, k2, k3 = p
        r1 = k1 * y[0]
        r2 = k2 * y[1] * y[2]
        r3 = k3 * y[1] * y[1]
        return jnp.stack([-r1 + r2, r1 - r2 - r3, r3])

    y0b = np.tile([1.0, 0.0, 0.0], (Bs, 1)).astype(np.float32)
    pb = np.tile([0.04, 1e4, 3e7], (Bs, 1)).astype(np.float32)
    pb[:, 0] = np.linspace(0.04, 0.05, Bs)
    pb[0, 0] = 0.04
    runs = jax.jit(lambda Y, P: solve_fused_sens(
        rob_rows, (0.0, 0.4), Y, params=P, method=TRBDF2,
        rtol=1e-4, atol=1e-8, block_members=512))
    dts, outs = time_tpu(runs, jnp.asarray(y0b), jnp.asarray(pb),
                         reps=3)
    yf, Sp = np.asarray(outs[0]), np.asarray(outs[1])
    assert np.all(np.asarray(outs[3]) == 1)
    cv_yf = np.array([9.8517e-01, 3.3864e-05, 1.4794e-02])
    cv_S = np.array([[-3.5595e-01, 9.5428e-08, -1.5832e-11],
                     [3.9026e-04, -2.1310e-10, -5.2900e-13],
                     [3.5556e-01, -9.5215e-08, 1.6361e-11]])
    np.testing.assert_allclose(yf[0], cv_yf, rtol=5e-4)
    for j in range(3):
        sc7 = np.abs(cv_S[:, j]).max()
        np.testing.assert_allclose(Sp[0, :, j] / sc7, cv_S[:, j] / sc7,
                                   atol=2e-2)
    print(f"7a fused stiff sens Robertson x{Bs} (TRBDF2, 3 params): "
          f"tpu {dts*1e3:7.1f} ms; member 0 matches CVODES table")

    # 7b: value-and-grad of a whole VdP mu-sweep — TWO fused kernel
    # launches (primal + augmented backward) for dL/dy0 and dL/dmu of
    # every member; FD spot check on the fused primal itself.
    Bg = 1024

    def vdp_rows(t, y, p):
        return jnp.stack([y[1], p[0] * (1 - y[0] ** 2) * y[1] - y[0]])

    Y0g = np.zeros((Bg, 2), np.float32)
    Y0g[:, 0] = 2.0
    mus = np.linspace(1.0, 2.0, Bg).astype(np.float32)[:, None]

    def loss(Y, P):
        yf7 = solve_fused_final(vdp_rows, (0.0, 3.0), Y, P, None,
                                1e-5, 1e-8, 100_000, 1024, False,
                                False)
        return jnp.sum(yf7[:, 0])

    rung = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    dtg7, outg7 = time_tpu(rung, jnp.asarray(Y0g), jnp.asarray(mus),
                           reps=3)
    val7, (gy07, gp7) = outg7
    assert np.all(np.isfinite(np.asarray(gy07)))
    eps7 = np.float32(1e-2)
    kwf = dict(rtol=1e-6, atol=1e-9, block_members=1024)
    from extensisq_tpu.ops import solve_fused_erk
    yp7 = solve_fused_erk(vdp_rows, (0.0, 3.0), Y0g,
                          params=mus + eps7, **kwf)[0]
    ym7 = solve_fused_erk(vdp_rows, (0.0, 3.0), Y0g,
                          params=mus - eps7, **kwf)[0]
    fd7 = (np.asarray(yp7)[:, 0] - np.asarray(ym7)[:, 0]) / (2 * eps7)
    dgrad = float(np.max(np.abs(np.asarray(gp7)[:, 0] - fd7)))
    assert dgrad < 5e-3, f"fused grad vs FD drift: {dgrad}"
    print(f"7b value_and_grad VdP x{Bg} (2 fused launches): "
          f"tpu {dtg7*1e3:7.1f} ms; dL/dmu vs FD |d| {dgrad:.1e}")

    # 7c: solve_fused_sharded on a REAL device mesh (every attached
    # chip) — integer outputs (status/counters) must exactly match the
    # unsharded kernel (the same invariant the 8-device CPU dryrun
    # pins, here on hardware).  With ONE attached chip the row is
    # DEGENERATE (no cross-device sharding exercised — the 8-device
    # CPU dryrun covers that); the artifact records the device count
    # and a degenerate flag so the row cannot be over-read.
    devs = jax.devices()
    if Bg % len(devs):
        devs = devs[:1]          # non-dividing mesh: fall back, flag
    bm7 = Bg // len(devs)
    if bm7 % 128:
        bm7 = max(128, (bm7 // 128) * 128)
    mesh7 = Mesh(np.array(devs), ("m",))
    runsh = lambda Y, P: solve_fused_sharded(
        vdp_rows, (0.0, 3.0), Y, mesh7, params=P,
        rtol=1e-5, atol=1e-8, block_members=bm7)
    dtsh, outsh = time_tpu(runsh, jnp.asarray(Y0g), jnp.asarray(mus),
                           reps=3)
    outu = jax.jit(lambda Y, P: solve_fused(
        vdp_rows, (0.0, 3.0), Y, params=P, rtol=1e-5, atol=1e-8,
        block_members=bm7))(jnp.asarray(Y0g), jnp.asarray(mus))
    assert np.array_equal(np.asarray(outsh[1]), np.asarray(outu[1]))
    assert np.array_equal(np.asarray(outsh[2]), np.asarray(outu[2]))
    assert np.array_equal(np.asarray(outsh[3]), np.asarray(outu[3]))
    degen = len(devs) < 2
    print(f"7c sharded fused VdP x{Bg} over {len(devs)} device(s)"
          f"{' [DEGENERATE: single-device mesh]' if degen else ''}: "
          f"tpu {dtsh*1e3:7.1f} ms; counters exactly match unsharded")
    return {"7a_fused_stiff_sens_ms": dts * 1e3,
            "7b_fused_value_and_grad_ms": dtg7 * 1e3,
            "7b_grad_vs_fd_maxd": dgrad,
            "7c_sharded_fused_ms": dtsh * 1e3,
            "7c_mesh_devices": len(devs),
            "7c_single_device_degenerate": degen}


def config7d():
    """Grid-layout continuous adjoint at MoL scale: jax.grad of an
    objective over a 128-state reaction-diffusion ensemble through the
    fused GRID forward (in-kernel dense recording) + the f64 XLA
    backward — the PDE-constrained-optimization gradient workload
    (reference sensitivity.py:220-387 at MoL width)."""
    from extensisq_tpu.ops import solve_fused_adjoint

    ngr, Bg = 128, 8
    x = np.linspace(0, 1, ngr, endpoint=False)
    Y0 = np.tile((0.5 + 0.3 * np.sin(2 * np.pi * x))
                 .astype(np.float32), (Bg, 1))
    rates = np.linspace(0.8, 1.6, Bg).astype(np.float32)[:, None]
    D = 0.02 * ngr * ngr

    def fisher_g(t, y, p):
        return (jnp.roll(y, 1, -1) - 2.0 * y
                + jnp.roll(y, -1, -1)) * D + p[0] * y * (1.0 - y)

    def loss(Y, P):
        yf = solve_fused_adjoint(fisher_g, (0.0, 0.25), Y, P, None,
                                 1e-5, 1e-8, 100_000, 8, False, 400,
                                 None, None, None, "grid")
        return jnp.sum(jnp.mean(yf, axis=1))

    gfn = jax.grad(loss, argnums=(0, 1))
    dt, (gy0, gp) = time_tpu(lambda Y: gfn(Y, jnp.asarray(rates)),
                             jnp.asarray(Y0), reps=2)
    assert bool(np.all(np.isfinite(np.asarray(gy0))))
    # dL/dr sanity vs central FD of the fused grid primal
    from extensisq_tpu.ops import solve_fused_erk_grid
    eps = np.float32(2e-3)
    kw = dict(rtol=1e-7, atol=1e-10, block_members=8)
    yp = solve_fused_erk_grid(fisher_g, (0.0, 0.25), Y0,
                              params=rates + eps, **kw)[0]
    ym = solve_fused_erk_grid(fisher_g, (0.0, 0.25), Y0,
                              params=rates - eps, **kw)[0]
    fd = (np.asarray(yp).mean(1) - np.asarray(ym).mean(1)) / (2 * eps)
    dgr = float(np.abs(np.asarray(gp)[:, 0] - fd).max()
                / max(np.abs(fd).max(), 1e-12))
    assert dgr < 5e-3, f"grid adjoint grad vs FD rel drift: {dgr}"
    print(f"7d grid adjoint n={ngr} x{Bg}: value+grad {dt*1e3:7.1f} "
          f"ms; dL/dr vs FD rel |d| {dgr:.1e}")
    return {"7d_grid_adjoint_ms": dt * 1e3}


def config8():
    """Banded vs dense ESDIRK Newton linear algebra at scale
    (VERDICT r4 item 4a; reference splu route common.py:1756-1776):
    Medazko reaction-transport at n = 512/1024/2048 through the
    device driver, KC4I, bands=True (block cyclic reduction, true
    f64) vs the dense path.  Gates are measured-with-margin from the
    2026-08-21 v5e calibration: 2.06x @ 512, 3.74x @ 1024 (warm
    wall), counters identical."""
    from extensisq_tpu.methods import KC4I
    from extensisq_tpu.problems import medazko

    out = {}
    gates = {512: 1.6, 1024: 2.8, 2048: 3.0}
    for N in (256, 512, 1024):
        P = medazko(N)
        n = 2 * N

        def run_one(kw):
            run = jax.jit(lambda y0: solve(
                P.rhs, (0.0, 20.0), y0, method=KC4I, rtol=1e-3,
                atol=1e-6, max_steps=400,
                jac_sparsity=P.jac_sparsity, **kw))
            y0 = jnp.asarray(P.y0)
            r = run(y0); np.asarray(r.y)          # compile + load
            t0 = time.perf_counter()
            r = run(y0); np.asarray(r.y)
            return time.perf_counter() - t0, r

        tb, rb = run_one(dict(bands=True))
        td, rd = run_one({})
        assert int(rb.status) == 1 and int(rd.status) == 1
        ds = abs(int(rb.nsteps) - int(rd.nsteps))
        assert ds <= (0 if n <= 512 else 1),             f"banded vs dense step drift at n={n}: {ds}"
        dy = float(np.max(np.abs(np.asarray(rb.y, np.float64)
                                 - np.asarray(rd.y, np.float64))))
        # BCR and dense LU round differently; with identical step
        # sequences both land within the solve tolerance (atol 1e-6;
        # measured 1.1e-7 @ 512, 1.6e-6 @ 1024 on v5e)
        assert dy < 1e-5, f"banded vs dense endpoint at n={n}: {dy}"
        sp = td / tb
        assert sp > gates[n],             f"banded speedup at n={n}: {sp:.2f} < {gates[n]}"
        print(f"8 Medazko n={n} KC4I: banded {tb:5.2f} s vs dense "
              f"{td:5.2f} s ({sp:4.2f}x); steps {int(rb.nsteps)}, "
              f"endpoint |d| {dy:.1e}")
        out[f"8_banded_n{n}_s"] = tb
        out[f"8_dense_n{n}_s"] = td
        out[f"8_banded_n{n}_speedup"] = sp
    return out


if __name__ == "__main__":
    import json

    as_json = "--json" in sys.argv
    metrics = {}
    failures = []
    for cfg in (config1, config3, config5, config4, config2, config6,
                config7, config7d, config8):
        try:
            r = cfg()
            if isinstance(r, dict):
                metrics.update({k: v for k, v in r.items()
                                if v is not None})
        except Exception as e:   # keep the report going
            print(f"{cfg.__name__} FAILED: {type(e).__name__}: {e}")
            failures.append(f"{cfg.__name__}: {type(e).__name__}: {e}")
    if as_json:
        import subprocess
        from datetime import date
        try:
            commit = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                cwd=os.path.dirname(__file__), capture_output=True,
                text=True).stdout.strip()
        except Exception:  # noqa: BLE001
            commit = "unknown"
        out = {"commit": commit, "date": date.today().isoformat(),
               "device": str(jax.devices()[0]),
               "metrics": metrics, "failures": failures}
        path = os.path.join(os.path.dirname(__file__), "..",
                            "BENCH_full.json")
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1, default=float)
        print(json.dumps(out, default=float))
    if failures:
        sys.exit(1)
