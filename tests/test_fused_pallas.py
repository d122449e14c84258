"""Fused Pallas ensemble solver (interpret mode on CPU; the compiled
path runs on TPU hardware)."""
import jax
import numpy as np
import pytest
import jax.numpy as jnp

from extensisq_tpu.ops import solve_fused_erk
from extensisq_tpu import BS5, CK5, solve_ensemble

pytestmark = pytest.mark.slow  # interpret-mode fused kernels: multi-minute


def vdp(t, y):
    return jnp.stack([y[1], 3.0 * (1 - y[0] ** 2) * y[1] - y[0]])


def test_fused_matches_f64_path():
    B = 256
    Y0 = np.stack([np.linspace(1.5, 2.5, B), np.zeros(B)],
                  axis=1).astype(np.float32)
    y, status, nsteps, nfev = solve_fused_erk(
        vdp, (0.0, 10.0), Y0, method=BS5, rtol=1e-4, atol=1e-6,
        block_members=128, interpret=True)
    assert np.all(np.asarray(status) == 1)
    out = solve_ensemble(vdp, (0.0, 10.0), jnp.asarray(Y0, jnp.float64),
                         method=BS5, rtol=1e-4, atol=1e-6)
    # f32 arithmetic at rtol 1e-4: trajectories agree to ~1e-2 absolute
    assert np.max(np.abs(np.asarray(y) - np.asarray(out.y))) < 5e-2
    # comparable work
    assert abs(int(nsteps.sum()) - int(out.nsteps.sum())) \
        < 0.3 * int(out.nsteps.sum())


def test_fused_nonfsal_method():
    B = 128
    Y0 = np.stack([np.linspace(0.5, 1.5, B), np.ones(B)],
                  axis=1).astype(np.float32)

    def linear(t, y):
        return jnp.stack([y[1], -y[0]])

    y, status, nsteps, nfev = solve_fused_erk(
        linear, (0.0, 3.14159265), Y0, method=CK5, rtol=1e-5, atol=1e-7,
        block_members=128, interpret=True)

    assert np.all(np.asarray(status) == 1)
    # rotate by pi: (x, v) -> (-x, -v) approximately
    exact = -np.asarray(Y0)
    assert np.max(np.abs(np.asarray(y) - exact)) < 1e-3


def test_fused_overflow_member_isolated():
    """A diverging member must not poison its neighbours (bit-level
    NaN sanitization)."""
    B = 128
    x0 = np.full(B, 0.1, np.float32)
    x0[7] = 1e18                      # this member blows up in f32
    Y0 = np.stack([x0, np.zeros(B, np.float32)], axis=1)

    def cubic(t, y):
        return jnp.stack([y[1], y[0] ** 3])

    y, status, nsteps, nfev = solve_fused_erk(
        cubic, (0.0, 1.0), Y0, method=BS5, rtol=1e-4, atol=1e-6,
        block_members=128, interpret=True, max_steps=2000)
    status = np.asarray(status)
    ok = status == 1
    assert not ok[7]                   # the bad member failed...
    assert ok.sum() == B - 1           # ...every other member finished
    assert np.all(np.isfinite(np.asarray(y)[ok]))


def test_fused_compensated_tight_tolerances():
    """Mixed-precision mode at rtol 1e-6/atol 1e-9 over 50 oscillator
    periods: global accuracy must match the f64 path's (plain f32
    drifts ~3.5x worse through accumulation round-off)."""
    def ho(t, y):
        return jnp.stack([y[1], -y[0]])

    B = 256
    Y0 = jnp.asarray(np.stack([np.ones(B), np.zeros(B)], axis=1))
    T = 50 * 2 * np.pi
    exact = np.array([1.0, 0.0])
    ref = jax.jit(lambda Y: solve_ensemble(
        ho, (0.0, T), Y, method=BS5, rtol=1e-6, atol=1e-9))(Y0)
    err_ref = float(jnp.max(jnp.abs(ref.y - exact)))

    yf, st, ns, nf = solve_fused_erk(
        ho, (0.0, T), Y0, method=BS5, rtol=1e-6, atol=1e-9,
        block_members=256, interpret=True, compensated=True)
    assert bool(jnp.all(st == 1))
    err = float(jnp.max(jnp.abs(np.asarray(yf) - exact)))
    assert err < 2.0 * err_ref
    # step counts track the f64 path (error estimates are clean)
    assert abs(float(ns.mean()) - float(ref.nsteps.mean())) < 10.0


def test_fused_rkn_kepler():
    """Fused RKN kernel (accelerations-only stages, h^2 A / h Ap
    updates): tolerance-level agreement with the f64 XLA path and
    tracking step counts on a Kepler ensemble."""
    from extensisq_tpu.ops import solve_fused_rkn
    from extensisq_tpu import Fi5N

    B = 128
    ecc = np.linspace(0.1, 0.5, B)
    Y0 = jnp.asarray(np.stack([1 - ecc, np.zeros(B), np.zeros(B),
                               np.sqrt((1 + ecc) / (1 - ecc))], axis=1))

    def acc(t, u, v):
        r2 = u[0] ** 2 + u[1] ** 2
        a = -r2 ** -1.5
        return jnp.stack([a * u[0], a * u[1]])

    def f_full(t, y):
        r2 = y[0] ** 2 + y[1] ** 2
        a = -r2 ** -1.5
        return jnp.stack([y[2], y[3], a * y[0], a * y[1]])

    ref = jax.jit(lambda Y: solve_ensemble(
        f_full, (0.0, 2 * np.pi), Y, method=Fi5N, rtol=1e-5,
        atol=1e-7))(Y0)
    for comp in (False, True):
        yf, st, ns, nf = solve_fused_rkn(
            acc, (0.0, 2 * np.pi), Y0, method=Fi5N, rtol=1e-5,
            atol=1e-7, block_members=128, interpret=True,
            compensated=comp)
        assert bool(jnp.all(st == 1))
        assert float(jnp.max(jnp.abs(np.asarray(yf)
                                     - np.asarray(ref.y)))) < 5e-4
        assert abs(float(ns.mean()) - float(ref.nsteps.mean())) < 3.0


def test_fused_rkn_t_eval():
    """Snapshot trajectories from inside the fused RKN kernel:
    partitioned cubic Hermite (u rows with derivative v, v rows with
    the carried acceleration) matching the XLA f64 driver's dense
    output at tolerance scale (common.py:766-790 form)."""
    from extensisq_tpu.ops import solve_fused_rkn
    from extensisq_tpu import Fi5N

    B = 128
    ecc = np.linspace(0.1, 0.5, B)
    Y0 = jnp.asarray(np.stack([1 - ecc, np.zeros(B), np.zeros(B),
                               np.sqrt((1 + ecc) / (1 - ecc))], axis=1))

    def acc(t, u, v):
        r2 = u[0] ** 2 + u[1] ** 2
        a = -r2 ** -1.5
        return jnp.stack([a * u[0], a * u[1]])

    def f_full(t, y):
        r2 = y[0] ** 2 + y[1] ** 2
        a = -r2 ** -1.5
        return jnp.stack([y[2], y[3], a * y[0], a * y[1]])

    tq = np.array([0.0, 1.5, np.pi, 5.0, 2 * np.pi], np.float32)
    yf, st, ns, nf, yq = solve_fused_rkn(
        acc, (0.0, 2 * np.pi), Y0, method=Fi5N, rtol=1e-5,
        atol=1e-7, block_members=128, interpret=True, t_eval=tq)
    assert bool(jnp.all(st == 1))
    yq = np.asarray(yq)
    assert yq.shape == (5, B, 4)
    out = solve_ensemble(f_full, (0.0, 2 * np.pi),
                         jnp.asarray(Y0, jnp.float64), method=Fi5N,
                         rtol=1e-5, atol=1e-7,
                         t_eval=jnp.asarray(tq, jnp.float64))
    yx = np.asarray(out.y_eval)
    for i in range(len(tq)):
        assert np.max(np.abs(yq[i] - yx[:, i])) < 2e-3, i
    np.testing.assert_array_equal(yq[0], np.asarray(Y0, np.float32))
    assert np.max(np.abs(yq[-1] - np.asarray(yf))) < 1e-6


def test_fused_rkc_brusselator():
    """Fused RKC kernel (in-kernel Chebyshev stage loop with runtime
    stage count, rho bound, H220 controller): in-tolerance agreement
    with the f64 XLA path on a 2-D Brusselator grid."""
    from extensisq_tpu.ops.fused_rkc import solve_fused_rkc, roll
    from extensisq_tpu import solve, SSV2stab

    ny, nx = 32, 32
    A_, B_, alpha = 1.0, 3.0, 0.02
    dx = 1.0 / nx

    def fun_grid(t, uv):
        lap = (roll(uv, 1, 1) + roll(uv, -1, 1)
               + roll(uv, 1, 2) + roll(uv, -1, 2) - 4.0 * uv) / dx ** 2
        u, v = uv[0], uv[1]
        uv2 = u * u * v
        return jnp.stack([A_ + uv2 - (B_ + 1.0) * u + alpha * lap[0],
                          B_ * u - uv2 + alpha * lap[1]])

    rho = 8.0 * alpha / dx ** 2 + 2.0 + B_
    xg = np.linspace(0, 1, nx, endpoint=False)
    u0 = 1.0 + 0.3 * np.sin(2 * np.pi * xg)[None, :] * np.ones((ny, 1))
    v0 = 3.0 * np.ones((ny, nx))
    Y0 = jnp.asarray(np.stack([u0, v0]), jnp.float32)

    yf, st, ns, nf = solve_fused_rkc(fun_grid, (0.0, 1.0), Y0, rho,
                                     rtol=1e-4, atol=1e-7,
                                     interpret=True)
    assert int(st) == 1

    def fun_flat(t, y):
        return fun_grid(t, y.reshape(2, ny, nx)).reshape(-1)

    out = jax.jit(lambda y: solve(
        fun_flat, (0.0, 1.0), y, method=SSV2stab, rtol=1e-4, atol=1e-7,
        rho_jac=lambda t, y_: rho))(
            jnp.asarray(np.stack([u0, v0]).reshape(-1)))
    d = float(jnp.max(jnp.abs(np.asarray(yf).reshape(-1)
                              - np.asarray(out.y))))
    assert d < 1e-3


def test_fused_rkc_double_single_stage_cap():
    """The DS stage recurrence lifts the f32 internal-stability cap:
    at rtol 1e-5 (old f32 cap mmax=3 => ~5x the steps, out-of-tolerance
    error) the fused kernel now matches the f64 path's step count and
    stays inside tolerance (round-1 VERDICT item 4)."""
    from extensisq_tpu.ops.fused_rkc import solve_fused_rkc, roll
    from extensisq_tpu import solve, SSV2stab

    ny, nx = 32, 32
    A_, B_, alpha = 1.0, 3.0, 0.02
    dx = 1.0 / nx

    def fun_grid(t, uv):
        lap = (roll(uv, 1, 1) + roll(uv, -1, 1)
               + roll(uv, 1, 2) + roll(uv, -1, 2) - 4.0 * uv) / dx ** 2
        u, v = uv[0], uv[1]
        uv2 = u * u * v
        return jnp.stack([A_ + uv2 - (B_ + 1.0) * u + alpha * lap[0],
                          B_ * u - uv2 + alpha * lap[1]])

    rho = 8.0 * alpha / dx ** 2 + 2.0 + B_
    xg = np.linspace(0, 1, nx, endpoint=False)
    u0 = 1.0 + 0.3 * np.sin(2 * np.pi * xg)[None, :] * np.ones((ny, 1))
    v0 = 3.0 * np.ones((ny, nx))
    Y0 = jnp.asarray(np.stack([u0, v0]), jnp.float32)

    yf, st, ns, nf = solve_fused_rkc(fun_grid, (0.0, 1.0), Y0, rho,
                                     rtol=1e-5, atol=1e-8,
                                     interpret=True)
    assert int(st) == 1
    out = jax.jit(lambda y: solve(
        lambda t, y_: fun_grid(t, y_.reshape(2, ny, nx)).reshape(-1),
        (0.0, 1.0), y, method=SSV2stab, rtol=1e-5, atol=1e-8,
        rho_jac=lambda t, y_: rho))(
            jnp.asarray(np.stack([u0, v0]).reshape(-1), jnp.float64))
    assert int(ns) <= 1.2 * int(out.nsteps)
    err = float(jnp.max(jnp.abs(
        np.asarray(yf).reshape(-1) - np.asarray(out.y))))
    assert err < 3e-5        # within ~3x tolerance of the f64 result


def test_fused_erk_t_eval():
    """Snapshot trajectories from INSIDE the fused ERK kernel: rows
    cubic-Hermite interpolated as each member crosses each t_eval
    point, matching the XLA driver's dense output within tolerance
    (round-2 VERDICT item 3; common.py:766-790 semantics)."""
    from extensisq_tpu.ops.fused_erk import solve_fused_erk
    from extensisq_tpu import solve_ensemble, BS5

    def vdp5(t, y):
        return jnp.stack([y[1], 5.0 * (1 - y[0] ** 2) * y[1] - y[0]])

    B = 128
    Y0 = np.stack([np.linspace(1.9, 2.1, B), np.zeros(B)],
                  axis=1).astype(np.float32)
    tq = np.array([0.0, 0.5, 1.1, 1.7, 2.0], np.float32)
    y, st, ns, nf, yq = solve_fused_erk(
        vdp5, (0.0, 2.0), Y0, rtol=1e-4, atol=1e-6,
        block_members=128, interpret=True, t_eval=tq)
    assert np.all(np.asarray(st) == 1)
    yq = np.asarray(yq)
    assert yq.shape == (5, B, 2)
    out = solve_ensemble(vdp5, (0.0, 2.0), jnp.asarray(Y0, jnp.float64),
                         method=BS5, rtol=1e-4, atol=1e-6,
                         t_eval=jnp.asarray(tq, jnp.float64))
    yx = np.asarray(out.y_eval)
    for i in range(len(tq)):
        assert np.max(np.abs(yq[i] - yx[:, i])) < 2e-3, i
    # the t0 row is exactly y0; the tf row is the kernel's endpoint
    np.testing.assert_array_equal(yq[0], Y0)
    assert np.max(np.abs(yq[-1] - np.asarray(y))) < 1e-6


def test_fused_rkc_t_eval():
    """Snapshots from inside the fused RKC kernel (pending-index
    dynamic writes on the scalar-t path) match the XLA driver's
    cubic-Hermite dense output (sommeijer.py:400-406)."""
    from extensisq_tpu.ops.fused_rkc import solve_fused_rkc, roll
    from extensisq_tpu import solve, SSV2stab

    ny, nx = 32, 32
    A_, B_, alpha = 1.0, 3.0, 0.02
    dx = 1.0 / nx

    def fun_grid(t, uv):
        lap = (roll(uv, 1, 1) + roll(uv, -1, 1)
               + roll(uv, 1, 2) + roll(uv, -1, 2) - 4.0 * uv) / dx ** 2
        u, v = uv[0], uv[1]
        uv2 = u * u * v
        return jnp.stack([A_ + uv2 - (B_ + 1.0) * u + alpha * lap[0],
                          B_ * u - uv2 + alpha * lap[1]])

    rho = 8.0 * alpha / dx ** 2 + 2.0 + B_
    xg = np.linspace(0, 1, nx, endpoint=False)
    u0 = 1.0 + 0.3 * np.sin(2 * np.pi * xg)[None, :] * np.ones((ny, 1))
    v0 = 3.0 * np.ones((ny, nx))
    Y0 = jnp.asarray(np.stack([u0, v0]), jnp.float32)
    tq = np.array([0.0, 0.1, 0.25, 0.5, 0.77, 1.0], np.float32)

    yf, st, ns, nf, yq = solve_fused_rkc(
        fun_grid, (0.0, 1.0), Y0, rho, rtol=1e-4, atol=1e-7,
        interpret=True, t_eval=tq)
    assert int(st) == 1
    yq = np.asarray(yq)

    def fun_flat(t, y):
        return fun_grid(t, y.reshape(2, ny, nx)).reshape(-1)

    out = jax.jit(lambda y: solve(
        fun_flat, (0.0, 1.0), y, method=SSV2stab, rtol=1e-4,
        atol=1e-7, rho_jac=lambda t, y_: rho,
        t_eval=jnp.asarray(tq, jnp.float64)))(
            jnp.asarray(np.stack([u0, v0]).reshape(-1)))
    yx = np.asarray(out.y_eval)
    for i in range(len(tq)):
        assert np.max(np.abs(yq[i].reshape(-1) - yx[i])) < 1e-4, i
    assert np.max(np.abs(yq[-1] - np.asarray(yf))) < 1e-6


def test_fused_rkc_member_ensemble():
    """Member-batched fused RKC (BASELINE config 5): an ensemble of
    PDE grids in ONE pallas_call, members on the Pallas grid dimension
    with fully independent per-member adaptive control.  Each member
    must be BIT-IDENTICAL to the single-grid kernel run on it alone,
    and step counts must track the f64 XLA ensemble path."""
    from extensisq_tpu.ops.fused_rkc import (solve_fused_rkc,
                                             solve_fused_rkc_ensemble,
                                             roll)
    from extensisq_tpu import solve_ensemble, SSV2stab

    ny, nx = 16, 128
    A_, alpha = 1.0, 0.02
    dx = 1.0 / nx

    def fun_grid(t, uv, p):
        lap = (roll(uv, 1, 1) + roll(uv, -1, 1)
               + roll(uv, 1, 2) + roll(uv, -1, 2) - 4.0 * uv) / dx ** 2
        u, v = uv[0], uv[1]
        uv2 = u * u * v
        return jnp.stack([A_ + uv2 - (p[0] + 1.0) * u + alpha * lap[0],
                          p[0] * u - uv2 + alpha * lap[1]])

    rho = 8.0 * alpha / dx ** 2 + 2.0 + 3.5
    M = 4
    xg = np.linspace(0, 1, nx, endpoint=False)
    Bs = np.linspace(2.8, 3.5, M).astype(np.float32)
    Y0 = np.zeros((M, 2, ny, nx), np.float32)
    for i in range(M):
        Y0[i, 0] = 1.0 + 0.3 * np.sin(2 * np.pi * xg)[None, :]
        Y0[i, 1] = 3.0
    params = Bs[:, None]

    yf, st, ns, nf = solve_fused_rkc_ensemble(
        fun_grid, (0.0, 1.0), Y0, rho, params=params,
        rtol=1e-4, atol=1e-7, interpret=True)
    assert np.all(np.asarray(st) == 1)
    # per-member adaptivity is genuinely independent
    assert len(set(int(x) for x in np.asarray(ns))) > 1

    # bit-identity with the single-grid kernel, member by member
    for i in range(M):
        p = (float(Bs[i]),)
        y1, s1, n1, f1 = solve_fused_rkc(
            lambda t, y: fun_grid(t, y, p), (0.0, 1.0), Y0[i], rho,
            rtol=1e-4, atol=1e-7, interpret=True)
        assert int(s1) == int(st[i])
        assert int(n1) == int(ns[i])
        assert int(f1) == int(nf[i])
        assert np.array_equal(np.asarray(y1), np.asarray(yf[i]))

    # step counts track the f64 XLA ensemble path
    def fun_flat(t, y, Bv):
        return fun_grid(t, y.reshape(2, ny, nx), (Bv,)).reshape(-1)

    out = solve_ensemble(
        fun_flat, (0.0, 1.0),
        jnp.asarray(Y0.reshape(M, -1), jnp.float64),
        params_batch=jnp.asarray(Bs, jnp.float64),
        method=SSV2stab, rtol=1e-4, atol=1e-7,
        rho_jac=lambda t, y: rho)
    nsx = np.asarray(out.nsteps)
    assert np.max(np.abs(np.asarray(ns) - nsx)) <= 2
    err = np.max(np.abs(np.asarray(yf).reshape(M, -1)
                        - np.asarray(out.y)))
    assert err < 1e-3


def test_fused_esdirk_robertson():
    """Fused implicit kernel (per-stage batched Newton, unrolled
    pivoted Gaussian solves): in-tolerance agreement and comparable
    work vs the XLA f64 ESDIRK path on a stiff ensemble."""
    from extensisq_tpu.ops.fused_esdirk import solve_fused_esdirk
    from extensisq_tpu import Kv3I

    def rob(t, y):
        return jnp.stack([-0.04 * y[0] + 1e4 * y[1] * y[2],
                          0.04 * y[0] - 1e4 * y[1] * y[2]
                          - 3e7 * y[1] ** 2,
                          3e7 * y[1] ** 2])

    B = 128
    Y0 = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (B, 1))
    Y0[:, 0] = np.linspace(0.9, 1.1, B)
    y, st, ns, nf = solve_fused_esdirk(rob, (0.0, 10.0), Y0,
                                       method=Kv3I, rtol=1e-4,
                                       atol=1e-8, block_members=128,
                                       interpret=True)
    assert np.all(np.asarray(st) == 1)
    out = solve_ensemble(rob, (0.0, 10.0), jnp.asarray(Y0, jnp.float64),
                         method=Kv3I, rtol=1e-4, atol=1e-8)
    assert np.max(np.abs(np.asarray(y) - np.asarray(out.y))) < 1e-3
    assert abs(int(np.asarray(ns).sum())
               - int(np.asarray(out.nsteps).sum())) \
        < 0.3 * int(np.asarray(out.nsteps).sum())


def test_fused_esdirk_pendulum_dae():
    """Diagonal-mass-matrix DAE in the fused kernel: index-1 pendulum
    ensemble, constraint preserved, agreement with the f64 path."""
    import warnings
    from extensisq_tpu.ops.fused_esdirk import solve_fused_esdirk
    from extensisq_tpu import Kv3I
    from extensisq_tpu.steppers import build_stepper
    from extensisq_tpu.types import IVPParams

    g = 9.81

    def pend(t, s):
        x, ya, vx, vy, lam = s[0], s[1], s[2], s[3], s[4]
        return jnp.stack([vx, vy, -lam * x, -lam * ya - g,
                          vx ** 2 + vy ** 2
                          - lam * (x ** 2 + ya ** 2) - g * ya])

    B = 128
    ths = np.linspace(0.3, 0.7, B)
    Y0 = np.stack([np.sin(ths), -np.cos(ths), np.zeros(B),
                   np.zeros(B), np.zeros(B)], axis=1)
    M = np.diag([1.0, 1.0, 1.0, 1.0, 0.0])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        stepper = build_stepper(Kv3I, pend, 5, np.float64, M=M)
    params = IVPParams(t_bound=jnp.asarray(0.3),
                       direction=jnp.asarray(1.0),
                       rtol=jnp.asarray(1e-4), atol=jnp.asarray(1e-6),
                       max_step=jnp.asarray(np.inf))
    states = jax.vmap(lambda y: stepper.init(0.0, y, params))(
        jnp.asarray(Y0))
    Y0c = np.asarray(states.y).astype(np.float32)
    YP0 = np.asarray(states.yp).astype(np.float32)

    y, st, ns, nf = solve_fused_esdirk(pend, (0.0, 0.3), Y0c,
                                       method=Kv3I, M=np.diag(M),
                                       yp0_batch=YP0, rtol=1e-4,
                                       atol=1e-6, block_members=128,
                                       interpret=True)
    y = np.asarray(y)
    assert np.all(np.asarray(st) == 1)
    out = solve_ensemble(pend, (0.0, 0.3), jnp.asarray(Y0c, jnp.float64),
                         method=Kv3I, M=M, rtol=1e-4, atol=1e-6)
    assert np.max(np.abs(y - np.asarray(out.y))) < 1e-3
    assert np.max(np.abs(y[:, 0] ** 2 + y[:, 1] ** 2 - 1.0)) < 1e-3


def test_fused_adams_vdp():
    """Fused SWAG kernel (hand-tiled dsteps: variable order, PECE,
    phi memory — all in one pallas_call): step-count and endpoint
    agreement with the f64 XLA path."""
    from extensisq_tpu.ops.fused_adams import solve_fused_adams
    from extensisq_tpu import SWAG

    def vdp5(t, y):
        return jnp.stack([y[1], 5.0 * (1 - y[0] ** 2) * y[1] - y[0]])

    B = 128
    Y0 = np.stack([np.linspace(1.9, 2.1, B), np.zeros(B)],
                  axis=1).astype(np.float32)
    y, st, ns, nf = solve_fused_adams(vdp5, (0.0, 2.0), Y0, rtol=1e-4,
                                      atol=1e-6, k_max=6,
                                      block_members=128,
                                      interpret=True)
    assert np.all(np.asarray(st) == 1)
    out = solve_ensemble(vdp5, (0.0, 2.0), jnp.asarray(Y0, jnp.float64),
                         method=SWAG, rtol=1e-4, atol=1e-6, k_max=6)
    assert abs(float(np.asarray(ns).mean())
               - float(np.asarray(out.nsteps).mean())) < 2.0
    assert np.max(np.abs(np.asarray(y) - np.asarray(out.y))) < 1e-3


def _heat_pair(n):
    """Periodic 1-D heat RHS in both conventions: (bm, n) kernel
    (states on lanes) and (n,) XLA-stepper."""
    D, dx = 0.01, 1.0 / n

    def kernel_form(t, y):
        return D * (jnp.roll(y, 1, -1) + jnp.roll(y, -1, -1)
                    - 2.0 * y) / dx ** 2

    def vec_form(t, y):
        return D * (jnp.roll(y, 1) + jnp.roll(y, -1)
                    - 2.0 * y) / dx ** 2

    return kernel_form, vec_form


def _fisher_pair(n):
    """Upwind advection + logistic reaction (Fisher-KPP) in both
    conventions: (bm, n) kernel (states on lanes) and (n,) XLA."""
    c, dx = 1.0, 1.0 / n

    def kernel_form(t, y):
        return -c * (y - jnp.roll(y, 1, -1)) / dx + y * (1.0 - y)

    def vec_form(t, y):
        return -c * (y - jnp.roll(y, 1)) / dx + y * (1.0 - y)

    return kernel_form, vec_form


def test_fused_erk_grid_advection():
    """Mid-size-system fused ERK (states on lanes, members on
    sublanes — fused_erk's n<=8 row-unrolled layout cannot express
    n ~ 16-512): a 128-state advection-reaction MoL ensemble matches
    the XLA f64 path's steps and endpoint at tolerance scale, with
    in-kernel t_eval snapshots."""
    from extensisq_tpu.ops import solve_fused_erk_grid
    from extensisq_tpu import BS5

    n = 128
    kern, vec = _fisher_pair(n)
    B = 16
    xg = np.linspace(0, 1, n, endpoint=False)
    amps = np.linspace(0.2, 0.8, B)
    Y0 = (0.5 + 0.4 * amps[:, None]
          * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)
    tq = np.array([0.0, 0.2, 0.5], np.float32)

    y, st, ns, nf, yq = solve_fused_erk_grid(
        kern, (0.0, 0.5), Y0, rtol=1e-5, atol=1e-7,
        block_members=8, interpret=True, t_eval=tq)
    assert np.all(np.asarray(st) == 1)
    out = solve_ensemble(vec, (0.0, 0.5), jnp.asarray(Y0, jnp.float64),
                         method=BS5, rtol=1e-5, atol=1e-7,
                         t_eval=jnp.asarray(tq, jnp.float64))
    assert np.max(np.abs(np.asarray(y) - np.asarray(out.y))) < 1e-3
    yx = np.asarray(out.y_eval).transpose(1, 0, 2)
    assert np.max(np.abs(np.asarray(yq) - yx)) < 1e-3
    np.testing.assert_array_equal(np.asarray(yq)[0],
                                  np.asarray(Y0, np.float32))
    # step counts in the XLA regime (f32 controller noise only)
    nsf = np.asarray(ns, np.float64)
    nsx = np.asarray(out.nsteps, np.float64)
    assert abs(nsf.mean() - nsx.mean()) < 0.1 * nsx.mean()


def test_fused_erk_grid_compensated():
    """The grid layout inherits fused_erk's mixed-precision mode
    verbatim (shared _run_erk_loop): official tolerances rtol 1e-6 /
    atol 1e-9 hold on a mid-size advection-reaction ensemble."""
    from extensisq_tpu.ops import solve_fused_erk_grid
    from extensisq_tpu import BS5

    n = 128
    kern, vec = _fisher_pair(n)
    B = 8
    xg = np.linspace(0, 1, n, endpoint=False)
    amps = np.linspace(0.2, 0.8, B)
    Y0 = (0.5 + 0.4 * amps[:, None]
          * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)
    y, st, ns, nf = solve_fused_erk_grid(
        kern, (0.0, 0.5), Y0, rtol=1e-6, atol=1e-9,
        block_members=8, interpret=True, compensated=True)
    assert np.all(np.asarray(st) == 1)
    out = solve_ensemble(vec, (0.0, 0.5), jnp.asarray(Y0, jnp.float64),
                         method=BS5, rtol=1e-6, atol=1e-9)
    assert np.max(np.abs(np.asarray(y) - np.asarray(out.y))) < 3e-5
    nsf = np.asarray(ns, np.float64)
    nsx = np.asarray(out.nsteps, np.float64)
    assert abs(nsf.mean() - nsx.mean()) < 0.1 * nsx.mean() + 2.0


def test_fused_adams_grid_heat():
    """Mid-size-system fused SWAG (states on lanes, members on
    sublanes — the layout hole n in 16..512 the row-unrolled kernel
    cannot express): a 128-state method-of-lines heat ensemble lands
    in the XLA f64 path's step regime with a tolerance-scale
    endpoint."""
    from extensisq_tpu.ops import solve_fused_adams_grid
    from extensisq_tpu import SWAG

    n = 128
    kern, vec = _heat_pair(n)
    B = 16
    xg = np.linspace(0, 1, n, endpoint=False)
    amps = np.linspace(0.5, 1.5, B)
    Y0 = (amps[:, None] * np.sin(2 * np.pi * xg)[None, :]
          + 0.3 * np.cos(4 * np.pi * xg)[None, :]).astype(np.float32)

    y, st, ns, nf = solve_fused_adams_grid(
        kern, (0.0, 0.25), Y0, rtol=1e-4, atol=1e-6, k_max=6,
        block_members=8, interpret=True)
    assert np.all(np.asarray(st) == 1)
    out = solve_ensemble(vec, (0.0, 0.25), jnp.asarray(Y0, jnp.float64),
                         method=SWAG, rtol=1e-4, atol=1e-6, k_max=6)
    assert np.max(np.abs(np.asarray(y) - np.asarray(out.y))) < 1e-3
    # step counts in the XLA regime (f32 controller noise drifts a
    # few percent on a ~100-step stability-limited solve)
    nsf = np.asarray(ns, np.float64)
    nsx = np.asarray(out.nsteps, np.float64)
    assert abs(nsf.mean() - nsx.mean()) < 0.15 * nsx.mean()
    # per-member nfev consistency: PECE => nfev ~ 2*nsteps + failures
    assert np.all(np.asarray(nf) >= 2 * np.asarray(ns))


def test_fused_adams_grid_t_eval():
    """In-kernel snapshot trajectories from the mid-size SWAG kernel
    match the XLA driver's dense output at tolerance scale."""
    from extensisq_tpu.ops import solve_fused_adams_grid
    from extensisq_tpu import SWAG

    n = 128
    kern, vec = _heat_pair(n)
    B = 8
    xg = np.linspace(0, 1, n, endpoint=False)
    amps = np.linspace(0.8, 1.2, B)
    Y0 = (amps[:, None]
          * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)
    tq = np.array([0.0, 0.05, 0.1, 0.2, 0.25], np.float32)

    y, st, ns, nf, yq = solve_fused_adams_grid(
        kern, (0.0, 0.25), Y0, rtol=1e-4, atol=1e-6, k_max=6,
        block_members=8, interpret=True, t_eval=tq)
    assert np.all(np.asarray(st) == 1)
    yq = np.asarray(yq)
    assert yq.shape == (5, B, n)
    out = solve_ensemble(vec, (0.0, 0.25), jnp.asarray(Y0, jnp.float64),
                         method=SWAG, rtol=1e-4, atol=1e-6, k_max=6,
                         t_eval=jnp.asarray(tq, jnp.float64))
    yx = np.asarray(out.y_eval)
    for i in range(len(tq)):
        assert np.max(np.abs(yq[i] - yx[:, i])) < 2e-3, i
    np.testing.assert_array_equal(yq[0], Y0)
    assert np.max(np.abs(yq[-1] - np.asarray(y))) < 1e-6


def test_fused_adams_t_eval():
    """Snapshot trajectories from INSIDE the fused SWAG kernel: cubic
    Hermite from the carried step-endpoint (y, yp) pairs as each
    member crosses each point (common.py:766-790 evaluation form),
    matching the XLA f64 driver's dintp dense output at tolerance
    scale."""
    from extensisq_tpu.ops.fused_adams import solve_fused_adams
    from extensisq_tpu import SWAG

    def vdp5(t, y):
        return jnp.stack([y[1], 5.0 * (1 - y[0] ** 2) * y[1] - y[0]])

    B = 128
    Y0 = np.stack([np.linspace(1.9, 2.1, B), np.zeros(B)],
                  axis=1).astype(np.float32)
    tq = np.array([0.0, 0.5, 1.1, 1.7, 2.0], np.float32)
    y, st, ns, nf, yq = solve_fused_adams(
        vdp5, (0.0, 2.0), Y0, rtol=1e-4, atol=1e-6, k_max=6,
        block_members=128, interpret=True, t_eval=tq)
    assert np.all(np.asarray(st) == 1)
    yq = np.asarray(yq)
    assert yq.shape == (5, B, 2)
    out = solve_ensemble(vdp5, (0.0, 2.0), jnp.asarray(Y0, jnp.float64),
                         method=SWAG, rtol=1e-4, atol=1e-6, k_max=6,
                         t_eval=jnp.asarray(tq, jnp.float64))
    yx = np.asarray(out.y_eval)
    for i in range(len(tq)):
        assert np.max(np.abs(yq[i] - yx[:, i])) < 5e-3, i
    # the t0 row is exactly y0; the tf row is the kernel's endpoint
    np.testing.assert_array_equal(yq[0], Y0)
    assert np.max(np.abs(yq[-1] - np.asarray(y))) < 1e-6


def test_fused_esdirk_hidden_mass_matrix():
    """Dense/hidden mass matrices in the fused implicit kernel via
    host-side SVD pre-rotation (round-2 VERDICT item 6): the Kaps DAE
    scrambled by the reference's A/B transform (test_DAE.py:137-162
    analog — M_hidden = A M B^-1 is full and rank-deficient).  The
    kernel solves the rotated diagonal system S w' = U^T f(t, V w)
    and un-rotates the result."""
    from extensisq_tpu.ops.fused_esdirk import solve_fused_esdirk
    from extensisq_tpu import solve_ivp, TRBDF2

    rng = np.random.RandomState(1)
    A = rng.rand(2, 2)
    B = rng.rand(2, 2)
    Binv = np.linalg.inv(B)
    M_dense = np.array([[0.0, 0.0], [0.0, 1.0]])
    M_hidden = A @ M_dense @ Binv

    def kaps_rows(t, z):
        # hidden variables z = B y
        y0 = Binv[0, 0] * z[0] + Binv[0, 1] * z[1]
        y1 = Binv[1, 0] * z[0] + Binv[1, 1] * z[1]
        f0 = -y0 + y1 * y1
        f1 = y0 - y1 - y1 * y1
        return jnp.stack([A[0, 0] * f0 + A[0, 1] * f1,
                          A[1, 0] * f0 + A[1, 1] * f1])

    z0 = B @ np.array([1.0, 1.0])
    zp0 = B @ np.array([-2.0, -1.0])
    Z0 = np.tile(z0.astype(np.float32), (128, 1))
    ZP0 = np.tile(zp0.astype(np.float32), (128, 1))

    zf, st, ns, nf = solve_fused_esdirk(
        kaps_rows, (0.0, 1.0), Z0, method=TRBDF2, M=M_hidden,
        yp0_batch=ZP0, rtol=1e-4, atol=1e-6, interpret=True,
        block_members=128)
    assert np.all(np.asarray(st) == 1)
    yf = Binv @ np.asarray(zf[0])
    exact = np.array([np.exp(-1.0) ** 2, np.exp(-1.0)])
    # tolerance-scale global error (the XLA hidden-M run lands at
    # ~1.0e-4 on the same setup)
    assert np.max(np.abs(yf - exact)) < 3e-4, yf

    # step counts in the regime of the XLA hidden-M solve (same
    # first_step: the fused DAE path keeps the fixed 0.01*span default
    # — the in-kernel h_start is plain-ODE only — and a 13-step solve
    # is startup-dominated)
    r = solve_ivp(lambda t, z: kaps_rows(t, z), (0.0, 1.0),
                  jnp.asarray(z0), method=TRBDF2, M=M_hidden,
                  rtol=1e-4, atol=1e-6, first_step=0.01)
    assert r.success
    assert abs(int(ns[0]) - r.nsteps) <= max(4, 0.35 * r.nsteps)


def test_fused_esdirk_t_eval():
    """Snapshot trajectories from INSIDE the fused implicit kernel:
    cubic Hermite from the carried step-endpoint (y, y') pairs (y' is
    the stiffly accurate last stage), matching the XLA f64 driver's
    dense output within tolerance on Robertson (common.py:766-790
    evaluation semantics)."""
    from extensisq_tpu.ops.fused_esdirk import solve_fused_esdirk
    from extensisq_tpu import solve_ensemble, Kv3I

    def rob(t, y):
        r1 = -0.04 * y[0] + 1e4 * y[1] * y[2]
        r3 = 3e7 * y[1] * y[1]
        return jnp.stack([r1, -r1 - r3, r3])

    B = 128
    Y0 = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (B, 1))
    tq = np.array([0.0, 1.0, 10.0, 100.0, 1e3], np.float32)
    y, st, ns, nf, yq = solve_fused_esdirk(
        rob, (0.0, 1e3), Y0, method=Kv3I, rtol=1e-4, atol=1e-8,
        block_members=128, interpret=True, t_eval=tq)
    assert np.all(np.asarray(st) == 1)
    yq = np.asarray(yq)
    assert yq.shape == (5, B, 3)
    out = solve_ensemble(rob, (0.0, 1e3),
                         jnp.asarray(Y0, jnp.float64), method=Kv3I,
                         rtol=1e-4, atol=1e-8,
                         t_eval=jnp.asarray(tq, jnp.float64))
    yx = np.asarray(out.y_eval)
    for i in range(len(tq)):
        assert np.max(np.abs(yq[i] - yx[:, i])) < 3e-3, i
    # the small intermediate species to its own scale
    assert np.max(np.abs(yq[1:, :, 1] - yx[:, 1:, 1].swapaxes(0, 1))
                  ) < 3e-6
    # the t0 row is exactly y0; the tf row is the kernel's endpoint
    np.testing.assert_array_equal(yq[0], Y0)
    assert np.max(np.abs(yq[-1] - np.asarray(y))) < 1e-6


def test_fused_esdirk_compensated_official_tol():
    """Compensated fused ESDIRK (DS y-carry + Neumaier stage dots over
    the z rows) holds the official tolerances (rtol 1e-6 / atol 1e-9)
    on Robertson to t=1e5: endpoint within ~2x tolerance of the f64
    XLA path (round-2 VERDICT item 2)."""
    from extensisq_tpu.ops.fused_esdirk import solve_fused_esdirk
    from extensisq_tpu import solve, Kv3I

    def rob_rows(t, y):
        r1 = -0.04 * y[0] + 1e4 * y[1] * y[2]
        r3 = 3e7 * y[1] * y[1]
        return jnp.stack([r1, -r1 - r3, r3])

    Y0 = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (128, 1))
    yf, st, ns, nf = solve_fused_esdirk(
        rob_rows, (0.0, 1e5), Y0, rtol=1e-6, atol=1e-9,
        interpret=True, block_members=128, compensated=True)
    assert np.all(np.asarray(st) == 1)

    out = jax.jit(lambda y: solve(
        rob_rows, (0.0, 1e5), y, method=Kv3I, rtol=1e-6, atol=1e-9,
        max_steps=20000))(jnp.asarray([1.0, 0.0, 0.0], jnp.float64))
    yx = np.asarray(out.y)
    rel = np.abs(np.asarray(yf[0]) - yx) / np.maximum(np.abs(yx),
                                                      1e-12)
    assert np.max(rel) < 5e-6, rel
    # step counts in the same regime as the f64 path
    assert abs(int(ns[0]) - int(out.nsteps)) < 0.15 * int(out.nsteps)


def test_fused_adams_compensated():
    """Compensated fused SWAG (DS y/t carries + Neumaier increment
    sums) at rtol 1e-6 / atol 1e-9: endpoint matches the f64 XLA path
    within tolerance on an oscillator (round-2 VERDICT item 2; the
    long-horizon mu=1e3 discriminating run is TPU-only, see
    validation/benchmarks.py config 2)."""
    from extensisq_tpu.ops.fused_adams import solve_fused_adams
    from extensisq_tpu import solve, SWAG

    def f(t, y):
        return jnp.stack([y[1], -y[0]])

    Y0 = np.tile(np.array([1.0, 0.0], np.float32), (128, 1))
    TF = 6.0
    yf, st, ns, nf = solve_fused_adams(
        f, (0.0, TF), Y0, rtol=1e-6, atol=1e-9, interpret=True,
        block_members=128, k_max=8, compensated=True)
    assert np.all(np.asarray(st) == 1)
    out = jax.jit(lambda y: solve(
        f, (0.0, TF), y, method=SWAG, rtol=1e-6, atol=1e-9,
        k_max=8))(jnp.asarray([1.0, 0.0], jnp.float64))
    err = np.max(np.abs(np.asarray(yf[0]) - np.asarray(out.y)))
    assert err < 5e-6, err


def test_fused_esdirk_trbdf2_filter_error():
    """TRBDF2 exercises the filter_error branch (err -> M W^-1 Sc err)
    of the fused implicit kernel."""
    from extensisq_tpu.ops.fused_esdirk import solve_fused_esdirk
    from extensisq_tpu import TRBDF2

    def rob(t, y):
        return jnp.stack([-0.04 * y[0] + 1e4 * y[1] * y[2],
                          0.04 * y[0] - 1e4 * y[1] * y[2]
                          - 3e7 * y[1] ** 2,
                          3e7 * y[1] ** 2])

    B = 128
    Y0 = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (B, 1))
    Y0[:, 0] = np.linspace(0.9, 1.1, B)
    y, st, ns, nf = solve_fused_esdirk(rob, (0.0, 100.0), Y0,
                                       method=TRBDF2, rtol=1e-4,
                                       atol=1e-8, block_members=128,
                                       interpret=True)
    assert np.all(np.asarray(st) == 1)
    out = solve_ensemble(rob, (0.0, 100.0), jnp.asarray(Y0, jnp.float64),
                         method=TRBDF2, rtol=1e-4, atol=1e-8)
    rel = np.max(np.abs(np.asarray(y) - np.asarray(out.y))
                 / (1e-8 + np.abs(np.asarray(out.y))))
    assert rel < 1e-3


def test_fused_ds_time_carry():
    """h < ulp(t) regime (unit span at t0=1e6): the double-single t
    carries and DS landing tests keep both fused kernels integrating
    where bare-f32 t accumulation stalls or mis-lands; backward spans
    work through the fused SWAG."""
    from extensisq_tpu.ops.fused_adams import solve_fused_adams
    from extensisq_tpu.ops.fused_esdirk import solve_fused_esdirk
    from extensisq_tpu import Kv3I

    def dec(t, y):
        return jnp.stack([-y[0]])

    B = 128
    Y0 = np.ones((B, 1), np.float32)
    y, st, ns, _ = solve_fused_adams(dec, (1e6, 1e6 + 1.0), Y0,
                                     rtol=1e-4, atol=1e-7, k_max=6,
                                     max_steps=3000,
                                     block_members=128, interpret=True)
    assert np.all(np.asarray(st) == 1)
    assert abs(float(y[0, 0]) - np.exp(-1.0)) < 1e-3

    y2, st2, _, _ = solve_fused_esdirk(dec, (1e6, 1e6 + 1.0), Y0,
                                       method=Kv3I, rtol=1e-4,
                                       atol=1e-7, max_steps=3000,
                                       block_members=128,
                                       interpret=True)
    assert np.all(np.asarray(st2) == 1)
    assert abs(float(y2[0, 0]) - np.exp(-1.0)) < 1e-3

    def grow(t, y):
        return jnp.stack([y[0]])

    y3, st3, _, _ = solve_fused_adams(grow, (1.0, 0.0), Y0, rtol=1e-5,
                                      atol=1e-8, k_max=6,
                                      max_steps=3000,
                                      block_members=128, interpret=True)
    assert np.all(np.asarray(st3) == 1)
    assert abs(float(y3[0, 0]) - np.exp(-1.0)) < 1e-4


def _rdiff_pair(n):
    """Stiff periodic reaction-diffusion u_t = D u_xx + u^2 (1 - u) in
    both conventions: (bm, n) kernel and (n,) XLA-stepper."""
    D, dx = 1.0, 1.0 / n

    def kernel_form(t, y):
        return (D * (jnp.roll(y, 1, -1) + jnp.roll(y, -1, -1)
                     - 2.0 * y) / dx ** 2 + y * y * (1.0 - y))

    def vec_form(t, y):
        return (D * (jnp.roll(y, 1) + jnp.roll(y, -1)
                     - 2.0 * y) / dx ** 2 + y * y * (1.0 - y))

    return kernel_form, vec_form


def test_pcr_tridiagonal_solver():
    """Parallel cyclic reduction vs dense f64 solves: exact to f32
    round-off for strictly tridiagonal AND periodic (circulant
    corner) systems — the zero corners propagate through every round,
    so one code path covers both."""
    from extensisq_tpu.ops.fused_esdirk_grid import _pcr_solve

    rng = np.random.RandomState(0)
    for n, periodic in [(128, True), (128, False), (256, True)]:
        nl = int(n).bit_length() - 1
        bm = 4
        lo = rng.randn(bm, n).astype(np.float32)
        up = rng.randn(bm, n).astype(np.float32)
        di = (4.0 + np.abs(lo) + np.abs(up)).astype(np.float32)
        if not periodic:
            lo[:, 0] = 0.0
            up[:, -1] = 0.0
        r = rng.randn(bm, n).astype(np.float32)
        x = np.asarray(_pcr_solve(jnp.asarray(lo), jnp.asarray(di),
                                  jnp.asarray(up), jnp.asarray(r),
                                  nl))
        for m in range(bm):
            W = np.zeros((n, n))
            for i in range(n):
                W[i, (i - 1) % n] += lo[m, i]
                W[i, i] += di[m, i]
                W[i, (i + 1) % n] += up[m, i]
            xe = np.linalg.solve(W, r[m].astype(np.float64))
            rel = (np.max(np.abs(x[m] - xe))
                   / max(1.0, np.max(np.abs(xe))))
            assert rel < 5e-5, (n, periodic, m, rel)


def test_fused_esdirk_grid_reaction_diffusion():
    """Mid-size-system fused ESDIRK (states on lanes, tridiagonal
    Newton matrices from 4-color in-kernel JVPs solved by cyclic
    reduction — the mid-size IMPLICIT hole): a stiff 128-state
    periodic reaction-diffusion ensemble lands in the XLA f64 path's
    step regime with a tolerance-scale endpoint, for both a plain
    ESDIRK (Kv3I) and the filter_error family (TRBDF2)."""
    from extensisq_tpu.ops import solve_fused_esdirk_grid
    from extensisq_tpu import Kv3I, TRBDF2

    n = 128
    kern, vec = _rdiff_pair(n)
    B = 8
    xg = np.linspace(0, 1, n, endpoint=False)
    amps = np.linspace(0.3, 0.7, B)
    Y0 = (0.5 + 0.4 * amps[:, None]
          * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)

    for method in (Kv3I, TRBDF2):
        y, st, ns, nf = solve_fused_esdirk_grid(
            kern, (0.0, 0.1), Y0, method=method, rtol=1e-4,
            atol=1e-6, block_members=8, interpret=True)
        assert np.all(np.asarray(st) == 1)
        out = solve_ensemble(vec, (0.0, 0.1),
                             jnp.asarray(Y0, jnp.float64),
                             method=method, rtol=1e-4, atol=1e-6)
        d = np.max(np.abs(np.asarray(y) - np.asarray(out.y)))
        assert d < 1e-3, (method.__name__, d)
        nsf = np.asarray(ns, np.float64)
        nsx = np.asarray(out.nsteps, np.float64)
        assert abs(nsf.mean() - nsx.mean()) < 0.2 * nsx.mean() + 2.0, \
            (method.__name__, nsf.mean(), nsx.mean())


def test_fused_esdirk_grid_dae_lanes():
    """Diagonal-M index-1 DAE with lane-interleaved algebraic rows
    (zeros in M mark them; the 1/(h d) rescale of common.py:2038-2044
    becomes a lane mask): even lanes y' = -y, odd lanes y = y_even.
    Exact solution y0 * exp(-t) on every lane."""
    from extensisq_tpu.ops import solve_fused_esdirk_grid

    n = 128
    lane = np.arange(n)
    M = (lane % 2 == 0).astype(np.float64)

    def dae_kern(t, y):
        mask = (jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
                % 2 == 0).astype(jnp.float32)
        return mask * (-y) + (1.0 - mask) * (jnp.roll(y, 1, -1) - y)

    B = 8
    Y0 = (np.ones((B, n)) * np.linspace(0.5, 2.0, B)[:, None]) \
        .astype(np.float32)
    y, st, ns, nf = solve_fused_esdirk_grid(
        dae_kern, (0.0, 1.0), Y0, M=M, yp0_batch=(-Y0), rtol=1e-5,
        atol=1e-7, block_members=8, interpret=True)
    assert np.all(np.asarray(st) == 1)
    exact = Y0 * np.exp(-1.0)
    assert np.max(np.abs(np.asarray(y) - exact)) < 1e-4


def test_fused_esdirk_grid_compensated_t_eval():
    """Compensated mode holds the official tolerances on the grid
    layout, and in-kernel t_eval snapshots match the XLA driver's
    dense output at tolerance scale."""
    from extensisq_tpu.ops import solve_fused_esdirk_grid
    from extensisq_tpu import Kv3I

    n = 128
    kern, vec = _rdiff_pair(n)
    B = 8
    xg = np.linspace(0, 1, n, endpoint=False)
    amps = np.linspace(0.3, 0.7, B)
    Y0 = (0.5 + 0.4 * amps[:, None]
          * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)

    y, st, ns, nf = solve_fused_esdirk_grid(
        kern, (0.0, 0.1), Y0, rtol=1e-6, atol=1e-9, block_members=8,
        interpret=True, compensated=True)
    assert np.all(np.asarray(st) == 1)
    out = solve_ensemble(vec, (0.0, 0.1), jnp.asarray(Y0, jnp.float64),
                         method=Kv3I, rtol=1e-6, atol=1e-9)
    assert np.max(np.abs(np.asarray(y) - np.asarray(out.y))) < 3e-5

    tq = np.array([0.0, 0.03, 0.1], np.float32)
    y2, st2, ns2, nf2, yq = solve_fused_esdirk_grid(
        kern, (0.0, 0.1), Y0, rtol=1e-4, atol=1e-6, block_members=8,
        interpret=True, t_eval=tq)
    assert np.all(np.asarray(st2) == 1)
    out2 = solve_ensemble(vec, (0.0, 0.1),
                          jnp.asarray(Y0, jnp.float64), method=Kv3I,
                          rtol=1e-4, atol=1e-6,
                          t_eval=jnp.asarray(tq, jnp.float64))
    yx = np.asarray(out2.y_eval).transpose(1, 0, 2)
    assert np.max(np.abs(np.asarray(yq) - yx)) < 1e-3
    np.testing.assert_array_equal(np.asarray(yq)[0],
                                  np.asarray(Y0, np.float32))


def test_fused_erk_events():
    """In-kernel events on the fused fast path: sign-change detection
    per direction flag, Hermite-bisection roots, first-crossing
    recording, and terminal truncation (status 8 == the driver's
    TERMINAL_EVENT) — all matching the device driver's event handler
    (solve.py:_make_event_handler) at tolerance scale."""
    from extensisq_tpu.ops import solve_fused_erk
    from extensisq_tpu import BS5

    def f(t, y):
        return jnp.stack([y[1], -y[0] - 0.05 * y[1]])

    B = 128
    amps = np.linspace(1.2, 2.0, B)
    Y0 = np.stack([amps, np.zeros(B)], axis=1).astype(np.float32)

    def ev_x(t, y):              # x downward crossing at t ~ pi/2
        return y[0]
    ev_x.direction = -1.0

    def ev_term(t, y):           # v recovers through -0.9 after the
        return y[1] + 0.9        # bottom: fires AFTER ev_x
    ev_term.terminal = True
    ev_term.direction = 1.0

    yf, st, ns, nf, t_ev, y_ev, n_ev = solve_fused_erk(
        f, (0.0, 20.0), Y0, method=BS5, rtol=1e-6, atol=1e-9,
        block_members=128, interpret=True, events=[ev_x, ev_term])
    assert np.all(np.asarray(st) == 8)
    assert np.asarray(n_ev).sum() == 2 * B

    out = solve_ensemble(f, (0.0, 20.0), jnp.asarray(Y0, jnp.float64),
                         method=BS5, rtol=1e-6, atol=1e-9,
                         events=[ev_x, ev_term])
    tx = np.asarray(out.t_events)
    assert np.nanmax(np.abs(np.asarray(t_ev)[0] - tx[:, 0, 0])) < 1e-3
    assert np.nanmax(np.abs(np.asarray(t_ev)[1] - tx[:, 1, 0])) < 1e-3
    assert np.max(np.abs(np.asarray(yf) - np.asarray(out.y))) < 1e-3
    assert np.nanmax(np.abs(np.asarray(y_ev)[0]
                            - np.asarray(out.y_events)[:, 0, 0])) < 1e-3


def test_fused_erk_events_nonterminal_runs_to_tf():
    """Recording-only events must not stop the integration; members
    finish at tf with status 1 and the first crossing recorded."""
    from extensisq_tpu.ops import solve_fused_erk
    from extensisq_tpu import BS5

    def f(t, y):
        return jnp.stack([y[1], -y[0]])

    B = 128
    Y0 = np.stack([np.linspace(0.8, 1.2, B), np.zeros(B)],
                  axis=1).astype(np.float32)

    def ev(t, y):
        return y[0]

    yf, st, ns, nf, t_ev, y_ev, n_ev = solve_fused_erk(
        f, (0.0, 10.0), Y0, method=BS5, rtol=1e-6, atol=1e-9,
        block_members=128, interpret=True, events=ev)
    assert np.all(np.asarray(st) == 1)
    assert np.all(np.asarray(n_ev) == 1)
    # first x = 0 crossing of cos-like solution: t = pi/2
    assert np.nanmax(np.abs(np.asarray(t_ev)[0] - np.pi / 2)) < 1e-3


def test_fused_erk_grid_events():
    """The grid layout inherits events through the shared loop: a
    lane-sliced event function on a mid-size advection-reaction
    ensemble terminates every member when the tracked lane crosses
    the threshold."""
    from extensisq_tpu.ops import solve_fused_erk_grid

    n = 128
    kern, _ = _fisher_pair(n)
    B = 8
    xg = np.linspace(0, 1, n, endpoint=False)
    amps = np.linspace(0.2, 0.8, B)
    Y0 = (0.5 + 0.4 * amps[:, None]
          * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)

    def ev(t, y):                # lane 0 grows through 0.95
        return y[:, 0:1] - 0.95
    ev.terminal = True
    ev.direction = 1.0

    yf, st, ns, nf, t_ev, y_ev, n_ev = solve_fused_erk_grid(
        kern, (0.0, 5.0), Y0, rtol=1e-5, atol=1e-7,
        block_members=8, interpret=True, events=ev)
    st = np.asarray(st)
    fired = np.asarray(n_ev)[0] != 0
    # Fisher-KPP drives u -> 1 everywhere: every member fires
    assert np.all(fired) and np.all(st == 8)
    # the recorded event state has lane 0 at the threshold
    assert np.nanmax(np.abs(np.asarray(y_ev)[0][:, 0] - 0.95)) < 1e-3
    # truncated endpoints sit at the event state
    assert np.max(np.abs(np.asarray(yf)[:, 0] - 0.95)) < 1e-3


def test_fused_esdirk_events():
    """Events on the fused implicit path (small-system kernel): a
    stiff decay ensemble terminates when a slow component crosses a
    threshold; the in-kernel Hermite roots match both the analytic
    crossing and the device driver's event handler."""
    from extensisq_tpu.ops import solve_fused_esdirk
    from extensisq_tpu import Kv3I

    def f(t, y):
        return jnp.stack([-50.0 * y[0] + y[1], -y[1]])

    B = 128
    a0 = np.linspace(1.0, 2.0, B)
    Y0 = np.stack([a0, a0], axis=1).astype(np.float32)

    def ev(t, y):
        return y[1] - 0.5        # y1 = a0 e^-t crosses 0.5 downward
    ev.terminal = True
    ev.direction = -1.0

    yf, st, ns, nf, t_ev, y_ev, n_ev = solve_fused_esdirk(
        f, (0.0, 10.0), Y0, method=Kv3I, rtol=1e-5, atol=1e-8,
        block_members=128, interpret=True, events=ev)
    assert np.all(np.asarray(st) == 8)
    t_exact = np.log(a0 / 0.5)
    assert np.max(np.abs(np.asarray(t_ev)[0] - t_exact)) < 2e-3
    out = solve_ensemble(f, (0.0, 10.0), jnp.asarray(Y0, jnp.float64),
                         method=Kv3I, rtol=1e-5, atol=1e-8, events=ev)
    tx = np.asarray(out.t_events)[:, 0, 0]
    assert np.nanmax(np.abs(np.asarray(t_ev)[0] - tx)) < 1e-3


def test_fused_esdirk_grid_events():
    """Events on the mid-size implicit grid kernel: terminate when
    the spatial mean of a reaction-diffusion field reaches 0.9 (a
    lane-reduced event function)."""
    from extensisq_tpu.ops import solve_fused_esdirk_grid

    n = 128
    kern, _ = _rdiff_pair(n)
    B = 8
    xg = np.linspace(0, 1, n, endpoint=False)
    amps = np.linspace(0.3, 0.7, B)
    Y0 = (0.5 + 0.4 * amps[:, None]
          * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)

    def ev(t, y):
        return jnp.mean(y, axis=-1, keepdims=True) - 0.9
    ev.terminal = True
    ev.direction = 1.0

    y, st, ns, nf, t_ev, y_ev, n_ev = solve_fused_esdirk_grid(
        kern, (0.0, 20.0), Y0, rtol=1e-4, atol=1e-6,
        block_members=8, interpret=True, events=ev)
    assert np.all(np.asarray(st) == 8)
    assert np.asarray(n_ev).sum() == B
    mean_at_ev = np.asarray(y_ev)[0].mean(axis=-1)
    assert np.max(np.abs(mean_at_ev - 0.9)) < 2e-3
    # truncated endpoints sit at the event state
    assert np.max(np.abs(np.asarray(y).mean(axis=-1) - 0.9)) < 2e-3


def test_fused_adams_events():
    """Events on the fused multistep path (hand-tiled SWAG kernel):
    recording + terminal crossings on a damped-oscillator ensemble
    match the device driver's event handler."""
    from extensisq_tpu.ops import solve_fused_adams
    from extensisq_tpu import SWAG

    def f(t, y):
        return jnp.stack([y[1], -y[0] - 0.05 * y[1]])

    B = 128
    amps = np.linspace(1.2, 2.0, B)
    Y0 = np.stack([amps, np.zeros(B)], axis=1).astype(np.float32)

    def ev_x(t, y):
        return y[0]
    ev_x.direction = -1.0

    def ev_term(t, y):
        return y[1] + 0.9
    ev_term.terminal = True
    ev_term.direction = 1.0

    yf, st, ns, nf, t_ev, y_ev, n_ev = solve_fused_adams(
        f, (0.0, 20.0), Y0, rtol=1e-6, atol=1e-9, k_max=8,
        block_members=128, interpret=True, events=[ev_x, ev_term])
    assert np.all(np.asarray(st) == 8)
    assert np.asarray(n_ev).sum() == 2 * B
    out = solve_ensemble(f, (0.0, 20.0), jnp.asarray(Y0, jnp.float64),
                         method=SWAG, rtol=1e-6, atol=1e-9,
                         events=[ev_x, ev_term])
    tx = np.asarray(out.t_events)
    assert np.nanmax(np.abs(np.asarray(t_ev)[0] - tx[:, 0, 0])) < 1e-3
    assert np.nanmax(np.abs(np.asarray(t_ev)[1] - tx[:, 1, 0])) < 1e-3
    assert np.max(np.abs(np.asarray(yf) - np.asarray(out.y))) < 2e-3


def test_fused_adams_grid_events():
    """Events on the mid-size multistep grid kernel: a heat-decay
    ensemble terminates when the tracked lane drops through 0.5,
    matching the analytic e^{-4 pi^2 D t} crossing."""
    from extensisq_tpu.ops import solve_fused_adams_grid

    n = 128
    D, dx = 0.01, 1.0 / n

    def kern(t, y):
        return D * (jnp.roll(y, 1, -1) + jnp.roll(y, -1, -1)
                    - 2.0 * y) / dx ** 2

    B = 8
    xg = np.linspace(0, 1, n, endpoint=False)
    amps = np.linspace(0.8, 1.2, B)
    Y0 = (amps[:, None]
          * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)

    def ev(t, y):
        return y[:, 32:33] - 0.5
    ev.terminal = True
    ev.direction = -1.0

    y, st, ns, nf, t_ev, y_ev, n_ev = solve_fused_adams_grid(
        kern, (0.0, 3.0), Y0, rtol=1e-5, atol=1e-7, k_max=6,
        block_members=8, interpret=True, events=ev)
    assert np.all(np.asarray(st) == 8)
    lam = 4 * np.pi ** 2 * D
    t_exact = np.log(amps * np.sin(2 * np.pi * xg[32]) / 0.5) / lam
    assert np.max(np.abs(np.asarray(t_ev)[0] - t_exact)) < 5e-3
    assert np.max(np.abs(np.asarray(y_ev)[0][:, 32] - 0.5)) < 1e-3


def test_fused_esdirk_nonunit_diagonal_mass():
    """Non-unit diagonal mass matrices without an explicit yp0: the
    initial derivative must solve M yp0 = f0 (steppers/esdirk.py
    init), not equal f0 — regression for a review finding where the
    wrong K0 degraded the first error estimate (18 vs 13 steps and a
    1.8e-5 endpoint at rtol 1e-5 on M = 2I)."""
    from extensisq_tpu.ops import (solve_fused_esdirk,
                                   solve_fused_esdirk_grid)

    def f2(t, y):
        return jnp.stack([-y[0], -y[1]])

    B = 128
    Y0 = (np.ones((B, 2))
          * np.linspace(0.5, 1.5, B)[:, None]).astype(np.float32)
    M = np.array([2.0, 3.0])
    y, st, ns, nf = solve_fused_esdirk(
        f2, (0.0, 1.0), Y0, M=M, rtol=1e-5, atol=1e-7,
        block_members=128, interpret=True)
    exact = Y0 * np.exp(-1.0 / M[None, :])
    assert np.all(np.asarray(st) == 1)
    assert np.max(np.abs(np.asarray(y) - exact)) < 1e-5

    n = 128
    Y0g = (np.ones((8, n))
           * np.linspace(0.5, 1.5, 8)[:, None]).astype(np.float32)
    yg, stg, nsg, nfg = solve_fused_esdirk_grid(
        lambda t, y: -y, (0.0, 1.0), Y0g, M=2.0 * np.ones(n),
        rtol=1e-5, atol=1e-7, block_members=8, interpret=True)
    assert np.all(np.asarray(stg) == 1)
    assert np.max(np.abs(np.asarray(yg)
                         - Y0g * np.exp(-0.5))) < 3e-6


def test_fused_erk_events_backward():
    """Backward-time integration with events: crossings are detected
    between step endpoints IN INTEGRATION ORDER, and the direction
    flag refers to the sign of the g change along the integration
    (the device driver's convention, solve.py:_make_event_handler:
    g_old -> g_new are the step's integration-order endpoints).
    Backward from t=0, y = y0 e^t decays, so g = y - 1 falls along
    the integration: direction=-1 fires at the analytic root,
    direction=+1 must NOT fire."""
    from extensisq_tpu.ops import solve_fused_erk
    from extensisq_tpu import BS5

    def f(t, y):
        return jnp.stack([y[0]])     # y = y0 e^t; backward decays

    B = 128
    Y0 = np.linspace(2.0, 4.0, B)[:, None].astype(np.float32)

    def ev_dn(t, y):
        return y[0] - 1.0            # crosses 1 at t = -log(y0)
    ev_dn.terminal = True
    ev_dn.direction = -1.0

    def ev_up(t, y):
        return y[0] - 1.0
    ev_up.direction = 1.0            # wrong way: never fires

    yf, st, ns, nf, t_ev, y_ev, n_ev = solve_fused_erk(
        f, (0.0, -5.0), Y0, method=BS5, rtol=1e-6, atol=1e-9,
        block_members=128, interpret=True, events=[ev_dn, ev_up])
    assert np.all(np.asarray(st) == 8)
    t_exact = -np.log(Y0[:, 0].astype(np.float64))
    assert np.max(np.abs(np.asarray(t_ev)[0] - t_exact)) < 1e-4
    assert np.max(np.abs(np.asarray(yf)[:, 0] - 1.0)) < 1e-4
    n_ev = np.asarray(n_ev)
    assert np.all(n_ev[0] == 1) and np.all(n_ev[1] == 0)
    # the device driver agrees on both counts
    out = solve_ensemble(f, (0.0, -5.0), jnp.asarray(Y0, jnp.float64),
                         method=BS5, rtol=1e-6, atol=1e-9,
                         events=[ev_dn, ev_up])
    nx = np.asarray(out.n_events)
    assert np.all(nx[:, 0] == 1) and np.all(nx[:, 1] == 0)


def test_fused_rkn_grid_wave():
    """Mid-size second-order fused RKN (states on lanes, partitioned
    Nystrom loop shared verbatim with the member-tiled kernel): a
    128-position discrete wave equation ensemble tracks the XLA f64
    path's steps and endpoint at f32 tolerance scale, with in-kernel
    partitioned-Hermite t_eval.  first_step is pinned on both sides
    (the fused kernels use a fixed default initial step; on a
    few-step problem the h ramp would otherwise dominate)."""
    from extensisq_tpu.ops import solve_fused_rkn_grid
    from extensisq_tpu import Fi5N

    n = 128
    c2 = 400.0

    def acc_g(t, u, v):
        return c2 * (jnp.roll(u, 1, -1) + jnp.roll(u, -1, -1)
                     - 2.0 * u)

    def f_vec(t, y):
        u, v = y[:n], y[n:]
        a = c2 * (jnp.roll(u, 1) + jnp.roll(u, -1) - 2.0 * u)
        return jnp.concatenate([v, a])

    B = 16
    xg = np.linspace(0, 1, n, endpoint=False)
    amps = np.linspace(0.5, 1.5, B)
    U0 = amps[:, None] * np.sin(2 * np.pi * xg)[None, :]
    Y0 = np.concatenate([U0, np.zeros_like(U0)],
                        axis=1).astype(np.float32)
    tq = np.array([0.0, 2.0, 4.0], np.float32)
    y, st, ns, nf, yq = solve_fused_rkn_grid(
        acc_g, (0.0, 4.0), Y0, rtol=1e-5, atol=1e-7,
        block_members=8, interpret=True, t_eval=tq, first_step=0.05)
    assert np.all(np.asarray(st) == 1)
    out = solve_ensemble(f_vec, (0.0, 4.0),
                         jnp.asarray(Y0, jnp.float64), method=Fi5N,
                         rtol=1e-5, atol=1e-7,
                         t_eval=jnp.asarray(tq, jnp.float64),
                         first_step=0.05)
    # ~2 wave periods: f32 stencil-cancellation phase noise bounds
    # the agreement at ~1e-3 (measured 1.8e-3); steps track the f64
    # path member-for-member within controller noise
    assert np.max(np.abs(np.asarray(y) - np.asarray(out.y))) < 5e-3
    yx = np.asarray(out.y_eval).transpose(1, 0, 2)
    assert np.max(np.abs(np.asarray(yq) - yx)) < 5e-3
    nsf = np.asarray(ns, np.float64)
    nsx = np.asarray(out.nsteps, np.float64)
    assert abs(nsf.mean() - nsx.mean()) < 0.1 * nsx.mean() + 2.0


def test_fused_esdirk_grid_n256():
    """The grid ESDIRK at n=256 (one more cyclic-reduction round than
    the n=128 cases): endpoint still lands on the XLA f64 path at
    tolerance scale."""
    from extensisq_tpu.ops import solve_fused_esdirk_grid
    from extensisq_tpu import Kv3I

    n = 256
    kern, vec = _rdiff_pair(n)
    B = 8
    xg = np.linspace(0, 1, n, endpoint=False)
    amps = np.linspace(0.3, 0.7, B)
    Y0 = (0.5 + 0.4 * amps[:, None]
          * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)
    y, st, ns, nf = solve_fused_esdirk_grid(
        kern, (0.0, 0.05), Y0, rtol=1e-4, atol=1e-6,
        block_members=8, interpret=True)
    assert np.all(np.asarray(st) == 1)
    out = solve_ensemble(vec, (0.0, 0.05),
                         jnp.asarray(Y0, jnp.float64), method=Kv3I,
                         rtol=1e-4, atol=1e-6)
    assert np.max(np.abs(np.asarray(y) - np.asarray(out.y))) < 1e-3


def _brusselator_grid(ny=8, nx=128, alpha=0.02):
    """Shared 2-D periodic Brusselator for the fused-RKC event /
    power-iteration tests."""
    from extensisq_tpu.ops.fused_rkc import roll
    dx = 1.0 / nx

    def fun_grid(t, uv, B=3.0):
        lap = (roll(uv, 1, 1) + roll(uv, -1, 1)
               + roll(uv, 1, 2) + roll(uv, -1, 2) - 4.0 * uv) / dx ** 2
        u, v = uv[0], uv[1]
        uv2 = u * u * v
        return jnp.stack([1.0 + uv2 - (B + 1.0) * u + alpha * lap[0],
                          B * u - uv2 + alpha * lap[1]])

    rho = 8.0 * alpha / dx ** 2 + 2.0 + 3.5
    xg = np.linspace(0, 1, nx, endpoint=False)
    Y0 = np.zeros((2, ny, nx), np.float32)
    Y0[0] = 1.0 + 0.3 * np.sin(2 * np.pi * xg)[None, :]
    Y0[1] = 3.0
    return fun_grid, rho, Y0


def test_fused_rkc_power_iteration():
    """rho=None runs the nonlinear power iteration INSIDE the kernel
    (sommeijer.py:331-398): the solve must track the XLA stepper's
    power-iteration path (which runs the identical algorithm in f64)
    in steps/endpoint, and report the nfesig counter."""
    from extensisq_tpu.ops.fused_rkc import solve_fused_rkc
    from extensisq_tpu import solve, SSV2stab

    fun_grid, _, Y0 = _brusselator_grid()
    ny, nx = Y0.shape[1:]

    y2, s2, n2, f2, nsig = solve_fused_rkc(
        fun_grid, (0.0, 1.0), Y0, None, rtol=1e-4, atol=1e-7,
        interpret=True)
    assert int(s2) == 1
    assert int(nsig) > 0          # evals spent on rho, counted apart
    # nfev must NOT include the power-iteration evals
    assert int(f2) < int(f2) + int(nsig)

    def fun_flat(t, y):
        return fun_grid(t, y.reshape(2, ny, nx)).reshape(-1)

    sol = solve(fun_flat, (0.0, 1.0),
                jnp.asarray(Y0.reshape(-1), jnp.float64),
                method=SSV2stab, rtol=1e-4, atol=1e-7)
    assert int(sol.status) == 1
    # same algorithm, f32 vs f64 radius estimates: small drift allowed
    assert abs(int(n2) - int(sol.nsteps)) <= 2
    assert np.max(np.abs(np.asarray(y2).reshape(-1)
                         - np.asarray(sol.y))) < 1e-3


def test_fused_rkc_events():
    """In-kernel events for the fused RKC kernel: terminal root agrees
    with the device driver's event handler at tolerance scale, status
    is the driver's TERMINAL_EVENT code."""
    from extensisq_tpu.ops.fused_rkc import solve_fused_rkc
    from extensisq_tpu import solve, SSV2stab

    fun_grid, rho, Y0 = _brusselator_grid()
    ny, nx = Y0.shape[1:]

    def gmean(t, y):
        return jnp.mean(y[0]) - 1.02
    gmean.terminal = True

    out = solve_fused_rkc(fun_grid, (0.0, 1.0), Y0, rho, rtol=1e-4,
                          atol=1e-7, interpret=True, events=gmean)
    y3, s3, n3, f3, tev, yev, nev = out
    assert int(s3) == 8
    assert int(nev[0]) == 1
    assert np.isfinite(float(tev[0]))

    def fun_flat(t, y):
        return fun_grid(t, y.reshape(2, ny, nx)).reshape(-1)

    def gflat(t, y):
        return jnp.mean(y.reshape(2, ny, nx)[0]) - 1.02
    gflat.terminal = True

    sol = solve(fun_flat, (0.0, 1.0),
                jnp.asarray(Y0.reshape(-1), jnp.float64),
                method=SSV2stab, rtol=1e-4, atol=1e-7,
                rho_jac=lambda t, y: rho, events=gflat)
    assert int(sol.status) == 8
    # different step sequences (f32 vs f64 controller) -> the root is
    # found on slightly different Hermite segments; tolerance-scale
    assert abs(float(tev[0]) - float(sol.t_events[0][0])) < 5e-4
    assert np.max(np.abs(np.asarray(yev[0]).reshape(-1)
                         - np.asarray(sol.y_events[0][0]))) < 1e-3
    # terminal truncation: the carried endpoint IS the event state
    assert np.array_equal(np.asarray(y3), np.asarray(yev[0]))


def test_fused_rkc_ensemble_power_events_teval():
    """Ensemble layout: per-member power iteration, events and t_eval
    all from inside one pallas_call; member rows bit-identical to the
    single-grid kernel run alone."""
    from extensisq_tpu.ops.fused_rkc import (solve_fused_rkc,
                                             solve_fused_rkc_ensemble)

    fun_grid, _, Y0 = _brusselator_grid()
    M = 3
    Bs = np.linspace(2.8, 3.4, M).astype(np.float32)
    Y0e = np.broadcast_to(Y0, (M,) + Y0.shape).copy()

    def fun_p(t, y, p):
        return fun_grid(t, y, p[0])

    def gev(t, y, p):
        return jnp.mean(y[0]) - 1.02
    gev.terminal = False

    tq = np.array([0.25, 0.5, 0.75], np.float32)
    out = solve_fused_rkc_ensemble(
        fun_p, (0.0, 1.0), Y0e, None, params=Bs[:, None], rtol=1e-4,
        atol=1e-7, interpret=True, t_eval=tq, events=gev)
    yf, st, ns, nf, nsig_e, yq, tev, yev, nev = out
    assert np.all(np.asarray(st) == 1)     # non-terminal: runs to tf
    assert yq.shape == (M, 3) + Y0.shape
    assert yev.shape == (1, M) + Y0.shape

    # member 1 must be bit-identical to the single-grid kernel
    y1, s1, n1, f1, nsig1 = solve_fused_rkc(
        lambda t, y: fun_grid(t, y, float(Bs[1])), (0.0, 1.0),
        Y0e[1], None, rtol=1e-4, atol=1e-7, interpret=True)
    assert int(n1) == int(ns[1])
    assert int(f1) == int(nf[1])
    assert int(nsig1) == int(nsig_e[1])
    assert np.array_equal(np.asarray(y1), np.asarray(yf[1]))


def test_fused_esdirk_hidden_mass_events():
    """Events on a ROTATED (dense/hidden-M) DAE: the kernel integrates
    in SVD-rotated coordinates but event functions see user
    coordinates (each g is wrapped through the y = V w back-rotation),
    and y_events is un-rotated on output.  Kaps has the analytic
    solution y1 = exp(-t), so the terminal root of y1 - 0.8 is known
    exactly: t* = -ln(0.8)."""
    from extensisq_tpu.ops.fused_esdirk import solve_fused_esdirk
    from extensisq_tpu import TRBDF2

    rng = np.random.RandomState(1)
    A = rng.rand(2, 2)
    B = rng.rand(2, 2)
    Binv = np.linalg.inv(B)
    M_hidden = A @ np.array([[0.0, 0.0], [0.0, 1.0]]) @ Binv

    def kaps_rows(t, z):
        y0 = Binv[0, 0] * z[0] + Binv[0, 1] * z[1]
        y1 = Binv[1, 0] * z[0] + Binv[1, 1] * z[1]
        f0 = -y0 + y1 * y1
        f1 = y0 - y1 - y1 * y1
        return jnp.stack([A[0, 0] * f0 + A[0, 1] * f1,
                          A[1, 0] * f0 + A[1, 1] * f1])

    def g_y1(t, z):
        # event in USER coordinates (the hidden z the caller supplies)
        return (Binv[1, 0] * z[0] + Binv[1, 1] * z[1]) - 0.8
    g_y1.terminal = True
    g_y1.direction = -1.0

    z0 = B @ np.array([1.0, 1.0])
    zp0 = B @ np.array([-2.0, -1.0])
    Z0 = np.tile(z0.astype(np.float32), (128, 1))
    ZP0 = np.tile(zp0.astype(np.float32), (128, 1))

    zf, st, ns, nf, tev, zev, nev = solve_fused_esdirk(
        kaps_rows, (0.0, 1.0), Z0, method=TRBDF2, M=M_hidden,
        yp0_batch=ZP0, rtol=1e-4, atol=1e-6, interpret=True,
        block_members=128, events=g_y1)
    assert np.all(np.asarray(st) == 8)
    assert np.all(np.asarray(nev[0]) == 1)
    t_star = -np.log(0.8)
    assert abs(float(tev[0][0]) - t_star) < 2e-4
    # y_events is un-rotated: recover y at the root, check y1 == 0.8
    y_ev = Binv @ np.asarray(zev[0][0])
    assert abs(y_ev[1] - 0.8) < 2e-4
    assert abs(y_ev[0] - 0.8 ** 2) < 3e-4
    # terminal truncation: carried endpoint equals the event state
    assert np.allclose(np.asarray(zf[0]), np.asarray(zev[0][0]),
                       atol=1e-6)


def test_fused_rkn_events():
    """In-kernel events for the fused RKN kernel (flat layout): the
    partitioned Hermite interpolant (u from (u, v), v from (v, a))
    feeds the shared bisection handler; on the harmonic oscillator
    u'' = -u the terminal root of u is analytically pi/2."""
    from extensisq_tpu.ops import solve_fused_rkn

    def acc(t, u, v):
        return -u

    B = 128
    Y0 = np.zeros((B, 2), np.float32)
    Y0[:, 0] = 1.0

    def g_u0(t, y):
        return y[0]
    g_u0.terminal = True
    g_u0.direction = -1.0

    y, st, ns, nf, tev, yev, nev = solve_fused_rkn(
        acc, (0.0, 3.0), Y0, rtol=1e-5, atol=1e-8,
        block_members=128, interpret=True, events=g_u0)
    assert np.all(np.asarray(st) == 8)
    assert np.all(np.asarray(nev[0]) == 1)
    assert abs(float(tev[0, 0]) - np.pi / 2) < 1e-4
    # the event state: u ~ 0, v = -sin(pi/2) = -1
    assert abs(float(yev[0, 0, 0])) < 1e-4
    assert abs(float(yev[0, 0, 1]) + 1.0) < 1e-3
    # terminal truncation: the carried endpoint is the event state
    assert np.allclose(np.asarray(y[0]), np.asarray(yev[0, 0]),
                       atol=1e-6)


def test_fused_rkn_grid_events():
    """Events in the mid-size states-on-lanes RKN layout: g sees
    (bm, 2n) [u, v] and returns a (bm, 1) member tile."""
    from extensisq_tpu.ops import solve_fused_rkn_grid

    n = 128
    B = 16
    Y0 = np.zeros((B, 2 * n), np.float32)
    Y0[:, :n] = 1.0

    def accg(t, u, v):
        return -u

    def g_mean(t, y):
        return jnp.mean(y[:, :n], axis=-1, keepdims=True)
    g_mean.terminal = True
    g_mean.direction = -1.0

    y, st, ns, nf, tev, yev, nev = solve_fused_rkn_grid(
        accg, (0.0, 3.0), Y0, rtol=1e-5, atol=1e-8,
        block_members=16, interpret=True, events=g_mean)
    assert np.all(np.asarray(st) == 8)
    assert abs(float(tev[0, 0]) - np.pi / 2) < 1e-4
    assert yev.shape == (1, B, 2 * n)


def test_fused_ckdisc_nonsmooth():
    """Fused CKdisc cascade on the sign-switching decay problem: the
    masked quit/twiddle logic must track the XLA f64 stepper's step
    count and land on the quadrature-exact endpoint at tolerance
    scale; t_eval and a terminal event run in-kernel."""
    import scipy.integrate as si
    from extensisq_tpu.ops import solve_fused_ckdisc
    from extensisq_tpu import solve_ivp, CKdisc

    def rhs_rows(t, y):
        sw = jnp.where(jnp.sin(3.0 * t) >= 0.0, 1.0, -1.0)
        return jnp.stack([(-sw - 0.5) * y[0]])

    B = 128
    Y0 = np.ones((B, 1), np.float32)
    y, st, ns, nf = solve_fused_ckdisc(
        rhs_rows, (0.0, 5.0), Y0, rtol=1e-4, atol=1e-7,
        block_members=128, interpret=True)
    assert np.all(np.asarray(st) == 1)

    r = solve_ivp(lambda t, yy: rhs_rows(t, yy), (0.0, 5.0),
                  jnp.asarray([1.0]), method=CKdisc, rtol=1e-4,
                  atol=1e-7)
    assert r.success
    # f32 cascade decisions track the f64 stepper's step count
    assert abs(int(ns[0]) - (r.t.size - 1)) <= max(5,
                                                   0.2 * (r.t.size - 1))
    ee, _ = si.quad(lambda t: -np.sign(np.sin(3 * t)) - 0.5, 0, 5,
                    limit=200)
    exact = float(np.exp(ee))
    assert abs(float(y[0, 0]) - exact) < 5e-4

    # t_eval + terminal event (y decays through 0.5 exactly once)
    def g_half(t, yy):
        return yy[0] - 0.5
    g_half.terminal = True
    g_half.direction = -1.0

    tq = np.array([0.5, 2.0, 4.0], np.float32)
    out = solve_fused_ckdisc(
        rhs_rows, (0.0, 5.0), Y0, rtol=1e-4, atol=1e-7,
        block_members=128, interpret=True, t_eval=tq, events=g_half)
    y2, st2, ns2, nf2, yq, tev, yev, nev = out
    assert np.all(np.asarray(st2) == 8)
    assert np.all(np.asarray(nev[0]) == 1)
    # root check vs the host driver's event handling
    rh = solve_ivp(lambda t, yy: rhs_rows(t, yy), (0.0, 5.0),
                   jnp.asarray([1.0]), method=CKdisc, rtol=1e-4,
                   atol=1e-7, events=g_half)
    assert abs(float(tev[0, 0]) - float(rh.t_events[0][0])) < 1.5e-3
    assert abs(float(yev[0, 0, 0]) - 0.5) < 1e-4


def test_solve_fused_dispatcher():
    """ops.solve_fused routes by method family and size: reference
    users address kernels by method class, not kernel name."""
    from extensisq_tpu.ops import solve_fused
    from extensisq_tpu import BS5, Kv3I, SSV2stab
    from extensisq_tpu.ops.fused_rkc import roll

    def vdp_r(t, y):
        return jnp.stack([y[1], 3.0 * (1 - y[0] ** 2) * y[1] - y[0]])

    Y0 = np.zeros((128, 2), np.float32)
    Y0[:, 0] = 2.0
    y, st, ns, nf = solve_fused(vdp_r, (0.0, 2.0), Y0, method=BS5,
                                block_members=128, interpret=True)
    assert np.all(np.asarray(st) == 1)

    # esdirk beyond the flat kernel's n <= 8 cap routes to the GRID
    # kernel via masked lane padding (ops/_lane_pad.py; since r4 ANY
    # n rides the grid kernels — the flat kernel alone would raise)
    def dec_g(t, y):
        return -y                      # grid convention (bm, n)

    yf9, st9 = solve_fused(dec_g, (0.0, 1.0),
                           np.ones((32, 9), np.float32),
                           method=Kv3I, interpret=True)[:2]
    assert np.all(np.asarray(st9) == 1)
    assert np.abs(np.asarray(yf9) - np.exp(-1.0)).max() < 1e-4

    # rkc routes by input shape: single grid vs member stack
    dx = 1.0 / 128

    def bru(t, uv):
        lap = (roll(uv, 1, 1) + roll(uv, -1, 1) + roll(uv, 1, 2)
               + roll(uv, -1, 2) - 4.0 * uv) / dx ** 2
        u, v = uv[0], uv[1]
        return jnp.stack([1.0 + u * u * v - 4.0 * u + 0.02 * lap[0],
                          3.0 * u - u * u * v + 0.02 * lap[1]])

    U0 = np.ones((2, 8, 128), np.float32)
    U0[0] += 0.1 * np.sin(
        2 * np.pi * np.linspace(0, 1, 128, endpoint=False))
    U0[1] = 3.0
    rho = 8 * 0.02 / dx ** 2 + 6.0
    out = solve_fused(bru, (0.0, 0.2), U0, method=SSV2stab, rho=rho,
                      interpret=True)
    assert int(out[1]) == 1
    out = solve_fused(bru, (0.0, 0.2), U0[None], method=SSV2stab,
                      rho=rho, interpret=True)      # 4-D => ensemble
    assert out[1].shape == (1,)


def test_fused_hstart_matches_xla():
    """The in-kernel Watts h_start (ops/_hstart_tile.py) reproduces the
    stepper's initial step, so with default first_step the fused step
    SEQUENCE and work counters match the XLA driver's exactly on a
    smooth problem (previously the 0.01*span default drifted the whole
    sequence)."""
    from extensisq_tpu.ops.fused_rkn import solve_fused_rkn
    from extensisq_tpu import Fi5N

    def osc(t, y):
        return jnp.stack([y[1], -y[0]])

    B = 128
    Y0 = np.stack([np.linspace(0.8, 1.2, B), np.zeros(B)],
                  axis=1).astype(np.float32)
    y, st, ns, nf = solve_fused_erk(
        osc, (0.0, 2.0), Y0, method=BS5, rtol=1e-4, atol=1e-6,
        block_members=128, interpret=True)
    out = solve_ensemble(osc, (0.0, 2.0), jnp.asarray(Y0, jnp.float64),
                         method=BS5, rtol=1e-4, atol=1e-6)
    assert np.all(np.asarray(st) == 1)
    # exact per-member step/nfev parity (h_start evals counted the
    # stepper's way: 1 + (1 + min(n+1, 3)) before the loop)
    assert np.array_equal(np.asarray(ns), np.asarray(out.nsteps))
    assert np.array_equal(np.asarray(nf), np.asarray(out.nfev))

    # RKN: h_start runs on the first-order [u, v] form
    # (steppers/rkn.py:81 semantics)
    def acc(t, u, v):
        return -u

    def rhs(t, y_):
        return jnp.concatenate([y_[1:], -y_[:1]])

    y2, st2, ns2, nf2 = solve_fused_rkn(
        acc, (0.0, 10.0), Y0, method=Fi5N, rtol=1e-4, atol=1e-6,
        block_members=128, interpret=True)
    out2 = solve_ensemble(rhs, (0.0, 10.0),
                          jnp.asarray(Y0, jnp.float64),
                          method=Fi5N, rtol=1e-4, atol=1e-6)
    assert np.all(np.asarray(st2) == 1)
    # f32 controller tie-breaks move a step on some members; the
    # sequences stay aligned to +-1 step
    assert np.max(np.abs(np.asarray(ns2)
                         - np.asarray(out2.nsteps))) <= 1
    assert np.max(np.abs(np.asarray(nf2).astype(np.int64)
                         - np.asarray(out2.nfev))) <= 12


def test_fused_hstart_matches_xla_esdirk():
    """Plain-ODE fused ESDIRK also starts from the in-kernel Watts
    estimate (evals uncounted, the reference's fun_single convention at
    common.py:1998-2006)."""
    from extensisq_tpu.ops.fused_esdirk import solve_fused_esdirk
    from extensisq_tpu import Kv3I

    def dec(t, y_):
        return jnp.stack([-y_[0] + 0.2 * y_[1], -0.5 * y_[1]])

    B = 128
    Y0 = np.stack([np.linspace(0.8, 1.2, B), np.ones(B)],
                  axis=1).astype(np.float32)
    y, st, ns, nf = solve_fused_esdirk(
        dec, (0.0, 4.0), Y0, method=Kv3I, rtol=1e-4, atol=1e-6,
        block_members=128, interpret=True)
    out = solve_ensemble(dec, (0.0, 4.0), jnp.asarray(Y0, jnp.float64),
                         method=Kv3I, rtol=1e-4, atol=1e-6)
    assert np.all(np.asarray(st) == 1)
    assert np.max(np.abs(np.asarray(ns)
                         - np.asarray(out.nsteps))) <= 2
    assert np.max(np.abs(np.asarray(nf).astype(np.int64)
                         - np.asarray(out.nfev))) <= 15


def test_fused_max_step():
    """max_step= on the fused kernels: ERK/RKN/ESDIRK match the XLA
    driver's capped step counts (to the f32 landing step); Adams and
    RKC respect the cap (nsteps >= span/max_step) without losing the
    endpoint."""
    from extensisq_tpu.ops.fused_rkn import solve_fused_rkn
    from extensisq_tpu.ops.fused_esdirk import solve_fused_esdirk
    from extensisq_tpu.ops.fused_adams import solve_fused_adams
    from extensisq_tpu.ops.fused_rkc import solve_fused_rkc
    from extensisq_tpu import Fi5N, Kv3I

    def osc(t, y):
        return jnp.stack([y[1], -y[0]])

    B = 128
    Y0 = np.stack([np.linspace(0.8, 1.2, B), np.zeros(B)],
                  axis=1).astype(np.float32)
    y, st, ns, nf = solve_fused_erk(
        osc, (0.0, 2.0), Y0, method=BS5, rtol=1e-4, atol=1e-6,
        max_step=0.05, block_members=128, interpret=True)
    out = solve_ensemble(osc, (0.0, 2.0), jnp.asarray(Y0, jnp.float64),
                         method=BS5, rtol=1e-4, atol=1e-6,
                         max_step=0.05)
    assert np.all(np.asarray(st) == 1)
    assert np.min(np.asarray(ns)) >= 40            # 2.0 / 0.05
    # f32 rounding at the cap costs at most one extra landing step
    assert np.max(np.abs(np.asarray(ns)
                         - np.asarray(out.nsteps))) <= 1
    assert np.max(np.abs(np.asarray(y)
                         - np.asarray(out.y))) < 1e-4

    def acc(t, u, v):
        return -u

    y2, st2, ns2, _ = solve_fused_rkn(
        acc, (0.0, 10.0), Y0, method=Fi5N, rtol=1e-4, atol=1e-6,
        max_step=0.25, block_members=128, interpret=True)
    assert np.all(np.asarray(st2) == 1)
    assert np.all(np.asarray(ns2) == 41)           # measured XLA twin

    def dec(t, y_):
        return jnp.stack([-y_[0] + 0.2 * y_[1], -0.5 * y_[1]])

    Y0d = np.stack([np.linspace(0.8, 1.2, B), np.ones(B)],
                   axis=1).astype(np.float32)
    y3, st3, ns3, _ = solve_fused_esdirk(
        dec, (0.0, 4.0), Y0d, method=Kv3I, rtol=1e-4, atol=1e-6,
        max_step=0.1, block_members=128, interpret=True)
    assert np.all(np.asarray(st3) == 1)
    assert np.all(np.asarray(ns3) == 41)           # measured XLA twin

    y4, st4, ns4, _ = solve_fused_adams(
        dec, (0.0, 4.0), Y0d, k_max=6, rtol=1e-4, atol=1e-6,
        max_step=0.05, block_members=128, interpret=True)
    assert np.all(np.asarray(st4) == 1)
    assert np.min(np.asarray(ns4)) >= 80           # 4.0 / 0.05
    y2e = np.exp(-0.5 * 4.0)
    y1e = (Y0d[:, 0] - 0.4) * np.exp(-4.0) + 0.4 * y2e
    assert np.max(np.abs(np.asarray(y4)[:, 0] - y1e)) < 1e-5
    assert np.max(np.abs(np.asarray(y4)[:, 1] - y2e)) < 1e-5

    nx = 128
    dx = 1.0 / nx

    def heat(t, u):
        return (jnp.roll(u, 1, -1) + jnp.roll(u, -1, -1)
                - 2.0 * u) / dx ** 2

    u0 = np.tile((np.sin(np.pi * np.linspace(
        0, 1, nx, endpoint=False)) ** 2).astype(np.float32), (8, 1))
    rho = 4.0 / dx ** 2
    outA = solve_fused_rkc(heat, (0.0, 0.1), u0, rho=rho, rtol=1e-4,
                           atol=1e-6, interpret=True)
    outB = solve_fused_rkc(heat, (0.0, 0.1), u0, rho=rho, rtol=1e-4,
                           atol=1e-6, max_step=0.002, interpret=True)
    assert int(outB[1]) == 1
    assert int(outB[2]) >= 50                      # 0.1 / 0.002
    assert int(outB[2]) > int(outA[2])
    assert float(np.max(np.abs(np.asarray(outA[0])
                               - np.asarray(outB[0])))) < 1e-4


def test_fused_max_step_grid_layouts():
    """max_step= on the states-on-lanes kernels: every grid family
    respects the cap (nsteps >= span/max_step) and keeps the endpoint
    at tolerance scale vs its own uncapped solve."""
    from extensisq_tpu.ops import (solve_fused_erk_grid,
                                   solve_fused_esdirk_grid,
                                   solve_fused_adams_grid)

    n = 128
    B = 8
    xg = np.linspace(0, 1, n, endpoint=False)
    amps = np.linspace(0.3, 0.7, B)
    Y0 = (0.5 + 0.4 * amps[:, None]
          * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)

    kern, _ = _fisher_pair(n)
    a = solve_fused_erk_grid(kern, (0.0, 0.5), Y0, rtol=1e-5,
                             atol=1e-7, block_members=8,
                             interpret=True)
    b = solve_fused_erk_grid(kern, (0.0, 0.5), Y0, rtol=1e-5,
                             atol=1e-7, block_members=8,
                             interpret=True, max_step=0.01)
    assert np.all(np.asarray(b[1]) == 1)
    assert np.min(np.asarray(b[2])) >= 50          # 0.5 / 0.01
    assert np.max(np.abs(np.asarray(a[0]) - np.asarray(b[0]))) < 1e-3

    kern2, _ = _rdiff_pair(n)
    c = solve_fused_esdirk_grid(kern2, (0.0, 0.1), Y0, rtol=1e-4,
                                atol=1e-6, block_members=8,
                                interpret=True)
    d = solve_fused_esdirk_grid(kern2, (0.0, 0.1), Y0, rtol=1e-4,
                                atol=1e-6, block_members=8,
                                interpret=True, max_step=0.002)
    assert np.all(np.asarray(d[1]) == 1)
    assert np.min(np.asarray(d[2])) >= 50          # 0.1 / 0.002
    assert np.max(np.abs(np.asarray(c[0]) - np.asarray(d[0]))) < 1e-3

    kern3, _ = _heat_pair(n)
    Y0h = (np.linspace(0.5, 1.5, B)[:, None]
           * np.sin(2 * np.pi * xg)[None, :]
           + 0.3 * np.cos(4 * np.pi * xg)[None, :]).astype(np.float32)
    e = solve_fused_adams_grid(kern3, (0.0, 0.25), Y0h, rtol=1e-4,
                               atol=1e-6, k_max=6, block_members=8,
                               interpret=True)
    f = solve_fused_adams_grid(kern3, (0.0, 0.25), Y0h, rtol=1e-4,
                               atol=1e-6, k_max=6, block_members=8,
                               interpret=True, max_step=0.001)
    assert np.all(np.asarray(f[1]) == 1)
    assert np.min(np.asarray(f[2])) >= 250         # 0.25 / 0.001
    assert np.max(np.abs(np.asarray(e[0]) - np.asarray(f[0]))) < 1e-3


def test_fused_ckdisc_grid_nonsmooth_mol():
    """Mid-size-system fused CKdisc (states on lanes — the last cell
    of the family x layout matrix): a 128-state advection-reaction MoL
    ensemble with a sign-switching forcing tracks the XLA f64 CKdisc
    path's steps and endpoint at tolerance scale, with in-kernel
    t_eval snapshots."""
    from extensisq_tpu.ops import solve_fused_ckdisc_grid
    from extensisq_tpu import CKdisc

    n = 128
    c, dx = 1.0, 1.0 / n

    def kern(t, y):
        sw = jnp.where(jnp.sin(4.0 * t) >= 0.0, 1.0, -1.0)
        return (-c * (y - jnp.roll(y, 1, -1)) / dx + y * (1.0 - y)
                + 0.3 * sw)

    def vec(t, y):
        sw = jnp.where(jnp.sin(4.0 * t) >= 0.0, 1.0, -1.0)
        return (-c * (y - jnp.roll(y, 1)) / dx + y * (1.0 - y)
                + 0.3 * sw)

    B = 8
    xg = np.linspace(0, 1, n, endpoint=False)
    amps = np.linspace(0.2, 0.8, B)
    Y0 = (0.5 + 0.4 * amps[:, None]
          * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)
    tq = np.array([0.0, 0.5, 1.2], np.float32)

    y, st, ns, nf, yq = solve_fused_ckdisc_grid(
        kern, (0.0, 1.2), Y0, rtol=1e-4, atol=1e-6,
        block_members=8, interpret=True, t_eval=tq)
    assert np.all(np.asarray(st) == 1)
    out = solve_ensemble(vec, (0.0, 1.2), jnp.asarray(Y0, jnp.float64),
                         method=CKdisc, rtol=1e-4, atol=1e-6,
                         t_eval=jnp.asarray(tq, jnp.float64))
    assert np.max(np.abs(np.asarray(y) - np.asarray(out.y))) < 2e-3
    yx = np.asarray(out.y_eval).transpose(1, 0, 2)
    assert np.max(np.abs(np.asarray(yq) - yx)) < 2e-3
    np.testing.assert_array_equal(np.asarray(yq)[0],
                                  np.asarray(Y0, np.float32))
    # cascade decisions land in the f64 stepper's step regime
    nsf = np.asarray(ns, np.float64)
    nsx = np.asarray(out.nsteps, np.float64)
    assert abs(nsf.mean() - nsx.mean()) < 0.2 * nsx.mean()


def test_fused_ckdisc_grid_event_diagonal():
    """Grid-layout CKdisc events ((bm, 1) member columns): on a
    lane-diagonal sign-switching decay — every lane the flat test's
    scalar problem — the terminal root matches the host driver's and
    the step sequence matches the flat kernel's."""
    from extensisq_tpu.ops import (solve_fused_ckdisc,
                                   solve_fused_ckdisc_grid)
    from extensisq_tpu import solve_ivp, CKdisc

    def rhs_col(t, y):
        sw = jnp.where(jnp.sin(3.0 * t) >= 0.0, 1.0, -1.0)
        return (-sw - 0.5) * y

    def g_half(t, y):
        return y[:, :1] - 0.5
    g_half.terminal = True
    g_half.direction = -1.0

    B, n = 8, 128
    Y0 = np.ones((B, n), np.float32)
    out = solve_fused_ckdisc_grid(
        rhs_col, (0.0, 5.0), Y0, rtol=1e-4, atol=1e-7,
        block_members=8, interpret=True, events=g_half)
    y2, st2, ns2, nf2, tev, yev, nev = out
    assert np.all(np.asarray(st2) == 8)
    assert np.all(np.asarray(nev[0]) == 1)
    rh = solve_ivp(lambda t, yy: jnp.stack(
        [(-jnp.where(jnp.sin(3.0 * t) >= 0.0, 1.0, -1.0) - 0.5)
         * yy[0]]), (0.0, 5.0), jnp.asarray([1.0]), method=CKdisc,
        rtol=1e-4, atol=1e-7, events=lambda t, yy: yy[0] - 0.5)
    assert abs(float(tev[0, 0]) - float(rh.t_events[0][0])) < 1.5e-3
    assert np.max(np.abs(np.asarray(yev[0]) - 0.5)) < 1e-4

    # the flat kernel on the scalar problem walks the same cascade
    # (same terminal event, so the step counts cover the same span)
    def rhs_rows(t, y):
        sw = jnp.where(jnp.sin(3.0 * t) >= 0.0, 1.0, -1.0)
        return jnp.stack([(-sw - 0.5) * y[0]])

    def g_half_rows(t, y):
        return y[0] - 0.5
    g_half_rows.terminal = True
    g_half_rows.direction = -1.0

    yf, stf, nsf, nff, tevf, yevf, nevf = solve_fused_ckdisc(
        rhs_rows, (0.0, 5.0), np.ones((128, 1), np.float32),
        rtol=1e-4, atol=1e-7, block_members=128, interpret=True,
        events=g_half_rows)
    assert abs(int(ns2[0]) - int(nsf[0])) <= 2
    assert abs(float(tev[0, 0]) - float(tevf[0, 0])) < 1e-3


def test_fused_ckdisc_grid_dispatch_and_params():
    """solve_fused routes mid-size CKdisc to the grid kernel, and
    per-member params reach the cascade's RHS."""
    from extensisq_tpu.ops import solve_fused
    from extensisq_tpu import CKdisc

    n = 128

    def kern(t, y, p):
        sw = jnp.where(jnp.sin(4.0 * t) >= 0.0, 1.0, -1.0)
        return -p[0] * y + 0.3 * sw

    B = 8
    Y0 = np.ones((B, n), np.float32)
    P = np.linspace(0.5, 2.0, B).astype(np.float32)[:, None]
    y, st, ns, nf = solve_fused(
        kern, (0.0, 2.0), Y0, method=CKdisc, block_members=8,
        interpret=True, params=P)
    assert np.all(np.asarray(st) == 1)
    # stiffer members (larger decay rate) end lower
    assert float(y[-1].mean()) < float(y[0].mean())
    # and the routing really picked the grid layout: lanes of one
    # member agree (diagonal dynamics preserve lane independence)
    assert y.shape == (B, n)


def test_fused_erk_complex_rotation_decay():
    """Complex fused ERK (blocked [Re | Im] real-pair encoding): the
    decaying rotation z' = (i w - a) z has the exact solution
    z0 e^{(iw-a)t}; per-member w sweep via params, t_eval midpoints,
    and n = 24 exercises the joint-state lane padding."""
    from extensisq_tpu.ops import solve_fused_erk_complex, cmul

    Bs, n = 8, 24
    rng = np.random.RandomState(5)
    z0 = (rng.randn(Bs, n) + 1j * rng.randn(Bs, n)).astype(np.complex64)
    ws = np.linspace(1.0, 3.0, Bs).astype(np.float32)[:, None]
    a = 0.3

    def rot(t, re, im, p):
        # (iw - a) z  via the real-pair product helper
        return cmul(re, im, 0.0 * re - a, p[0] + 0.0 * re)

    tq = np.linspace(0.0, 2.0, 5)
    zf, st, ns, nf, zev = solve_fused_erk_complex(
        rot, (0.0, 2.0), z0, params=ws, rtol=1e-6, atol=1e-9,
        block_members=8, interpret=True, t_eval=tq)
    assert np.all(np.asarray(st) == 1)
    assert zf.dtype == np.complex64
    lam = (-a + 1j * ws[:, 0]).astype(np.complex64)
    ex = z0 * np.exp(lam * 2.0)[:, None]
    sc = np.abs(z0).max()
    assert np.abs(np.asarray(zf) - ex).max() < 5e-5 * sc
    for q, tv in enumerate(tq):
        exq = z0 * np.exp(lam * tv)[:, None]
        assert np.abs(np.asarray(zev)[q] - exq).max() < 1e-4 * sc


def test_fused_erk_complex_flat_small():
    """Flat-layout complex fused ERK (explicit layout, n = 2 rides the
    member-tile kernel): z' = i z rotation preserves |z| and matches
    the closed form; conj_mul helper sanity."""
    from extensisq_tpu.ops import solve_fused_erk_complex, conj_mul

    Bs, n = 128, 2
    rng = np.random.RandomState(7)
    z0 = (rng.randn(Bs, n) + 1j * rng.randn(Bs, n)).astype(np.complex64)

    def rot(t, re, im):
        # i z: (re, im) -> (-im, re)
        return -im, re

    zf, st, ns, nf = solve_fused_erk_complex(
        rot, (0.0, 1.5), z0, layout="flat", rtol=1e-6, atol=1e-9,
        block_members=128, interpret=True)
    assert np.all(np.asarray(st) == 1)
    ex = z0 * np.exp(1j * np.float32(1.5))
    assert np.abs(np.asarray(zf) - ex).max() < 5e-5 * np.abs(z0).max()
    # conj(a)*a is |a|^2 (pure real); f32 product rounding ~eps*|z|^2
    cr, ci = conj_mul(z0.real, z0.imag, z0.real, z0.imag)
    zsq = np.abs(z0).max() ** 2
    assert np.abs(cr - np.abs(z0) ** 2).max() < 4e-6 * zsq
    assert np.abs(ci).max() < 4e-6 * zsq
