"""Fused Pallas ensemble solver (interpret mode on CPU; the compiled
path runs on TPU hardware)."""
import jax
import numpy as np
import jax.numpy as jnp

from extensisq_tpu.ops import solve_fused_erk
from extensisq_tpu import BS5, CK5, solve_ensemble


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
