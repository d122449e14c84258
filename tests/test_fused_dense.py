"""Continuous dense output from the fused kernels (ops/fused_dense.py).

The fused kernels record per-step (t, y, f) rows in-kernel; the host
compacts them into the framework's unified OdeSolution anchor form
with cubic Hermite segments — the reference's ``sol`` capability
(common.py:766-821; RKC's dense output is the same cubic Hermite,
sommeijer.py:400-406).  Interpolation between nodes is O(h^4) cubic
Hermite (the fused kernels' documented t_eval semantics) — node
values carry the solve's own accuracy; between-node gates are set by
the Hermite truncation on each problem.  All runs interpret mode
(the conftest forces CPU).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from extensisq_tpu import solve_ivp, BS5
from extensisq_tpu.methods import TRBDF2
from extensisq_tpu.ops import solve_fused_erk, solve_fused_esdirk

pytestmark = pytest.mark.slow  # interpret-mode fused kernels: multi-minute

B = 128


def _vdp_rows(t, y):
    return jnp.stack([y[1], 2.0 * (1 - y[0] ** 2) * y[1] - y[0]])


def _vdp_host(t, y):
    return jnp.stack([y[1], 2.0 * (1 - y[0] ** 2) * y[1] - y[0]])


def test_fused_erk_dense_vdp():
    """Fused VdP dense output vs a tight f64 reference: node values at
    solve accuracy, between-node values at cubic Hermite truncation;
    evaluation past tf returns the final state; endpoint exact."""
    Y0 = np.tile([2.0, 0.0], (B, 1)).astype(np.float32)
    yf, st, ns, nf, sol = solve_fused_erk(
        _vdp_rows, (0.0, 10.0), Y0, rtol=1e-5, atol=1e-8,
        block_members=128, interpret=True, dense=256)
    assert np.all(np.asarray(st) == 1)
    assert bool(np.all(np.asarray(sol.valid)))

    r = solve_ivp(_vdp_host, (0.0, 10.0), np.array([2.0, 0.0]),
                  method=BS5, rtol=1e-8, atol=1e-11,
                  dense_output=True)

    nsteps = int(ns[0])
    ts0 = np.asarray(sol.ts[0])[:nsteps + 1]
    # strictly monotone real nodes, then the inert tail
    assert np.all(np.diff(ts0) > 0)
    # node values: the fused solve's own accuracy (measured 2.4e-4)
    ya0 = np.asarray(sol.y_anchor[0])[:nsteps]
    node_err = np.abs(ya0.T - np.asarray(r.sol(ts0[:-1]))).max()
    assert node_err < 1e-3, node_err
    # between nodes: cubic Hermite truncation on VdP's steep segments
    # (measured 1.3e-2 at these ~0.35 step sizes)
    tq = np.linspace(0.0, 10.0, 73)
    fv = np.asarray(sol(jnp.asarray(tq, jnp.float32)))[0]
    assert np.abs(fv - np.asarray(r.sol(tq))).max() < 3e-2
    # endpoint exactness and past-tf clamping
    assert np.abs(np.asarray(sol(jnp.float32(10.0)))[0]
                  - np.asarray(yf[0])).max() < 1e-6
    assert np.abs(np.asarray(sol(jnp.float32(12.0)))[0]
                  - np.asarray(yf[0])).max() == 0.0
    # per-member OdeSolution view agrees with the batched evaluation
    m0 = sol.member(0)
    assert np.abs(np.asarray(m0(jnp.asarray(tq, jnp.float32)))
                  - fv).max() == 0.0


def test_fused_erk_dense_smooth_tight():
    """On a smooth problem the whole dense trajectory holds ~1e-5:
    y' = -lane_rate * y, exact solution known."""
    n = 3
    rates = np.array([0.5, 1.0, 1.7])

    def rows(t, y):
        return jnp.stack([-rates[j] * y[j] for j in range(n)])

    Y0 = np.tile([1.0, 2.0, 0.7], (B, 1)).astype(np.float32)
    yf, st, ns, nf, sol = solve_fused_erk(
        rows, (0.0, 3.0), Y0, rtol=1e-6, atol=1e-9,
        block_members=128, interpret=True, dense=128,
        compensated=True)
    assert np.all(np.asarray(st) == 1)
    tq = np.linspace(0.0, 3.0, 41)
    vals = np.asarray(sol(jnp.asarray(tq, jnp.float32)))[0]  # (n, m)
    exact = np.array([1.0, 2.0, 0.7])[:, None] \
        * np.exp(-rates[:, None] * tq[None, :])
    # node values are ~1e-6; between-node cubic Hermite truncation at
    # the large steps a smooth decay affords measures 6.7e-5
    assert np.abs(vals - exact).max() < 2e-4


def test_fused_erk_dense_overflow_flag():
    Y0 = np.tile([2.0, 0.0], (B, 1)).astype(np.float32)
    out = solve_fused_erk(_vdp_rows, (0.0, 10.0), Y0, rtol=1e-5,
                          atol=1e-8, block_members=128,
                          interpret=True, dense=10)
    sol = out[4]
    assert not bool(np.any(np.asarray(sol.valid)))


def test_fused_esdirk_dense_robertson():
    """Stiff dense output: fused TR-BDF2 Robertson sol(t) vs the f64
    XLA driver's dense output across 5 decades of t."""
    def rob_rows(t, y):
        r1 = 0.04 * y[0]
        r2 = 1e4 * y[1] * y[2]
        r3 = 3e7 * y[1] * y[1]
        return jnp.stack([-r1 + r2, r1 - r2 - r3, r3])

    def rob_host(t, y):
        r1 = 0.04 * y[0]
        r2 = 1e4 * y[1] * y[2]
        r3 = 3e7 * y[1] * y[1]
        return jnp.stack([-r1 + r2, r1 - r2 - r3, r3])

    Bs = 8
    Y0 = np.tile([1.0, 0.0, 0.0], (Bs, 1)).astype(np.float32)
    yf, st, ns, nf, sol = solve_fused_esdirk(
        rob_rows, (0.0, 100.0), Y0, method=TRBDF2, rtol=1e-4,
        atol=1e-8, block_members=128, interpret=True, dense=256)
    assert np.all(np.asarray(st) == 1)
    assert bool(np.all(np.asarray(sol.valid)))
    r = solve_ivp(rob_host, (0.0, 100.0), np.array([1.0, 0.0, 0.0]),
                  method=TRBDF2, rtol=1e-7, atol=1e-12,
                  dense_output=True)
    tq = np.concatenate([[0.0], np.logspace(-3, 2, 31)])
    fv = np.asarray(sol(jnp.asarray(tq, jnp.float32)))[0]
    rv = np.asarray(r.sol(tq))
    # y2 lives at ~3e-5 scale: compare per-component relative
    scale = np.abs(rv).max(axis=1, keepdims=True)
    assert np.abs((fv - rv) / scale).max() < 2e-3


def test_fused_erk_grid_dense_matches_t_eval():
    """GRID-layout dense recording: sol(tq) must reproduce the
    kernel's own in-kernel t_eval rows (both are cubic Hermite on the
    same step endpoints — the only difference is f32 rounding order),
    and the endpoint is exact."""
    from extensisq_tpu.ops import solve_fused_erk_grid
    n, Bs = 32, 8
    x = np.arange(n)
    Y0 = np.tile((1.0 + 0.3 * np.sin(2 * np.pi * x / n))
                 .astype(np.float32), (Bs, 1))

    def adv(t, y):
        return -(y - jnp.roll(y, 1, -1)) * (0.2 * n)

    tq = np.linspace(0.0, 0.5, 7)
    yf, st, ns, nf, yev, sol = solve_fused_erk_grid(
        adv, (0.0, 0.5), Y0, rtol=1e-5, atol=1e-8, block_members=8,
        interpret=True, t_eval=tq, dense=128)
    assert np.all(np.asarray(st) == 1)
    assert bool(np.all(np.asarray(sol.valid)))
    fv = np.asarray(sol(jnp.asarray(tq, jnp.float32)))   # (B, n, m)
    assert np.abs(fv.transpose(2, 0, 1) - np.asarray(yev)).max() \
        < 2e-6
    assert np.abs(np.asarray(sol(jnp.float32(0.5)))
                  - np.asarray(yf)).max() < 1e-6


def test_fused_esdirk_grid_dense_matches_t_eval():
    """GRID-layout implicit dense recording (y' = the stiffly
    accurate last stage): sol(tq) vs the kernel's t_eval rows."""
    from extensisq_tpu.ops import solve_fused_esdirk_grid
    n, Bs = 32, 8
    x = np.arange(n)
    Y0 = np.tile((1.0 + 0.3 * np.sin(2 * np.pi * x / n))
                 .astype(np.float32), (Bs, 1))

    def heat(t, y):
        left = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
        right = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)
        return (left - 2.0 * y + right) * 50.0

    tq = np.linspace(0.0, 0.1, 5)
    yf, st, ns, nf, yev, sol = solve_fused_esdirk_grid(
        heat, (0.0, 0.1), Y0, rtol=1e-4, atol=1e-7, block_members=8,
        interpret=True, t_eval=tq, dense=128)
    assert np.all(np.asarray(st) == 1)
    assert bool(np.all(np.asarray(sol.valid)))
    fv = np.asarray(sol(jnp.asarray(tq, jnp.float32)))
    assert np.abs(fv.transpose(2, 0, 1) - np.asarray(yev)).max() \
        < 2e-5


def test_fused_dense_inside_jit_and_grad_safe():
    """The builder and evaluation are traceable: whole pipeline under
    jit, evaluation vmapped over query points."""
    Y0 = np.tile([1.0, 0.5], (B, 1)).astype(np.float32)

    def rows(t, y):
        return jnp.stack([y[1], -y[0]])

    @jax.jit
    def run(Y):
        out = solve_fused_erk(rows, (0.0, 6.0), Y, rtol=1e-5,
                              atol=1e-8, block_members=128,
                              interpret=True, dense=128)
        sol = out[4]
        return sol(jnp.linspace(0.0, 6.0, 13, dtype=jnp.float32))

    vals = np.asarray(run(Y0))
    tq = np.linspace(0.0, 6.0, 13)
    exact = np.stack([np.cos(tq) + 0.5 * np.sin(tq),
                      -np.sin(tq) + 0.5 * np.cos(tq)])
    # Hermite truncation at BS5's ~0.5 steps on cos: (1/384) h^4
    assert np.abs(vals[0] - exact).max() < 1e-3


def test_fused_rkn_grid_dense_matches_t_eval():
    """GRID-layout RKN dense recording over the FULL [u, v] state:
    sol(tq) vs the kernel's own in-kernel t_eval rows (both are the
    partitioned cubic Hermite on the same step endpoints)."""
    from extensisq_tpu.ops import solve_fused_rkn_grid
    n, Bs = 32, 8
    x = np.arange(n)
    U0 = np.tile(np.sin(2 * np.pi * x / n).astype(np.float32),
                 (Bs, 1))
    Y0 = np.concatenate([U0, np.zeros_like(U0)], axis=1)

    def wave(t, u, v):
        return (jnp.roll(u, 1, -1) - 2.0 * u
                + jnp.roll(u, -1, -1)) * (0.5 * n * n)

    tq = np.linspace(0.0, 0.5, 6)
    yf, st, ns, nf, yev, sol = solve_fused_rkn_grid(
        wave, (0.0, 0.5), Y0, rtol=1e-5, atol=1e-8, block_members=8,
        interpret=True, t_eval=tq, dense=256)
    assert np.all(np.asarray(st) == 1)
    assert bool(np.all(np.asarray(sol.valid)))
    fv = np.asarray(sol(jnp.asarray(tq, jnp.float32)))   # (B, 2n, m)
    assert np.abs(fv.transpose(2, 0, 1) - np.asarray(yev)).max() \
        < 2e-5
    assert np.abs(np.asarray(sol(jnp.float32(0.5)))
                  - np.asarray(yf)).max() < 1e-6


def test_fused_adams_grid_dense_matches_t_eval():
    """GRID-layout SWAG dense recording: sol(tq) vs the kernel's
    t_eval rows (both cubic Hermite on accepted-step endpoints; the
    solver's own order-k interpolant stays on the XLA path)."""
    from extensisq_tpu.ops import solve_fused_adams_grid
    n, Bs = 32, 8
    x = np.arange(n)
    Y0 = np.tile((1.0 + 0.3 * np.sin(2 * np.pi * x / n))
                 .astype(np.float32), (Bs, 1))

    def adv(t, y):
        return -(y - jnp.roll(y, 1, -1)) * (0.2 * n)

    tq = np.linspace(0.0, 1.0, 6)
    yf, st, ns, nf, yev, sol = solve_fused_adams_grid(
        adv, (0.0, 1.0), Y0, rtol=1e-5, atol=1e-8, block_members=8,
        interpret=True, t_eval=tq, dense=256)
    assert np.all(np.asarray(st) == 1)
    assert bool(np.all(np.asarray(sol.valid)))
    fv = np.asarray(sol(jnp.asarray(tq, jnp.float32)))
    assert np.abs(fv.transpose(2, 0, 1) - np.asarray(yev)).max() \
        < 5e-5
    assert np.abs(np.asarray(sol(jnp.float32(1.0)))
                  - np.asarray(yf)).max() < 1e-6


def test_fused_rkn_flat_dense_matches_t_eval():
    """FLAT-layout RKN dense recording (member-tile rows): sol(tq) vs
    the kernel's own in-kernel t_eval rows (both the partitioned cubic
    Hermite on accepted-step endpoints), endpoint exact."""
    from extensisq_tpu.ops import solve_fused_rkn
    Bs = 128
    # harmonic oscillator [u, v], omega member-constant
    Y0 = np.tile([1.0, 0.0], (Bs, 1)).astype(np.float32)

    def acc(t, u, v):
        return -4.0 * u

    tq = np.linspace(0.0, 3.0, 6)
    yf, st, ns, nf, yev, sol = solve_fused_rkn(
        acc, (0.0, 3.0), Y0, rtol=1e-5, atol=1e-8,
        block_members=128, interpret=True, t_eval=tq, dense=128)
    assert np.all(np.asarray(st) == 1)
    assert bool(np.all(np.asarray(sol.valid)))
    fv = np.asarray(sol(jnp.asarray(tq, jnp.float32)))   # (B, 2, m)
    assert np.abs(fv.transpose(2, 0, 1) - np.asarray(yev)).max() \
        < 2e-5
    assert np.abs(np.asarray(sol(jnp.float32(3.0)))
                  - np.asarray(yf)).max() < 1e-6
    # node-accuracy check against the closed form at the query points
    exact = np.stack([np.cos(2.0 * tq), -2.0 * np.sin(2.0 * tq)])
    assert np.abs(fv[0].T - exact.T).max() < 5e-4


def test_fused_adams_flat_dense_matches_t_eval():
    """FLAT-layout SWAG dense recording: sol(tq) vs the kernel's own
    in-kernel t_eval rows (both cubic Hermite on accepted-step
    endpoints; f0 anchors from the host init), endpoint exact."""
    from extensisq_tpu.ops import solve_fused_adams
    Bs = 128
    Y0 = np.tile([1.0, 0.5], (Bs, 1)).astype(np.float32)

    def rows(t, y):
        return jnp.stack([y[1], -y[0]])

    tq = np.linspace(0.0, 4.0, 6)
    yf, st, ns, nf, yev, sol = solve_fused_adams(
        rows, (0.0, 4.0), Y0, rtol=1e-5, atol=1e-8, k_max=6,
        block_members=128, interpret=True, t_eval=tq, dense=256)
    assert np.all(np.asarray(st) == 1)
    assert bool(np.all(np.asarray(sol.valid)))
    fv = np.asarray(sol(jnp.asarray(tq, jnp.float32)))   # (B, 2, m)
    assert np.abs(fv.transpose(2, 0, 1) - np.asarray(yev)).max() \
        < 5e-5
    assert np.abs(np.asarray(sol(jnp.float32(4.0)))
                  - np.asarray(yf)).max() < 1e-6
    exact = np.stack([np.cos(tq) + 0.5 * np.sin(tq),
                      -np.sin(tq) + 0.5 * np.cos(tq)])
    assert np.abs(fv[0].T - exact.T).max() < 1e-3
