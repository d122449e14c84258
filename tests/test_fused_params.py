"""Per-member parameters on the fused kernels (interpret mode).

Every fused family/layout accepts ``params=(B, k)``: the RHS (and
each event callable) gains a third argument ``p``, a k-tuple of
per-member tiles — the parameter-sweep ensemble axis the reference
runs as one python loop over solve_ivp calls.  The flat layouts are
pinned BIT-EXACT against the same kernel with the parameter baked in
as a constant (identical trace modulo the parameter source); grid
layouts to tolerance (XLA constant-folds baked-in scalars into fused
multiplies, reassociating one ulp).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from extensisq_tpu import BS5, Fi5N, Kv3I
from extensisq_tpu.ops import (solve_fused_erk, solve_fused_rkn,
                               solve_fused_adams, solve_fused_esdirk,
                               solve_fused_ckdisc)
from extensisq_tpu.ops.fused_erk_grid import solve_fused_erk_grid
from extensisq_tpu.ops.fused_adams_grid import solve_fused_adams_grid
from extensisq_tpu.ops.fused_esdirk_grid import solve_fused_esdirk_grid
from extensisq_tpu.ops.fused_rkn_grid import solve_fused_rkn_grid

pytestmark = pytest.mark.slow  # interpret-mode fused kernels: multi-minute

B = 128


def test_fused_erk_params_bit_exact_vs_baked():
    def vdp_p(t, y, p):
        return jnp.stack([y[1], p[0] * (1 - y[0] ** 2) * y[1] - y[0]])

    mus = np.linspace(1.0, 4.0, B).astype(np.float32)
    Y0 = np.stack([np.full(B, 2.0), np.zeros(B)],
                  axis=1).astype(np.float32)
    y, st, ns, nf = solve_fused_erk(
        vdp_p, (0.0, 5.0), Y0, method=BS5, rtol=1e-4, atol=1e-6,
        block_members=128, interpret=True, params=mus[:, None])
    assert np.all(np.asarray(st) == 1)
    # per-member counters/endpoints == the same kernel with mu baked in
    for i in [0, 37, 127]:
        mu = float(mus[i])

        def vdp(t, y, mu=mu):
            return jnp.stack([y[1],
                              mu * (1 - y[0] ** 2) * y[1] - y[0]])

        o2 = solve_fused_erk(vdp, (0.0, 5.0),
                             Y0[i:i + 1].repeat(128, 0), method=BS5,
                             rtol=1e-4, atol=1e-6, block_members=128,
                             interpret=True)

        assert np.array_equal(np.asarray(o2[0][0]), np.asarray(y[i]))
        assert int(np.asarray(o2[2][0])) == int(np.asarray(ns[i]))
        assert int(np.asarray(o2[3][0])) == int(np.asarray(nf[i]))


def test_fused_erk_params_terminal_event():
    def vdp_p(t, y, p):
        return jnp.stack([y[1], p[0] * (1 - y[0] ** 2) * y[1] - y[0]])

    def g(t, y, p):                      # events get params too
        return y[0]
    g.terminal = True

    mus = np.linspace(1.0, 4.0, B).astype(np.float32)[:, None]
    Y0 = np.stack([np.full(B, 2.0), np.zeros(B)],
                  axis=1).astype(np.float32)
    y, st, ns, nf, tev, yev, nev = solve_fused_erk(
        vdp_p, (0.0, 5.0), Y0, method=BS5, rtol=1e-4, atol=1e-6,
        block_members=128, interpret=True, params=mus, events=g)
    assert np.all(np.asarray(st) == 8)           # all truncated
    assert np.all(np.asarray(nev) == 1)
    assert np.all(np.abs(np.asarray(yev)[0, :, 0]) < 1e-5)


def test_fused_rkn_params_oscillator():
    def acc_p(t, u, v, p):
        return jnp.stack([-p[0] * u[0]])

    w2 = np.linspace(1.0, 4.0, B).astype(np.float32)[:, None]
    Y0 = np.stack([np.ones(B), np.zeros(B)],
                  axis=1).astype(np.float32)
    y, st, ns, nf = solve_fused_rkn(
        acc_p, (0.0, 3.0), Y0, method=Fi5N, rtol=1e-5, atol=1e-7,
        block_members=128, interpret=True, params=w2)
    assert np.all(np.asarray(st) == 1)
    om = np.sqrt(w2[:, 0])
    assert np.max(np.abs(np.asarray(y[:, 0])
                         - np.cos(om * 3.0))) < 1e-4


def test_fused_adams_params_decay():
    def dec_p(t, y, p):
        return jnp.stack([-p[0] * y[0], -2.0 * p[0] * y[1]])

    lam = np.linspace(0.5, 2.0, B).astype(np.float32)[:, None]
    Y0 = np.ones((B, 2), np.float32)
    y, st, ns, nf = solve_fused_adams(
        dec_p, (0.0, 1.0), Y0, rtol=1e-4, atol=1e-7, k_max=6,
        block_members=128, interpret=True, params=lam)
    assert np.all(np.asarray(st) == 1)
    assert np.max(np.abs(np.asarray(y[:, 0])
                         - np.exp(-lam[:, 0] * 1.0))) < 1e-3
    # host init went through the per-member RHS: step counts differ
    # across the sweep (stiffer members take more steps)
    assert int(np.asarray(ns[-1])) > int(np.asarray(ns[0]))


def test_fused_esdirk_params_stiff():
    def stiff_p(t, y, p):
        return jnp.stack([-p[0] * (y[0] - jnp.cos(t))])

    k = np.linspace(50.0, 500.0, B).astype(np.float32)[:, None]
    Y0 = np.zeros((B, 1), np.float32)
    y, st, ns, nf = solve_fused_esdirk(
        stiff_p, (0.0, 1.0), Y0, method=Kv3I, rtol=1e-4, atol=1e-6,
        block_members=128, interpret=True, params=k)
    assert np.all(np.asarray(st) == 1)
    kk = k[:, 0].astype(np.float64)
    exact = (kk * (kk * np.cos(1.0) + np.sin(1.0)) / (kk ** 2 + 1.0)
             - kk ** 2 / (kk ** 2 + 1.0) * np.exp(-kk * 1.0))
    assert np.max(np.abs(np.asarray(y[:, 0]) - exact)) < 2e-3


def test_fused_ckdisc_params_event_root():
    def dsc_p(t, y, p):
        return jnp.stack([-p[0] * y[0]])

    def gev(t, y, p):
        return y[0] - 0.5
    gev.terminal = True

    lam = np.linspace(0.5, 2.0, B).astype(np.float32)[:, None]
    Y0 = np.ones((B, 1), np.float32)
    y, st, ns, nf, tev, yev, nev = solve_fused_ckdisc(
        dsc_p, (0.0, 4.0), Y0, rtol=1e-5, atol=1e-8,
        block_members=128, interpret=True, params=lam, events=gev)
    assert np.all(np.asarray(st) == 8)
    t_exact = np.log(2.0) / lam[:, 0]
    assert np.max(np.abs(np.asarray(tev)[0] - t_exact)) < 1e-4


@pytest.mark.parametrize("n", [128])
def test_fused_erk_grid_params_advection(n):
    dx = 1.0 / n

    def adv(t, y, p):
        return -p[0] * (y - jnp.roll(y, 1, -1)) / dx

    x = np.arange(n) * dx
    Y0 = np.exp(-100 * (x - 0.3) ** 2)[None].repeat(16, 0)
    c = np.linspace(0.5, 1.5, 16).astype(np.float32)[:, None]
    y, st, ns, nf = solve_fused_erk_grid(
        adv, (0.0, 0.2), Y0.astype(np.float32), method=BS5,
        rtol=1e-5, atol=1e-7, block_members=8, interpret=True,
        params=c)
    assert np.all(np.asarray(st) == 1)
    for i in [0, 15]:
        ci = float(c[i, 0])

        def adv1(t, y, ci=ci):
            return -ci * (y - jnp.roll(y, 1, -1)) / dx

        o2 = solve_fused_erk_grid(
            adv1, (0.0, 0.2), Y0[i:i + 1].repeat(8, 0), method=BS5,
            rtol=1e-5, atol=1e-7, block_members=8, interpret=True)
        # XLA folds the baked-in constant into the divide (one-ulp
        # reassociation) — tolerance-level equality, exact counters
        assert np.max(np.abs(np.asarray(o2[0][0])
                             - np.asarray(y[i]))) < 1e-4
        assert int(np.asarray(o2[2][0])) == int(np.asarray(ns[i]))


def test_fused_adams_grid_params_heat():
    n = 128
    dx = 1.0 / n

    def heat_p(t, y, p):
        return p[0] * (jnp.roll(y, 1, -1) - 2 * y
                       + jnp.roll(y, -1, -1)) / dx ** 2

    x = np.arange(n) * dx
    Y0 = np.sin(2 * np.pi * x)[None].repeat(16, 0).astype(np.float32)
    D = np.linspace(0.001, 0.003, 16).astype(np.float32)[:, None]
    y, st, ns, nf = solve_fused_adams_grid(
        heat_p, (0.0, 0.3), Y0, rtol=1e-4, atol=1e-7, k_max=6,
        block_members=8, interpret=True, params=D)
    assert np.all(np.asarray(st) == 1)
    lam_m = (2.0 / dx * np.sin(np.pi / n)) ** 2
    for i in [0, 15]:
        exact = (np.exp(-float(D[i, 0]) * lam_m * 0.3)
                 * np.sin(2 * np.pi * x))
        assert np.max(np.abs(np.asarray(y[i]) - exact)) < 5e-3


def test_fused_rkn_grid_params_wave():
    n = 128
    x = np.arange(n) / n

    def accg(t, u, v, p):
        return p[0] * (jnp.roll(u, 1, -1) - 2 * u
                       + jnp.roll(u, -1, -1))

    U0 = np.sin(2 * np.pi * x)
    Y0 = np.concatenate([U0, np.zeros(n)])[None].repeat(16, 0)
    c2 = np.linspace(5.0, 20.0, 16).astype(np.float32)[:, None]
    y, st, ns, nf = solve_fused_rkn_grid(
        accg, (0.0, 1.0), Y0.astype(np.float32), method=Fi5N,
        rtol=1e-5, atol=1e-7, block_members=8, interpret=True,
        params=c2)
    assert np.all(np.asarray(st) == 1)
    for i in [0, 15]:
        om = np.sqrt(float(c2[i, 0])) * 2.0 * np.sin(np.pi / n)
        exact = np.cos(om) * U0
        assert np.max(np.abs(np.asarray(y[i, :n]) - exact)) < 5e-3


def test_fused_esdirk_grid_params_reaction_diffusion():
    n = 128
    dx = 1.0 / n
    x = np.arange(n) * dx

    def rd_p(t, y, p):
        lap = (jnp.roll(y, 1, -1) - 2 * y
               + jnp.roll(y, -1, -1)) / dx ** 2
        return 0.001 * lap - p[0] * y

    r = np.linspace(1.0, 5.0, 8).astype(np.float32)[:, None]
    Y0 = (1.0 + 0.1 * np.sin(2 * np.pi * x))[None].repeat(8, 0)
    y, st, ns, nf = solve_fused_esdirk_grid(
        rd_p, (0.0, 0.5), Y0.astype(np.float32), method=Kv3I,
        rtol=1e-4, atol=1e-6, block_members=8, interpret=True,
        params=r)
    assert np.all(np.asarray(st) == 1)
    lam_m = (2.0 / dx * np.sin(np.pi / n)) ** 2
    for i in [0, 7]:
        rr = float(r[i, 0])
        exact = np.exp(-rr * 0.5) * (
            1.0 + 0.1 * np.exp(-0.001 * lam_m * 0.5)
            * np.sin(2 * np.pi * x))
        assert np.max(np.abs(np.asarray(y[i]) - exact)) < 2e-3
