"""Fused forward sensitivities and jax.grad through the fused path.

solve_fused_sens integrates the variational system in ONE Pallas
kernel (tangent rows from in-kernel jax.jvp of the user RHS);
solve_fused_final is the custom_vjp twin of sensitivity.solve_final
whose backward pass is one fused augmented solve.  All runs interpret
mode (the conftest forces CPU); tolerances calibrated against f64
XLA sensitivities (sens_forward, jacrev of solve_final).
"""
import numpy as np
import jax
import jax.numpy as jnp

from extensisq_tpu import BS5, sensitivity
from extensisq_tpu.ops import solve_fused_erk
from extensisq_tpu.ops.fused_sens import (solve_fused_sens,
                                          solve_fused_final)

B = 128
SPAN = (0.0, 3.0)


def _vdp_rows(t, y, p):
    return jnp.stack([y[1], p[0] * (1 - y[0] ** 2) * y[1] - y[0]])


def _setup():
    Y0 = np.zeros((B, 2), np.float32)
    Y0[:, 0] = 2.0
    mus = np.linspace(1.0, 2.0, B).astype(np.float32)[:, None]
    return Y0, mus


def test_fused_sens_matches_fd_and_xla():
    """S_p from the fused variational solve matches (a) central
    finite differences of the fused kernel itself across the whole mu
    sweep and (b) the f64 XLA sens_forward for a spot member; S_y0
    matches jacrev of the XLA continuous adjoint."""
    Y0, mus = _setup()
    yf, Sp, Sy0, st, ns, nf = solve_fused_sens(
        _vdp_rows, SPAN, Y0, params=mus, sens_y0=True, rtol=1e-5,
        atol=1e-7, block_members=128, interpret=True)
    assert np.all(np.asarray(st) == 1)
    assert Sp.shape == (B, 2, 1) and Sy0.shape == (B, 2, 2)

    # (a) central differences through the plain fused kernel (tight
    # compensated runs so the FD quotient is clean)
    eps = 1e-3
    kw = dict(method=BS5, rtol=1e-7, atol=1e-9, block_members=128,
              interpret=True, compensated=True)
    yp = solve_fused_erk(_vdp_rows, SPAN, Y0, params=mus + eps, **kw)[0]
    ym = solve_fused_erk(_vdp_rows, SPAN, Y0, params=mus - eps, **kw)[0]
    fd = (np.asarray(yp) - np.asarray(ym)) / (2 * eps)
    assert np.max(np.abs(np.asarray(Sp)[:, :, 0] - fd)) < 3e-3

    # (b) f64 XLA forward sensitivities, member 0
    out = sensitivity.sens_forward(
        lambda t, y, mu: jnp.stack([y[1], mu * (1 - y[0] ** 2) * y[1]
                                    - y[0]]),
        SPAN, np.array([2.0, 0.0]), p=(float(mus[0, 0]),),
        rtol=1e-9, atol=1e-11)
    assert np.max(np.abs(np.asarray(yf)[0] - np.asarray(out.yf))) < 1e-4
    assert np.max(np.abs(np.asarray(Sp)[0, :, 0]
                         - np.asarray(out.sensf)[:, 0])) < 1e-3

    # S_y0 vs jacrev of the XLA continuous-adjoint solve_final
    mu0 = float(mus[0, 0])
    J = jax.jacrev(lambda y0: sensitivity.solve_final(
        lambda t, y, p: jnp.stack([y[1], p * (1 - y[0] ** 2) * y[1]
                                   - y[0]]),
        SPAN, y0, mu0, None, 1e-9, 1e-11, 10_000))(
            jnp.array([2.0, 0.0]))
    assert np.max(np.abs(np.asarray(Sy0)[0] - np.asarray(J))) < 1e-3


def test_fused_final_grad():
    """jax.grad through solve_fused_final: gradients w.r.t. y0, params
    and t_span for the whole ensemble from ONE fused augmented
    backward solve."""
    Y0, mus = _setup()

    def loss(tsp, Y, P):
        yf = solve_fused_final(_vdp_rows, tsp, Y, P, BS5, 1e-5, 1e-7,
                               100_000, 128, True, False)
        return jnp.sum(yf[:, 0])

    val, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(
        SPAN, jnp.asarray(Y0), jnp.asarray(mus))
    (dt0, dtf), gy0, gp = g

    # dL/dmu == the FD quotient of the fused kernel, member by member
    eps = 1e-3
    kw = dict(method=BS5, rtol=1e-7, atol=1e-9, block_members=128,
              interpret=True, compensated=True)
    yp = solve_fused_erk(_vdp_rows, SPAN, Y0, params=mus + eps, **kw)[0]
    ym = solve_fused_erk(_vdp_rows, SPAN, Y0, params=mus - eps, **kw)[0]
    fd = (np.asarray(yp)[:, 0] - np.asarray(ym)[:, 0]) / (2 * eps)
    assert np.max(np.abs(np.asarray(gp)[:, 0] - fd)) < 3e-3

    # autonomous system: shifting both endpoints together changes
    # nothing, so dt0 + dtf ~ 0 (each is O(|sum f|) ~ 300)
    assert abs(float(dt0) + float(dtf)) < 0.05 * abs(float(dtf))

    # dL/dy0 spot check vs jacrev of the f64 XLA adjoint (member 0)
    mu0 = float(mus[0, 0])
    J = jax.jacrev(lambda y0: sensitivity.solve_final(
        lambda t, y, p: jnp.stack([y[1], p * (1 - y[0] ** 2) * y[1]
                                   - y[0]]),
        SPAN, y0, mu0, None, 1e-9, 1e-11, 10_000))(
            jnp.array([2.0, 0.0]))
    assert np.max(np.abs(np.asarray(gy0)[0]
                         - np.asarray(J)[0, :])) < 1e-3


def _robertson_rows(t, y, p):
    k1, k2, k3 = p
    r1 = k1 * y[0]
    r2 = k2 * y[1] * y[2]
    r3 = k3 * y[1] * y[1]
    return jnp.stack([-r1 + r2, r1 - r2 - r3, r3])


# CVODES Robertson forward-sensitivity table at t = 0.4 (the
# reference's flagship stiff-sensitivity oracle,
# /root/reference/tests/test_sens.py:61-66)
_CVODES_YF = np.array([9.8517e-01, 3.3864e-05, 1.4794e-02])
_CVODES_SENS = np.array(
    [[-3.5595e-01, 9.5428e-08, -1.5832e-11],
     [3.9026e-04, -2.1310e-10, -5.2900e-13],
     [3.5556e-01, -9.5215e-08, 1.6361e-11]])


def test_fused_esdirk_sens_robertson_cvodes():
    """Fused STIFF forward sensitivities: Robertson through the
    simultaneous-corrector ESDIRK kernel (block_base) matches the
    CVODES table — the reference's own stiff-sensitivity oracle — and
    the f64 XLA sens_forward, column-scaled (f32 internal
    differentiation at rtol 1e-4)."""
    from extensisq_tpu.methods import TRBDF2
    Bs = 8
    y0b = np.tile([1.0, 0.0, 0.0], (Bs, 1)).astype(np.float32)
    pb = np.tile([0.04, 1e4, 3e7], (Bs, 1)).astype(np.float32)
    yf, Sp, Sy0, st, ns, nf = solve_fused_sens(
        _robertson_rows, (0.0, 0.4), y0b, params=pb, method=TRBDF2,
        rtol=1e-4, atol=1e-8, block_members=128, interpret=True)
    assert np.all(np.asarray(st) == 1)
    assert Sp.shape == (Bs, 3, 3) and Sy0 is None
    np.testing.assert_allclose(np.asarray(yf[0]), _CVODES_YF,
                               rtol=5e-4)
    S = np.asarray(Sp[0])
    # column-scaled: each dy/dp_j column spans ~11 decades across j
    for j in range(3):
        scale = np.abs(_CVODES_SENS[:, j]).max()
        np.testing.assert_allclose(S[:, j] / scale,
                                   _CVODES_SENS[:, j] / scale,
                                   atol=2e-2)
    # all members identical (same params)
    assert np.max(np.abs(np.asarray(Sp) - S)) == 0.0


def test_fused_esdirk_final_grad():
    """jax.grad through solve_fused_final with an ESDIRK method: the
    stiff ensemble's dL/dp and dL/dy0 from ONE fused augmented ESDIRK
    backward solve, checked against central differences of the fused
    primal and jacrev of the f64 XLA adjoint."""
    from extensisq_tpu.methods import TRBDF2
    from extensisq_tpu.ops import solve_fused_esdirk
    Bs = 8
    # mildly stiff parameterized problem (short-horizon Robertson is
    # FD-unfriendly; use a stiff linear-relaxation pair instead)
    def rows(t, y, p):
        return jnp.stack([-p[0] * (y[0] - jnp.sin(y[1])),
                          -y[1] + 0.1 * y[0]])

    y0b = np.tile([2.0, 1.0], (Bs, 1)).astype(np.float32)
    ks = np.linspace(50.0, 400.0, Bs).astype(np.float32)[:, None]

    def loss(tsp, Y, P):
        yf = solve_fused_final(rows, tsp, Y, P, TRBDF2, 1e-5, 1e-8,
                               100_000, 128, True, False)
        return jnp.sum(yf[:, 0])

    val, g = jax.value_and_grad(loss, argnums=(1, 2))(
        (0.0, 1.0), jnp.asarray(y0b), jnp.asarray(ks))
    gy0, gp = g

    eps = np.float32(0.5)
    kw = dict(method=TRBDF2, rtol=1e-6, atol=1e-9, block_members=128,
              interpret=True)
    yp = solve_fused_esdirk(rows, (0.0, 1.0), y0b, params=ks + eps,
                            **kw)[0]
    ym = solve_fused_esdirk(rows, (0.0, 1.0), y0b, params=ks - eps,
                            **kw)[0]
    fd = (np.asarray(yp)[:, 0] - np.asarray(ym)[:, 0]) / (2 * eps)
    assert np.max(np.abs(np.asarray(gp)[:, 0] - fd)) < 5e-5

    k0 = float(ks[0, 0])
    J = jax.jacrev(lambda y0: sensitivity.solve_final(
        lambda t, y, p: jnp.stack([-p * (y[0] - jnp.sin(y[1])),
                                   -y[1] + 0.1 * y[0]]),
        (0.0, 1.0), y0, k0, None, 1e-9, 1e-12, 10_000))(
            jnp.array([2.0, 1.0]))
    assert np.max(np.abs(np.asarray(gy0)[0]
                         - np.asarray(J)[0, :])) < 1e-4


def test_fused_sens_rejects_unsupported_family():
    from extensisq_tpu.methods import SSV2stab
    Y0, mus = _setup()
    with np.testing.assert_raises(ValueError):
        solve_fused_sens(_vdp_rows, SPAN, Y0, params=mus,
                         method=SSV2stab, interpret=True)


def test_fused_sens_y0_only():
    """params=None + sens_y0=True: the pure fundamental-solution mode
    (no parameter axis), and the plain-fun (t, y) RHS signature."""
    def lin_rows(t, y):
        return jnp.stack([-0.5 * y[0] + 0.2 * y[1],
                          -0.3 * y[1]])

    Y0 = np.tile(np.array([[1.0, 2.0]], np.float32), (B, 1))
    yf, Sp, Sy0, st, ns, nf = solve_fused_sens(
        lin_rows, (0.0, 1.0), Y0, sens_y0=True, rtol=1e-6, atol=1e-9,
        block_members=128, interpret=True)
    assert np.all(np.asarray(st) == 1)
    assert Sp.shape == (B, 2, 0)
    # constant-coefficient system: S_y0 == expm(A) exactly
    import scipy.linalg as sl
    A = np.array([[-0.5, 0.2], [0.0, -0.3]])
    E = sl.expm(A)
    assert np.max(np.abs(np.asarray(Sy0)[0] - E)) < 1e-5
    # and y_f == expm(A) y0
    assert np.max(np.abs(np.asarray(yf)[0] - E @ np.array([1.0, 2.0])
                         )) < 1e-5


def test_fused_sens_grid_layout_analytic():
    """GRID-layout fused sensitivities: the augmented [y | s] state
    rides the states-on-lanes kernel (layout="grid" is an explicit
    API contract — the grid fun convention transposes the arrays).
    Elementwise decay has exact sensitivities: S_a = -t * y0 e^{-at}."""
    n, Bs = 32, 8
    rates = np.linspace(0.5, 1.5, Bs).astype(np.float32)[:, None]
    Y0 = np.tile(np.linspace(1.0, 2.0, n, dtype=np.float32), (Bs, 1))

    def dec_g(t, y, p):                  # grid convention: y (bm, n)
        return -p[0] * y

    yf, Sp, Sy0, st, ns, nf = solve_fused_sens(
        dec_g, (0.0, 1.0), Y0, params=rates, rtol=1e-6, atol=1e-9,
        block_members=8, interpret=True, layout="grid")
    assert np.all(np.asarray(st) == 1) and Sy0 is None
    assert Sp.shape == (Bs, n, 1)
    ex = Y0 * np.exp(-rates)
    np.testing.assert_allclose(np.asarray(yf), ex, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(Sp)[:, :, 0], -ex,
                               rtol=5e-4)


def test_fused_sens_grid_layout_fisher_fd():
    """Nonlinear mid-size grid sensitivities (Fisher advection-
    reaction, n = 64) match central differences of the grid kernel
    itself across the growth-rate sweep."""
    from extensisq_tpu.ops import solve_fused_erk_grid
    n, Bs = 64, 8
    x = np.linspace(0, 1, n, endpoint=False)
    Y0 = np.tile((0.5 + 0.3 * np.sin(2 * np.pi * x))
                 .astype(np.float32), (Bs, 1))
    rates = np.linspace(0.8, 1.2, Bs).astype(np.float32)[:, None]

    def fisher(t, y, p):
        return -(y - jnp.roll(y, 1, -1)) * n + p[0] * y * (1.0 - y)

    yf, Sp, _, st, ns, nf = solve_fused_sens(
        fisher, (0.0, 0.25), Y0, params=rates, rtol=1e-5, atol=1e-8,
        block_members=8, interpret=True, layout="grid")
    assert np.all(np.asarray(st) == 1)

    eps = np.float32(4e-3)   # small eps drowns in f32 FD noise
    kw = dict(rtol=1e-7, atol=1e-10, block_members=8, interpret=True)
    yp = solve_fused_erk_grid(fisher, (0.0, 0.25), Y0,
                              params=rates + eps, **kw)[0]
    ym = solve_fused_erk_grid(fisher, (0.0, 0.25), Y0,
                              params=rates - eps, **kw)[0]
    fd = (np.asarray(yp) - np.asarray(ym)) / (2 * eps)
    scale = np.abs(fd).max()
    # FD of an f32 primal plus the rtol-1e-5 internal-differentiation
    # error: measured 2.9e-3 relative at eps 4e-3 (eps 1e-3 is FD-noise
    # dominated at ~9e-3)
    assert np.max(np.abs(np.asarray(Sp)[:, :, 0] - fd)) < 6e-3 * scale


def test_fused_sens_grid_rejects_sens_y0_and_block_m():
    """Guard rails: grid sens_y0 raises with the documented
    redirection; the grid kernel's block_base mode rejects mass
    matrices (the tiled base bands assume identity mass)."""
    import pytest
    from extensisq_tpu.ops import solve_fused_esdirk_grid
    Y0 = np.ones((8, 32), np.float32)
    P = np.ones((8, 1), np.float32)

    def g(t, y, p):
        return -p[0] * y

    with pytest.raises(ValueError, match="solve_fused_adjoint"):
        solve_fused_sens(g, (0.0, 1.0), Y0, params=P, sens_y0=True,
                         layout="grid", interpret=True)
    with pytest.raises(ValueError, match="M=None"):
        solve_fused_esdirk_grid(lambda t, y: -y, (0.0, 1.0),
                                np.ones((8, 64), np.float32),
                                M=np.ones(64), block_base=32,
                                interpret=True)
    with pytest.raises(ValueError, match="divide"):
        solve_fused_esdirk_grid(lambda t, y: -y, (0.0, 1.0),
                                np.ones((8, 64), np.float32),
                                block_base=48, interpret=True)


def test_fused_sens_grid_esdirk_mol_sweep():
    """GRID-layout STIFF fused sensitivities (VERDICT r4 item 3's
    done-criterion): a reaction-diffusion k-sweep through the
    simultaneous-corrector ESDIRK grid kernel (block_base — tiled
    tridiagonal base bands, one block-cyclic PCR per Newton
    iteration) matches the f64 XLA ``sens_forward`` on spot members
    to forward-sensitivity tolerance.  n = 64 also exercises
    PER-BLOCK lane padding (each [y | s_j] block pads 64 -> 128),
    and k = 2 parameters make 3 blocks (non-power-of-two count)."""
    from extensisq_tpu import sensitivity
    from extensisq_tpu.methods import TRBDF2

    n, Bs = 64, 8
    x = np.linspace(0, 1, n)
    Y0 = np.tile((1.0 + 0.5 * np.sin(np.pi * x)).astype(np.float32),
                 (Bs, 1))
    ks = np.linspace(5.0, 30.0, Bs).astype(np.float32)
    Ds = np.full(Bs, 200.0, np.float32)
    P = np.stack([ks, Ds], axis=1)

    def rd_g(t, y, p):                   # grid convention (bm, n)
        left = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
        right = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)
        return (left - 2.0 * y + right) * p[1] - p[0] * (y - 1.0)

    yf, Sp, Sy0, st, ns, nf = solve_fused_sens(
        rd_g, (0.0, 0.04), Y0, params=P, method=TRBDF2,
        rtol=1e-5, atol=1e-8, block_members=8, interpret=True,
        layout="grid")
    assert np.all(np.asarray(st) == 1) and Sy0 is None
    assert Sp.shape == (Bs, n, 2)

    def rd_1(t, y, k, D):                # single member (n,), f64
        left = jnp.concatenate([y[:1], y[:-1]])
        right = jnp.concatenate([y[1:], y[-1:]])
        return (left - 2.0 * y + right) * D - k * (y - 1.0)

    for b in (0, Bs - 1):
        ref = sensitivity.sens_forward(
            rd_1, (0.0, 0.04), np.asarray(Y0[b], np.float64),
            p=(float(ks[b]), float(Ds[b])), rtol=1e-9, atol=1e-12,
            method=TRBDF2)
        assert np.abs(np.asarray(yf[b]) - ref.yf).max() < 2e-5
        for j in range(2):
            sc = max(np.abs(ref.sensf[:, j]).max(), 1e-12)
            assert np.abs(np.asarray(Sp[b, :, j])
                          - ref.sensf[:, j]).max() < 3e-3 * sc
