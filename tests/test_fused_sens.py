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
