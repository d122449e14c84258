"""Sensitivity analysis: CVODES reference values (Robertson setup of
/root/reference/tests/test_sens.py) + autodiff defaults + grad-native
continuous adjoint."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from extensisq_tpu import KC4I, TRBDF2, BS5
from extensisq_tpu.sensitivity import (sens_forward, sens_adjoint_end,
                                       sens_adjoint_int, solve_final)


def fun(t, y, *p):
    p1, p2, p3 = p
    return jnp.stack([-p1 * y[0] + p2 * y[1] * y[2],
                      p1 * y[0] - p2 * y[1] * y[2] - p3 * y[1] ** 2,
                      p3 * y[1] ** 2])


def jac(t, y, *p):
    p1, p2, p3 = p
    return jnp.array([[-p1, p2 * y[2], p2 * y[1]],
                      [p1, -p2 * y[2] - 2 * p3 * y[1], -p2 * y[1]],
                      [0.0, 2 * p3 * y[1], 0.0]])


def dfdp(t, y, *p):
    return jnp.array([[-y[0], y[1] * y[2], 0.0],
                      [y[0], -y[1] * y[2], -y[1] ** 2],
                      [0.0, 0.0, y[1] ** 2]])


Y0 = np.array([1.0, 0.0, 0.0])
P = (0.04, 1e4, 3e7)
DY0DP = np.zeros((3, 3))
RTOL = 1e-4
ATOL = np.array([1e-8, 1e-14, 1e-6])

# hard-coded CVODES reference numbers (test_sens.py:61-70)
YF = [9.8517e-01, 3.3864e-05, 1.4794e-02]
SENS = [[-3.5595e-01, 9.5428e-08, -1.5832e-11],
        [3.9026e-04, -2.1310e-10, -5.2900e-13],
        [3.5556e-01, -9.5215e-08, 1.6361e-11]]


@pytest.mark.parametrize("method", [KC4I, TRBDF2], ids=lambda m: m.name)
@pytest.mark.parametrize("derivs", ["analytic", "autodiff"])
def test_sens_forward(method, derivs):
    J, D = (jac, dfdp) if derivs == "analytic" else (None, None)
    sens, yf, _ = sens_forward(fun, (0.0, 0.4), Y0, J, D, DY0DP, p=P,
                               method=method, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(yf, YF, rtol=1e-3)
    np.testing.assert_allclose(sens, SENS, rtol=1e-3)


def test_sens_forward_approx_jac():
    """use_approx_jac=True supplies the block-diagonal Newton Jacobian
    (reference sensitivity.py:183-210): same answers, possibly more
    iterations; explicit methods warn and ignore the flag."""
    sens, yf, sol = sens_forward(fun, (0.0, 0.4), Y0, None, None,
                                 DY0DP, p=P, method=KC4I, rtol=RTOL,
                                 atol=ATOL, use_approx_jac=True)
    np.testing.assert_allclose(yf, YF, rtol=1e-3)
    np.testing.assert_allclose(sens, SENS, rtol=1e-3)
    with pytest.warns(UserWarning, match="use_approx_jac"):
        sens_forward(fun, (0.0, 0.4), Y0, None, None, DY0DP, p=P,
                     method=BS5, rtol=RTOL, atol=ATOL,
                     use_approx_jac=True)


def test_sens_forward_sparsity_pattern_matches_dense_jac():
    """The default implicit path evaluates the exact augmented
    Jacobian through its block sparsity; it must equal the dense AD
    Jacobian of the augmented RHS wherever the pattern is set (and the
    pattern must cover every structural nonzero)."""
    from extensisq_tpu.core.linalg import group_columns

    Ny, Np = 3, 3
    m = (Np + 1) * Ny
    S = np.zeros((m, m), dtype=int)
    S[:, :Ny] = 1
    for i in range(Np):
        S[(i + 1) * Ny:(i + 2) * Ny, (i + 1) * Ny:(i + 2) * Ny] = 1
    _, ng = group_columns(S)
    assert ng == 2 * Ny                      # independent of Np

    p = jnp.asarray(P)

    def total_fun(t, z):
        y = z[:Ny]
        s = z[Ny:].reshape(Np, Ny)
        eye = jnp.eye(Np)
        ds = jax.vmap(lambda si, ei: jax.jvp(
            lambda yy, pp: fun(t, yy, *pp), (y, p), (si, ei))[1])(s, eye)
        return jnp.concatenate([jnp.asarray(fun(t, y, *P)),
                                ds.reshape(-1)])

    z = jnp.asarray(np.concatenate([[1.0, 2e-5, 0.01],
                                    np.random.default_rng(1)
                                    .standard_normal(Np * Ny)]))
    Jd = np.asarray(jax.jacfwd(total_fun, argnums=1)(0.1, z))
    assert not np.any((Jd != 0) & (S == 0)), \
        "pattern misses a structural nonzero"


@pytest.mark.parametrize("method", [KC4I], ids=lambda m: m.name)
def test_sens_adjoint_end(method):
    sol_y = None
    for i in range(3):
        def g(t, y, *p, i=i):
            return jnp.array([y[i]])

        sens, gf, sol_y, _ = sens_adjoint_end(
            fun, (0.0, 0.4), Y0, None, None, DY0DP, P, g, None, None,
            method=method, atol=ATOL, rtol=RTOL, atol_adj=1e-6,
            atol_quad=1e-7, sol_y=sol_y)
        np.testing.assert_allclose(gf, YF[i], rtol=1e-3)
        np.testing.assert_allclose(sens, SENS[i], rtol=1e-2, atol=1e-13)


def test_sens_adjoint_int():
    def g(t, y, *p):
        return jnp.array([y[0] + p[1] * y[1] * y[2]])

    sens, G, sol_y, sol_bw = sens_adjoint_int(
        fun, (0.0, 4e7), Y0, None, None, DY0DP, P, g, None, None,
        method=KC4I, atol=ATOL, rtol=RTOL, atol_adj=1e-5, atol_quad=1e-6)
    np.testing.assert_allclose(sol_y.y[:, -1],
                               [5.2016e-05, 2.0808e-10, 9.9995e-01],
                               rtol=1e-2)
    np.testing.assert_allclose(G, 1.8219e4, rtol=5e-3)
    np.testing.assert_allclose(sens, [-7.8383e5, 3.1991, -5.3301e-4],
                               rtol=1e-2)
    np.testing.assert_allclose(sol_bw.y[:3, -1],
                               [3.4249e4, 3.4206e4, 3.4139e4], rtol=1e-2)


def test_grad_native_adjoint():
    """jax.grad through a whole device solve (custom_vjp continuous
    adjoint) agrees with forward sensitivities and finite differences."""
    def vdp(t, y, mu):
        return jnp.stack([y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]])

    gmu = jax.grad(lambda mu: solve_final(
        vdp, (0.0, 5.0), jnp.array([2.0, 0.0]), mu, BS5, 1e-9,
        1e-12)[0])(1.5)
    sens, _, _ = sens_forward(lambda t, y, mu: vdp(t, y, mu), (0.0, 5.0),
                              np.array([2.0, 0.0]), p=(1.5,), rtol=1e-10,
                              atol=1e-13, method=BS5)
    np.testing.assert_allclose(float(gmu), sens[0, 0], rtol=1e-6)

    gy0 = jax.grad(lambda y0: solve_final(
        vdp, (0.0, 5.0), y0, 1.5, BS5, 1e-9, 1e-12)[0])(
        jnp.array([2.0, 0.0]))

    def yf0(y0):
        return float(solve_final(vdp, (0.0, 5.0), jnp.asarray(y0), 1.5,
                                 BS5, 1e-11, 1e-14)[0])

    eps = 1e-6
    fd = [(yf0([2 + eps, 0]) - yf0([2 - eps, 0])) / (2 * eps),
          (yf0([2, eps]) - yf0([2, -eps])) / (2 * eps)]
    np.testing.assert_allclose(np.asarray(gy0), fd, rtol=1e-6)


def test_grad_native_vmapped():
    """Gradients of an ensemble of solves in one program."""
    def vdp(t, y, mu):
        return jnp.stack([y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]])

    mus = jnp.linspace(0.5, 2.0, 4)
    grads = jax.vmap(jax.grad(lambda mu: solve_final(
        vdp, (0.0, 3.0), jnp.array([2.0, 0.0]), mu, BS5, 1e-8,
        1e-11)[0]))(mus)
    assert grads.shape == (4,)
    g1 = jax.grad(lambda mu: solve_final(
        vdp, (0.0, 3.0), jnp.array([2.0, 0.0]), mu, BS5, 1e-8,
        1e-11)[0])(float(mus[2]))
    np.testing.assert_allclose(float(grads[2]), float(g1), rtol=1e-8)
