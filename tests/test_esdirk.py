"""ESDIRK solver conformance: work counts, stiff problems, linear fast
path, complex support, and index-1 DAEs (strategy of
/root/reference/tests/test_ivp.py:294-366 and tests/test_DAE.py)."""
import jax
import numpy as np
import jax.numpy as jnp
import pytest

from extensisq_tpu import (solve_ivp, TRBDF2, TRX2, KC3I, KC4I, KC4Ia,
                           Kv3I)
from extensisq_tpu.solve import solve

METHODS = [TRBDF2, TRX2, KC3I, KC4I, KC4Ia, Kv3I]


def fun_rational(t, y):
    return jnp.stack([y[1] / t,
                      y[1] * (y[0] + 2 * y[1] - 1) / (t * (y[0] - 1))])


def jac_rational(t, y):
    return jnp.array([
        [0.0, 1 / t],
        [-y[1] ** 2 / (t * (y[0] - 1) ** 2),
         (y[0] + 4 * y[1] - 1) / (t * (y[0] - 1))]])


def sol_rational(t):
    t = np.asarray(t)
    return np.asarray([t / (t + 10), 10 * t / (t + 10) ** 2])


@pytest.mark.parametrize("method", METHODS, ids=lambda m: m.name)
@pytest.mark.parametrize("t_span", [[5, 9], [5, 1]])
@pytest.mark.parametrize("jac", [None, jac_rational],
                         ids=["jac-ad", "jac-analytic"])
def test_integration_rational(method, t_span, jac):
    rtol, atol = 1e-3, 1e-6
    res = solve_ivp(fun_rational, t_span, [1 / 3, 2 / 9], rtol=rtol,
                    atol=atol, method=method, dense_output=True, jac=jac)
    assert res.success
    budget = 65 if method in (KC3I, KC4I) else 44
    assert res.nfev < budget
    assert 0 < res.njev < 3
    assert 0 < res.nlu < 10

    scale = np.abs(sol_rational(res.t)).max(axis=1)[:, None]
    e = (res.y - sol_rational(res.t)) / (atol + rtol * scale)
    assert np.all(np.linalg.norm(e, axis=0) / np.sqrt(2) < 5)

    tc = np.linspace(*t_span)
    e = (np.asarray(res.sol(tc)) - sol_rational(tc)) / (atol + rtol * scale)
    assert np.all(np.linalg.norm(e, axis=0) / np.sqrt(2) < 5)


@pytest.mark.parametrize("method", METHODS, ids=lambda m: m.name)
def test_robertson_budget(method):
    """Robertson stiff to t=1e8 within the reference work budgets
    (test_ivp.py:345-366)."""
    def rob(t, y):
        return jnp.stack([-0.04 * y[0] + 1e4 * y[1] * y[2],
                          0.04 * y[0] - 1e4 * y[1] * y[2]
                          - 3e7 * y[1] ** 2,
                          3e7 * y[1] ** 2])

    res = solve_ivp(rob, (0, 1e8), [1e4, 0.0, 0.0], rtol=1e-6, atol=1e-6,
                    method=method)
    assert res.success
    assert res.nfev < 5700
    assert res.njev < 200
    # all mass is in x and z at t = 1e8 (matches the reference solver's
    # endpoint for this setup to 8 digits)
    assert res.y[1, -1] < 1e-4
    assert res.y[0, -1] + res.y[2, -1] == pytest.approx(1e4, rel=1e-3)


@pytest.mark.parametrize("method", [TRBDF2, Kv3I], ids=lambda m: m.name)
def test_linear_constant_jac_fast_path(method):
    """Constant-array jac => linear path: one iteration per stage and
    njev == 0 (test_ivp.py:294-341)."""
    A = np.array([[-1.0, 3.0], [0.0, -2.0]])

    def fun(t, y):
        return jnp.asarray(A) @ y

    res = solve_ivp(fun, (0, 2), [1.0, 1.0], method=method, jac=A,
                    rtol=1e-6, atol=1e-9)
    assert res.success
    assert res.njev == 0
    # exact solution of the linear system
    from scipy.linalg import expm
    exact = expm(2 * A) @ np.array([1.0, 1.0])
    np.testing.assert_allclose(res.y[:, -1], exact, rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("method", [TRBDF2, KC3I], ids=lambda m: m.name)
def test_complex(method):
    def fun(t, y):
        return -y

    def jac(t, y):
        return -jnp.eye(1, dtype=jnp.complex128)

    res = solve_ivp(fun, [0, 1], np.array([0.5 + 1j]), method=method,
                    rtol=1e-3, atol=1e-6, jac=jac)
    assert res.success
    assert res.njev == 1
    assert res.nlu < 6
    y_true = (0.5 + 1j) * np.exp(-res.t[-1])
    assert abs(res.y[0, -1] - y_true) < 5e-3


# ---------------------------------------------------------------------------
# DAE: Kaps problem (tests/test_DAE.py)
# ---------------------------------------------------------------------------

from extensisq_tpu.problems import kaps as _kaps_problem  # noqa: E402

_KAPS = _kaps_problem()
kaps, kaps_jac, kaps_ref = _KAPS.rhs, _KAPS.jac, _KAPS.solution


M_dense = np.array([[0.0, 0.0], [0.0, 1.0]])
M_diag = np.array([0.0, 1.0])


@pytest.mark.parametrize("method", METHODS, ids=lambda m: m.name)
def test_dae_kaps(method):
    interpolant = {}
    if method in (KC3I, KC4I, KC4Ia, Kv3I):
        interpolant = {"interpolant": "C1"}
    for M in (M_diag, M_dense):
        for J in (kaps_jac, None):
            for y0 in ([1.0, 1.0], [2.0, 1.0]):
                with np.errstate(all="ignore"):
                    import warnings
                    with warnings.catch_warnings():
                        warnings.simplefilter("ignore")
                        sol = solve_ivp(kaps, (0, 1.0), y0, method=method,
                                        jac=J, M=M, dense_output=True,
                                        **interpolant)
                assert sol.success
                # consistent projection reproduced by the interpolant
                np.testing.assert_allclose(
                    np.asarray(sol.sol(sol.t[0])), [1.0, 1.0], atol=1e-8)
                # initial derivative ~ [-2, -1]
                h = (sol.t[1] - sol.t[0]) / 10
                ypn = (np.asarray(sol.sol(sol.t[0] + h))
                       - np.asarray(sol.sol(sol.t[0]))) / h
                np.testing.assert_allclose(ypn, [-2.0, -1.0], atol=1e-4,
                                           rtol=1e-2)
                # accuracy at the end and along the path
                np.testing.assert_allclose(sol.y[:, -1], kaps_ref(1.0),
                                           atol=1e-5, rtol=1e-2)
                np.testing.assert_allclose(sol.y[:, 1:],
                                           kaps_ref(sol.t[1:]),
                                           atol=1e-5, rtol=1e-2)
                # algebraic constraint holds
                np.testing.assert_allclose(sol.y[1, 1:] ** 2,
                                           sol.y[0, 1:], atol=1e-6,
                                           rtol=1e-3)


@pytest.mark.parametrize("method", [TRBDF2, Kv3I], ids=lambda m: m.name)
def test_dae_hidden_mass_matrix(method):
    """Random similarity-transformed ('hidden') mass matrix: the SVD
    untangling must recover the same solution (test_DAE.py:137-162)."""
    rng = np.random.RandomState(42)
    T = rng.rand(2, 2) + np.eye(2)
    Tinv = np.linalg.inv(T)
    M_h = T @ M_dense

    def fun_h(t, y):
        return jnp.asarray(T) @ kaps(t, y)

    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sol = solve_ivp(fun_h, (0, 1.0), [1.0, 1.0], method=method,
                        M=M_h)
    assert sol.success
    np.testing.assert_allclose(sol.y[:, -1], kaps_ref(1.0), atol=1e-4,
                               rtol=1e-2)
    del Tinv


def test_dae_index2_rejected():
    """An index-2 system must be detected and rejected."""
    # y0' = y1, 0 = y0 (index 2)
    def fun(t, y):
        return jnp.stack([y[1], y[0]])

    def jac(t, y):
        return jnp.array([[0.0, 1.0], [1.0, 0.0]])

    M = np.array([[1.0, 0.0], [0.0, 0.0]])
    # Gvv = dg/dv with g = y0: independent of the algebraic var => rank 0
    with pytest.raises(ValueError, match="index"):
        solve_ivp(lambda t, y: jnp.stack([y[1], y[0] * 1.0]), (0, 1),
                  [0.0, 0.0], method=TRBDF2, M=M,
                  jac=lambda t, y: jnp.array([[0.0, 1.0], [1.0, 0.0]]))
    del fun, jac


@pytest.mark.parametrize("method", [KC3I, KC4I], ids=lambda m: m.name)
def test_interpolant_selection(method):
    for ip in ("C0", "C1"):
        res = solve_ivp(fun_rational, [5, 9], [1 / 3, 2 / 9], rtol=1e-6,
                        atol=1e-9, method=method, dense_output=True,
                        interpolant=ip)
        tc = np.linspace(5, 9, 17)
        scale = np.abs(sol_rational(tc)).max(axis=1)[:, None]
        e = (np.asarray(res.sol(tc)) - sol_rational(tc)) \
            / (1e-9 + 1e-6 * scale)
        assert np.all(np.linalg.norm(e, axis=0) / np.sqrt(2) < 5), ip


def test_flat_path_matches_host_driver():
    """solve() uses step_flat (one attempt per while iteration); it
    must reproduce the host driver's nested loop exactly — including
    through Newton-failure retries and error rejections."""
    def vdp(t, y):
        return jnp.stack([y[1], 5.0 * (1 - y[0] ** 2) * y[1] - y[0]])

    y0 = jnp.array([2.0, 0.0])
    out = jax.jit(lambda y: solve(vdp, (0.0, 20.0), y, method=TRBDF2,
                                  rtol=1e-5, atol=1e-8))(y0)
    ref = solve_ivp(vdp, (0.0, 20.0), y0, method=TRBDF2,
                    rtol=1e-5, atol=1e-8)
    assert int(out.nsteps) == ref.t.size - 1
    assert int(out.nfev) == ref.nfev
    np.testing.assert_array_equal(np.asarray(out.y), ref.y[:, -1])


def test_dae_pendulum_index1():
    """Index-1 Cartesian pendulum (twice-differentiated length
    constraint, singular mass matrix): consistent-lambda projection at
    t0 and constraint preservation along the solve.  Step counts are
    within a few steps of the reference run with an analytic Jacobian
    (2846; autodiff Jacobians differ at round-off)."""
    from extensisq_tpu.problems import pendulum_dae

    P = pendulum_dae(theta0=0.5)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = solve_ivp(P.rhs, P.t_span, P.y0, method=Kv3I,
                      rtol=1e-6, atol=1e-8, M=P.M)
    assert r.success
    # projected initial lambda: g*cos(th) (v=0 at t0)
    np.testing.assert_allclose(r.y[4, 0], P.extra["lambda0"],
                               rtol=1e-6)
    # length constraint preserved to tolerance-level drift
    drift = np.abs(r.y[0] ** 2 + r.y[1] ** 2 - 1.0).max()
    assert drift < 5e-4
    assert abs(r.t.size - 1 - 2846) < 30


@pytest.mark.parametrize("method", [TRBDF2, Kv3I], ids=lambda m: m.name)
def test_mass_matrix_vs_inverted_ode(method):
    """Nonsingular mass matrix M y' = f must behave like the explicitly
    inverted ODE y' = M^-1 f: step/eval/jac counts within small budgets
    and matching solutions (reference test_DAE.py:177-197)."""
    eps = 1e-3

    def kaps_f(t, y):
        return jnp.stack([-(1 + 2 * eps) * y[0] + y[1] ** 2,
                          y[0] - y[1] - y[1] ** 2])

    Mp = np.array([[eps, 0.0], [0.0, 1.0]])
    Mpinv = np.linalg.inv(Mp)

    def kaps_inv(t, y):
        return jnp.asarray(Mpinv) @ kaps_f(t, y)

    import warnings
    for y0 in ([1.0, 1.0], [2.0, 1.0]):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sol_m = solve_ivp(kaps_f, (0.0, 1.0), y0, method=method,
                              M=Mp)
            sol_i = solve_ivp(kaps_inv, (0.0, 1.0), y0, method=method,
                              dense_output=True)
        assert sol_m.success and sol_i.success
        assert abs(sol_m.t.size - sol_i.t.size) < 3
        assert abs(sol_m.nfev - sol_i.nfev) < 20
        assert abs(sol_m.njev - sol_i.njev) < 2
        np.testing.assert_allclose(sol_m.y, sol_i.sol(sol_m.t),
                                   atol=1e-5, rtol=1e-2)
