"""Integration conformance suite, explicit RK methods.

Covers the behaviours the reference pins in
/root/reference/tests/test_ivp.py: the rational problem with work-count
budgets and tolerance-scaled error bounds (fwd+bwd), complex ODEs,
events (directions/terminal/backward), t_eval orderings, max_step /
first_step, degenerate cases, and the stepwise solver protocol.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from extensisq_tpu import (solve_ivp, BS5, Ts5, CK5, Me4, Pr7, Pr8, Pr9,
                           CFMR7osc)

from extensisq_tpu.problems import rational as _rational_problem

EXPLICIT = [BS5, Ts5, CK5, Me4, Pr7, Pr8, Pr9, CFMR7osc]

_RATIONAL = _rational_problem()
fun_rational, sol_rational = _RATIONAL.rhs, _RATIONAL.solution


def compute_error(y, y_true, rtol, atol):
    scale = np.abs(np.atleast_2d(y_true)).max(axis=1)[:, None]
    e = (y - y_true) / (atol + rtol * scale)
    return np.linalg.norm(e, axis=0) / np.sqrt(e.shape[0])


@pytest.mark.parametrize("method", EXPLICIT, ids=lambda m: m.name)
@pytest.mark.parametrize("t_span", [[5, 9], [5, 1]])
def test_integration_rational(method, t_span):
    rtol, atol = 1e-3, 1e-6
    res = solve_ivp(fun_rational, t_span, [1 / 3, 2 / 9], rtol=rtol,
                    atol=atol, method=method, dense_output=True)
    assert res.t[0] == t_span[0]
    assert res.t_events is None
    assert res.y_events is None
    assert res.success
    assert res.status == 0
    assert res.nfev < 44
    assert res.njev == 0
    assert res.nlu == 0

    e = compute_error(res.y, sol_rational(res.t), rtol, atol)
    assert np.all(e < 5)

    tc = np.linspace(*t_span)
    e = compute_error(res.sol(tc), sol_rational(tc), rtol, atol)
    assert np.all(e < 5)

    tc = (t_span[0] + t_span[-1]) / 2
    e = compute_error(np.asarray(res.sol(tc))[:, None],
                      sol_rational(tc)[:, None], rtol, atol)
    assert np.all(e < 5)

    # dense output consistent with nodes to round-off
    pmax = 1.0
    if method.tableau.P is not None:
        pmax = np.abs(method.tableau.P).max()
    assert np.allclose(np.asarray(res.sol(res.t)), res.y,
                       rtol=pmax * 1e-14, atol=pmax * 1e-14)


@pytest.mark.parametrize("method", EXPLICIT, ids=lambda m: m.name)
def test_integration_complex(method):
    rtol, atol = 1e-3, 1e-6
    y0 = np.array([0.5 + 1j])

    def fun(t, y):
        return -y

    res = solve_ivp(fun, [0, 1], y0, method=method, dense_output=True,
                    rtol=rtol, atol=atol)
    assert res.success
    if method in (Pr8, Pr9):
        assert res.nfev < 40
    else:
        assert res.nfev < 28
    assert res.njev == 0 and res.nlu == 0

    y_true = 0.5e0 * np.exp(-res.t) + 1j * np.exp(-res.t)
    e = compute_error(res.y, y_true[None, :], rtol, atol)
    assert np.all(e < 5)
    tc = np.linspace(0, 1)
    yc_true = (0.5 + 1j) * np.exp(-tc)
    e = compute_error(np.asarray(res.sol(tc)), yc_true[None, :], rtol, atol)
    assert np.all(e < 5)


@pytest.mark.parametrize("method", [BS5, Ts5, Me4], ids=lambda m: m.name)
def test_events(method):
    def event_rational_1(t, y):
        return float(y[0] - y[1] ** 0.7)

    def event_rational_2(t, y):
        return float(y[1] ** 0.6 - y[0])

    def event_rational_3(t, y):
        return t - 7.4

    event_rational_3.terminal = True

    res = solve_ivp(fun_rational, [5, 8], [1 / 3, 2 / 9], method=method,
                    events=(event_rational_1, event_rational_2))
    assert res.status == 0
    assert res.t_events[0].size == 1
    assert res.t_events[1].size == 1
    assert 5.3 < res.t_events[0][0] < 5.7
    assert 7.3 < res.t_events[1][0] < 7.7
    assert res.y_events[0].shape == (1, 2)
    assert np.isclose(
        event_rational_1(res.t_events[0][0], res.y_events[0][0]), 0)

    event_rational_1.direction = 1
    event_rational_2.direction = 1
    res = solve_ivp(fun_rational, [5, 8], [1 / 3, 2 / 9], method=method,
                    events=(event_rational_1, event_rational_2))
    assert res.t_events[0].size == 1
    assert res.t_events[1].size == 0

    event_rational_1.direction = -1
    event_rational_2.direction = -1
    res = solve_ivp(fun_rational, [5, 8], [1 / 3, 2 / 9], method=method,
                    events=(event_rational_1, event_rational_2))
    assert res.t_events[0].size == 0
    assert res.t_events[1].size == 1

    event_rational_1.direction = 0
    event_rational_2.direction = 0
    res = solve_ivp(fun_rational, [5, 8], [1 / 3, 2 / 9], method=method,
                    events=(event_rational_1, event_rational_2,
                            event_rational_3), dense_output=True)
    assert res.status == 1
    assert res.t_events[0].size == 1
    assert res.t_events[1].size == 0
    assert res.t_events[2].size == 1
    assert 5.3 < res.t_events[0][0] < 5.7
    assert 7.3 < res.t_events[2][0] < 7.5
    # terminal event must not break the interpolant
    tc = np.linspace(res.t[0], res.t[-1])
    e = compute_error(np.asarray(res.sol(tc)), sol_rational(tc), 1e-3, 1e-6)
    assert np.all(e < 5)
    assert np.allclose(sol_rational(res.t_events[0][0]),
                       res.y_events[0][0], rtol=1e-3, atol=1e-6)

    # backward direction
    res = solve_ivp(fun_rational, [8, 5], [4 / 9, 20 / 81], method=method,
                    events=(event_rational_1, event_rational_2,
                            event_rational_3), dense_output=True)
    assert res.status == 1
    assert res.t_events[0].size == 0
    assert res.t_events[1].size == 1
    assert res.t_events[2].size == 1
    assert 7.3 < res.t_events[1][0] < 7.7
    assert 7.3 < res.t_events[2][0] < 7.5
    del event_rational_3.terminal


@pytest.mark.parametrize("method", [BS5, Pr7], ids=lambda m: m.name)
def test_max_step_and_first_step(method):
    rtol, atol = 1e-3, 1e-6
    y0 = [1 / 3, 2 / 9]
    for t_span in ([5, 9], [5, 1]):
        res = solve_ivp(fun_rational, t_span, y0, rtol=rtol, atol=atol,
                        max_step=0.5, method=method)
        assert res.t[0] == t_span[0]
        assert res.t[-1] == t_span[-1]
        assert np.all(np.abs(np.diff(res.t)) <= 0.5 + 1e-12)
        e = compute_error(res.y, sol_rational(res.t), rtol, atol)
        assert np.all(e < 5)

        res = solve_ivp(fun_rational, t_span, y0, rtol=rtol, atol=atol,
                        first_step=0.1, method=method)
        assert res.t[0] == t_span[0]
        assert np.isclose(np.abs(res.t[1] - t_span[0]), 0.1)
        assert res.success

        with pytest.raises(ValueError):
            solve_ivp(fun_rational, t_span, y0, method=method,
                      first_step=-1)
        with pytest.raises(ValueError):
            solve_ivp(fun_rational, t_span, y0, method=method,
                      max_step=-1)


@pytest.mark.parametrize("method", [BS5], ids=lambda m: m.name)
def test_t_eval(method):
    rtol, atol = 1e-3, 1e-6
    y0 = [1 / 3, 2 / 9]
    for t_span in ([5, 9], [5, 1]):
        t_eval = np.linspace(t_span[0], t_span[1], 10)
        res = solve_ivp(fun_rational, t_span, y0, rtol=rtol, atol=atol,
                        method=method, t_eval=t_eval)
        assert np.allclose(res.t, t_eval)
        assert res.success
        e = compute_error(res.y, sol_rational(res.t), rtol, atol)
        assert np.all(e < 5)

    # subsets not containing endpoints
    t_eval = [5.01, 7, 8, 8.01]
    res = solve_ivp(fun_rational, [5, 9], y0, rtol=rtol, atol=atol,
                    method=method, t_eval=t_eval)
    assert np.allclose(res.t, t_eval)
    e = compute_error(res.y, sol_rational(res.t), rtol, atol)
    assert np.all(e < 5)

    t_eval = [4.99, 3, 1.5, 1.1]
    res = solve_ivp(fun_rational, [5, 1], y0, rtol=rtol, atol=atol,
                    method=method, t_eval=t_eval)
    assert np.allclose(res.t, t_eval)

    with pytest.raises(ValueError):
        solve_ivp(fun_rational, [5, 9], y0, method=method,
                  t_eval=[5, 5.01, 4])     # not sorted
    with pytest.raises(ValueError):
        solve_ivp(fun_rational, [5, 9], y0, method=method,
                  t_eval=[4, 6])           # outside span


def test_t_eval_dense_output():
    rtol, atol = 1e-3, 1e-6
    y0 = [1 / 3, 2 / 9]
    t_span = [5, 9]
    t_eval = np.linspace(t_span[0], t_span[1], 10)
    res = solve_ivp(fun_rational, t_span, y0, rtol=rtol, atol=atol,
                    method=BS5, t_eval=t_eval)
    res_d = solve_ivp(fun_rational, t_span, y0, rtol=rtol, atol=atol,
                      method=BS5, t_eval=t_eval, dense_output=True)
    assert np.allclose(res.t, t_eval)
    assert res_d.sol is not None
    assert np.allclose(res.t, res_d.t)
    assert np.allclose(res.y, res_d.y)


@pytest.mark.parametrize("method", [BS5, CFMR7osc], ids=lambda m: m.name)
def test_degenerate(method):
    # zero-length interval
    res = solve_ivp(lambda t, y: -y, [0, 0], [1.0, 2.0], method=method)
    assert res.success
    assert res.t[-1] == 0.0
    assert np.allclose(res.y[:, -1], [1.0, 2.0])

    # empty state
    res = solve_ivp(lambda t, y: y, [0, 10], np.zeros(0), method=method)
    assert res.success
    assert res.y.shape[0] == 0

    # zero RHS
    res = solve_ivp(lambda t, y: 0 * y, [0, 10], [1.0], method=method)
    assert res.success
    assert np.allclose(res.y, 1.0)


@pytest.mark.parametrize("method", [BS5, Ts5], ids=lambda m: m.name)
def test_stepwise_protocol(method):
    """Direct OdeSolver-protocol usage (test_ivp.py:838-868)."""
    solver = method(fun_rational, 5.0, [1 / 3, 2 / 9], 9.0)
    assert solver.n == 2
    assert solver.status == "running"
    assert solver.t_bound == 9.0
    n_steps = 0
    while solver.status == "running":
        msg = solver.step()
        assert msg is None
        n_steps += 1
        assert solver.nfev > 0
        assert solver.step_size is not None
        sol = solver.dense_output()
        # interpolant reproduces endpoints
        assert np.allclose(sol(solver.t_old),
                           sol_rational(solver.t_old), rtol=1e-2)
        assert np.allclose(np.asarray(sol(solver.t)), solver.y,
                           atol=1e-9 * max(1.0, np.abs(solver.y).max()))
    assert solver.status == "finished"
    assert solver.t == 9.0
    with pytest.raises(RuntimeError):
        solver.step()


def test_args_passing():
    def fun(t, y, omega):
        return jnp.stack([-omega * y[1], omega * y[0]])

    omega = 2.0
    res = solve_ivp(fun, [0, 1], [1.0, 0.0], method=BS5, args=(omega,),
                    rtol=1e-9, atol=1e-12, dense_output=True)
    assert res.success
    assert np.allclose(res.y[0, -1], np.cos(omega), atol=1e-7)
    assert np.allclose(res.y[1, -1], np.sin(omega), atol=1e-7)

    # events receive args too
    def ev(t, y, omega):
        return float(y[1] - 0.5)

    res = solve_ivp(fun, [0, 1], [1.0, 0.0], method=BS5, args=(omega,),
                    events=ev, rtol=1e-9, atol=1e-12)
    te = res.t_events[0][0]
    assert np.isclose(np.sin(omega * te), 0.5, atol=1e-6)


def test_extraneous_option_warns():
    with pytest.warns(UserWarning, match="no effect"):
        solve_ivp(fun_rational, [5, 9], [1 / 3, 2 / 9], method=BS5,
                  jac=lambda t, y: np.eye(2))


@pytest.mark.parametrize("interpolant", ["free", "low", "best"])
def test_bs5_interpolants(interpolant):
    rtol, atol = 1e-6, 1e-9
    res = solve_ivp(fun_rational, [5, 9], [1 / 3, 2 / 9], rtol=rtol,
                    atol=atol, method=BS5, dense_output=True,
                    interpolant=interpolant)
    tc = np.linspace(5, 9, 33)
    e = compute_error(np.asarray(res.sol(tc)), sol_rational(tc), rtol, atol)
    assert np.all(e < 5), interpolant


def test_pleiades_cfmr7osc_step_parity():
    """Pleiades (7-body, 28 states) with the oscillatory-problem method:
    384 accepted steps / 4083 evals at rtol 1e-9 — identical to the
    reference implementation (endpoint agreement 4e-12)."""
    from extensisq_tpu.problems import pleiades

    P = pleiades()
    r = solve_ivp(P.rhs, P.t_span, P.y0,
                  method=CFMR7osc, rtol=1e-9, atol=1e-12)
    assert r.success
    assert r.t.size - 1 == 384
    assert r.nfev == 4083
