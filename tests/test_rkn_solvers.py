"""RKN solver conformance (strategy of /root/reference/tests/test_rkn.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from extensisq_tpu import solve_ivp, Fi4N, Fi5N, Mu5Nmb, MR6NN

METHODS = [Fi4N, Fi5N, Mu5Nmb, MR6NN]


def fun_linear(t, y):
    return jnp.stack([y[1], -y[0]])


def sol_linear(t):
    t = np.asarray(t)
    return np.vstack((np.sin(t), np.cos(t)))


@pytest.mark.parametrize("method", METHODS, ids=lambda m: m.name)
@pytest.mark.parametrize("t_span", [[0, 2 * np.pi], [2 * np.pi, 0]])
def test_integration(method, t_span):
    rtol, atol = 1e-3, 1e-6
    res = solve_ivp(fun_linear, t_span, [0.0, 1.0], rtol=rtol, atol=atol,
                    method=method, dense_output=True)
    assert res.t[0] == t_span[0]
    assert res.success
    assert res.status == 0
    if method in (Mu5Nmb, MR6NN):
        assert res.nfev < 130
    else:
        assert res.nfev < 60
    assert res.njev == 0
    assert res.nlu == 0

    def compute_error(y, y_true):
        scale = np.abs(y_true).max(axis=1)[:, None]
        e = (y - y_true) / (atol + rtol * scale)
        return np.linalg.norm(e, axis=0) / np.sqrt(e.shape[0])

    assert np.all(compute_error(res.y, sol_linear(res.t)) < 5)
    tc = np.linspace(*t_span)
    assert np.all(compute_error(np.asarray(res.sol(tc)),
                                sol_linear(tc)) < 5)


@pytest.mark.parametrize("method", METHODS, ids=lambda m: m.name)
def test_error_estimation_one_step(method):
    """|true error| < |estimated error| on one harmonic-oscillator step
    (test_rkn.py:95-103), done functionally on the stepper."""
    import jax.numpy as jnp
    from extensisq_tpu.steppers import build_stepper
    from extensisq_tpu.types import IVPParams

    step_size = 0.2
    impl = build_stepper(method, fun_linear, 2, np.float64)
    params = IVPParams(t_bound=jnp.asarray(1.0), direction=jnp.asarray(1.0),
                       rtol=jnp.asarray(1e-3), atol=jnp.asarray(1e-6),
                       max_step=jnp.asarray(np.inf))
    state = impl.init(0.0, jnp.array([1.0, 0.0]), params,
                      first_step=step_size)
    state = impl.step(params, state)
    assert int(state.nsteps) == 1
    y_true = np.array([np.cos(step_size), -np.sin(step_size)])
    err_true = np.linalg.norm(np.asarray(state.y) - y_true)
    # reconstruct the raw error estimate from stored stages
    h = float(state.h_previous)
    K = np.asarray(state.K)
    mm = impl.s + (1 if impl.fsal else 0)
    eu = (K[:mm].T @ impl.E_u[:mm]) * h * h
    ev = (K[:mm].T @ impl.E_v[:mm]) * h
    err_est = np.linalg.norm(np.concatenate([eu, ev])) \
        / np.sqrt(2)
    # scale_embedded damps Mu5Nmb's estimate; undo for the comparison
    if method is Mu5Nmb:
        err_est /= 0.75
    assert err_true / np.sqrt(2) < err_est


def test_wrong_structure_raises():
    # first-order fun passed to an RKN method
    def fun(t, y):
        return jnp.stack([-y[1], y[0]])
    with pytest.raises(AssertionError, match="second order"):
        solve_ivp(fun, [0, 1], [1.0, 2.0], method=Fi4N)

    # velocity-dependent fun passed to a strict method
    def fun_vd(t, y):
        return jnp.stack([y[1], -y[0] - 0.1 * y[1]])
    with pytest.raises(AssertionError, match="velocity independent"):
        solve_ivp(fun_vd, [0, 1], [1.0, 1.0], method=MR6NN)


@pytest.mark.parametrize("interpolant", [0, 1, 2, 3])
def test_fi5n_interpolants(interpolant):
    rtol, atol = 1e-6, 1e-9
    res = solve_ivp(fun_linear, [0, 2 * np.pi], [0.0, 1.0], rtol=rtol,
                    atol=atol, method=Fi5N, dense_output=True,
                    interpolant=interpolant)
    tc = np.linspace(0, 2 * np.pi, 41)
    yc = np.asarray(res.sol(tc))
    y_true = sol_linear(tc)
    e = np.abs(yc - y_true) / (atol + rtol * np.abs(y_true).max())
    assert np.all(e < 500), interpolant


def test_mu5nmb_interpolants():
    for interpolant in ("free", "better"):
        res = solve_ivp(fun_linear, [0, 2 * np.pi], [0.0, 1.0], rtol=1e-6,
                        atol=1e-9, method=Mu5Nmb, dense_output=True,
                        interpolant=interpolant)
        tc = np.linspace(0, 2 * np.pi, 41)
        yc = np.asarray(res.sol(tc))
        y_true = sol_linear(tc)
        e = np.abs(yc - y_true) / (1e-9 + 1e-6 * np.abs(y_true).max())
        assert np.all(e < 500), interpolant


def test_kepler_orbit():
    """BASELINE config 3: Kepler 2-body orbit with an RKN pair."""
    def kepler(t, y):
        r = y[:2]
        v = y[2:]
        a = -r / jnp.sum(r ** 2) ** 1.5
        return jnp.concatenate([v, a])

    e = 0.3
    y0 = np.array([1 - e, 0.0, 0.0, np.sqrt((1 + e) / (1 - e))])
    res = solve_ivp(kepler, [0, 2 * np.pi], y0, method=Fi5N, rtol=1e-9,
                    atol=1e-12)
    assert res.success
    # one full period returns to the initial state
    np.testing.assert_allclose(res.y[:, -1], y0, atol=2e-6)
