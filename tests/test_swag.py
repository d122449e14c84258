"""SWAG (Adams PECE) conformance tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from extensisq_tpu import solve_ivp, SWAG
from extensisq_tpu.solve import solve


def fun_rational(t, y):
    return jnp.stack([y[1] / t,
                      y[1] * (y[0] + 2 * y[1] - 1) / (t * (y[0] - 1))])


def sol_rational(t):
    t = np.asarray(t)
    return np.asarray([t / (t + 10), 10 * t / (t + 10) ** 2])


@pytest.mark.parametrize("t_span", [[5, 9], [5, 1]])
def test_rational(t_span):
    rtol, atol = 1e-3, 1e-6
    res = solve_ivp(fun_rational, t_span, [1 / 3, 2 / 9], rtol=rtol,
                    atol=atol, method=SWAG, dense_output=True)
    assert res.success
    assert res.nfev < 44
    assert res.njev == 0 and res.nlu == 0
    scale = np.abs(sol_rational(res.t)).max(axis=1)[:, None]
    e = (res.y - sol_rational(res.t)) / (atol + rtol * scale)
    assert np.all(np.linalg.norm(e, axis=0) / np.sqrt(2) < 5)
    tc = np.linspace(*t_span)
    e = (np.asarray(res.sol(tc)) - sol_rational(tc)) \
        / (atol + rtol * scale)
    assert np.all(np.linalg.norm(e, axis=0) / np.sqrt(2) < 5)
    # C1-smooth interpolant consistent with the nodes
    assert np.allclose(np.asarray(res.sol(res.t)), res.y, atol=1e-12)


def test_complex():
    res = solve_ivp(lambda t, y: -y, (0, 1), np.array([0.5 + 1j]),
                    rtol=1e-3, atol=1e-6, method=SWAG)
    assert res.success
    assert res.nfev < 40
    assert abs(res.y[0, -1] - (0.5 + 1j) * np.exp(-1)) < 1e-4


def test_high_order_efficiency():
    """At tight tolerances the order climbs and the PECE scheme costs
    ~2 evaluations per step (the method's signature efficiency)."""
    def fun(t, y):
        return jnp.stack([y[1], -y[0]])

    res = solve_ivp(fun, (0, 100), [0.0, 1.0], rtol=1e-8, atol=1e-11,
                    method=SWAG)
    assert res.success
    # PECE: nfev ~ 2*steps (+ starter); far fewer evals than RK here
    assert res.nfev < 2.2 * res.nsteps + 10
    assert abs(res.y[0, -1] - np.sin(100)) < 1e-6
    assert abs(res.y[1, -1] - np.cos(100)) < 1e-6


def test_van_der_pol():
    """BASELINE config 2 (moderate mu)."""
    def fun(t, y):
        return jnp.stack([y[1], 5.0 * (1 - y[0] ** 2) * y[1] - y[0]])

    res = solve_ivp(fun, (0, 20), [2.0, 0.0], rtol=1e-6, atol=1e-9,
                    method=SWAG, dense_output=True)
    assert res.success
    from scipy.integrate import solve_ivp as sivp
    ref = sivp(lambda t, y: [y[1], 5 * (1 - y[0] ** 2) * y[1] - y[0]],
               (0, 20), [2.0, 0.0], rtol=1e-10, atol=1e-13, method="DOP853")
    np.testing.assert_allclose(res.y[:, -1], ref.y[:, -1], atol=1e-4)


def test_k_max_option():
    def fun(t, y):
        return jnp.stack([y[1], -y[0]])

    res = solve_ivp(fun, (0, 30), [0.0, 1.0], rtol=1e-8, atol=1e-11,
                    method=SWAG, k_max=4)
    assert res.success
    # capped order costs many more steps than the default k_max=12
    res12 = solve_ivp(fun, (0, 30), [0.0, 1.0], rtol=1e-8, atol=1e-11,
                      method=SWAG)
    assert res.nsteps > 1.5 * res12.nsteps
    with pytest.raises(ValueError):
        solve_ivp(fun, (0, 1), [0.0, 1.0], method=SWAG, k_max=13)


def test_device_solve_swag():
    from extensisq_tpu.solve import solve

    def fun(t, y):
        return jnp.stack([y[1], -y[0]])

    out = jax.jit(lambda y0: solve(fun, (0.0, 10.0), y0, method=SWAG,
                                   rtol=1e-6, atol=1e-9))(
        jnp.array([0.0, 1.0]))
    assert int(out.status) == 1
    r = solve_ivp(fun, (0, 10), [0.0, 1.0], method=SWAG, rtol=1e-6,
                  atol=1e-9)
    assert int(out.nsteps) == r.nsteps
    np.testing.assert_allclose(np.asarray(out.y), r.y[:, -1], atol=1e-12)


def test_vmapped_ensemble_swag():
    """Variable-order Adams under vmap: each member picks its own
    order/step sequence."""
    from extensisq_tpu.solve import solve_ensemble

    def fun(t, y, mu):
        return jnp.stack([y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]])

    B = 8
    Y0 = jnp.tile(jnp.array([2.0, 0.0]), (B, 1))
    mus = jnp.linspace(0.5, 3.0, B)
    out = solve_ensemble(fun, (0.0, 10.0), Y0, params_batch=mus,
                         method=SWAG, rtol=1e-6, atol=1e-9)
    assert bool(jnp.all(out.status == 1))
    mu0 = float(mus[0])
    r = solve_ivp(lambda t, y: fun(t, y, mu0), (0, 10), [2.0, 0.0],
                  method=SWAG, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.y[0]), r.y[:, -1],
                               rtol=1e-9, atol=1e-10)


def test_flat_path_matches_host_driver():
    """solve() uses step_flat (one attempt per while iteration); it
    must reproduce the host driver's nested loop exactly, including
    through step rejections and the near-end extrapolation."""
    def brus(t, y):
        return jnp.stack([1.0 + y[0] ** 2 * y[1] - 4.0 * y[0],
                          3.0 * y[0] - y[0] ** 2 * y[1]])

    y0 = jnp.array([1.5, 3.0])
    out = jax.jit(lambda y: solve(brus, (0.0, 30.0), y, method=SWAG,
                                  rtol=1e-9, atol=1e-12))(y0)
    ref = solve_ivp(brus, (0.0, 30.0), y0, method=SWAG,
                    rtol=1e-9, atol=1e-12)
    assert int(out.nsteps) == ref.t.size - 1
    assert int(out.nfev) == ref.nfev
    np.testing.assert_array_equal(np.asarray(out.y), ref.y[:, -1])
