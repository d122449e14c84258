"""CKdisc variable-order solver conformance."""
import numpy as np
import jax
import jax.numpy as jnp

from extensisq_tpu import solve_ivp, CKdisc
from extensisq_tpu.solve import solve


def fun_rational(t, y):
    return jnp.stack([y[1] / t,
                      y[1] * (y[0] + 2 * y[1] - 1) / (t * (y[0] - 1))])


def sol_rational(t):
    t = np.asarray(t)
    return np.asarray([t / (t + 10), 10 * t / (t + 10) ** 2])


def test_smooth_problem():
    for t_span in ([5, 9], [5, 1]):
        res = solve_ivp(fun_rational, t_span, [1 / 3, 2 / 9], rtol=1e-3,
                        atol=1e-6, method=CKdisc, dense_output=True)
        assert res.success
        assert res.nfev < 44
        scale = np.abs(sol_rational(res.t)).max(axis=1)[:, None]
        e = (res.y - sol_rational(res.t)) / (1e-6 + 1e-3 * scale)
        assert np.all(np.linalg.norm(e, axis=0) / np.sqrt(2) < 5)
        tc = np.linspace(*t_span)
        e = (np.asarray(res.sol(tc)) - sol_rational(tc)) \
            / (1e-6 + 1e-3 * scale)
        assert np.all(np.linalg.norm(e, axis=0) / np.sqrt(2) < 5)


def test_nonsmooth_rhs():
    """Discontinuous derivative: the order cascade keeps the step count
    bounded and the solution accurate across the kinks."""
    def fun(t, y):
        return jnp.stack([-jnp.sign(jnp.sin(3 * t)) * y[0] - 0.5 * y[0]])

    res = solve_ivp(fun, (0, 5), [2.0], rtol=1e-4, atol=1e-8,
                    method=CKdisc)
    assert res.success
    assert res.nsteps < 100

    # piecewise-exact solution: integrate |d/dt log y| analytically
    import scipy.integrate as si
    exact, _ = si.quad(lambda t: -np.sign(np.sin(3 * t)) - 0.5, 0, 5,
                       limit=200)
    # discontinuity localization limits accuracy at this tolerance
    np.testing.assert_allclose(res.y[0, -1], 2.0 * np.exp(exact),
                               rtol=1e-2)


def test_discontinuous_forcing():
    """Step forcing (the paper's use case)."""
    def fun(t, y):
        return jnp.stack([jnp.where(t < 1.0, 1.0, -1.0) - 0.1 * y[0]])

    res = solve_ivp(fun, (0, 2), [0.0], rtol=1e-6, atol=1e-9,
                    method=CKdisc)
    assert res.success
    # reference value from fine fixed-step integration
    from scipy.integrate import solve_ivp as sivp
    ref = sivp(lambda t, y: [(1.0 if t < 1.0 else -1.0) - 0.1 * y[0]],
               (0, 2), [0.0], rtol=1e-10, atol=1e-12, max_step=1e-3)
    np.testing.assert_allclose(res.y[0, -1], ref.y[0, -1], atol=1e-4)


def test_flat_path_matches_host_driver():
    """solve() uses step_flat; it must reproduce the host driver's
    nested loop exactly, including through fallback-order acceptances
    at a discontinuity."""
    def f_disc(t, y):
        return jnp.stack([jnp.where(t < 5.0, 1.0, -1.0) * y[0] - y[1],
                          y[0] * 0.1 + jnp.where(t < 5.0, 0.5, -2.0)])

    y0 = jnp.array([1.0, 0.0])
    out = jax.jit(lambda y: solve(f_disc, (0.0, 10.0), y, method=CKdisc,
                                  rtol=1e-6, atol=1e-9))(y0)
    ref = solve_ivp(f_disc, (0.0, 10.0), y0, method=CKdisc,
                    rtol=1e-6, atol=1e-9)
    assert int(out.nsteps) == ref.t.size - 1
    assert int(out.nfev) == ref.nfev
    np.testing.assert_array_equal(np.asarray(out.y), ref.y[:, -1])
