"""Stiffness-diagnosis tests (RKSuite power iteration, host-side)."""
import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from extensisq_tpu import solve_ivp, BS5, Me4, Fi5N


def test_stiff_problem_warns():
    lam = 500.0

    def fun(t, y):
        return jnp.stack([-lam * (y[0] - jnp.sin(t)) + jnp.cos(t)])

    with pytest.warns(UserWarning, match="diagnosed as stiff"):
        res = solve_ivp(fun, (0, 30), [0.5], rtol=1e-4, atol=1e-7,
                        method=BS5)
    assert res.success


def test_nonstiff_problem_silent():
    def fun(t, y):
        return jnp.stack([y[1], -y[0]])

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res = solve_ivp(fun, (0, 10), [0.0, 1.0], rtol=1e-6, atol=1e-9,
                        method=Me4)
    assert res.success
    assert not [w for w in rec if "stiff" in str(w.message)]


def test_detection_disabled():
    lam = 500.0

    def fun(t, y):
        return jnp.stack([-lam * (y[0] - jnp.sin(t)) + jnp.cos(t)])

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res = solve_ivp(fun, (0, 30), [0.5], rtol=1e-4, atol=1e-7,
                        method=BS5, nfev_stiff_detect=0)
    assert res.success
    assert not [w for w in rec if "stiff" in str(w.message)]


def test_rkn_stiff_rectangle():
    """Stiff 2nd-order problem through the Nystrom rectangular-domain
    variant (common.py:1323-1486)."""
    k = 2.5e5   # stiff spring

    def fun(t, y):
        return jnp.stack([y[1], -k * y[0] - 1000.0 * y[1]])

    with pytest.warns(UserWarning, match="stiff"):
        res = solve_ivp(fun, (0, 20), [1.0, 0.0], rtol=1e-3, atol=1e-6,
                        method=Fi5N)
    del res


# ---------------------------------------------------------------------------
# device-path diagnosis (solve(..., nfev_stiff_detect=N); VERDICT r1 #7)
# ---------------------------------------------------------------------------

def test_device_stiffness_single():
    """The on-device power iteration reproduces the host verdict on the
    same problem test_stiff_problem_warns uses."""
    import jax
    from extensisq_tpu import solve
    from extensisq_tpu.core.stiffness import STIFF_REAL

    lam = 500.0

    def fun(t, y):
        return jnp.stack([-lam * (y[0] - jnp.sin(t)) + jnp.cos(t)])

    out = jax.jit(lambda y0: solve(fun, (0.0, 30.0), y0, method=BS5,
                                   rtol=1e-4, atol=1e-7,
                                   nfev_stiff_detect=5000))(
        jnp.array([0.5]))
    assert int(out.status) == 1
    assert int(out.stiffness) == STIFF_REAL


def test_device_stiffness_ensemble_one_stiff_member():
    """An ensemble with one stiff member reports it without host
    stepping; benign members stay clean and their results match a
    diagnosis-free solve."""
    import jax
    from extensisq_tpu import solve_ensemble
    from extensisq_tpu.core.stiffness import STIFF_REAL, STIFF_NONE

    lams = jnp.array([1.0, 2.0, 800.0, 4.0])

    def fun(t, y, lam):
        return -lam * y

    Y0 = jnp.ones((4, 1))
    out = solve_ensemble(fun, (0.0, 20.0), Y0, params_batch=lams,
                         method=BS5, rtol=1e-5, atol=1e-8,
                         nfev_stiff_detect=1000)
    assert bool(jnp.all(out.status == 1))
    codes = np.asarray(out.stiffness)
    assert codes[2] == STIFF_REAL
    assert np.all(codes[[0, 1, 3]] == STIFF_NONE)
    ref = solve_ensemble(fun, (0.0, 20.0), Y0, params_batch=lams,
                         method=BS5, rtol=1e-5, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(out.y),
                                  np.asarray(ref.y))


def test_device_stiffness_off_by_default():
    import jax
    from extensisq_tpu import solve

    out = jax.jit(lambda y0: solve(
        lambda t, y: -500.0 * y, (0.0, 30.0), y0, method=BS5,
        rtol=1e-4, atol=1e-7))(jnp.array([0.5]))
    assert out.stiffness is None


def test_device_stiffness_rkn():
    """Nystrom rectangular-domain variant on the device path."""
    import jax
    from extensisq_tpu import solve

    k = 2.5e5

    def fun(t, y):
        return jnp.stack([y[1], -k * y[0] - 1000.0 * y[1]])

    out = jax.jit(lambda y0: solve(fun, (0.0, 20.0), y0, method=Fi5N,
                                   rtol=1e-3, atol=1e-6,
                                   nfev_stiff_detect=5000))(
        jnp.array([1.0, 0.0]))
    assert int(out.status) == 1
    assert int(out.stiffness) > 0            # diagnosed stiff
