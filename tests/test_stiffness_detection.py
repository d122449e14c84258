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
