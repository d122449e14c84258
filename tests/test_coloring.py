"""Colored autodiff Jacobian (jac_sparsity): grouping validity,
exactness vs dense jacfwd, and a full ESDIRK solve equivalence.

Reference behavior being mirrored: group_columns + num_jac FD at
/root/reference/extensisq/common.py:1706-1754 — here the column groups
seed forward-mode tangents instead of FD perturbations.
"""
import numpy as np
import jax
import jax.numpy as jnp

from extensisq_tpu import solve_ivp, Kv3I
from extensisq_tpu.core.linalg import group_columns, colored_jacfwd
from extensisq_tpu.problems import medazko

MEDAZKO = medazko(200)


def band(n, w):
    """0/1 pattern with |i-j| <= w."""
    i = np.arange(n)
    return (np.abs(i[:, None] - i[None, :]) <= w).astype(int)


def test_group_columns_band():
    n, w = 50, 1
    S = band(n, w)
    groups, ng = group_columns(S)
    assert ng == 2 * w + 1                 # tridiagonal -> 3 colors
    # validity: two columns of one group never share a nonzero row
    for g in range(ng):
        cols = np.flatnonzero(groups == g)
        assert np.all(S[:, cols].sum(axis=1) <= 1)


def test_group_columns_dense_column():
    """A dense column conflicts with every other column, so it sits
    alone in its group; the remaining diagonal columns all compress
    into one."""
    n = 20
    S = np.eye(n, dtype=int)
    S[:, 0] = 1
    groups, ng = group_columns(S)
    assert ng == 2
    assert np.sum(groups == groups[0]) == 1      # column 0 isolated


def test_colored_jacfwd_matches_dense():
    n, w = 40, 2
    S = band(n, w)

    def rhs(t, y):
        lower = jnp.concatenate([y[2:], y[:2]])
        upper = jnp.concatenate([y[-2:], y[:-2]])
        return jnp.sin(y) * lower - y ** 2 + 0.3 * upper * y

    # the cyclic shifts wrap: widen the pattern at the corners
    S[:2, -2:] = 1
    S[-2:, :2] = 1
    y = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    J_dense = jax.jacfwd(rhs, argnums=1)(0.0, y)
    J_col = colored_jacfwd(rhs, S, n, np.float64)(0.0, y)
    np.testing.assert_array_equal(np.asarray(J_col) != 0.0,
                                  (np.asarray(J_dense) != 0.0)
                                  & (S != 0))
    np.testing.assert_allclose(np.asarray(J_col), np.asarray(J_dense),
                               rtol=0, atol=1e-15)


def test_medazko_sparsity_solve_matches_dense():
    """Full implicit solve with jac_sparsity reproduces the dense-AD
    solve: identical Jacobian values => identical trajectory and
    work counts."""
    S = MEDAZKO.jac_sparsity
    groups, ng = group_columns(S)
    assert ng <= 9                          # O(bandwidth), not O(n)

    y0 = MEDAZKO.y0
    res_sparse = solve_ivp(MEDAZKO.rhs, MEDAZKO.t_span, y0, method=Kv3I,
                           jac_sparsity=S)
    res_dense = solve_ivp(MEDAZKO.rhs, MEDAZKO.t_span, y0, method=Kv3I)
    assert res_sparse.success
    assert res_sparse.njev == res_dense.njev
    assert res_sparse.nlu == res_dense.nlu
    assert res_sparse.nfev == res_dense.nfev
    np.testing.assert_allclose(res_sparse.y[:, -1], res_dense.y[:, -1],
                               rtol=1e-12, atol=1e-15)
