"""Dense linear solves that work in float64 on TPU.

The TPU XLA backend implements LuDecomposition only for F32/C64, so
``jnp.linalg.solve``/``lu_factor`` cannot run in f64 there.  For the
few full-precision solves the framework needs outside the Newton loop
(DAE consistent-IC projection, mass-matrix application at setup), this
module provides partial-pivot Gaussian elimination built from
elementwise jnp ops — dtype-agnostic, jittable, vmappable.
"""
import jax
import jax.numpy as jnp


def gauss_solve(A, B):
    """Solve A X = B with partial pivoting; B may be (n,) or (n, m)."""
    A = jnp.asarray(A)
    vec = B.ndim == 1
    B = jnp.asarray(B)
    if vec:
        B = B[:, None]
    n = A.shape[0]
    m = B.shape[1]
    Ab = jnp.concatenate([A, B.astype(A.dtype)], axis=1)
    rows = jnp.arange(n)

    def elim(k, Ab):
        col = jnp.abs(Ab[:, k])
        col = jnp.where(rows < k, -jnp.inf, jnp.real(col))
        p = jnp.argmax(col)
        rk = Ab[k]
        rp = Ab[p]
        Ab = Ab.at[k].set(rp).at[p].set(rk)
        pivot = Ab[k, k]
        factors = Ab[:, k] / pivot
        factors = jnp.where(rows > k, factors, 0.0)
        return Ab - factors[:, None] * Ab[k][None, :]

    Ab = jax.lax.fori_loop(0, n, elim, Ab)

    def back(i, X):
        k = n - 1 - i
        dot = jnp.sum(jnp.where((rows > k)[:, None],
                                Ab[k, :n][:, None] * X, 0.0), axis=0)
        xk = (Ab[k, n:] - dot) / Ab[k, k]
        return X.at[k].set(xk)

    X = jax.lax.fori_loop(0, n, back,
                          jnp.zeros((n, m), Ab.dtype))
    return X[:, 0] if vec else X
