"""Reproduce the RKC-paper tables (SSV2stab on 3-D PDE problems).

Counterpart of /root/reference/docs/Demo_SSV2stab.ipynb cells 9 & 15,
which reproduce Tables 3 and 1 of Sommeijer, Shampine & Verwer, "RKC:
An explicit solver for parabolic PDEs" (1998):

* 3-D combustion, N = 40^3 grid, 2 species => 128,000 states
* 3-D heat problem with source, N = 39^3, rho_jac callback (nfesig = 0)

Prints steps (incl. failed), f-evals, average stages/step, power-method
evals, wall time and max stage count per tolerance, next to the
reference implementation's numbers.

Run: python validation/rkc_tables.py [cpu|tpu]
"""
import os
import sys
from time import perf_counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from extensisq_tpu import Stepper, SSV2stab  # noqa: E402


def lap(A, h):
    return (1.0 / h ** 2) * (
        -6 * A[1:-1, 1:-1, 1:-1]
        + A[:-2, 1:-1, 1:-1] + A[2:, 1:-1, 1:-1]
        + A[1:-1, :-2, 1:-1] + A[1:-1, 2:, 1:-1]
        + A[1:-1, 1:-1, :-2] + A[1:-1, 1:-1, 2:])


def run_to_end(fun, t0, y0, tf, tol, **opts):
    solver = Stepper(SSV2stab, fun, t0, y0, tf, rtol=tol, atol=tol,
                     **opts)
    t_start = perf_counter()
    while solver.status == "running":
        msg = solver.step()
        assert msg is None, msg
    wall = perf_counter() - t_start
    st = solver.state
    return (np.asarray(st.y), int(st.nsteps), int(st.nfailed),
            int(st.nfev), int(st.nfesig), int(st.maxm), wall)


def combustion_table():
    from extensisq_tpu.problems import combustion_3d

    P = combustion_3d(40)
    fun, y0 = P.rhs, P.y0
    print("combustion N=40^3 (128,000 states), t in [0, 0.3]")
    print("computing tol=1e-8 reference solution ...")
    ref, *_ = run_to_end(fun, 0.0, y0, 0.30, 1e-8)

    # reference implementation's numbers (notebook cell 9)
    expected = {1e-4: (52, 525, 21, 36), 1e-5: (124, 781, 27, 29),
                1e-6: (270, 1270, 39, 20), 1e-7: (581, 2147, 65, 14)}
    print(" Tol   Error  Steps  f-evals  avg  f-sigma  wall   s-max  "
          "| ref: steps evals sig smax")
    for tol in (1e-4, 1e-5, 1e-6, 1e-7):
        y, nst, nfs, nfev, nfesig, maxm, wall = run_to_end(
            fun, 0.0, y0, 0.30, tol)
        err = np.abs(y - ref).max()
        steps = nst + nfs
        e = expected[tol]
        print(f"{tol:.0e}  {err:6.2g}  {steps:>4}({nfs})  {nfev:>5}  "
              f"{nfev / steps:4.1f}  {nfesig:>5}  {wall:5.1f}s  {maxm:>4}"
              f"  | {e[0]:>6} {e[1]:>5} {e[2]:>3} {e[3]:>4}")


def heat_table():
    N = 39
    grid = np.linspace(0.0, 1.0, N + 2)
    X, Y, Z = np.meshgrid(grid, grid, grid)
    h = 1.0 / (N + 1.0)

    def solution(x, y, z, t):
        return np.tanh(5 * x + 10 * y + 7.5 * z - (2.5 + 5 * t))

    def source(t):
        s = jnp.tanh(5 * X + 10 * Y + 7.5 * Z - (2.5 + 5 * t))
        return 362.5 * (s - s ** 3) + 5 * s ** 2 - 5

    Xj, Yj, Zj = map(jnp.asarray, (X, Y, Z))

    def boundary(t):
        return jnp.tanh(5 * Xj + 10 * Yj + 7.5 * Zj - (2.5 + 5 * t))

    def fun(t, y):
        W = boundary(t)
        W = W.at[1:-1, 1:-1, 1:-1].set(y.reshape(N, N, N))
        dy = lap(W, h) + source(t)[1:-1, 1:-1, 1:-1]
        return dy.reshape(-1)

    rho = 12.0 / h ** 2
    y0 = solution(X, Y, Z, 0.0)[1:-1, 1:-1, 1:-1].reshape(-1)
    print("\nheat N=39^3, rho_jac supplied (no power iterations)")
    print("computing tol=1e-8 reference solution ...")
    ref, *_ = run_to_end(fun, 0.0, y0, 0.7, 1e-8, const_jac=True,
                         rho_jac=lambda t, y: rho)

    solc = solution(X, Y, Z, 0.7)[1:-1, 1:-1, 1:-1].reshape(-1)
    expected = {1e-1: (7, 402, 132), 1e-2: (19, 729, 85),
                1e-3: (29, 786, 40), 1e-4: (57, 1087, 26),
                1e-5: (130, 1682, 20), 1e-6: (262, 2445, 12)}
    print(" Tol   Error   Steps  f-evals  avg  wall   s-max  error-c  "
          "| ref: steps evals smax")
    for tol in (1e-1, 1e-2, 1e-3, 1e-4, 1e-5, 1e-6):
        y, nst, nfs, nfev, nfesig, maxm, wall = run_to_end(
            fun, 0.0, y0, 0.7, tol, const_jac=True,
            rho_jac=lambda t, yy: rho)
        assert nfesig == 0
        err = np.abs(y - ref).max()
        errc = np.abs(y - solc).max()
        steps = nst + nfs
        e = expected[tol]
        print(f"{tol:.0e}  {err:7.2g}  {steps:>4}({nfs})  {nfev:>5}  "
              f"{nfev / steps:4.1f}  {wall:5.1f}s  {maxm:>4}  {errc:7.2g}"
              f"  | {e[0]:>5} {e[1]:>5} {e[2]:>4}")


if __name__ == "__main__":
    combustion_table()
    heat_table()
