"""Replicate the TR-BDF2 paper validation tables.

Runs the four problems of Hosea & Shampine, "Analysis and implementation
of TR-BDF2" (1996), at the reference's settings (rtol=0.005/2,
atol=1e-10/2, "G" controller), and prints this framework's work counts
next to the values the reference implementation reproduces
(/root/reference/extensisq/hosea.py:350-537; duplicated in BASELINE.md).

Run: python validation/hosea_tables.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from extensisq_tpu import solve_ivp, TRBDF2, TRX2  # noqa: E402

NORM_FACTOR = 2        # RMS norm vs the paper's max norm
RTOL = 0.005 / NORM_FACTOR
ATOL = 1e-10 / NORM_FACTOR
SC = "G"


def run():
    results = []

    # problem 1: linear, supplied as a constant Jacobian (linear path)
    def f1(t, y):
        return jnp.stack([-500 * y[0] + 500 * jnp.cos(t) - jnp.sin(t),
                          -y[1] + jnp.sin(t) + jnp.cos(t)])

    J1 = np.array([[-500.0, 0.0], [0.0, -1.0]])
    for method in (TRBDF2, TRX2):
        results.append(solve_ivp(f1, (0.0, 12.0), [1.0, 0.0], jac=J1,
                                 atol=ATOL, rtol=RTOL, method=method,
                                 sc_params=SC))

    # problem 2: D4 chemical kinetics
    def f2(t, y):
        return jnp.stack([
            -0.013 * y[0] - 1000 * y[0] * y[2],
            -2500 * y[1] * y[2],
            -0.013 * y[0] - 1000 * y[0] * y[2] - 2500 * y[1] * y[2]])

    def j2(t, y):
        return jnp.array([
            [-0.013 - 1000 * y[2], 0, -1000 * y[0]],
            [0, -2500 * y[2], -2500 * y[1]],
            [-0.013 - 1000 * y[2], -2500 * y[2],
             -1000 * y[0] - 2500 * y[1]]])

    for method in (TRBDF2, TRX2):
        results.append(solve_ivp(f2, (0, 50), [1.0, 1.0, 0.0], jac=j2,
                                 atol=ATOL, rtol=RTOL, method=method,
                                 sc_params=SC))

    # problem 3: non-stiff Van der Pol
    def f3(t, y):
        return jnp.stack([y[1], (1 - y[0] ** 2) * y[1] - y[0]])

    def j3(t, y):
        return jnp.array([[0.0, 1.0],
                          [-2 * y[0] * y[1] - 1, 1 - y[0] ** 2]])

    for method in (TRBDF2, TRX2):
        results.append(solve_ivp(f3, (0, 20), [0.0, 0.25], jac=j3,
                                 atol=ATOL, rtol=RTOL, method=method,
                                 sc_params=SC))

    # problem 4: Robertson (paper uses 10e4 for the second rate)
    def f4(t, y):
        return jnp.stack([
            -0.04 * y[0] + 10e4 * y[1] * y[2],
            0.04 * y[0] - 10e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
            3e7 * y[1] ** 2])

    def j4(t, y):
        return jnp.array([
            [-0.04, 10e4 * y[2], 10e4 * y[1]],
            [0.04, -10e4 * y[2] - 6e7 * y[1], -10e4 * y[1]],
            [0, 6e7 * y[1], 0.0]])

    results.append(solve_ivp(f4, (0, 4e7), [1.0, 0.0, 0.0], jac=j4,
                             atol=ATOL, rtol=RTOL, method=TRBDF2,
                             sc_params=SC))

    names = ["TRBDF2", "TRX2", "TRBDF2", "TRX2", "TRBDF2", "TRX2",
             "TRBDF2"]
    # two comparison baselines:
    #  paper  — the tables in Hosea & Shampine (the reference's own run
    #           deviates from these; hosea.py:530-537 explains why)
    #  refimp — counts measured from the reference implementation
    #           (extensisq v0.6.0) on this exact setup
    paper = {
        "successful steps": (40, 33, 24, 23, 116, 93, 76),
        "error failures": (7, 3, 0, 0, 24, 19, 5),
        "iteration failures": (0, 0, 0, 0, 1, 2, 5),
        "fun evaluations": (139, 105, 75, 114, 557, 482, 399),
        "jac evaluations": (1, 1, 1, 1, 2, 3, 10),
        "LU decompositions": (43, 31, 17, 16, 99, 86, 77),
        "LU solves": (184, 139, 97, 135, 695, 592, 478),
    }
    refimp = {
        "successful steps": (37, 31, 17, 15, 114, 91, 70),
        "error failures": (9, 7, 2, 1, 25, 21, 3),
        "iteration failures": (0, 0, 0, 0, 3, 0, 6),
        "fun evaluations": (93, 77, 79, 66, 577, 477, 365),
        "jac evaluations": (0, 0, 1, 1, 5, 2, 15),
        "LU decompositions": (43, 35, 17, 15, 75, 58, 70),
        "LU solves": (138, 114, 97, 81, 715, 588, 437),
    }
    got = {
        "successful steps": [r.nsteps for r in results],
        "error failures": [r.nfailed for r in results],
        "iteration failures": [r.nfi for r in results],
        "fun evaluations": [r.nfev for r in results],
        "jac evaluations": [r.njev for r in results],
        "LU decompositions": [r.nlu for r in results],
        "LU solves": [r.nls for r in results],
    }
    print("case/table:           " + "".join(f"{i:>12}" for i in
                                             (1, 1, 2, 2, 3, 3, 4)))
    print("solver:               " + "".join(f"{n:>12}" for n in names))
    ok = True
    for label in paper:
        line = "".join(
            f"{g:>5}({g - rp:>+4}|{g - ri:>+4})"
            for g, rp, ri in zip(got[label], paper[label],
                                 refimp[label]))
        print(f"{label:<21} {line}")
        # parity criterion vs the reference implementation: EXACT
        # (round-1 +3/+6 nls drift traced to the error-filter solve
        # being counted on Newton-failed attempts; fixed in esdirk.py)
        for g, ri in zip(got[label], refimp[label]):
            if g != ri:
                ok = False
    print("\nper-cell format: ours(delta vs paper | delta vs reference "
          "implementation)")
    print("parity with the reference implementation:",
          "PASS" if ok else "FAIL")
    return ok


if __name__ == "__main__":
    run()
