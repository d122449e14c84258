"""Dense-output interpolant study (counterpart of the reference's
"interpolants" notebook and the Demo_BS5 interpolant cells).

BS5 ships three interpolants and Fi5N four; they trade RHS evaluations
for within-step accuracy.  This script integrates one problem per
method/interpolant, then samples the dense output on a fine grid and
reports the worst within-step error against the exact solution,
alongside the eval count the interpolant cost.

Run: python examples/11_interpolants.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np                                     # noqa: E402
import jax.numpy as jnp                                # noqa: E402

from extensisq_tpu import solve_ivp, BS5, Fi5N         # noqa: E402
from extensisq_tpu.problems import rational            # noqa: E402

P = rational()
tq = np.linspace(P.t_span[0], P.t_span[1], 400)
EX = P.solution(tq)

print("BS5 on the rational problem, rtol 1e-6 (interpolant option):")
print(f"{'interpolant':<12} {'nfev':>6} {'max dense-output error':>24}")
for ip in ("best", "low", "free"):
    r = solve_ivp(P.rhs, P.t_span, P.y0, method=BS5, rtol=1e-6,
                  atol=1e-9, dense_output=True, interpolant=ip)
    err = float(np.max(np.abs(np.asarray(r.sol(tq)) - EX)))
    print(f"{ip:<12} {r.nfev:>6} {err:>24.2e}")

print("\nFi5N (Nystrom) on a Kepler-like oscillator, rtol 1e-6:")


def osc(t, y):
    return jnp.stack([y[1], -y[0]])


tq2 = np.linspace(0.0, 2 * np.pi, 400)
for ip in (0, 1, 2, 3):        # Fi5N keys its four interpolants 0..3
    r = solve_ivp(osc, (0.0, 2 * np.pi), [1.0, 0.0], method=Fi5N,
                  rtol=1e-6, atol=1e-9, dense_output=True,
                  interpolant=ip)
    ex = np.stack([np.cos(tq2), -np.sin(tq2)])
    err = float(np.max(np.abs(np.asarray(r.sol(tq2)) - ex)))
    print(f"{ip:<12} {r.nfev:>6} {err:>24.2e}")

print("\n'best' buys extra stages for a C1, higher-order interpolant;"
      "\n'free' reuses the step's own stages at zero extra cost.")
