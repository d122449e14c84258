"""Define and run your own Runge-Kutta method (counterpart of the
reference's ``Demo_own_RK.ipynb``).

A method here is pure data: an :class:`extensisq_tpu.types.ERKTableau`
wrapped in a :class:`Method` handle.  Anything you build this way gets
the full machinery for free — both drivers, events, dense output
(cubic-Hermite fallback when you give no interpolant), vmapped
ensembles, and the device while-loop path.

Run: python examples/12_custom_method.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np                                     # noqa: E402
import jax.numpy as jnp                                # noqa: E402

from extensisq_tpu import solve_ivp, solve_ensemble    # noqa: E402
from extensisq_tpu.types import ERKTableau, Method     # noqa: E402

# Bogacki-Shampine 3(2) — the classic RK23 pair, written by hand.
# A is strictly lower triangular; E are the error weights (embedded
# minus main, FSAL: 4 entries with E[-1] != 0).
BS23 = Method(
    name="BS23", family="erk",
    tableau=ERKTableau(
        name="BS23", order=3, order_secondary=2,
        A=[[0.0, 0.0, 0.0],
           [1 / 2, 0.0, 0.0],
           [0.0, 3 / 4, 0.0]],
        B=[2 / 9, 1 / 3, 4 / 9],
        C=[0.0, 1 / 2, 3 / 4],
        E=[5 / 72, -1 / 12, -1 / 9, 1 / 8],
        stbrad=1.7, tanang=20.0))

r = solve_ivp(lambda t, y: -y, (0.0, 4.0), [1.0], method=BS23,
              rtol=1e-6, atol=1e-9, dense_output=True)
print(f"custom BS23: {r.t.size - 1} steps, {r.nfev} evals, "
      f"err {abs(float(r.y[0, -1]) - np.exp(-4.0)):.2e}")
print(f"dense output at t=2: {float(r.sol(2.0)[0]):.8f} "
      f"(exact {np.exp(-2.0):.8f})")

# the same handle drives the whole-trajectory-on-device ensemble path
B = 64
Y0 = jnp.stack([jnp.linspace(0.5, 2.0, B), jnp.zeros(B)], axis=1)
out = solve_ensemble(lambda t, y: jnp.stack([y[1], -y[0]]),
                     (0.0, 2 * np.pi), Y0, method=BS23,
                     rtol=1e-6, atol=1e-9)
ok = bool(jnp.all(out.status == 1))
err = float(jnp.max(jnp.abs(out.y[:, 0] - Y0[:, 0])))
print(f"ensemble x{B} on device: all finished={ok}, "
      f"period-return error {err:.2e}")
