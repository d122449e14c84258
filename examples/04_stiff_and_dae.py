"""Stiff problems and index-1 DAEs with the ESDIRK methods
(BASELINE config 4)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import numpy as np
import jax.numpy as jnp

from extensisq_tpu import solve_ivp, TRBDF2, Kv3I

# --- Robertson to t = 1e8 (autodiff Jacobian) -----------------------------


def robertson(t, y):
    return jnp.stack([-0.04 * y[0] + 1e4 * y[1] * y[2],
                      0.04 * y[0] - 1e4 * y[1] * y[2] - 3e7 * y[1] ** 2,
                      3e7 * y[1] ** 2])


res = solve_ivp(robertson, (0, 1e8), [1.0, 0.0, 0.0], method=TRBDF2,
                rtol=1e-6, atol=1e-9)
print(f"Robertson: {res.nsteps} steps, nfev={res.nfev}, "
      f"njev={res.njev} (autodiff), nlu={res.nlu}")
print("  y(1e8) =", res.y[:, -1])

# --- pendulum index-1 DAE: x^2 + y^2 = L^2 enforced via mass matrix -------
# state [x, y, vx, vy, lam];  M diag(1,1,1,1,0)
L = 1.0
g = 9.81


def pendulum(t, s):
    x, y, vx, vy, lam = s
    return jnp.stack([
        vx,
        vy,
        -lam * x,
        -lam * y - g,
        # acceleration-level constraint: involves lam => index 1
        vx ** 2 + vy ** 2 - lam * (x ** 2 + y ** 2) - g * y,
    ])


M = np.diag([1.0, 1.0, 1.0, 1.0, 0.0])
s0 = np.array([L, 0.0, 0.0, 0.0, 0.0])
res = solve_ivp(pendulum, (0.0, 3.0), s0, method=Kv3I, M=M, rtol=1e-7,
                atol=1e-10, dense_output=True)
r = np.sqrt(res.y[0] ** 2 + res.y[1] ** 2)
print(f"pendulum DAE: {res.nsteps} steps, |r - L| max ="
      f" {np.abs(r - L).max():.2e}")

# --- Kaps singular-perturbation DAE with inconsistent ICs -----------------


def kaps(t, y):
    return jnp.stack([-y[0] + y[1] ** 2, y[0] - y[1] - y[1] ** 2])


import warnings
with warnings.catch_warnings(record=True) as rec:
    warnings.simplefilter("always")
    res = solve_ivp(kaps, (0, 1.0), [2.0, 1.0], method=TRBDF2,
                    M=np.array([0.0, 1.0]))
print("Kaps: inconsistent y0 projected;",
      [str(w.message).splitlines()[1].strip() for w in rec][:1])
print("  constraint residual:",
      np.abs(res.y[1, -1] ** 2 - res.y[0, -1]))
