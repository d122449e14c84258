"""Second-order dynamics with Runge-Kutta-Nystrom methods.

Kepler orbit + the Pleiades 7-body problem (BASELINE config 3).  RKN
methods integrate u'' = a(t, u[, u']) with the state laid out
[positions, velocities] and the RHS returning [velocities,
accelerations] — the solver stores only accelerations internally.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import numpy as np
import jax.numpy as jnp

from extensisq_tpu import solve_ivp, Fi5N, MR6NN

# --- Kepler orbit, one period -------------------------------------------
ecc = 0.5
y0 = np.array([1 - ecc, 0.0, 0.0, np.sqrt((1 + ecc) / (1 - ecc))])


def kepler(t, y):
    r, v = y[:2], y[2:]
    a = -r / jnp.sum(r ** 2) ** 1.5
    return jnp.concatenate([v, a])


res = solve_ivp(kepler, (0, 2 * np.pi), y0, method=Fi5N, rtol=1e-10,
                atol=1e-13)
print("Kepler: period-return error",
      np.abs(res.y[:, -1] - y0).max(), f"({res.nfev} evals)")

# velocity-independent problems can use the strict method MR6NN
res6 = solve_ivp(kepler, (0, 2 * np.pi), y0, method=MR6NN, rtol=1e-10,
                 atol=1e-13)
print("MR6NN :", np.abs(res6.y[:, -1] - y0).max(), f"({res6.nfev} evals)")

# --- Pleiades (7 bodies, Hairer I) ---------------------------------------
x0 = np.array([3.0, 3.0, -1.0, -3.0, 2.0, -2.0, 2.0,
               3.0, -3.0, 2.0, 0.0, 0.0, -4.0, 4.0])
v0 = np.zeros(14)
v0[[5, 6, 9, 13]] = [1.75, -1.5, -1.25, 1.0]
v0[[10, 12]] = [0.0, 0.0]
masses = np.arange(1.0, 8.0)


def pleiades(t, y):
    pos = y[:14].reshape(7, 2)
    vel = y[14:].reshape(7, 2)
    d = pos[:, None, :] - pos[None, :, :]
    r3 = jnp.sum(d ** 2, axis=-1) ** 1.5
    r3 = jnp.where(r3 == 0, 1.0, r3)
    acc = -jnp.sum(jnp.asarray(masses)[None, :, None] * d
                   / r3[:, :, None], axis=1)
    return jnp.concatenate([vel.reshape(-1), acc.reshape(-1)])


y0p = np.concatenate([x0, v0])
res = solve_ivp(pleiades, (0.0, 3.0), y0p, method=Fi5N, rtol=1e-10,
                atol=1e-12, dense_output=True)
print(f"Pleiades: {res.nsteps} steps, {res.nfev} evals, "
      f"final x1 = {res.y[0, -1]:.6f}")
