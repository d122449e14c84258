"""Trajectories (t_eval snapshots) straight from the fused kernels.

The fused Pallas solvers keep the whole adaptive integration inside
one TPU kernel — historically returning only the endpoint.  With
``t_eval=...`` they now ALSO record the solution on a user grid,
written from inside the kernel as the integration crosses each point:
cubic-Hermite interpolation from the step-endpoint (y, f) pairs, the
same inter-step evaluation the reference performs on the host
(common.py:766-790; for RKC this is exactly its dense output,
sommeijer.py:400-406).

No extra kernel launches, no trajectory buffers streamed to HBM per
step — just len(t_eval) rows filled in as the solve runs:

* ``solve_fused_erk(..., t_eval=grid)``   -> (len(grid), B, n) rows,
  per-member (each member crosses each time at its own step);
* ``solve_fused_rkc(..., t_eval=grid)``   -> (len(grid), *grid_shape)
  snapshots of the PDE field;
* ``solve_fused_esdirk(..., t_eval=grid)`` -> (len(grid), B, n) rows
  of a stiff/DAE ensemble (y' at the step endpoints is the stiffly
  accurate last stage);
* ``solve_fused_adams(..., t_eval=grid)`` -> the same for the
  variable-order SWAG multistep path.

Run on CPU (interpret mode) or directly on a TPU.
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

INTERPRET = jax.default_backend() == "cpu"
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from extensisq_tpu.ops import (solve_fused_erk, solve_fused_rkc,  # noqa: E402
                               solve_fused_esdirk)
from extensisq_tpu.ops.fused_rkc import roll  # noqa: E402
from extensisq_tpu import Kv3I  # noqa: E402


# -- 1. an oscillator ensemble with a 9-point trajectory --------------
def vdp(t, y):
    return jnp.stack([y[1], 5.0 * (1 - y[0] ** 2) * y[1] - y[0]])


B = 256
Y0 = np.stack([np.linspace(1.9, 2.1, B), np.zeros(B)],
              axis=1).astype(np.float32)
grid = np.linspace(0.0, 8.0, 9).astype(np.float32)

y, status, nsteps, nfev, traj = solve_fused_erk(
    vdp, (0.0, 8.0), Y0, rtol=1e-4, atol=1e-6, block_members=256,
    interpret=INTERPRET, t_eval=grid)
print("ensemble ok:", bool(np.all(np.asarray(status) == 1)))
print("trajectory shape:", np.asarray(traj).shape)      # (9, 256, 2)
print("member 0, y0(t):",
      np.array2string(np.asarray(traj)[:, 0, 0], precision=3))

# -- 2. a PDE field filmed at 5 instants ------------------------------
ny, nx = 32, 64
dx = 1.0 / nx


def brusselator(t, uv):
    lap = (roll(uv, 1, 1) + roll(uv, -1, 1)
           + roll(uv, 1, 2) + roll(uv, -1, 2) - 4.0 * uv) / dx ** 2
    u, v = uv[0], uv[1]
    uv2 = u * u * v
    return jnp.stack([1.0 + uv2 - 4.0 * u + 0.02 * lap[0],
                      3.0 * u - uv2 + 0.02 * lap[1]])


rho = 8.0 * 0.02 / dx ** 2 + 5.0
xg = np.linspace(0, 1, nx, endpoint=False)
U0 = np.stack([1.0 + 0.3 * np.sin(2 * np.pi * xg)[None, :]
               * np.ones((ny, 1)),
               3.0 * np.ones((ny, nx))]).astype(np.float32)
film_times = np.linspace(0.0, 1.0, 5).astype(np.float32)

yf, status, nsteps, nfev, film = solve_fused_rkc(
    brusselator, (0.0, 1.0), U0, rho, rtol=1e-4, atol=1e-7,
    interpret=INTERPRET, t_eval=film_times)
print("\nPDE ok:", int(status) == 1, "steps:", int(nsteps))
print("film shape:", np.asarray(film).shape)        # (5, 2, 32, 64)
print("mean u per frame:",
      np.array2string(np.asarray(film)[:, 0].mean(axis=(1, 2)),
                      precision=4))

# -- 3. a stiff ensemble sampled on a log grid ------------------------
def robertson(t, y):
    r1 = -0.04 * y[0] + 1e4 * y[1] * y[2]
    r3 = 3e7 * y[1] * y[1]
    return jnp.stack([r1, -r1 - r3, r3])


R0 = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (256, 1))
log_grid = np.logspace(-2, 3, 6).astype(np.float32)

yr, status, nsteps, nfev, hist = solve_fused_esdirk(
    robertson, (0.0, 1e3), R0, method=Kv3I, rtol=1e-4, atol=1e-8,
    block_members=256, interpret=INTERPRET, t_eval=log_grid)
print("\nstiff ok:", bool(np.all(np.asarray(status) == 1)),
      "steps:", int(np.asarray(nsteps).max()))
print("history shape:", np.asarray(hist).shape)      # (6, 256, 3)
print("member 0, y1(t):",
      np.array2string(np.asarray(hist)[:, 0, 1], precision=3))

# -- 4. fused RKC without a spectral-radius bound, with an event ------
# rho=None runs the netlib RKCRHO nonlinear power iteration INSIDE the
# kernel (sommeijer.py:331-398) — nothing to supply; nfesig reports
# the evals it cost.  Events use the solve_ivp protocol: this one
# stops the solve when the mean concentration first crosses 1.02.
def u_mean_crosses(t, y):
    return jnp.mean(y[0]) - 1.02


u_mean_crosses.terminal = True

yf2, status, nsteps, nfev, nfesig, t_ev, y_ev, n_ev = solve_fused_rkc(
    brusselator, (0.0, 1.0), U0, None, rtol=1e-4, atol=1e-7,
    interpret=INTERPRET, events=u_mean_crosses)
print("\nself-estimated rho: status", int(status),
      "(8 = terminal event)", "nfesig:", int(nfesig))
print("event at t =", float(t_ev[0]),
      " mean u there:", float(np.asarray(y_ev)[0, 0].mean()))
