"""Mid-size fused kernels (states-on-lanes) and in-kernel events.

The fused grid kernels cover systems of n ~ 128-512 states — too
big for the row-unrolled small-system kernels, too small to shard —
with the TRANSPOSED layout: the state rides the 128-lane axis,
members ride sublanes, and the whole adaptive integration runs in one
kernel launch:

* ``solve_fused_erk_grid``    — explicit RK (advection/reaction MoL)
* ``solve_fused_adams_grid``  — variable-order SWAG multistep
* ``solve_fused_esdirk_grid`` — implicit ESDIRK with TRIDIAGONAL
  Newton matrices (bands from 4-color in-kernel JVPs, solves by
  parallel cyclic reduction over the lane axis)
* ``solve_fused_ckdisc_grid`` — the CKdisc quit/twiddle cascade for
  NON-SMOOTH mid-size systems (switched forcing, discontinuities)

The RHS convention: ``fun(t, y)`` gets t (bm, 1) and y (bm, n),
returns (bm, n); stencils are ``jnp.roll(y, s, -1)`` lane rolls.

The ERK kernels (both layouts) also run EVENTS fully in-kernel:
the solve_ivp terminal/direction protocol, Hermite-bisection roots,
first-crossing recording, terminal truncation (status 8).

Run on CPU (interpret mode): python examples/14_...py
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")   # demo runs anywhere

import numpy as np
import jax.numpy as jnp

from extensisq_tpu.ops import (solve_fused_erk_grid,
                               solve_fused_esdirk_grid)

INTERPRET = jax.default_backend() == "cpu"

# --- 1. nonstiff: Fisher-KPP advection-reaction front, 256 states ----
n = 256
c, dx = 1.0, 1.0 / n


def fisher(t, y):
    return -c * (y - jnp.roll(y, 1, -1)) / dx + y * (1.0 - y)


B = 16
xg = np.linspace(0, 1, n, endpoint=False)
amps = np.linspace(0.2, 0.8, B)
Y0 = (0.5 + 0.4 * amps[:, None]
      * np.sin(2 * np.pi * xg)[None, :]).astype(np.float32)

y, st, ns, nf = solve_fused_erk_grid(
    fisher, (0.0, 1.0), Y0, rtol=1e-5, atol=1e-7, block_members=16,
    interpret=INTERPRET)
print(f"grid ERK   x{B}: all ok={bool(np.all(np.asarray(st) == 1))}, "
      f"~{int(np.asarray(ns).mean())} steps, "
      f"u-range [{float(np.asarray(y).min()):.3f}, "
      f"{float(np.asarray(y).max()):.3f}]")

# --- 2. the same run, terminated by an in-kernel event --------------


def front_arrives(t, y):
    """Lane 0 rises through 0.95 (the logistic front passes x=0)."""
    return y[:, 0:1] - 0.95


front_arrives.terminal = True
front_arrives.direction = 1.0

y2, st2, ns2, nf2, t_ev, y_ev, n_ev = solve_fused_erk_grid(
    fisher, (0.0, 5.0), Y0, rtol=1e-5, atol=1e-7, block_members=16,
    interpret=INTERPRET, events=front_arrives)
te = np.asarray(t_ev)[0]
print(f"event      x{B}: every member terminated at its own front-"
      f"arrival time, t in [{np.nanmin(te):.3f}, {np.nanmax(te):.3f}] "
      f"(status {int(np.asarray(st2)[0])} == TERMINAL_EVENT)")

# --- 3. stiff: reaction-diffusion through the implicit grid kernel --
nI = 128
D, dxI = 1.0, 1.0 / nI


def rdiff(t, y):
    return (D * (jnp.roll(y, 1, -1) + jnp.roll(y, -1, -1)
                 - 2.0 * y) / dxI ** 2 + y * y * (1.0 - y))


Y0I = (0.5 + 0.4 * np.linspace(0.3, 0.7, 8)[:, None]
       * np.sin(2 * np.pi * np.linspace(0, 1, nI,
                                        endpoint=False))[None, :]
       ).astype(np.float32)
y3, st3, ns3, nf3 = solve_fused_esdirk_grid(
    rdiff, (0.0, 0.1), Y0I, rtol=1e-4, atol=1e-6, block_members=8,
    interpret=INTERPRET)
print(f"grid ESDIRK x8: all ok={bool(np.all(np.asarray(st3) == 1))}, "
      f"~{int(np.asarray(ns3).mean())} implicit steps "
      f"(tridiagonal Newton via cyclic reduction, "
      f"{int(np.asarray(nf3).mean())} RHS evals)")

# --- 4. non-smooth: the CKdisc cascade on a switched MoL model ------
# sign-switching forcing makes the RHS discontinuous in t — exactly
# the problem class CKdisc's staged assessments and reduced-order
# fallbacks exist for (cash.py:115-165).
from extensisq_tpu.ops import solve_fused_ckdisc_grid


def fisher_switched(t, y):
    sw = jnp.where(jnp.sin(4.0 * t) >= 0.0, 1.0, -1.0)
    return fisher(t, y) + 0.3 * sw


y4, st4, ns4, nf4 = solve_fused_ckdisc_grid(
    fisher_switched, (0.0, 1.0), Y0, rtol=1e-4, atol=1e-6,
    block_members=16, interpret=INTERPRET)
print(f"grid CKdisc x{B}: all ok={bool(np.all(np.asarray(st4) == 1))},"
      f" ~{int(np.asarray(ns4).mean())} accepted steps "
      f"({int(np.asarray(nf4).mean())} RHS evals through the "
      f"quit/twiddle cascade)")
