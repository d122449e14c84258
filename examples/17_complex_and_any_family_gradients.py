"""Complex ensembles and any-family gradients on the fused path.

Two round-5 capabilities:

1. ``ops.solve_fused_erk_complex`` — complex-valued ODE ensembles
   (the reference's ``support_complex=True`` cell, common.py:193)
   through the UNCHANGED real fused ERK kernels.  z = x + iy rides a
   blocked [Re | Im] real-pair lane encoding; because RK arithmetic
   is linear in the state, real weighted sums of the stacked (re, im)
   rows ARE complex RK arithmetic exactly.  The RHS is written over
   (re, im) array pairs (``cmul``/``conj_mul`` helpers); the complex
   boundary stays on HOST (TPU backends hold no complex buffers).

2. ``ops.solve_fused_adjoint`` now routes EVERY family the reference's
   adjoint supports (sensitivity.py works with any solver): ERK,
   ESDIRK, RKN — pass the acceleration ``acc(t, u, v[, p])`` and the
   backward differentiates the full-state [v, a] form automatically —
   and Adams/SWAG (static t_span; the multistep host init bakes the
   horizon in).

Run on CPU (interpret mode) or directly on a TPU.
"""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from extensisq_tpu.ops import (solve_fused_erk_complex, cmul,
                               solve_fused_adjoint)
from extensisq_tpu.methods import Fi5N, SWAG

INTERPRET = jax.default_backend() == "cpu"

# -- 1. complex rotation-decay sweep ----------------------------------
# z' = (i w - a) z for a per-member frequency sweep w: the workhorse
# linear-complex test (exact solution z0 e^{(iw-a)t}).  n = 24 complex
# states -> 48 real lanes, riding the grid kernel's masked padding.
B, n = 8, 24
rng = np.random.RandomState(0)
z0 = (rng.randn(B, n) + 1j * rng.randn(B, n)).astype(np.complex64)
ws = np.linspace(1.0, 3.0, B).astype(np.float32)[:, None]
a = 0.3


def rot(t, re, im, p):
    # (i w - a) z over the (re, im) pair; p[0] is the member's w tile
    return cmul(re, im, 0.0 * re - a, p[0] + 0.0 * re)


zf, status, nsteps, nfev = solve_fused_erk_complex(
    rot, (0.0, 2.0), z0, params=ws, rtol=1e-6, atol=1e-9,
    block_members=8, interpret=INTERPRET)
lam = (-a + 1j * ws[:, 0]).astype(np.complex64)
exact = z0 * np.exp(lam * 2.0)[:, None]
print("complex sweep ok:", bool(np.all(np.asarray(status) == 1)),
      " dtype:", np.asarray(zf).dtype,
      " max |z - exact|:", float(np.abs(np.asarray(zf) - exact).max()))

# -- 2. RKN-family adjoint: gradient of an oscillator sweep -----------
# u'' = -w^2 u.  L = sum_b u_b(tf); dL/du0 = cos(w tf) in closed form.
# The fused RKN forward records its partitioned [u,v]/[v,a] Hermite
# rows in-kernel; the backward is one (n+k) continuous-adjoint system
# per member through that dense output.
Y0 = np.zeros((128, 2), np.float32)
Y0[:, 0] = 1.0
wr = np.linspace(1.0, 2.0, 128).astype(np.float32)[:, None]
tf = 2.0


def acc(t, u, v, p):
    return -(p[0] ** 2) * u


def loss_rkn(Y, P):
    yf = solve_fused_adjoint(acc, (0.0, tf), Y, P, Fi5N,
                             1e-6, 1e-9, 100_000, 128, INTERPRET, 512)
    return jnp.sum(yf[:, 0])


gy0, gw = jax.grad(loss_rkn, argnums=(0, 1))(jnp.asarray(Y0),
                                             jnp.asarray(wr))
err = np.abs(np.asarray(gy0)[:, 0] - np.cos(wr[:, 0] * tf)).max()
print("RKN adjoint: max |dL/du0 - cos(w tf)| =", float(err))

# -- 3. SWAG-family adjoint: Van der Pol mu-sweep gradient ------------
# The variable-order multistep forward in one kernel + the same
# adjoint backward.  t_span must be static on this route (no (t0, tf)
# gradients — the reference's adjoint has none for any solver).
Yv = np.zeros((128, 2), np.float32)
Yv[:, 0] = 2.0
mus = np.linspace(1.0, 2.0, 128).astype(np.float32)[:, None]


def vdp(t, y, p):
    return jnp.stack([y[1], p[0] * (1 - y[0] ** 2) * y[1] - y[0]])


def loss_swag(Y, P):
    yf = solve_fused_adjoint(vdp, (0.0, 3.0), Y, P, SWAG,
                             1e-5, 1e-8, 100_000, 128, INTERPRET, 512,
                             None, None, None, "flat", 6)
    return jnp.sum(yf[:, 0])


gmu = jax.grad(loss_swag, argnums=1)(jnp.asarray(Yv), jnp.asarray(mus))
print("SWAG adjoint: dL/dmu range [%.4f, %.4f], all finite: %s"
      % (float(np.asarray(gmu).min()), float(np.asarray(gmu).max()),
         bool(np.all(np.isfinite(np.asarray(gmu))))))
