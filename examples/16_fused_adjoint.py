"""Gradients with MANY parameters through a fused forward solve.

Two differentiable fused doors exist:

* ``ops.solve_fused_final`` — backward = one fused FORWARD-sensitivity
  solve.  The augmented state is n*(1 + k + n) wide, so its cost (and
  VMEM) scales with the parameter count k.  Unbeatable for small k.
* ``ops.solve_fused_adjoint`` — backward = the CONTINUOUS ADJOINT
  (what the reference's ``sens_adjoint_end`` implements,
  /root/reference/extensisq/sensitivity.py): the fused forward
  records per-step (t, y, f) rows in-kernel (ops/fused_dense.py), and
  one (n + k)-dimensional backward system per member integrates
  mu' = -J^T mu, xi' = (df/dp)^T mu against that dense output with
  the f64 XLA driver.  Gradient cost is FLAT in k — the right tool
  when each member carries a big parameter vector.

Here: a driven oscillator whose forcing is a k = 12 term Fourier
series, per member.  jax.grad returns dL/d(all 12 coefficients) for
every member from ONE fused launch + ONE backward adjoint solve.

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

from extensisq_tpu.ops import solve_fused_adjoint  # noqa: E402

B, K = 8, 12


def forced(t, y, p):
    """y'' + 0.2 y' + y = sum_j p_j sin((j+1) t) — rows convention."""
    drive = sum(p[j] * jnp.sin((j + 1.0) * t) for j in range(K))
    return jnp.stack([y[1], -0.2 * y[1] - y[0] + drive])


Y0 = np.zeros((B, 2), np.float32)
Y0[:, 0] = 1.0
rng = np.random.RandomState(0)
P = (0.3 * rng.rand(B, K)).astype(np.float32)


def loss(Pb):
    yf = solve_fused_adjoint(forced, (0.0, 6.0), jnp.asarray(Y0), Pb,
                             None, 1e-5, 1e-8, 100_000, 128,
                             INTERPRET, 512)
    return jnp.sum(yf[:, 0] ** 2)


val, g = jax.value_and_grad(loss)(jnp.asarray(P))
print(f"loss {float(val):.5f}; dL/dp shape {g.shape} "
      f"(all {B * K} gradients from one backward adjoint)")

# sanity: central difference on one coefficient of one member
eps = 1e-2
Pp, Pm = P.copy(), P.copy()
Pp[3, 5] += eps
Pm[3, 5] -= eps
fd = (float(loss(jnp.asarray(Pp))) - float(loss(jnp.asarray(Pm)))) \
    / (2 * eps)
print(f"dL/dp[3,5]: adjoint {float(g[3, 5]):+.5f}  vs  FD {fd:+.5f}")
assert abs(float(g[3, 5]) - fd) < 5e-3 * max(1.0, abs(fd))
print("OK")
