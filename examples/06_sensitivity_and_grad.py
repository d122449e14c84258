"""Sensitivity analysis three ways: forward, adjoint, and jax.grad.

No hand-written Jacobians anywhere — the derivatives come from
autodiff (jvp for forward, vjp for adjoint), which the pure-Python
reference could not do (its jac/dfdp/dgdy/dgdp arguments are
mandatory callables).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from extensisq_tpu import (sens_forward, sens_adjoint_end, solve_final,
                           BS5, KC4I)


def robertson(t, y, *p):
    p1, p2, p3 = p
    return jnp.stack([-p1 * y[0] + p2 * y[1] * y[2],
                      p1 * y[0] - p2 * y[1] * y[2] - p3 * y[1] ** 2,
                      p3 * y[1] ** 2])


p = (0.04, 1e4, 3e7)
y0 = np.array([1.0, 0.0, 0.0])
atol = np.array([1e-8, 1e-14, 1e-6])

# forward sensitivities: one augmented solve of size ny*(np+1)
sens, yf, _ = sens_forward(robertson, (0.0, 0.4), y0, p=p, method=KC4I,
                           rtol=1e-4, atol=atol)
print("forward dy/dp at t=0.4:")
print(sens)

# adjoint sensitivities of a functional g(tf, y)
g = lambda t, y, *p: jnp.array([y[0]])      # noqa: E731
sens_a, gf, *_ = sens_adjoint_end(robertson, (0.0, 0.4), y0, p=p, g=g,
                                  method=KC4I, atol=atol, rtol=1e-4,
                                  atol_adj=1e-6, atol_quad=1e-7)
print("adjoint  dy0/dp:", sens_a, " (matches forward row 0)")

# the whole solve under jax.grad (continuous adjoint custom_vjp)


def vdp(t, y, mu):
    return jnp.stack([y[1], mu * (1 - y[0] ** 2) * y[1] - y[0]])


def loss(mu):
    yf = solve_final(vdp, (0.0, 5.0), jnp.array([2.0, 0.0]), mu,
                     BS5, 1e-9, 1e-12)
    return yf[0]


print("d y0(5) / d mu =", float(jax.grad(loss)(1.5)))
print("gradient over an ensemble of mus:",
      np.asarray(jax.vmap(jax.grad(loss))(jnp.linspace(0.5, 2.5, 5))))
