"""Stability regions of the explicit methods, computed from the
tableaux (counterpart of the reference's "stability regions" notebook).

For an explicit RK pair the linear stability function is

    R(z) = 1 + z b^T (I - z A)^{-1} 1

a polynomial of degree n_stages.  We evaluate |R(z)| on rays of the
left half plane and report, per method:

* the negative-real-axis stability boundary (|R(x)| = 1, x < 0),
* the imaginary-axis extent,
* the boundary radius at 45 degrees,

and compare the real-axis value with the tableau's ``stbrad`` (the
stiffness-detection arc radius the reference hard-codes) where set.

Run: python examples/10_stability_regions.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np                                     # noqa: E402

from extensisq_tpu import (BS5, Ts5, CK5, Me4, Pr7, Pr8, Pr9,  # noqa
                           CFMR7osc)

METHODS = [BS5, Ts5, CK5, Me4, Pr7, Pr8, Pr9, CFMR7osc]


def stability_poly(tab):
    """Coefficients of R(z) = 1 + sum_k z^(k+1) b^T A^k 1."""
    A = np.asarray(tab.A, dtype=float)
    b = np.asarray(tab.B, dtype=float)
    s = tab.n_stages
    coeffs = [1.0]
    v = np.ones(s)
    for _ in range(s):
        coeffs.append(float(b @ v))
        v = A @ v
    return np.array(coeffs)      # coeffs[k] multiplies z^k


def boundary_on_ray(coeffs, theta, r_max=60.0):
    """Largest r with |R(r e^{i theta})| <= 1 (bisection on the ray)."""
    def mag(r):
        z = r * np.exp(1j * theta)
        return abs(np.polyval(coeffs[::-1], z))

    if mag(1e-9) > 1.0:
        return 0.0
    lo, hi = 0.0, r_max
    # find a bracket: grow until unstable
    r = 1e-3
    while r < r_max and mag(r) <= 1.0:
        lo, r = r, r * 1.3
    hi = min(r, r_max)
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if mag(mid) <= 1.0:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


print(f"{'method':<10} {'stages':>6} {'real axis':>10} {'45 deg':>8} "
      f"{'imag axis':>10} {'stbrad (ref)':>13}")
for m in METHODS:
    tab = m.tableau
    c = stability_poly(tab)
    real = boundary_on_ray(c, np.pi)
    diag = boundary_on_ray(c, 3 * np.pi / 4)
    imag = boundary_on_ray(c, np.pi / 2)
    ref = f"{tab.stbrad:.2f}" if tab.stbrad is not None else "—"
    print(f"{m.name:<10} {tab.n_stages:>6} {real:>10.3f} {diag:>8.3f} "
          f"{imag:>10.3f} {ref:>13}")

print("\nThe stiffness detector compares the dominant |h lambda| "
      "against ~0.9*stbrad\n(core/stiffness.py); stbrad is slightly "
      "inside the true real-axis boundary by design.")
