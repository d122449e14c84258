"""Step-control (SC) stability of the explicit pairs, per controller
preset — the analysis behind the reference's docs/"SC stability"
figures (stab_dS_<method>_<controller>.png), which ship as images
with no generating code.

Integrating y' = lam*y with h*lam near the stability boundary, the
step-size controller and the method form a coupled discrete map
(Higham & Hall 1990).  Where that map is unstable the controller
limit-cycles: steps thrash between accept and reject even though the
method itself is stable — the classic failure of the "standard"
I-controller on mildly stiff problems, and the reason the reference
ships the Soederlind ("S") and Gustafsson ("G") predictive presets
(sc_params= on every solver; /root/reference/extensisq/bogacki.py
67-77 documents the law).

This script traces each method's stability boundary and marks every
point SC-stable or SC-unstable for each preset, printing a summary
table (and saving reference-style figures when matplotlib is
available).  Note how the standard controller is SC-unstable over
most of BS5's boundary arc while G clears everything except the
real-axis tip — matching the shipped figures point for point.

Run: python examples/15_sc_stability.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np                                     # noqa: E402

from extensisq_tpu import (BS5, Ts5, CK5, Me4, Pr7, Pr8, Pr9,  # noqa
                           CFMR7osc)
from extensisq_tpu.utils.sc_stability import (          # noqa: E402
    boundary_points, sc_stable)

METHODS = [BS5, Ts5, CK5, Me4, CFMR7osc, Pr7, Pr8, Pr9]
PRESETS = [("standard", "standard"), ("S", "Soederlind"),
           ("G", "Gustafsson")]

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
except Exception:                                      # pragma: no cover
    plt = None


def main():
    print(f"{'method':10s} {'controller':11s} {'stable':>7s} "
          f"{'unstable':>9s}  unstable region")
    for method in METHODS:
        zb = boundary_points(method, n_points=121)
        arc = zb[zb.real < -0.05]      # drop the degenerate Im-axis hug
        for key, label in PRESETS:
            st = sc_stable(method, arc, key)
            un = arc[~st]
            if len(un):
                where = (f"Re [{un.real.min():.2f}, {un.real.max():.2f}]"
                         f" Im [{un.imag.min():.2f}, {un.imag.max():.2f}]")
            else:
                where = "-"
            print(f"{method.name:10s} {label:11s} {int(st.sum()):7d} "
                  f"{len(un):9d}  {where}")

            if plt is not None:
                fig, ax = plt.subplots(figsize=(4.5, 3.8))
                ax.plot(arc[st].real, arc[st].imag, ".", color="tab:green",
                        label="stable")
                ax.plot(un.real, un.imag, ".", color="tab:red",
                        label="unstable")
                ax.set_title(f"{method.name}: {label}")
                ax.set_xlabel(r"$\Re(\lambda h)$")
                ax.set_ylabel(r"$\Im(\lambda h)$")
                ax.grid(True)
                ax.legend()
                fig.tight_layout()
                out = _os.path.join(_os.path.dirname(__file__),
                                    f"sc_stab_{method.name}_{label}.png")
                fig.savefig(out, dpi=110)
                plt.close(fig)
    if plt is not None:
        print("\nfigures saved next to this script "
              "(sc_stab_<method>_<controller>.png)")


if __name__ == "__main__":
    main()
