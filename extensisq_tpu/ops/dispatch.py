"""One front door for the fused kernels: route by METHOD FAMILY and
problem size, the way a reference user thinks (``method=BS5``), not by
kernel name.

``solve_fused(fun, t_span, y0_batch, method=..., **kw)`` picks:

| family  | small systems            | mid-size (n % 128 == 0)     |
|---------|--------------------------|-----------------------------|
| erk     | solve_fused_erk          | solve_fused_erk_grid        |
| ckdisc  | solve_fused_ckdisc       | solve_fused_ckdisc_grid     |
| rkn     | solve_fused_rkn          | solve_fused_rkn_grid        |
| esdirk  | solve_fused_esdirk (n<=8)| solve_fused_esdirk_grid     |
| adams   | solve_fused_adams (n<=8) | solve_fused_adams_grid      |
| rkc     | solve_fused_rkc (one grid) / solve_fused_rkc_ensemble  |

The TWO LAYOUTS have different RHS conventions — row-stacked member
tiles (``y[j]`` indexing) for the small-system kernels, (bm, n) lane
arrays for the grid kernels — so the dispatcher cannot silently
convert a mismatched ``fun``; it only picks the kernel.  Pass
``layout="flat"`` or ``layout="grid"`` to force a side; default picks
``grid`` when the (per-partition) state length is a multiple of 128,
at least 48, or above a small-kernel cap.  The grid kernels accept
ANY n — non-aligned sizes ride inert masked lane padding
(ops/_lane_pad.py) with the exact unpadded step sequence, so e.g. the
reference's Medazko n=400 showcase runs fused without hand-padding.

RKC dispatch is by input shape: a single (grid-shaped, >= 2-D) y0
runs :func:`solve_fused_rkc`; an (n_members, *grid_shape) stack runs
:func:`solve_fused_rkc_ensemble` (pass ``ensemble=True`` to force the
member reading of a 3-D input that could be a single 3-D grid).
"""
import numpy as np

from .fused_erk import solve_fused_erk
from .fused_erk_grid import solve_fused_erk_grid
from .fused_ckdisc import solve_fused_ckdisc
from .fused_ckdisc_grid import solve_fused_ckdisc_grid
from .fused_rkn import solve_fused_rkn
from .fused_rkn_grid import solve_fused_rkn_grid
from .fused_rkc import solve_fused_rkc, solve_fused_rkc_ensemble
from .fused_esdirk import solve_fused_esdirk
from .fused_esdirk_grid import solve_fused_esdirk_grid
from .fused_adams import solve_fused_adams
from .fused_adams_grid import solve_fused_adams_grid

_SMALL_CAP = {"esdirk": 8, "adams": 8}
_GRID_MIN = 48     # smallest state the grid layout wins at (padded)


def solve_fused(fun, t_span, y0_batch, method=None, layout=None,
                ensemble=None, **kw):
    """Route a fused whole-integration solve to the family's kernel.

    ``method``: a Method handle (BS5, CKdisc, SWAG, SSV2stab, Fi5N,
    Kv3I, ...) — its ``family`` picks the kernel; None = BS5 (erk).
    ``layout``: force "flat" (row-stacked member tiles) or "grid"
    (states on the lane axis); default auto-picks by size.
    All other kwargs (rtol/atol/first_step/t_eval/events/rho/M/
    params/...) pass through to the kernel; see each kernel's
    docstring for its RHS convention and extras.  ``params=(B, k)``
    per-member scalar parameters are supported by EVERY fused kernel
    (the RHS and event callables gain a third argument ``p``, a
    k-tuple of per-member tiles).
    """
    if method is None:
        family = "erk"
    else:
        family = getattr(method, "family", None)
        if family is None:
            raise ValueError(
                f"method {method!r} has no 'family' attribute — "
                "custom methods must declare one (erk/ckdisc/rkn/"
                "esdirk/adams/rkc) to route to a fused kernel; "
                "running an unknown method through the ERK kernel "
                "would silently produce wrong results")

    if family == "rkc":
        nd = np.ndim(y0_batch)
        is_ens = ensemble if ensemble is not None else nd >= 4
        if is_ens:
            return solve_fused_rkc_ensemble(fun, t_span, y0_batch,
                                            **kw)
        return solve_fused_rkc(fun, t_span, y0_batch, **kw)

    n = int(np.shape(y0_batch)[-1])
    n_part = n // 2 if family == "rkn" else n

    if layout is None:
        cap = _SMALL_CAP.get(family)
        # the grid kernels accept ANY n (masked lane padding,
        # ops/_lane_pad.py), so routing is a pure efficiency choice:
        # small states run fastest with members on lanes (flat),
        # larger states with the state on lanes (grid; below 128 the
        # pad waste still beats unrolling >= _GRID_MIN state rows)
        wants_grid = (n_part % 128 == 0 and n_part >= 128) \
            or n_part >= _GRID_MIN
        if cap is not None and n_part > cap:
            layout = "grid"
        else:
            layout = "grid" if wants_grid else "flat"

    if family == "erk":
        f = solve_fused_erk_grid if layout == "grid" else \
            solve_fused_erk
        return f(fun, t_span, y0_batch, method=method, **kw)
    if family == "ckdisc":
        f = solve_fused_ckdisc_grid if layout == "grid" else \
            solve_fused_ckdisc
        return f(fun, t_span, y0_batch, **kw)
    if family == "rkn":
        f = solve_fused_rkn_grid if layout == "grid" else \
            solve_fused_rkn
        return f(fun, t_span, y0_batch, method=method, **kw)
    if family == "esdirk":
        f = solve_fused_esdirk_grid if layout == "grid" else \
            solve_fused_esdirk
        return f(fun, t_span, y0_batch, method=method, **kw)
    if family == "adams":
        f = solve_fused_adams_grid if layout == "grid" else \
            solve_fused_adams
        return f(fun, t_span, y0_batch, **kw)
    raise ValueError(f"no fused kernel for method family {family!r}")
