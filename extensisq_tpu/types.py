"""Core data types: Butcher tableaux as frozen data, solver params/state.

The reference encodes each method as a class with numpy class attributes
(SURVEY.md section 2.2).  Here a method is *pure data*: a frozen tableau
dataclass whose arrays become compile-time constants of the jitted step
program, plus a lightweight ``Method`` handle the user passes to
``solve_ivp``/``solve`` (mirroring the reference usage
``solve_ivp(fun, t_span, y0, method=BS5)``, /root/reference/README.md:26-35).
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import numpy as np


def _freeze(a):
    if a is None:
        return None
    a = np.asarray(a, dtype=float)
    a.setflags(write=False)
    return a


@dataclasses.dataclass(frozen=True)
class ERKTableau:
    """Embedded explicit Runge-Kutta pair (+ optional interpolants).

    Layout follows the conventions of the reference base class
    (/root/reference/extensisq/common.py:88-121): ``A`` (s, s) strictly
    lower triangular, ``B``/``C`` (s,), error weights ``E`` (s+1,) with
    ``E[-1] != 0`` iff the pair is FSAL, interpolant ``P`` (s+1, p).
    """
    name: str
    order: int
    order_secondary: int
    A: np.ndarray
    B: np.ndarray
    C: np.ndarray
    E: np.ndarray
    P: Optional[np.ndarray] = None
    # two-phase error test (BS5 / CFMR7osc): error check after n_pre stages
    n_pre: int = 0
    E_pre: Optional[np.ndarray] = None          # (n_pre,)
    B_pre: Optional[np.ndarray] = None          # (n_pre,) scale-solution wts
    # extra stages for higher-accuracy interpolants, keyed by option name:
    # {name: (C_extra, A_extra, P_full)} where A_extra is (n_extra, s_total)
    interpolants: Any = None
    # stiffness-detection stability-arc parameters (None = not implemented)
    stbrad: Optional[float] = None
    tanang: Optional[float] = None
    sc_params: str = "standard"

    def __post_init__(self):
        for f in ("A", "B", "C", "E", "P", "E_pre", "B_pre"):
            object.__setattr__(self, f, _freeze(getattr(self, f)))

    @property
    def n_stages(self):
        return self.B.shape[0]

    @property
    def fsal(self):
        return bool(self.E[self.n_stages] != 0.0)

    def c_spacing(self):
        """Minimum distance between distinct C nodes, for the min-step
        rule (/root/reference/extensisq/common.py:123-148)."""
        cdiff = 1.0
        for c1 in self.C:
            for c2 in self.C:
                d = abs(c1 - c2)
                if d:
                    cdiff = min(cdiff, d)
        return max(cdiff, 1e-3)


@dataclasses.dataclass(frozen=True)
class RKNTableau:
    """Explicit Runge-Kutta-Nystrom pair for u'' = a(t, u[, u']).

    Displacement weights A/B/E act with h^2, velocity weights Ap/Bp/Ep
    with h (cf. /root/reference/extensisq/common.py:1207-1310).  ``Ap``
    is None for velocity-independent (strict RKN) methods.
    """
    name: str
    order: int
    order_secondary: int
    A: np.ndarray
    B: np.ndarray
    C: np.ndarray
    E: np.ndarray
    Ap: Optional[np.ndarray]
    Bp: np.ndarray
    Ep: np.ndarray
    P: Optional[np.ndarray] = None
    Pp: Optional[np.ndarray] = None
    interpolants: Any = None
    stbre: Optional[float] = None
    stbim: Optional[float] = None
    tanang: Optional[float] = None
    sc_params: str = "G"

    def __post_init__(self):
        for f in ("A", "B", "C", "E", "Ap", "Bp", "Ep", "P", "Pp"):
            object.__setattr__(self, f, _freeze(getattr(self, f)))

    @property
    def n_stages(self):
        return self.B.shape[0]

    @property
    def fsal(self):
        return bool(self.Ep[self.n_stages] != 0.0)

    @property
    def velocity_independent(self):
        return self.Ap is None

    def c_spacing(self):
        cdiff = 1.0
        for c1 in self.C:
            for c2 in self.C:
                d = abs(c1 - c2)
                if d:
                    cdiff = min(cdiff, d)
        return max(cdiff, 1e-3)


@dataclasses.dataclass(frozen=True)
class ESDIRKTableau:
    """Explicit-first-stage singly-diagonal implicit RK tableau.

    ``d`` is the diagonal entry, ``Az`` the stage-increment predictor
    weights, ``kappa`` the Newton tolerance factor; cf.
    /root/reference/extensisq/common.py:1616-1653.
    """
    name: str
    order: int
    order_secondary: int
    d: float
    kappa: float
    A: np.ndarray
    B: np.ndarray
    C: np.ndarray
    E: np.ndarray
    Az: np.ndarray
    P: Optional[np.ndarray] = None            # default interpolant
    interpolants: Any = None                  # {'C0': P0, 'C1': P1}
    filter_error: bool = False
    piecewise_cubic_dense: bool = False       # HS methods: 3-point cubic
    sc_params: str = "G"

    def __post_init__(self):
        for f in ("A", "B", "C", "E", "Az", "P"):
            object.__setattr__(self, f, _freeze(getattr(self, f)))

    @property
    def n_stages(self):
        return self.B.shape[0]

    def c_spacing(self):
        cdiff = 1.0
        for c1 in self.C:
            for c2 in self.C:
                d = abs(c1 - c2)
                if d:
                    cdiff = min(cdiff, d)
        return max(cdiff, 1e-3)


class IVPParams(NamedTuple):
    """Traced per-solve parameters shared by all steppers."""
    t_bound: Any
    direction: Any           # +1.0 / -1.0
    rtol: Any
    atol: Any                # scalar or (n,)
    max_step: Any


@dataclasses.dataclass(frozen=True)
class Method:
    """User-facing handle: ``solve_ivp(fun, span, y0, method=BS5)``.

    ``family`` selects the stepper implementation; ``tableau`` holds the
    data; ``options`` are method-specific defaults that can be overridden
    per solve (e.g. ``interpolant='best'`` for BS5).
    """
    name: str
    family: str              # 'erk' | 'ckdisc' | 'rkn' | 'esdirk' | 'adams' | 'rkc'
    tableau: Any = None
    options: Any = None

    def with_options(self, **opts):
        merged = dict(self.options or {})
        merged.update(opts)
        return dataclasses.replace(self, options=merged)

    def __call__(self, fun, t0, y0, t_bound, **options):
        """scipy ``OdeSolver``-protocol construction: returns a stepwise
        solver object (see extensisq_tpu.ivp.Stepper), mirroring
        direct-stepping usage in /root/reference/tests/test_ivp.py:838-868.
        """
        from .ivp import Stepper
        return Stepper(self, fun, t0, y0, t_bound, **options)

    def __repr__(self):
        return f"<extensisq_tpu method {self.name}>"
