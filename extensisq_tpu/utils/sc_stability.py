"""Step-control (SC) stability analysis for explicit RK pairs.

The reference ships per-(method x controller) SC-stability figures
(/root/reference/docs/"SC stability"/stab_dS_*.png) without the code
that made them; this module is that analysis, generalized to the
4-coefficient controller law the solvers actually run
(core/controller.py, /root/reference/extensisq/bogacki.py:67-77).

Background (Higham & Hall 1990, "Embedded Runge-Kutta formulae with
stable equilibrium states"; Gustafsson 1991): integrating y' = lam*y
near the stability boundary, the step-size controller and the method
form a coupled discrete map.  At a boundary point z* (|R(z*)| = 1)
the map has an equilibrium (constant |y|, constant h with the error
estimate pinned at tolerance); the CONTROLLER is SC-stable at z* iff
the linearization of the coupled map has spectral radius < 1 —
otherwise the step size oscillates/limit-cycles there in practice
(the classic "step thrashing" on mildly stiff problems).

For the law  h_new = h * g_sc * err^mb1 * err_old^mb2 * (h/h_old)^ma
(mb1 = kb1*ee, mb2 = kb2*ee, ma = -a, ee = -1/(err_order+1)),
absolute error control (err_n = |E(z_n)| |y_n| / tol), and the
log-variables u = log|y|, eta = log h, the linearized map is

    u+    = u + B_ * eta
    eta+  = eta + mb1*(u + A_*eta) + mb2*(u_o + A_*eta_o)
                + ma*(eta - eta_o)

with A_ = Re(z E'(z)/E(z)), B_ = Re(z R'(z)/R(z)) evaluated at z*,
state (u, eta, u_o, eta_o).  The "standard" preset (kb2 = a = 0)
collapses to Higham & Hall's classic 2x2 matrix
[[1, B_], [ee, 1 + ee*A_]].

R and E come from the tableau exactly as the stepper computes them
(steppers/erk.py:158-167): stages Y = (I - zA)^(-1) 1, R = 1 + z b.Y,
err/y = z*(E[:s].Y + E[s]*R) when the error row includes the FSAL
stage.  Host-side numpy — this is an analysis/design tool, not device
code.
"""
import numpy as np

__all__ = ["linear_test_functions", "boundary_points",
           "sc_stability_matrix", "sc_stable", "CONTROLLER_PRESETS"]

# (kb1, kb2, a, g) — core/controller.py's explicit presets
CONTROLLER_PRESETS = {
    "standard": (1.0, 0.0, 0.0, 0.9),
    "S": (0.6, -0.2, 0.0, 0.9),          # Soederlind
    "G": (0.7, -0.4, 0.0, 0.9),          # Gustafsson
}


def _tableau(method):
    tab = getattr(method, "tableau", method)
    A = np.asarray(tab.A, float)
    B = np.asarray(tab.B, float)
    E = np.asarray(tab.E, float)
    s = A.shape[0]
    return A, B, E, s, tab


def linear_test_functions(method):
    """(R, E, R', E') of complex z for ``y' = lam y``, as callables.

    R is the stability function; E the error-estimate transfer
    function err(z)/y_n including the stepper's leading h
    (err = h * sum_j E_j k_j, so E(z) = z * [E[:s].Y + E_extra*R]).
    Derivatives are analytic (Y' = (I - zA)^(-1) A Y).
    """
    A, B, Ew, s, _ = _tableau(method)
    I = np.eye(s)
    one = np.ones(s)
    Es, Elast = Ew[:s], (Ew[s] if Ew.shape[0] > s else 0.0)

    def _parts(z):
        z = complex(z)
        M = I - z * A
        Y = np.linalg.solve(M, one)
        Yp = np.linalg.solve(M, A @ Y)
        R = 1.0 + z * (B @ Y)
        Rp = (B @ Y) + z * (B @ Yp)
        Ebase = Es @ Y + Elast * R
        E = z * Ebase
        Ep = Ebase + z * (Es @ Yp + Elast * Rp)
        return R, E, Rp, Ep

    def Rf(z):
        return np.array([_parts(zi)[0] for zi in np.atleast_1d(z)])

    def Ef(z):
        return np.array([_parts(zi)[1] for zi in np.atleast_1d(z)])

    def Rpf(z):
        return np.array([_parts(zi)[2] for zi in np.atleast_1d(z)])

    def Epf(z):
        return np.array([_parts(zi)[3] for zi in np.atleast_1d(z)])

    return Rf, Ef, Rpf, Epf


def boundary_points(method, n_points=151, dtheta=2 * np.pi / 4000,
                    max_theta=8 * np.pi):
    """Trace the upper-half stability boundary |R(z)| = 1.

    Continuation in theta of R(z) = exp(i*theta) starting from z = 0
    (where R(z) ~ e^z, so z(theta) ~ i*theta), Newton-corrected at
    every step, until the branch returns to the real axis.  Returns
    ``n_points`` arclength-resampled complex points.
    """
    A, B, Ew, s, _ = _tableau(method)
    I = np.eye(s)
    one = np.ones(s)

    def RRp(z):
        M = I - z * A
        Y = np.linalg.solve(M, one)
        Yp = np.linalg.solve(M, A @ Y)
        return 1.0 + z * (B @ Y), (B @ Y) + z * (B @ Yp)

    pts = [0.0 + 0.0j]
    z = 1j * dtheta
    theta = dtheta
    while theta < max_theta:
        target = np.exp(1j * theta)
        for _ in range(30):                     # Newton correction
            R, Rp = RRp(z)
            dz = (target - R) / Rp
            z = z + dz
            if abs(dz) < 1e-13 * max(1.0, abs(z)):
                break
        pts.append(z)
        if z.imag < 0.0 and len(pts) > 10:      # crossed back down
            break
        # predictor: dz/dtheta = i e^{i theta} / R'(z)
        _, Rp = RRp(z)
        z = z + 1j * np.exp(1j * theta) / Rp * dtheta
        theta += dtheta

    pts = np.asarray(pts)
    pts = pts[pts.imag >= -1e-12]
    # arclength resample to n_points
    d = np.abs(np.diff(pts))
    arc = np.concatenate([[0.0], np.cumsum(d)])
    si = np.linspace(0.0, arc[-1], n_points)
    re = np.interp(si, arc, pts.real)
    im = np.interp(si, arc, pts.imag)
    return re + 1j * im


def sc_stability_matrix(method, z, sc_params="standard"):
    """The 4x4 linearized (u, eta, u_old, eta_old) map at boundary z."""
    if isinstance(sc_params, str):
        kb1, kb2, a, _g = CONTROLLER_PRESETS[sc_params]
    else:
        kb1, kb2, a, _g = sc_params
    A_t, B_t, Ew, s, tab = _tableau(method)
    ee = -1.0 / (min(tab.order_secondary, tab.order) + 1)
    mb1, mb2, ma = kb1 * ee, kb2 * ee, -a

    Rf, Ef, Rpf, Epf = linear_test_functions(method)
    z = complex(z)
    if abs(z) < 1e-8:
        # E ~ c z^(q+1) at the origin: z E'/E -> q+1 analytically, but
        # the quotient is 0/0 in floats — evaluate just inside
        z = z + 1e-6 * (1e-6 + 1j)
    R, E, Rp, Ep = Rf(z)[0], Ef(z)[0], Rpf(z)[0], Epf(z)[0]
    A_ = (z * Ep / E).real                     # d log|err| / d log h
    B_ = (z * Rp / R).real                     # d log|y+|  / d log h

    return np.array([
        [1.0, B_, 0.0, 0.0],
        [mb1, 1.0 + mb1 * A_ + ma, mb2, mb2 * A_ - ma],
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
    ])


def sc_stable(method, z, sc_params="standard", tol=1e-9):
    """Boolean SC-stability of (method, controller) at boundary z.

    Accepts a scalar or an array of boundary points; spectral radius
    strictly below 1 (with a round-off guard) counts as stable.
    """
    zs = np.atleast_1d(np.asarray(z, complex))
    out = np.empty(zs.shape, bool)
    for i, zi in enumerate(zs.ravel()):
        M = sc_stability_matrix(method, zi, sc_params)
        out.ravel()[i] = np.max(np.abs(np.linalg.eigvals(M))) < 1.0 - tol
    return out if np.ndim(z) else bool(out[0])
