"""Per-family method studies backing docs/methods/*.md.

Counterpart of the reference's derivation/analysis notebooks
(Bogacki_Shampine.ipynb, Cash_Karp.ipynb, Prince.ipynb,
Shampine_Gordon_Watts.ipynb): each study integrates the family's
signature problem over a tolerance ladder against natural competitor
methods and tabulates (nfev, achieved error) plus the family-specific
diagnostics the notebooks discuss (interpolant error for BS5, rejected
steps for CKdisc, order slopes for Prince, order distribution for SWAG).

Run: python validation/method_studies.py [study ...]
where study in {bs5, ckdisc, prince, swag, rkc, esdirk, nystrom};
default all.
The tables printed here are pasted into docs/methods/*.md.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np                                    # noqa: E402
import jax.numpy as jnp                               # noqa: E402

from extensisq_tpu import (solve_ivp, BS5, Ts5, CK5, CKdisc, Pr7, Pr8,  # noqa
                           Pr9, CFMR7osc, SWAG, Kv3I)
from extensisq_tpu.problems import vdp, pleiades      # noqa: E402


def _ladder(rhs, t_span, y0, methods, tols, exact, **kw):
    rows = []
    for m in methods:
        cells = []
        for rtol in tols:
            r = solve_ivp(rhs, t_span, y0, method=m, rtol=rtol,
                          atol=rtol * 1e-3, **kw.get(getattr(m, "name",
                                                             str(m)), {}))
            if not r.success:
                cells.append((r.nfev, np.nan))
                continue
            err = float(np.max(np.abs(np.asarray(r.y)[:, -1] - exact)))
            cells.append((r.nfev, err))
        rows.append((m.name, cells))
    return rows


def _print(rows, tols, label):
    print(f"\n== {label} ==")
    hdr = f"{'method':<10}" + "".join(f"  rtol={t:7.0e}: nfev     err"
                                      for t in tols)
    print(hdr)
    for name, cells in rows:
        line = f"{name:<10}"
        for nfev, err in cells:
            e = "   FAIL " if np.isnan(err) else f"{err:8.1e}"
            line += f"  {nfev:>12}  {e}"
        print(line)


# ---------------------------------------------------------------- BS5
def study_bs5():
    """Duffing oscillator: x'' + delta x' + alpha x + beta x^3 =
    gamma cos(omega t) — the notebook's signature problem; smooth,
    oscillatory, moderate stiffness-free nonlinearity."""
    delta, alpha, beta, gamma, omega = 0.08, 1.0, 5.0, 8.0, 0.5

    def rhs(t, y):
        return jnp.stack([
            y[1],
            gamma * jnp.cos(omega * t) - delta * y[1] - alpha * y[0]
            - beta * y[0] ** 3])

    y0 = jnp.asarray([1.0, 0.0])
    t_span = (0.0, 40.0)
    ref = solve_ivp(rhs, t_span, y0, method=Pr9, rtol=1e-13, atol=1e-16)
    exact = np.asarray(ref.y)[:, -1]

    tols = [1e-3, 1e-6, 1e-9]
    rows = _ladder(rhs, t_span, y0, [BS5, Ts5, CK5, CFMR7osc],
                   tols, exact)
    _print(rows, tols, "BS5 study: Duffing, err at t=40 vs Pr9@1e-13")

    # interpolant comparison: max dense-output error on a fine grid
    print("\nBS5 interpolant variants (rtol=1e-6, max |dense - ref| "
          "on 2000-point grid):")
    tq = np.linspace(*t_span, 2000)
    ref_q = solve_ivp(rhs, t_span, y0, method=Pr9, rtol=1e-13,
                      atol=1e-16, t_eval=tq)
    for variant in ("best", "low", "free"):
        r = solve_ivp(rhs, t_span, y0, method=BS5, rtol=1e-6, atol=1e-9,
                      t_eval=tq, interpolant=variant)
        err = float(np.max(np.abs(np.asarray(r.y) - np.asarray(ref_q.y))))
        extra = r.nfev
        print(f"  {variant:<5} nfev={extra:>6}  max err={err:8.1e}")


# ------------------------------------------------------------- CKdisc
def study_ckdisc():
    """Step-forced linear system: the quit/twiddle cascade localizes
    the derivative discontinuities instead of hammering them with
    rejected high-order steps."""
    def rhs(t, y):
        s = jnp.where(jnp.sin(3.0 * t) >= 0.0, 1.0, -1.0)
        return jnp.stack([-s * y[0] - 0.5 * y[0]])

    y0 = jnp.asarray([1.0])
    t_span = (0.0, 5.0)
    import scipy.integrate as si
    exact_exp, _ = si.quad(lambda t: -np.sign(np.sin(3 * t)) - 0.5,
                           0, 5, limit=200)
    exact = np.asarray([np.exp(exact_exp)])

    tols = [1e-3, 1e-6, 1e-9]
    rows = _ladder(rhs, t_span, y0, [CKdisc, CK5, BS5], tols, exact)
    _print(rows, tols,
           "CKdisc study: sign-switching decay, err at t=5 vs quad")

    print("\nrejected steps at rtol=1e-6 (discontinuity handling):")
    for m in (CKdisc, CK5, BS5):
        r = solve_ivp(rhs, t_span, y0, method=m, rtol=1e-6, atol=1e-9)
        print(f"  {m.name:<7} steps={r.t.size - 1:>5}  nfev={r.nfev:>6}  "
              f"rejected={int(r.nfailed):>4}")


# ------------------------------------------------------------- Prince
def study_prince():
    """Pleiades at tight tolerances: where 8th/9th order wins."""
    P = pleiades()
    ref = solve_ivp(P.rhs, P.t_span, P.y0, method=Pr9, rtol=3e-14,
                    atol=1e-16)
    exact = np.asarray(ref.y)[:, -1]

    tols = [1e-6, 1e-9, 1e-12]
    rows = _ladder(P.rhs, P.t_span, P.y0, [BS5, Pr7, Pr8, Pr9], tols,
                   exact)
    _print(rows, tols, "Prince study: Pleiades, err at t=3 vs Pr9@3e-14")

    # empirical convergence order: fixed-step-ish via tight ladder
    print("\nempirical order between rtol=1e-9 and 1e-12 "
          "(d log err / d log nfev; steeper = higher effective order):")
    for name, cells in rows:
        (n1, e1), (n2, e2) = cells[1], cells[2]
        if np.isnan(e1) or np.isnan(e2) or e2 == 0 or e1 == 0:
            continue
        slope = (np.log(e2) - np.log(e1)) / (np.log(n2) - np.log(n1))
        print(f"  {name:<5} slope={slope:6.1f}")


# --------------------------------------------------------------- SWAG
def study_swag():
    """Van der Pol mu=5 (the notebook's problem, nonstiff regime):
    the variable-order Adams pair against one-step methods; Adams wins
    when f is expensive because it reuses history."""
    P = vdp(mu=5.0)
    t_span = (0.0, 30.0)
    ref = solve_ivp(P.rhs, t_span, P.y0, method=Pr9, rtol=1e-13,
                    atol=1e-16)
    exact = np.asarray(ref.y)[:, -1]

    tols = [1e-3, 1e-6, 1e-9]
    rows = _ladder(P.rhs, t_span, P.y0, [SWAG, BS5, Pr7, Kv3I], tols,
                   exact)
    _print(rows, tols, "SWAG study: VdP mu=5, err at t=30 vs Pr9@1e-13")

    r = solve_ivp(P.rhs, t_span, P.y0, method=SWAG, rtol=1e-6,
                  atol=1e-9)
    print(f"\nSWAG at rtol=1e-6: steps={r.t.size - 1}, nfev={r.nfev} "
          f"(~{r.nfev / (r.t.size - 1):.2f} evals/step — one-step "
          f"methods above pay 6-12)")


# ---------------------------------------------------------------- RKC
def study_rkc():
    """1-D reaction-diffusion ladder over the diffusion coefficient:
    SSV2stab's stage count m grows like sqrt(h rho) so its STEP count
    stays flat as the problem stiffens, while an explicit RK pair's
    step count grows linearly with rho (stability-bound, not
    accuracy-bound).  The Demo_SSV2stab.ipynb argument, measured."""
    from extensisq_tpu import SSV2stab

    n = 64
    dx = 1.0 / n
    xg = np.linspace(0, 1, n, endpoint=False)
    y0 = jnp.asarray(0.5 + 0.4 * np.sin(2 * np.pi * xg))

    print("\n== RKC study: u_t = d u_xx + u^2(1-u), t in [0, 0.5], "
          "n=64, rtol=1e-4 ==")
    print(f"{'d':>8}  {'rho':>9}  {'RKC steps':>9}  {'RKC nfev':>8}  "
          f"{'max m':>6}  {'BS5 steps':>9}  {'BS5 nfev':>8}")
    for dcoef in (0.01, 0.1, 1.0, 10.0):
        def rhs(t, y, d=dcoef):
            lap = (jnp.roll(y, 1) + jnp.roll(y, -1) - 2.0 * y) / dx ** 2
            return d * lap + y * y * (1.0 - y)

        rho = 4.0 * dcoef / dx ** 2 + 1.0
        r = solve_ivp(rhs, (0.0, 0.5), y0, method=SSV2stab, rtol=1e-4,
                      atol=1e-7, rho_jac=lambda t, y, rho=rho: rho)
        rb = solve_ivp(rhs, (0.0, 0.5), y0, method=BS5, rtol=1e-4,
                       atol=1e-7)
        print(f"{dcoef:8.2f}  {rho:9.0f}  {r.t.size - 1:>9}  "
              f"{r.nfev:>8}  {int(r.maxm):>6}  {rb.t.size - 1:>9}  "
              f"{rb.nfev:>8}")

    # power iteration vs analytic bound: same steps, nfesig extra
    def rhs1(t, y):
        lap = (jnp.roll(y, 1) + jnp.roll(y, -1) - 2.0 * y) / dx ** 2
        return 1.0 * lap + y * y * (1.0 - y)

    rho1 = 4.0 / dx ** 2 + 1.0
    ra = solve_ivp(rhs1, (0.0, 0.5), y0, method=SSV2stab, rtol=1e-4,
                   atol=1e-7, rho_jac=lambda t, y: rho1)
    rp = solve_ivp(rhs1, (0.0, 0.5), y0, method=SSV2stab, rtol=1e-4,
                   atol=1e-7)
    print(f"\nspectral radius: analytic bound steps={ra.t.size - 1} "
          f"nfev={ra.nfev}; power iteration steps={rp.t.size - 1} "
          f"nfev={rp.nfev} + nfesig={int(rp.nfesig)}")


# ------------------------------------------------------------- ESDIRK
def study_esdirk():
    """Robertson over a tolerance ladder: the implicit family's
    work profile (nfev/njev/nlu) and the L- vs A-stable distinction
    the TR-BDF2 paper discusses (TRX2's trapezium substeps are only
    A-stable: on very stiff transients its error estimate forces
    smaller steps than L-stable TRBDF2)."""
    from extensisq_tpu import TRBDF2, TRX2, KC3I, KC4I, KC4Ia

    def rob(t, y):
        r1 = -0.04 * y[0] + 1e4 * y[1] * y[2]
        r3 = 3e7 * y[1] * y[1]
        return jnp.stack([r1, -r1 - r3, r3])

    y0 = jnp.asarray([1.0, 0.0, 0.0])
    t_span = (0.0, 1e4)
    ref = solve_ivp(rob, t_span, y0, method=KC4Ia, rtol=1e-11,
                    atol=1e-14)
    exact = np.asarray(ref.y)[:, -1]

    print("\n== ESDIRK study: Robertson to t=1e4, err vs KC4Ia@1e-11 ==")
    print(f"{'method':<7} {'rtol':>7}  {'steps':>6} {'nfev':>6} "
          f"{'njev':>5} {'nlu':>5}  {'err':>8}")
    for m in (TRBDF2, TRX2, KC3I, KC4I, KC4Ia, Kv3I):
        for rtol in (1e-4, 1e-7):
            r = solve_ivp(rob, t_span, y0, method=m, rtol=rtol,
                          atol=rtol * 1e-3)
            err = float(np.max(np.abs(np.asarray(r.y)[:, -1] - exact)
                               / np.maximum(np.abs(exact), 1e-30)))
            print(f"{m.name:<7} {rtol:>7.0e}  {r.t.size - 1:>6} "
                  f"{r.nfev:>6} {int(r.njev):>5} {int(r.nlu):>5}  "
                  f"{err:8.1e}")

    # L- vs A-stability: stiff relaxation y' = -1e6 (y - cos t)
    def relax(t, y):
        return -1e6 * (y - jnp.cos(t))

    print("\nstiff relaxation y' = -1e6 (y - cos t), y0=2, t=[0,2], "
          "rtol=1e-6:")
    for m in (TRBDF2, TRX2, KC3I):
        r = solve_ivp(relax, (0.0, 2.0), jnp.asarray([2.0]), method=m,
                      rtol=1e-6, atol=1e-9)
        err = abs(float(r.y[0, -1]) - np.cos(2.0))
        print(f"  {m.name:<7} steps={r.t.size - 1:>5}  nfev={r.nfev:>6} "
              f" err={err:8.1e}")


# ------------------------------------------------------------ Nystrom
def study_nystrom():
    """Kepler orbit (e=0.5): direct 2nd-order integration vs the same
    problem through a first-order pair.  Nystrom pairs integrate
    y''=a(y) directly — fewer evals per step at the same order — and
    MR6NN additionally drops the velocity arguments entirely."""
    from extensisq_tpu import Fi4N, Fi5N, Mu5Nmb, MR6NN

    e = 0.5

    def rhs1(t, y):
        """Reference RKN convention: y = [u, v], returns [v, a(u)]."""
        r2 = y[0] ** 2 + y[1] ** 2
        a = -r2 ** -1.5
        return jnp.concatenate([y[2:], jnp.stack([a * y[0],
                                                  a * y[1]])])

    u0 = jnp.asarray([1.0 - e, 0.0])
    v0 = jnp.asarray([0.0, np.sqrt((1 + e) / (1 - e))])
    y0 = jnp.concatenate([u0, v0])
    t_span = (0.0, 20.0)

    ref = solve_ivp(rhs1, t_span, y0, method=Pr9, rtol=1e-13,
                    atol=1e-16)
    exact = np.asarray(ref.y)[:, -1]

    print("\n== Nystrom study: Kepler e=0.5 to t=20, err vs "
          "Pr9@1e-13 ==")
    print(f"{'method':<7} {'rtol':>7}  {'steps':>6} {'nfev':>7}  "
          f"{'err':>8}")
    for m in (Fi4N, Fi5N, Mu5Nmb, MR6NN):
        for rtol in (1e-6, 1e-9):
            r = solve_ivp(rhs1, t_span, y0, method=m, rtol=rtol,
                          atol=rtol * 1e-3)
            err = float(np.max(np.abs(np.asarray(r.y)[:, -1] - exact)))
            print(f"{m.name:<7} {rtol:>7.0e}  {r.t.size - 1:>6} "
                  f"{r.nfev:>7}  {err:8.1e}")
    for m, name in ((BS5, "BS5"), (Pr7, "Pr7")):
        for rtol in (1e-6, 1e-9):
            r = solve_ivp(rhs1, t_span, y0, method=m, rtol=rtol,
                          atol=rtol * 1e-3)
            err = float(np.max(np.abs(np.asarray(r.y)[:, -1] - exact)))
            print(f"{name + '*':<7} {rtol:>7.0e}  {r.t.size - 1:>6} "
                  f"{r.nfev:>7}  {err:8.1e}")
    print("(* first-order form: each eval costs the full [v, a] stack)")


STUDIES = {"bs5": study_bs5, "ckdisc": study_ckdisc,
           "prince": study_prince, "swag": study_swag,
           "rkc": study_rkc, "esdirk": study_esdirk,
           "nystrom": study_nystrom}

if __name__ == "__main__":
    pick = [a for a in sys.argv[1:] if a in STUDIES] or list(STUDIES)
    for s in pick:
        STUDIES[s]()
