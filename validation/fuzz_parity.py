"""Randomized work-count parity sweep against the reference.

For seeded random smooth ODEs, tolerances, horizons and directions,
run every first-order method through our host driver and the reference
implementation and demand IDENTICAL accepted-step counts and nfev.
Any divergence prints a reproducer line.

Explicit/RKN methods must match exactly (identical arithmetic order).
SWAG is checked to a small step budget (round-off tie-breaks are a
documented deviation).  ESDIRK uses autodiff Jacobians (reference
finite-differences), so counts legitimately differ; ESDIRK parity is
covered by the analytic-jac tests and hosea_tables instead.

Run: python validation/fuzz_parity.py [n_cases]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp   # noqa: E402

from extensisq_tpu import solve_ivp as our_solve_ivp   # noqa: E402
import extensisq_tpu as et                              # noqa: E402

sys.path.insert(0, "/root/reference")
from scipy.integrate import solve_ivp as scipy_solve_ivp  # noqa: E402
import extensisq as ref                                    # noqa: E402

EXPLICIT = ["BS5", "Ts5", "CK5", "Me4", "Pr7", "Pr8", "Pr9", "CFMR7osc",
            "CKdisc"]
MULTISTEP = ["SWAG", "SSV2stab"]


def make_problem(rng, n):
    """Random well-behaved RHS built from ELEMENTWISE ops only, so the
    numpy and jnp evaluations are bit-identical (matmuls sum in
    different orders and would seed round-off divergence that the step
    controllers amplify at accept/reject tie-breaks — a sensitivity,
    not a parity bug)."""
    a = -0.2 - rng.rand(n)            # stable diagonal
    c = rng.randn(n) * 0.4            # cyclic coupling strength
    w = rng.rand(n) * 3.0
    amp = rng.rand(n)

    def f_np(t, y):
        cpl = c * np.roll(y, 1)
        return a * y + cpl + amp * np.sin(w * t + y)

    def f_jx(t, y):
        cpl = jnp.asarray(c) * jnp.roll(y, 1)
        return jnp.asarray(a) * y + cpl \
            + jnp.asarray(amp) * jnp.sin(jnp.asarray(w) * t + y)

    return f_np, f_jx


def _ref_forks(f_np, span, y0, name, kw, counts=None, end_probe=None,
               sol_probe=None):
    """Does the reference fork under ulp-scale y0 perturbations?

    Checks several perturbation magnitudes because the fork sources we
    are certifying against (1-ulp differences in jnp vs numpy
    transcendentals) are not reproduced by any single perturbation.
    """
    import warnings
    for rel in (1e-15, -1e-15, 1e-13, -1e-13):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            try:
                r_p = scipy_solve_ivp(f_np, span, y0 * (1.0 + rel),
                                      method=getattr(ref, name), **kw)
            except Exception:
                return True
        if counts is not None and (r_p.t.size, r_p.nfev) != counts:
            return True
        if end_probe is not None:
            y_end, thresh = end_probe
            if r_p.status == 0 and                     np.max(np.abs(r_p.y[:, -1] - y_end)) > thresh:
                return True
        if sol_probe is not None:
            ts, r_ref, thresh = sol_probe
            if r_p.status == 0 and r_p.sol is not None and                     np.max(np.abs(r_p.sol(ts) - r_ref.sol(ts))) > thresh:
                return True
    return False


def one_case(seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(1, 6))
    f_np, f_jx = make_problem(rng, n)
    y0 = rng.randn(n)
    rtol = 10.0 ** rng.uniform(-9, -3)
    atol = rtol * 10.0 ** rng.uniform(-4, -1)
    tf = rng.uniform(0.5, 8.0)
    backward = rng.rand() < 0.3
    span = (tf, 0.0) if backward else (0.0, tf)
    # forced first steps are kept well above the regime where the
    # first-step error estimate sits at the round-off floor: there the
    # reference's UNCLAMPED standard-controller factor err**exponent
    # amplifies 1-ulp noise into O(1) h differences (a knife edge the
    # perturbation gate cannot reliably certify; both implementations
    # fork alike — see seed-32-class cases in the git history)
    first_step = None if rng.rand() < 0.7 else tf * 10.0 ** rng.uniform(-2, -1)

    dense = rng.rand() < 0.5
    # exercise all controller presets (common.py:166-185)
    scp = [None, "G", "S", "standard"][int(rng.randint(4))]
    fails = []
    for name in EXPLICIT + MULTISTEP:
        kw = dict(rtol=rtol, atol=atol, dense_output=dense)
        if first_step is not None:
            kw["first_step"] = first_step
        if scp is not None and name not in ("SWAG", "SSV2stab",
                                            "CKdisc"):
            kw["sc_params"] = scp
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            try:
                r_ref = scipy_solve_ivp(f_np, span, y0,
                                        method=getattr(ref, name), **kw)
            except Exception as e:
                fails.append((name, f"reference raised {type(e).__name__}"))
                continue
            try:
                r_our = our_solve_ivp(f_jx, span, jnp.asarray(y0),
                                      method=getattr(et, name), **kw)
            except Exception as e:
                fails.append((name, f"ours raised {type(e).__name__}: {e}"))
                continue
        if dense and r_ref.status == 0 and r_our.status == 0 \
                and r_our.t.size == r_ref.t.size:
            ts = np.sort(rng.uniform(min(span), max(span), 23))
            dv = np.max(np.abs(np.asarray(r_our.sol(ts))
                               - r_ref.sol(ts)))
            yscale = max(1.0, np.max(np.abs(r_ref.sol(ts))))
            if dv > 1e-9 * yscale:
                if not _ref_forks(f_np, span, y0, name, kw,
                                  sol_probe=(ts, r_ref, 0.1 * dv)):
                    fails.append((name, f"dense-output diff {dv:.2e}"))
                    continue
        if r_ref.status != r_our.status:
            fails.append((name, f"status {r_our.status} vs {r_ref.status}"))
            continue
        ds = abs((r_our.t.size - 1) - (r_ref.t.size - 1))
        dn = abs(r_our.nfev - r_ref.nfev)
        exact = name in EXPLICIT
        lim = 0 if exact else max(3, (r_ref.t.size - 1) // 20)
        if ds > lim or (exact and dn > 0):
            # controller tie-break sensitivity gate: if the reference
            # itself changes counts under ulp-scale y0 perturbations,
            # the case sits on an accept/reject knife edge (our fun
            # evaluations differ from numpy's at 1 ulp through
            # jnp.sin etc.) — not a parity bug
            if _ref_forks(f_np, span, y0, name, kw,
                          counts=(r_ref.t.size, r_ref.nfev)):
                continue
            fails.append((name, f"steps {r_our.t.size-1} vs "
                          f"{r_ref.t.size-1}, nfev {r_our.nfev} vs "
                          f"{r_ref.nfev}"))
            continue
        if r_ref.status == 0 and exact:
            d = np.max(np.abs(r_our.y[:, -1] - r_ref.y[:, -1]))
            scale = atol + rtol * np.max(np.abs(r_ref.y[:, -1]))
            if d > 1e-7 * max(1.0, np.max(np.abs(r_ref.y[:, -1]))) \
                    and d > 0.01 * scale:
                if _ref_forks(f_np, span, y0, name, kw,
                              end_probe=(r_ref.y[:, -1], 0.1 * d)):
                    continue
                fails.append((name, f"endpoint diff {d:.2e}"))
    return fails


RKN = ["Fi4N", "Fi5N", "Mu5Nmb"]
ESDIRK = ["TRBDF2", "TRX2", "KC3I", "KC4I", "KC4Ia", "Kv3I"]

# The reference's Mu5Nmb.__init__ does `self.E *= 0.75` on the CLASS
# attribute, so the embedded-error damping compounds across repeated
# instantiations in one process (0.75, 0.5625, ...).  Snapshot and
# restore so every comparison sees the intended single damping (our
# implementation damps exactly once per solver, per murua.py:223-226).
_MU_E = ref.Mu5Nmb.E.copy()
_MU_EP = ref.Mu5Nmb.Ep.copy()


def _fresh_mu5nmb():
    ref.Mu5Nmb.E = _MU_E.copy()
    ref.Mu5Nmb.Ep = _MU_EP.copy()


def one_case_rkn(seed):
    """Second-order problems y=[u, v], fun returns [v, a(t, u)]."""
    rng = np.random.RandomState(seed + 10_000)
    n = int(rng.randint(1, 4))
    k = 0.5 + rng.rand(n) * 2.0       # spring constants
    amp = rng.rand(n)
    w = rng.rand(n) * 2.0

    def f_np(t, y):
        u = y[:n]
        acc = -k * u + amp * np.sin(w * t)
        return np.concatenate([y[n:], acc])

    def f_jx(t, y):
        u = y[:n]
        acc = -jnp.asarray(k) * u + jnp.asarray(amp) \
            * jnp.sin(jnp.asarray(w) * t)
        return jnp.concatenate([y[n:], acc])

    y0 = rng.randn(2 * n)
    rtol = 10.0 ** rng.uniform(-9, -4)
    atol = rtol * 1e-2
    tf = rng.uniform(1.0, 10.0)
    fails = []
    import warnings
    for name in RKN:
        _fresh_mu5nmb()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r_ref = scipy_solve_ivp(f_np, (0.0, tf), y0,
                                    method=getattr(ref, name),
                                    rtol=rtol, atol=atol)
            r_our = our_solve_ivp(f_jx, (0.0, tf), jnp.asarray(y0),
                                  method=getattr(et, name),
                                  rtol=rtol, atol=atol)
        if (r_our.t.size != r_ref.t.size or r_our.nfev != r_ref.nfev
                or r_our.status != r_ref.status):
            fails.append((name, f"steps {r_our.t.size-1} vs "
                          f"{r_ref.t.size-1}, nfev {r_our.nfev} vs "
                          f"{r_ref.nfev}"))
    return fails


def one_case_esdirk(seed):
    """Mildly stiff problems with an ANALYTIC elementwise Jacobian
    supplied to both sides, so Newton work counts must match exactly."""
    rng = np.random.RandomState(seed + 20_000)
    n = int(rng.randint(1, 4))
    a = -(1.0 + 30.0 * rng.rand(n))   # stiff diagonal
    c = rng.randn(n) * 0.5
    amp = rng.rand(n)
    w = rng.rand(n) * 2.0
    roll = np.roll(np.eye(n), 1, axis=1)   # y[(i-1) % n] coupling

    def f_np(t, y):
        return a * y + c * np.roll(y, 1) + amp * np.sin(w * t + y)

    def f_jx(t, y):
        return jnp.asarray(a) * y + jnp.asarray(c) * jnp.roll(y, 1) \
            + jnp.asarray(amp) * jnp.sin(jnp.asarray(w) * t + y)

    def jac_np(t, y):
        return np.diag(a + amp * np.cos(w * t + y)) + c[:, None] * roll

    def jac_jx(t, y):
        return jnp.diag(jnp.asarray(a) + jnp.asarray(amp)
                        * jnp.cos(jnp.asarray(w) * t + y)) \
            + jnp.asarray(c)[:, None] * jnp.asarray(roll)

    y0 = rng.randn(n)
    rtol = 10.0 ** rng.uniform(-7, -3)
    atol = rtol * 1e-2
    tf = rng.uniform(1.0, 10.0)
    fails = []
    import warnings
    for name in ESDIRK:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r_ref = scipy_solve_ivp(f_np, (0.0, tf), y0,
                                    method=getattr(ref, name),
                                    jac=jac_np, rtol=rtol, atol=atol)
            r_our = our_solve_ivp(f_jx, (0.0, tf), jnp.asarray(y0),
                                  method=getattr(et, name),
                                  jac=jac_jx, rtol=rtol, atol=atol)
        if (r_our.t.size != r_ref.t.size or r_our.nfev != r_ref.nfev
                or r_our.njev != r_ref.njev or r_our.nlu != r_ref.nlu
                or r_our.status != r_ref.status):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                r_p = scipy_solve_ivp(f_np, (0.0, tf), y0 * (1 + 1e-13),
                                      method=getattr(ref, name),
                                      jac=jac_np, rtol=rtol, atol=atol)
            if (r_p.t.size != r_ref.t.size) or (r_p.nfev != r_ref.nfev):
                continue                  # knife-edge case
            fails.append((name, f"steps {r_our.t.size-1} vs "
                          f"{r_ref.t.size-1}, nfev {r_our.nfev} vs "
                          f"{r_ref.nfev}, njev {r_our.njev} vs "
                          f"{r_ref.njev}, nlu {r_our.nlu} vs "
                          f"{r_ref.nlu}"))
    return fails


def one_case_disc(seed):
    """Discontinuous RHSs (CKdisc's design case): coefficients switch
    at random times via where-masks (bit-identical on both sides).
    Exact count parity for CKdisc and the explicit methods."""
    rng = np.random.RandomState(seed + 30_000)
    n = int(rng.randint(1, 4))
    a1 = -0.2 - rng.rand(n)
    a2 = -0.2 - rng.rand(n)
    b1 = rng.randn(n)
    b2 = rng.randn(n)
    tf = rng.uniform(2.0, 8.0)
    tc = rng.uniform(0.3, 0.7) * tf

    def f_np(t, y):
        lo = t < tc
        a = np.where(lo, a1, a2)
        b = np.where(lo, b1, b2)
        return a * y + b

    def f_jx(t, y):
        lo = t < tc
        a = jnp.where(lo, jnp.asarray(a1), jnp.asarray(a2))
        b = jnp.where(lo, jnp.asarray(b1), jnp.asarray(b2))
        return a * y + b

    y0 = rng.randn(n)
    rtol = 10.0 ** rng.uniform(-7, -3)
    atol = rtol * 1e-2
    fails = []
    import warnings
    for name in ["CKdisc", "BS5", "Me4"]:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r_ref = scipy_solve_ivp(f_np, (0.0, tf), y0,
                                    method=getattr(ref, name),
                                    rtol=rtol, atol=atol)
            r_our = our_solve_ivp(f_jx, (0.0, tf), jnp.asarray(y0),
                                  method=getattr(et, name),
                                  rtol=rtol, atol=atol)
        if (r_our.t.size != r_ref.t.size or r_our.nfev != r_ref.nfev
                or r_our.status != r_ref.status):
            if _ref_forks(f_np, (0.0, tf), y0, name,
                          dict(rtol=rtol, atol=atol),
                          counts=(r_ref.t.size, r_ref.nfev)):
                continue
            fails.append((name, f"steps {r_our.t.size-1} vs "
                          f"{r_ref.t.size-1}, nfev {r_our.nfev} vs "
                          f"{r_ref.nfev}"))
    return fails


def one_case_device(seed):
    """Our flat device driver vs our host driver: must be bit-exact
    for every family on random smooth problems."""
    rng = np.random.RandomState(seed + 40_000)
    n = int(rng.randint(1, 5))
    f_np, f_jx = make_problem(rng, n)
    y0 = jnp.asarray(rng.randn(n))
    rtol = 10.0 ** rng.uniform(-8, -3)
    atol = rtol * 1e-2
    tf = rng.uniform(0.5, 6.0)
    from extensisq_tpu.solve import solve as dev_solve
    fails = []
    import warnings
    for name in EXPLICIT + MULTISTEP + ["Fi4N", "Kv3I", "TRBDF2"]:
        fun = f_jx
        if name in ("Fi4N",):
            # build a second-order problem instead
            def fun(t, y, n=n):
                return jnp.concatenate([y[n:], -y[:n]])
            y0d = jnp.concatenate([y0, jnp.zeros_like(y0)])
        else:
            y0d = y0
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            r_host = our_solve_ivp(fun, (0.0, tf), y0d,
                                   method=getattr(et, name),
                                   rtol=rtol, atol=atol)
            out = jax.jit(lambda y: dev_solve(
                fun, (0.0, tf), y, method=getattr(et, name),
                rtol=rtol, atol=atol))(y0d)
        ok_host = r_host.status == 0
        ok_dev = int(out.status) == 1
        # endpoints agree to a few ulp, not bitwise: the two programs
        # compile separately and XLA places FMAs differently
        scale = np.maximum(1.0, np.abs(r_host.y[:, -1]))
        ulp_ok = bool(np.all(np.abs(np.asarray(out.y) - r_host.y[:, -1])
                             <= 1e-12 * scale))
        if ok_host != ok_dev or (ok_host and (
                int(out.nsteps) != r_host.t.size - 1
                or int(out.nfev) != r_host.nfev
                or not ulp_ok)):
            fails.append((name, f"device {int(out.nsteps)}/{int(out.nfev)}"
                          f" vs host {r_host.t.size-1}/{r_host.nfev}"))
    return fails


if __name__ == "__main__":
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    family = sys.argv[2] if len(sys.argv) > 2 else "explicit"
    runner = {"explicit": one_case, "rkn": one_case_rkn,
              "esdirk": one_case_esdirk, "disc": one_case_disc,
              "device": one_case_device}[family]
    bad = 0
    for seed in range(n_cases):
        fails = runner(seed)
        jax.clear_caches()            # each seed compiles ~11 programs
        for name, msg in fails:
            bad += 1
            print(f"seed {seed:3d} {name:9s} MISMATCH: {msg}")
        if not fails:
            print(f"seed {seed:3d} all methods match")
    print(f"\n{n_cases} {family} cases, {bad} mismatches")
    sys.exit(1 if bad else 0)


