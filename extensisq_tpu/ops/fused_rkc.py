"""Fused Pallas RKC solver: a whole stabilized PDE integration in ONE
TPU kernel.

SSV2stab's workload is a single large semi-discretized grid taking
20-100 Chebyshev stages per step.  On the XLA path every stage RHS
costs ~20 dispatched kernels (jnp.roll does not fuse), so the solve is
dispatch-bound.  Here the grid lives in VMEM for the entire
integration; stencil shifts are ``pltpu.roll`` (in-register lane/sublane
rotations), and the stage recurrence, spectral-radius estimation, error
estimate, H220 controller, events and time loop all run inside one
``pallas_call``.

Scope (the fast path; the f64 XLA path remains the conformance
solver):
* one system per program instance (the state IS the grid, any
  2-D-tileable shape); :func:`solve_fused_rkc_ensemble` runs many
  members over the Pallas grid dimension;
* f32 arithmetic with a double-single carry for y and t (the same
  compensation machinery as fused_erk);
* the spectral radius comes from a float constant, a traceable
  ``rho(t, y) -> scalar`` callback, or — when ``rho is None`` — the
  IN-KERNEL nonlinear power iteration (sommeijer.py:331-398, netlib
  rkc.f RKCRHO) with the eigenvector warm start, the 25-step refresh
  policy and the ``nfesig`` counter of the XLA stepper
  (steppers/rkc.py);
* Chebyshev stage loop is an in-kernel ``lax.fori_loop`` with the
  runtime stage count m of rkc.py:_stages (sommeijer.py:273-329);
* ``t_eval`` snapshots and solve_ivp-protocol ``events`` (terminal /
  direction, cubic-Hermite bisection roots) are handled inside the
  kernel on both layouts.

The RHS must be written with :func:`roll` from this module for its
stencil shifts — it maps to ``pltpu.roll`` inside the kernel and to
``jnp.roll`` outside, so the same function runs on every path.
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_erk import _two_sum, _df_add, _make_ev_spec
from . import ds as D

_RUNNING, _FINISHED, _TOO_SMALL, _OVERFLOW = 0, 1, 2, 3
_RHO_FAIL = 6   # matches _config.RHO_FAIL
_EVENT = 8      # matches _config.TERMINAL_EVENT

_IN_KERNEL = [False]


def roll(x, shift, axis):
    """Periodic shift usable both inside the fused kernel and in plain
    jnp code (write the RHS once, run it anywhere)."""
    if _IN_KERNEL[0]:
        return pltpu.roll(x, shift % x.shape[axis], axis)
    return jnp.roll(x, shift, axis)


def _sblend(cond, a, b):
    """Grid select by a SCALAR bool via arithmetic blending (Mosaic
    rejects several vector-select layouts; scalar-mask arithmetic is
    always legal)."""
    m = cond.astype(jnp.float32)
    return m * a + (1.0 - m) * b


class _S(NamedTuple):
    """In-kernel integration state (one member / one grid)."""
    it: Any
    t: Any
    t_lo: Any
    y: Any
    y_lo: Any
    f: Any
    h_abs: Any
    h_prev: Any
    err_old: Any
    status: Any
    nstep: Any
    nfev: Any
    iq: Any                # next unwritten t_eval snapshot index
    # spectral-radius machinery (power-iteration mode only; V is an
    # empty tuple when a user rho bound/callback is supplied)
    sprad: Any
    V: Any                 # eigenvector warm start (grid) or ()
    newspc: Any            # i32 bool: re-estimate the spectral radius
    jacatt: Any            # i32 bool: current estimate is up to date
    nstsig: Any            # accepted steps since last refresh (mod 25)
    nfesig: Any            # RHS evals spent on rho (reference counter)
    # events: per-event previous g value / fired flag (or empty tuples)
    gprev: Any
    evfired: Any


def _hermite(theta, h, y0, f0, y1, f1):
    """Cubic Hermite evaluation at theta in [0, 1] over a step of
    signed size h — the same C1 dense output the reference uses for
    RKC (sommeijer.py:400-406 / common.py:766-790 semantics)."""
    t2 = theta * theta
    t3 = t2 * theta
    return (y0 * (2.0 * t3 - 3.0 * t2 + 1.0)
            + (h * (t3 - 2.0 * t2 + theta)) * f0
            + y1 * (3.0 * t2 - 2.0 * t3)
            + (h * (t3 - t2)) * f1)


def _rho_power(fun, t, yn, fn, V, sprad_prev, active, linidx, ntot,
               small, sqrtu, rho_uround):
    """Nonlinear power iteration for the Jacobian spectral radius —
    the in-kernel twin of steppers/rkc.py:_rho (sommeijer.py:331-398,
    netlib rkc.f RKCRHO).  Mosaic-safe: every grid select is an
    arithmetic blend by a scalar mask, and the degenerate
    one-component sign flip uses a precomputed linear-index grid
    instead of a scatter.  Runs ZERO iterations when ``active`` is
    false (the while condition short-circuits), so inactive steps pay
    only the v0 setup arithmetic.

    Returns (sprad, V_new, n_evals, ok): on convergence failure after
    50 iterations ``ok`` is false and sprad is 0 (exactly the XLA
    stepper's failure value)."""
    ynrm = jnp.sqrt(jnp.sum(yn * yn))
    vnrm = jnp.sqrt(jnp.sum(V * V))
    both = (ynrm != 0.0) & (vnrm != 0.0)
    only_y = (ynrm != 0.0) & (vnrm == 0.0)
    only_v = (ynrm == 0.0) & (vnrm != 0.0)
    neither = (ynrm == 0.0) & (vnrm == 0.0)
    dynrm = jnp.where(both | only_y, ynrm * sqrtu,
                      jnp.float32(rho_uround))
    vsafe = jnp.where(vnrm == 0.0, jnp.float32(1.0), vnrm)
    mb = both.astype(jnp.float32)
    moy = only_y.astype(jnp.float32)
    mov = only_v.astype(jnp.float32)
    mn = neither.astype(jnp.float32)
    # the only_y branch scales V (not yn) by 1+sqrtu — this matches
    # the REFERENCE's translation (sommeijer.py:358 `v[:] *= ...`
    # after v[:] = V), which the XLA stepper also reproduces
    v0 = (mb * (yn + V * (dynrm / vsafe))
          + moy * (V * (1.0 + sqrtu))
          + mov * (V * (dynrm / vsafe))
          + mn * (V * 0.0 + dynrm))

    def cond(c):
        i, v, sigma, sprad, done, nev = c
        return (done == 0) & (i < 50)

    def body(c):
        i, v, sigma, sprad, done, nev = c
        fv = fun(t, v)
        df = fv - fn
        dfnrm = jnp.sqrt(jnp.sum(df * df))
        sigma_new = dfnrm / dynrm
        conv = (i > 0) & (jnp.abs(sigma_new - sigma)
                          <= jnp.maximum(sigma_new, small) * 0.01)
        dfsafe = jnp.where(dfnrm == 0.0, jnp.float32(1.0), dfnrm)
        v_pow = yn + df * (dynrm / dfsafe)
        # degenerate case: flip the sign of component (i mod n)
        flip = (linidx == jnp.mod(i, jnp.int32(ntot))
                ).astype(jnp.float32)
        v_deg = (1.0 - 2.0 * flip) * v
        v_next = _sblend(dfnrm != 0.0, v_pow, v_deg)
        return (i + 1, _sblend(conv, v, v_next), sigma_new,
                jnp.where(conv, 1.2 * sigma_new, sprad),
                jnp.where(conv, jnp.int32(1), done), nev + 1)

    done0 = jnp.where(active, jnp.int32(0), jnp.int32(1))
    sprad0 = jnp.where(active, jnp.float32(0.0), sprad_prev)
    c = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), v0, jnp.float32(0.0), sprad0, done0,
         jnp.int32(0)))
    _, v, _, sprad, done, nev = c
    ok = done != 0
    V_new = _sblend(ok & active, v - yn, V)
    return sprad, V_new, nev, ok


def _linear_index_grid(shape):
    """Row-major linear index of every grid element, as an i32 array
    of the grid shape (>= 2-D, so broadcasted_iota is Mosaic-legal)."""
    linidx = None
    stride = 1
    for ax in reversed(range(len(shape))):
        io = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
        term = io * jnp.int32(stride)
        linidx = term if linidx is None else linidx + term
        stride *= shape[ax]
    return linidx, int(np.prod(shape))


def _integrate(fun, sprad_at, sc, y_init, *, mmax, max_steps, uround,
               sqrtmin, snap=None, events=None, const_jac=False,
               max_step=None):
    """Whole adaptive RKC integration of one grid, shared by the
    single-grid and member-ensemble kernels.  ``fun(t, y) -> dy`` on
    the grid-shaped y; ``sprad_at(t, y) -> scalar`` or None to run the
    in-kernel nonlinear power iteration; ``sc`` the 6 solver scalars.
    Runs the Chebyshev stage recurrence in double-single arithmetic
    (see solve_fused_rkc docstring) and returns the final ``_S`` state.

    ``snap``: optional (nq, read_tq, write_snap) — after each accepted
    step, every snapshot time crossed by the step is written via
    ``write_snap(i, value)``, cubic-Hermite interpolated from the
    carried (y, f) endpoint pairs.  ``read_tq(i)`` returns snapshot
    time i.  Points at/before t0 get y0; unreached points are flushed
    with the final state.

    ``events``: optional (ev_spec, write_event) — ev_spec is the
    static list of (g, terminal, direction) triples from
    fused_erk._make_ev_spec; after each accepted step, sign changes of
    g fire the event (first crossing only), the root is refined by 25
    bisection rounds on the step's cubic Hermite interpolant, and
    recorded via ``write_event(i, keep, t_root, y_root)``.  Terminal
    events truncate the integration at the earliest terminal root with
    status 8 (the device driver's TERMINAL_EVENT semantics,
    solve.py:_make_event_handler)."""
    t0s, tfs, rtol_s, atol_s, dir_s, h0s = sc
    f_init = fun(t0s, y_init)
    # steppers/rkc.py:141-143 == sommeijer.py hmax semantics
    max_step_eff = jnp.abs(tfs - t0s)
    if max_step is not None:
        max_step_eff = jnp.minimum(max_step_eff, float(max_step))

    power_rho = sprad_at is None
    if power_rho:
        linidx, ntot = _linear_index_grid(y_init.shape)
        eps32 = float(np.finfo(np.float32).eps)
        sqrtu = float(np.sqrt(eps32))
        rho_uround = eps32
        small = 1.0 / max_step_eff

    if events is not None:
        ev_spec, write_event = events
        n_ev = len(ev_spec)
    else:
        n_ev = 0

    # rkc.f initial step heuristic (sommeijer.py:206-216)
    def init_absh(t, y, f, sprad):
        absh0 = jnp.where(sprad * max_step_eff > 1.0, 1.0 / sprad,
                          max_step_eff)
        absh0 = jnp.maximum(absh0, sqrtmin)
        vtemp2 = fun(t + absh0, y + absh0 * f)
        wt = atol_s + rtol_s * jnp.abs(y)
        est = absh0 * jnp.sqrt(jnp.mean(((vtemp2 - f) / wt) ** 2))
        absh1 = jnp.where(
            0.1 * absh0 < max_step_eff * jnp.sqrt(est),
            jnp.maximum(0.1 * absh0 / jnp.sqrt(est), sqrtmin),
            max_step_eff)
        return absh1

    def cond(st):
        return st.status == _RUNNING

    def stages(t, Y, f, h, m):
        """Chebyshev three-term recurrence (sommeijer.py:273-329) in
        DEVIATION form with double-single scalar coefficients.

        Since mu + nu + (1 - mu - nu) = 1, subtracting the step-start
        state Y from every stage turns the recurrence into one for the
        deviation e_j = y_j - y_n:

            e_j = mu e_{j-1} + nu e_{j-2} + h mus (f_j - a_{j-1} f)

        — algebraically identical, but the carried arrays are SMALL
        (O(step increment)), so per-stage f32 round-off is injected
        relative to |e| instead of |y|; that is what internal
        stability amplifies ~m^2 (sommeijer.py:134-135), giving the
        f64-grade stage cap at ~1/4 the array-op count of a full DS
        stage carry (the round-2 design).  The scalar coefficient
        recurrences (z, dz, d2z, b — whose conditioning grows with m)
        stay in DS; the stage arrays are plain f32.  A further bonus:
        the embedded error's y_n - y_m is exactly -e_m, so the
        estimate has no cancellation at all.

        ``Y`` is the DS step-start state; returns e_m (f32 array).
        """
        mf = m.astype(jnp.float32)
        # w0 = 1 + 2/(13 m^2) in DS (13 m^2 is exact in f32)
        w0 = D.ds_add_f(D.ds_div(D.ds(jnp.float32(2.0)),
                                 D.ds(13.0 * mf * mf)),
                        jnp.float32(1.0))
        two_w0 = D.ds_mul_f(w0, jnp.float32(2.0))
        w0c = D.ds_collapse(w0)
        temp1 = w0c * w0c - 1.0
        temp2 = jnp.sqrt(temp1)
        arg = mf * jnp.log(w0c + temp2)
        # Mosaic has no sinh/cosh primitives; arg is bounded
        # (~0.55 for all m), so the exp form is safe
        ea = jnp.exp(arg)
        ei = 1.0 / ea
        sinh_a = 0.5 * (ea - ei)
        cosh_a = 0.5 * (ea + ei)
        w1 = sinh_a * temp1 / (cosh_a * mf * temp2 - w0c * sinh_a)
        bj0 = D.ds_div(D.ds(jnp.float32(1.0)),
                       D.ds_mul(two_w0, two_w0))
        mus0 = w1 * D.ds_collapse(bj0)
        y_hi, y_lo = Y

        def body(j, c):
            (ejm2, ejm1, thjm2, thjm1, zjm2, zjm1, dzjm2, dzjm1,
             d2zjm2, d2zjm1, bjm2, bjm1) = c
            zj = D.ds_add(D.ds_mul(two_w0, zjm1), D.ds_neg(zjm2))
            dzj = D.ds_add(
                D.ds_add(D.ds_mul(two_w0, dzjm1), D.ds_neg(dzjm2)),
                D.ds_mul_f(zjm1, jnp.float32(2.0)))
            d2zj = D.ds_add(
                D.ds_add(D.ds_mul(two_w0, d2zjm1),
                         D.ds_neg(d2zjm2)),
                D.ds_mul_f(dzjm1, jnp.float32(4.0)))
            bj = D.ds_div(d2zj, D.ds_mul(dzj, dzj))
            ajm1 = D.ds_add_f(D.ds_neg(D.ds_mul(zjm1, bjm1)),
                              jnp.float32(1.0))
            mu = D.ds_div(D.ds_mul(two_w0, bj), bjm1)
            nu = D.ds_neg(D.ds_div(bj, bjm2))
            muc = D.ds_collapse(mu)
            nuc = D.ds_collapse(nu)
            ajc = D.ds_collapse(ajm1)
            mus = muc * w1 / w0c

            fj = fun(t + h * thjm1, y_hi + (y_lo + ejm1))
            ej = muc * ejm1 + nuc * ejm2 + (h * mus) * (fj - ajc * f)
            thj = muc * thjm1 + nuc * thjm2 + mus * (1.0 - ajc)
            return (ejm1, ej, thjm1, thj, zjm1, zj, dzjm1, dzj,
                    d2zjm1, d2zj, bjm1, bj)

        c0 = (y_hi * 0.0, (h * mus0) * f,
              jnp.float32(0.0), mus0,
              D.ds(jnp.float32(1.0)), w0,
              D.ds(jnp.float32(0.0)), D.ds(jnp.float32(1.0)),
              D.ds(jnp.float32(0.0)), D.ds(jnp.float32(0.0)),
              bj0, bj0)
        c = jax.lax.fori_loop(2, m + 1, body, c0)
        return c[1]

    def body(st):
        t, y, f = st.t, st.y, st.f

        # spectral radius: user bound/callback, or the in-kernel
        # power iteration with the stepper's refresh policy
        # (steppers/rkc.py step_flat: refresh on newspc only)
        if power_rho:
            active = st.newspc != 0
            sprad, V_new, nev_rho, rho_ok = _rho_power(
                fun, t, y, f, st.V, st.sprad, active, linidx, ntot,
                small, sqrtu, rho_uround)
            nfesig = st.nfesig + nev_rho
            jacatt_att = jnp.where(active, jnp.int32(1), st.jacatt)
        else:
            sprad = sprad_at(t, y)
            V_new = st.V
            nfesig = st.nfesig
            jacatt_att = st.jacatt
            rho_ok = sprad == sprad   # always true

        absh = jnp.where(st.h_abs < 0.0,
                         init_absh(t, y, f, sprad), st.h_abs)
        nfev = st.nfev + jnp.where(st.h_abs < 0.0, 1, 0)

        d = jnp.abs(tfs - t)
        absh = jnp.where(1.1 * absh >= d, d, absh)
        # NaN/inf guard: a non-finite absh (overflowed member state)
        # would cast sqrt(...)->int32 to an undefined huge value on
        # Mosaic and send the stage fori_loop astronomically long.
        # Clamp and let the error test report OVERFLOW instead.
        absh = jnp.where(jnp.isfinite(absh), absh, max_step_eff)
        m = 1 + jnp.sqrt(1.54 * absh * sprad + 1.0).astype(jnp.int32)
        hit_cap = m > mmax
        m = jnp.where(hit_cap, mmax, m)
        m = jnp.clip(m, 2, mmax)
        absh = jnp.where(hit_cap,
                         (m.astype(jnp.float32) ** 2 - 1.0)
                         / (1.54 * sprad), absh)
        h = dir_s * absh
        mf = m.astype(jnp.float32)
        hmin = jnp.maximum(
            jnp.float32(sqrtmin),
            13.3 * uround * (jnp.abs(t) + absh) * (mf * mf - 1.0))

        Y = (y, st.y_lo)
        e_m = stages(t, Y, f, h, m)
        yk = y + (st.y_lo + e_m)
        f_new = fun(t + h, yk)
        nfev = nfev + (m - 1) + 1

        wt = atol_s + rtol_s * jnp.maximum(jnp.abs(y), jnp.abs(yk))
        # y_n - y_m == -e_m exactly in deviation form: no cancellation
        est = -0.8 * e_m + 0.4 * h * (f + f_new)
        err = jnp.sqrt(jnp.mean((est / wt) ** 2))
        bad = ~jnp.isfinite(err)
        err = jnp.where(bad, jnp.float32(10.0), err)

        accepted = (err < 1.0) & ~bad
        # Mosaic cannot legalize powf: x**(1/3) = exp(log(x)/3),
        # arguments are clamped positive
        logec = jnp.log(jnp.maximum(err, 1e-30))
        cbrt_e = jnp.exp(logec * (1.0 / 3.0))
        absh_rej = 0.8 * absh / cbrt_e
        too_small = (~accepted) & (absh_rej < hmin)

        # H220 dead-beat controller (sommeijer.py:253-266)
        fac = jnp.float32(10.0)
        t2f = cbrt_e
        fac_first = jnp.where(0.8 < fac * t2f, 0.8 / t2f, fac)
        temp1 = 0.8 * absh * jnp.exp(
            jnp.log(jnp.maximum(st.err_old, 1e-30)) * (1.0 / 3.0))
        temp2 = jnp.abs(st.h_prev) * jnp.exp(logec * (2.0 / 3.0))
        fac_next = jnp.where(temp1 < fac * temp2,
                             temp1 / jnp.maximum(temp2, 1e-30), fac)
        fac = jnp.where(st.h_prev == 0.0, fac_first, fac_next)
        absh_acc = jnp.maximum(0.1, fac) * absh
        absh_acc = jnp.maximum(hmin, jnp.minimum(max_step_eff,
                                                 absh_acc))

        is_last = accepted & (absh >= d)
        t_adv, t_lo_adv = _df_add(st.t, st.t_lo, h)
        t_new = jnp.where(is_last, tfs, t_adv)
        t_lo_new = jnp.where(is_last, 0.0, t_lo_adv)

        # advance the DS y-carry by the step deviation (once per step)
        y_hi, y_lo_new = D.ds_add_f(Y, e_m)

        # events: sign changes of g over the accepted step fire; the
        # root is bisected on the step's cubic Hermite interpolant;
        # terminal events truncate at the earliest terminal root
        # (fused_erk._handle_events semantics, scalar-member form)
        gprev_new = st.gprev
        evfired_new = st.evfired
        trunc = accepted & (t != t)       # scalar false
        te = jnp.float32(0.0)
        y_te = None
        if n_ev:
            y0c = y + st.y_lo
            h_safe = jnp.where(h == 0.0, jnp.float32(1.0), h)
            te_dir = jnp.float32(1e30)
            roots, groots, fires, g_news = [], [], [], []
            for i, (ge, eterm, edir) in enumerate(ev_spec):
                g_new_i = ge(t_new, yk)
                g_news.append(g_new_i)
                gp = st.gprev[i]
                up_x = (gp <= 0.0) & (g_new_i >= 0.0)
                dn_x = (gp >= 0.0) & (g_new_i <= 0.0)
                if edir > 0:
                    sign_x = up_x
                elif edir < 0:
                    sign_x = dn_x
                else:
                    sign_x = up_x | dn_x
                fired_i = sign_x & accepted & (st.evfired[i] == 0)
                a = jnp.float32(0.0)
                b = jnp.float32(1.0)
                fa = gp
                for _ in range(25):
                    mid = 0.5 * (a + b)
                    ymid = _hermite(mid, h, y0c, f, yk, f_new)
                    fm = ge(t + mid * h_safe, ymid)
                    left = fa * fm <= 0.0
                    a = jnp.where(left, a, mid)
                    b = jnp.where(left, mid, b)
                    fa = jnp.where(left, fa, fm)
                th = 0.5 * (a + b)
                roots.append(t + th * h_safe)
                groots.append(_hermite(th, h, y0c, f, yk, f_new))
                fires.append(fired_i)
                if eterm:
                    di = dir_s * roots[i]
                    better = fired_i & (di < te_dir)
                    te_dir = jnp.where(better, di, te_dir)
                    te = jnp.where(better, roots[i], te)
                    y_te = _sblend(better, groots[i],
                                   yk if y_te is None else y_te)
                    trunc = trunc | fired_i
            gprev_new, evfired_new = [], []
            for i in range(n_ev):
                keep = fires[i] & (~trunc
                                   | (dir_s * roots[i] <= te_dir))
                write_event(i, keep, roots[i], groots[i])
                gprev_new.append(jnp.where(accepted, g_news[i],
                                           st.gprev[i]))
                evfired_new.append(
                    jnp.where(keep, jnp.int32(1), st.evfired[i]))
            gprev_new = tuple(gprev_new)
            evfired_new = tuple(evfired_new)

        # terminal truncation rewrites the step endpoint
        if n_ev and y_te is not None:
            t_new = jnp.where(trunc, te, t_new)
            t_lo_new = jnp.where(trunc, 0.0, t_lo_new)
            y_hi = _sblend(trunc, y_te, y_hi)
            y_lo_new = _sblend(trunc, y_hi * 0.0, y_lo_new)

        # t_eval snapshots: write every grid point this step crossed,
        # cubic-Hermite interpolated from the carried (y, f) endpoint
        # pairs (the reference's own RKC dense output is cubic
        # Hermite, sommeijer.py:400-406)
        iq = st.iq
        if snap is not None:
            nq, read_tq, write_snap = snap

            def qbody(i, iq_c):
                tq = read_tq(i)
                cross = (accepted & (i == iq_c)
                         & (dir_s * tq <= dir_s * t_new))

                @pl.when(cross)
                def _():
                    theta = ((tq - st.t) - st.t_lo) / h
                    write_snap(i, _hermite(theta, h, y, f, yk, f_new))
                return iq_c + jnp.where(cross, 1, 0)

            iq = jax.lax.fori_loop(0, nq, qbody, iq)

        status = jnp.where(
            bad, _OVERFLOW,
            jnp.where(too_small, _TOO_SMALL,
                      jnp.where(is_last, _FINISHED,
                                st.status))).astype(jnp.int32)
        if n_ev:
            status = jnp.where(trunc, jnp.int32(_EVENT), status)
        status = jnp.where(~rho_ok, jnp.int32(_RHO_FAIL), status)
        status = jnp.where((st.it + 1 >= max_steps)
                           & (status == _RUNNING),
                           jnp.int32(_OVERFLOW), status)

        # spectral-radius refresh policy after the attempt
        # (steppers/rkc.py:513-517): on accept, jacatt <- const_jac,
        # nstsig cycles mod 25, refresh when it wraps; on reject,
        # re-estimate unless the estimate is fresh this attempt
        if power_rho:
            cj = jnp.int32(1 if const_jac else 0)
            nstsig_new = jnp.where(accepted,
                                   jnp.mod(st.nstsig + 1, 25),
                                   st.nstsig)
            newspc_new = jnp.where(
                accepted,
                ((nstsig_new == 0) & (cj == 0)).astype(jnp.int32),
                (jacatt_att == 0).astype(jnp.int32))
            jacatt_new = jnp.where(accepted, cj, jacatt_att)
        else:
            nstsig_new = st.nstsig
            newspc_new = st.newspc
            jacatt_new = jacatt_att

        am = accepted.astype(jnp.float32)
        return _S(
            it=st.it + 1,
            t=jnp.where(accepted, t_new, st.t),
            t_lo=jnp.where(accepted, t_lo_new, st.t_lo),
            y=am * y_hi + (1.0 - am) * st.y,
            y_lo=am * y_lo_new + (1.0 - am) * st.y_lo,
            f=am * f_new + (1.0 - am) * st.f,
            h_abs=jnp.where(accepted, absh_acc, absh_rej),
            h_prev=jnp.where(accepted, h, st.h_prev),
            err_old=jnp.where(accepted, err, st.err_old),
            status=status,
            nstep=st.nstep + jnp.where(accepted, 1, 0),
            nfev=nfev,
            iq=iq,
            sprad=sprad,
            V=V_new,
            newspc=newspc_new,
            jacatt=jacatt_new,
            nstsig=nstsig_new,
            nfesig=nfesig,
            gprev=gprev_new,
            evfired=evfired_new)

    # snapshot points at/before t0 take the initial state
    iq0 = jnp.int32(0)
    if snap is not None:
        nq, read_tq, write_snap = snap

        def q0body(i, iq_c):
            tq = read_tq(i)
            hit = (i == iq_c) & (dir_s * tq <= dir_s * t0s)

            @pl.when(hit)
            def _():
                write_snap(i, y_init)
            return iq_c + jnp.where(hit, 1, 0)

        iq0 = jax.lax.fori_loop(0, nq, q0body, iq0)

    if n_ev:
        gprev0 = tuple(ev_spec[i][0](t0s, y_init) for i in range(n_ev))
        evfired0 = tuple(jnp.int32(0) for _ in range(n_ev))
    else:
        gprev0 = ()
        evfired0 = ()

    st0 = _S(it=jnp.int32(0), t=t0s, t_lo=jnp.float32(0.0),
             y=y_init, y_lo=y_init * 0.0, f=f_init, h_abs=h0s,
             h_prev=jnp.float32(0.0), err_old=jnp.float32(1.0),
             status=jnp.int32(_RUNNING), nstep=jnp.int32(0),
             nfev=jnp.int32(1), iq=iq0,
             sprad=jnp.float32(0.0),
             V=(f_init * 1.0) if power_rho else (),
             newspc=jnp.int32(1), jacatt=jnp.int32(0),
             nstsig=jnp.int32(0), nfesig=jnp.int32(0),
             gprev=gprev0, evfired=evfired0)
    st = jax.lax.while_loop(cond, body, st0)

    # flush snapshot points the integration never reached (beyond tf,
    # or anything left by an early failure) with the final state
    if snap is not None:
        nq, read_tq, write_snap = snap

        def qfbody(i, _):
            @pl.when(i >= st.iq)
            def _():
                write_snap(i, st.y)
            return 0

        jax.lax.fori_loop(0, nq, qfbody, 0)
    return st


def _mmax_for(rtol, m_max):
    eps32 = float(np.finfo(np.float32).eps)
    # the stage recurrence runs in double-single (hi, lo) arithmetic:
    # per-stage round-off injected into the Chebyshev recurrence (the
    # quantity internal stability amplifies ~m^2, sommeijer.py:134-135)
    # is ~eps32^2 instead of eps32, so the f64-grade stage cap applies.
    # A hard cap of 200 bounds kernel time and the (damped) f32
    # RHS-evaluation noise.
    uround = eps32 * eps32
    mmax = int(max(np.round(np.sqrt(rtol / (10.0 * uround))), 2.0))
    mmax = min(mmax, 200)
    return (int(m_max) if m_max is not None else mmax), uround


def solve_fused_rkc(fun, t_span, y0, rho=None, rtol=1e-4, atol=1e-6,
                    first_step=None, max_steps=100_000,
                    interpret=False, m_max=None, t_eval=None,
                    events=None, const_jac=False, max_step=None):
    """Integrate one stiff semi-discretized system in one TPU kernel.

    y0: float32 array of any VMEM-tileable shape (e.g. ``(2, ny, nx)``)
    — NOT flattened; ``fun(t, y) -> dy`` of the same shape, stencil
    shifts via :func:`roll`.  ``rho``: float upper bound of the
    Jacobian spectral radius, a traceable callback ``rho(t, y)``, or
    ``None`` to run the IN-KERNEL nonlinear power iteration
    (sommeijer.py:331-398) with the XLA stepper's refresh policy
    (re-estimate on the first step, after rejections, and every 25
    accepted steps; ``const_jac=True`` pins the first estimate).
    Returns (y_final, status, nsteps, nfev) with the fused-ERK status
    convention, plus ``nfesig`` (power-iteration RHS evals, the
    reference's counter) appended when ``rho is None``.

    The Chebyshev stage recurrence runs in double-single (hi, lo)
    arithmetic (ops/ds.py), so the internal-stability round-off bound
    sqrt(rtol / 10u) (sommeijer.py:134-135) applies with u ~ eps32^2:
    the stage cap matches the f64 path's (hard-capped at 200) instead
    of the bare-f32 mmax~9 at rtol 1e-4 that cost ~4x the steps in
    round 1.  ``m_max`` overrides the cap.

    ``t_eval``: optional increasing (in integration direction) float
    sequence of snapshot times.  Snapshots are written FROM INSIDE the
    kernel as the integration crosses each point, cubic-Hermite
    interpolated from the carried (y, f) step endpoints — the
    reference's own RKC dense output (sommeijer.py:400-406).  When
    given, ``y_eval`` of shape (len(t_eval), *y0.shape) is appended to
    the return; points at or before t0 take y0, points past tf take
    y(tf).

    ``events``: optional callable or list of callables
    ``g(t, y) -> scalar`` with the reference's optional ``terminal`` /
    ``direction`` attributes (the solve_ivp event protocol).  Sign
    changes across accepted steps fire the event; the root is bisected
    in-kernel on the step's cubic Hermite interpolant (first crossing
    recorded), and terminal events truncate the integration at the
    root with status 8.  Appends ``(t_events (n_ev,),
    y_events (n_ev, *y0.shape), n_events (n_ev,))`` to the return;
    non-fired slots are NaN.

    Return order: ``(y, status, nsteps, nfev[, nfesig][, y_eval]
    [, t_events, y_events, n_events])``.

    ``max_step``: optional static float cap on |h| — folded into the
    effective hmax exactly like the stepper (steppers/rkc.py:141-143,
    rkc.f's hmax).
    """
    y0 = jnp.asarray(y0, jnp.float32)
    shape = y0.shape

    t0, tf = t_span
    t0 = jnp.asarray(t0, jnp.float32)
    tf = jnp.asarray(tf, jnp.float32)
    direction = jnp.sign(tf - t0)
    h0 = (jnp.asarray(first_step, jnp.float32) if first_step is not None
          else jnp.asarray(-1.0, jnp.float32))
    scalars = jnp.stack([t0, tf, jnp.float32(rtol), jnp.float32(atol),
                         direction, h0])

    sqrtmin = float(np.sqrt(np.finfo(np.float32).tiny))
    mmax, uround = _mmax_for(rtol, m_max)
    power = rho is None
    rho_const = None if (power or callable(rho)) else float(rho)

    nq = 0 if t_eval is None else int(np.asarray(t_eval).shape[0])
    if t_eval is not None:
        t_eval = jnp.asarray(t_eval, jnp.float32)

    ev_spec = _make_ev_spec(events)
    n_ev = 0 if ev_spec is None else len(ev_spec)

    def kernel(sc_ref, *refs):
        refs = list(refs)
        teval_ref = refs.pop(0) if t_eval is not None else None
        y0_ref = refs.pop(0)
        yout_ref, stat_ref, nstep_ref, nfev_ref = refs[:4]
        refs = refs[4:]
        nfesig_ref = refs.pop(0) if power else None
        yq_ref = refs.pop(0) if t_eval is not None else None
        if n_ev:
            tev_ref, yev_ref, fev_ref = refs[:3]
        _IN_KERNEL[0] = True
        sc = tuple(sc_ref[i] for i in range(6))

        if power:
            sprad_at = None
        elif rho_const is not None:
            sprad_at = lambda t, y: jnp.float32(rho_const)  # noqa: E731
        else:
            sprad_at = lambda t, y: jnp.asarray(   # noqa: E731
                rho(t, y), jnp.float32)

        snap = None
        if t_eval is not None:
            def write_snap(i, val):
                yq_ref[i] = val
            snap = (nq, lambda i: teval_ref[i], write_snap)

        events_k = None
        if n_ev:
            # outputs are uninitialized memory: clear before the loop
            for i in range(n_ev):
                tev_ref[i] = jnp.float32(0.0)
                fev_ref[i] = jnp.int32(0)
                yev_ref[i] = y0_ref[:] * 0.0

            def write_event(i, keep, t_root, y_root):
                @pl.when(keep)
                def _():
                    tev_ref[i] = t_root
                    fev_ref[i] = jnp.int32(1)
                    yev_ref[i] = y_root
            events_k = (ev_spec, write_event)

        st = _integrate(fun, sprad_at, sc, y0_ref[:], mmax=mmax,
                        max_steps=max_steps, uround=uround,
                        sqrtmin=sqrtmin, snap=snap, events=events_k,
                        const_jac=const_jac, max_step=max_step)

        yout_ref[:] = st.y
        stat_ref[0] = st.status
        nstep_ref[0] = st.nstep
        nfev_ref[0] = st.nfev
        if power:
            nfesig_ref[0] = st.nfesig
        _IN_KERNEL[0] = False

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [scalars]
    if t_eval is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(t_eval)
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    args.append(y0)

    out_shapes = [
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    if power:
        out_shapes.append(jax.ShapeDtypeStruct((1,), jnp.int32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if t_eval is not None:
        out_shapes.append(
            jax.ShapeDtypeStruct((nq,) + shape, jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if n_ev:
        out_shapes += [
            jax.ShapeDtypeStruct((n_ev,), jnp.float32),
            jax.ShapeDtypeStruct((n_ev,) + shape, jnp.float32),
            jax.ShapeDtypeStruct((n_ev,), jnp.int32),
        ]
        out_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(*args)
    y_out, status, nsteps, nfev = outs[:4]
    res = (y_out, status[0], nsteps[0], nfev[0])
    k = 4
    if power:
        res = res + (outs[k][0],)
        k += 1
    if t_eval is not None:
        res = res + (outs[k],)
        k += 1
    if n_ev:
        tev, yev, fev = outs[k], outs[k + 1], outs[k + 2]
        nanv = jnp.float32(np.nan)
        t_events = jnp.where(fev != 0, tev, nanv)
        exp = (slice(None),) + (None,) * len(shape)
        y_events = jnp.where((fev != 0)[exp], yev, nanv)
        res = res + (t_events, y_events, fev)
    return res


def solve_fused_rkc_ensemble(fun, t_span, y0, rho=None, params=None,
                             rtol=1e-4, atol=1e-6, first_step=None,
                             max_steps=100_000, interpret=False,
                             m_max=None, t_eval=None, events=None,
                             const_jac=False, max_step=None):
    """Integrate an ENSEMBLE of stiff PDE grids in one TPU kernel.

    The flagship SSV2stab workload (BASELINE config 5, reference
    docs/Demo_SSV2stab.ipynb): many members of one semi-discretized
    PDE, each with its own parameters/ICs and fully independent
    adaptive step-size control.  Members ride the Pallas GRID
    dimension — one member-block per program instance, the member's
    spatial grid resident in VMEM with its minor two dims on the
    (sublane, lane) tile, so :func:`roll` stencil shifts stay
    in-register lane/sublane rotations exactly as in the single-grid
    kernel (the member axis never mixes into the stencil dims).

    Parameters
    ----------
    y0 : (n_members, *grid_shape) float32 — per-member initial grids.
    fun : ``fun(t, y)`` or ``fun(t, y, p)`` if ``params`` is given;
        ``y`` has ``grid_shape``; stencil shifts via :func:`roll`.
    rho : float spectral-radius bound, traceable callback
        (``rho(t, y)`` / ``rho(t, y, p)`` matching ``fun``'s arity),
        or ``None`` to run the in-kernel power iteration PER MEMBER
        (each member carries its own eigenvector warm start and
        refresh schedule; see :func:`solve_fused_rkc`).
    params : optional (n_members, k) float32 — per-member scalar
        parameters, delivered to ``fun`` as a k-tuple of SMEM scalars.
    t_eval : optional snapshot times; appends ``y_eval`` of shape
        (n_members, len(t_eval), *grid_shape).
    events : optional event callables ``g(t, y)`` (or ``g(t, y, p)``
        when ``params`` is given) with the solve_ivp protocol
        attributes; appends ``(t_events (n_ev, n_members),
        y_events (n_ev, n_members, *grid_shape),
        n_events (n_ev, n_members))``; non-fired slots are NaN.

    Returns (y_final, status, nsteps, nfev[, nfesig][, y_eval]
    [, t_events, y_events, n_events]): per-member arrays.  Per-member
    semantics (step sequence, controller, counters) are IDENTICAL to
    :func:`solve_fused_rkc` on that member alone — the same
    ``_integrate`` body runs per program instance.  ``max_step``:
    optional static float cap on |h| (steppers/rkc.py:141-143).
    """
    y0 = jnp.asarray(y0, jnp.float32)
    n_members = y0.shape[0]
    gshape = y0.shape[1:]
    if len(gshape) < 2:
        raise ValueError(
            "member grids must be >= 2-D (minor two dims are the VMEM "
            f"tile); got per-member shape {gshape}")

    t0, tf = t_span
    t0 = jnp.asarray(t0, jnp.float32)
    tf = jnp.asarray(tf, jnp.float32)
    direction = jnp.sign(tf - t0)
    h0 = (jnp.asarray(first_step, jnp.float32) if first_step is not None
          else jnp.asarray(-1.0, jnp.float32))
    scalars = jnp.stack([t0, tf, jnp.float32(rtol), jnp.float32(atol),
                         direction, h0])

    sqrtmin = float(np.sqrt(np.finfo(np.float32).tiny))
    mmax, uround = _mmax_for(rtol, m_max)
    power = rho is None
    rho_const = None if (power or callable(rho)) else float(rho)

    if params is not None:
        params = jnp.asarray(params, jnp.float32)
        if params.ndim != 2 or params.shape[0] != n_members:
            raise ValueError("params must be (n_members, k)")
        n_par = params.shape[1]
    else:
        n_par = 0

    nq = 0 if t_eval is None else int(np.asarray(t_eval).shape[0])
    if t_eval is not None:
        t_eval = jnp.asarray(t_eval, jnp.float32)

    ev_spec = _make_ev_spec(events)
    n_ev = 0 if ev_spec is None else len(ev_spec)

    def kernel(sc_ref, *refs):
        refs = list(refs)
        par_ref = refs.pop(0) if params is not None else None
        teval_ref = refs.pop(0) if t_eval is not None else None
        y0_ref = refs.pop(0)
        yout_ref, stat_ref, nstep_ref, nfev_ref = refs[:4]
        refs = refs[4:]
        nfesig_ref = refs.pop(0) if power else None
        yq_ref = refs.pop(0) if t_eval is not None else None
        if n_ev:
            tev_ref, yev_ref, fev_ref = refs[:3]
        _IN_KERNEL[0] = True
        sc = tuple(sc_ref[i] for i in range(6))
        i = pl.program_id(0)

        if params is not None:
            p = tuple(par_ref[i, j] for j in range(n_par))
            fun1 = lambda t, y: fun(t, y, p)                 # noqa: E731
            wrap = lambda g: (lambda t, y: g(t, y, p))       # noqa: E731
        else:
            fun1 = fun
            wrap = lambda g: g                               # noqa: E731

        if power:
            sprad_at = None
        elif rho_const is not None:
            sprad_at = lambda t, y: jnp.float32(rho_const)  # noqa: E731
        else:
            rho1 = wrap(rho)
            sprad_at = lambda t, y: jnp.asarray(   # noqa: E731
                rho1(t, y), jnp.float32)

        snap = None
        if t_eval is not None:
            def write_snap(q, val):
                yq_ref[0, q] = val
            snap = (nq, lambda q: teval_ref[q], write_snap)

        events_k = None
        if n_ev:
            ev_spec_k = [(wrap(ge), term, edir)
                         for ge, term, edir in ev_spec]
            for j in range(n_ev):
                tev_ref[j, i] = jnp.float32(0.0)
                fev_ref[j, i] = jnp.int32(0)
                yev_ref[0, j] = y0_ref[0] * 0.0

            def write_event(j, keep, t_root, y_root):
                @pl.when(keep)
                def _():
                    tev_ref[j, i] = t_root
                    fev_ref[j, i] = jnp.int32(1)
                    yev_ref[0, j] = y_root
            events_k = (ev_spec_k, write_event)

        st = _integrate(fun1, sprad_at, sc, y0_ref[0], mmax=mmax,
                        max_steps=max_steps, uround=uround,
                        sqrtmin=sqrtmin, snap=snap, events=events_k,
                        const_jac=const_jac, max_step=max_step)

        yout_ref[0] = st.y
        # the int outputs are whole-(n_members,) SMEM blocks (Mosaic
        # rejects 1-element rank-1 blocks); each program writes slot i
        stat_ref[i] = st.status
        nstep_ref[i] = st.nstep
        nfev_ref[i] = st.nfev
        if power:
            nfesig_ref[i] = st.nfesig
        _IN_KERNEL[0] = False

    zero_idx = (0,) * len(gshape)
    member_spec = pl.BlockSpec((1,) + gshape,
                               lambda i: (i,) + zero_idx,
                               memory_space=pltpu.VMEM)
    scalar_out_spec = pl.BlockSpec((n_members,), lambda i: (0,),
                                   memory_space=pltpu.SMEM)
    in_specs = [pl.BlockSpec(scalars.shape, lambda i: (0,),
                             memory_space=pltpu.SMEM)]
    args = [scalars]
    if params is not None:
        in_specs.append(pl.BlockSpec(params.shape, lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(params)
    if t_eval is not None:
        in_specs.append(pl.BlockSpec((nq,), lambda i: (0,),
                                     memory_space=pltpu.SMEM))
        args.append(t_eval)
    in_specs.append(member_spec)
    args.append(y0)

    out_shapes = [
        jax.ShapeDtypeStruct((n_members,) + gshape, jnp.float32),
        jax.ShapeDtypeStruct((n_members,), jnp.int32),
        jax.ShapeDtypeStruct((n_members,), jnp.int32),
        jax.ShapeDtypeStruct((n_members,), jnp.int32),
    ]
    out_specs = [member_spec, scalar_out_spec, scalar_out_spec,
                 scalar_out_spec]
    if power:
        out_shapes.append(
            jax.ShapeDtypeStruct((n_members,), jnp.int32))
        out_specs.append(scalar_out_spec)
    if t_eval is not None:
        out_shapes.append(jax.ShapeDtypeStruct(
            (n_members, nq) + gshape, jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, nq) + gshape, lambda i: (i, 0) + zero_idx,
            memory_space=pltpu.VMEM))
    if n_ev:
        out_shapes += [
            jax.ShapeDtypeStruct((n_ev, n_members), jnp.float32),
            jax.ShapeDtypeStruct((n_members, n_ev) + gshape,
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_ev, n_members), jnp.int32),
        ]
        out_specs += [
            pl.BlockSpec((n_ev, n_members), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_ev) + gshape,
                         lambda i: (i, 0) + zero_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ev, n_members), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(n_members,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(*args)
    y_out, status, nsteps, nfev = outs[:4]
    res = (y_out, status, nsteps, nfev)
    k = 4
    if power:
        res = res + (outs[k],)
        k += 1
    if t_eval is not None:
        res = res + (outs[k],)
        k += 1
    if n_ev:
        tev, yev, fev = outs[k], outs[k + 1], outs[k + 2]
        nanv = jnp.float32(np.nan)
        t_events = jnp.where(fev != 0, tev, nanv)
        # yev is (n_members, n_ev, *gshape) -> (n_ev, n_members, ...)
        yev = jnp.moveaxis(yev, 1, 0)
        exp = (slice(None), slice(None)) + (None,) * len(gshape)
        y_events = jnp.where((fev != 0)[exp], yev, nanv)
        res = res + (t_events, y_events, fev)
    return res
