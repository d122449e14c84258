"""Fused Pallas RKC solver: a whole stabilized PDE integration in ONE
TPU kernel.

SSV2stab's workload is a single large semi-discretized grid taking
20-100 Chebyshev stages per step.  On the XLA path every stage RHS
costs ~20 dispatched kernels (jnp.roll does not fuse), so the solve is
dispatch-bound.  Here the grid lives in VMEM for the entire
integration; stencil shifts are ``pltpu.roll`` (in-register lane/sublane
rotations), and the stage recurrence, spectral-radius bound, error
estimate, H220 controller and time loop all run inside one
``pallas_call``.

Scope (the single-grid fast path; the f64 XLA path remains the
conformance solver):
* one system (the state IS the grid, any 2-D-tileable shape);
* f32 arithmetic with a double-single carry for y and t (the same
  compensation machinery as fused_erk);
* the spectral radius comes from a user bound: a float constant or a
  traceable ``rho(t, y) -> scalar`` callback (the nonlinear power
  iteration stays on the XLA path, sommeijer.py:331-398);
* Chebyshev stage loop is an in-kernel ``lax.fori_loop`` with the
  runtime stage count m of rkc.py:_stages (sommeijer.py:273-329).

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

from .fused_erk import _two_sum, _df_add
from . import ds as D

_RUNNING, _FINISHED, _TOO_SMALL, _OVERFLOW = 0, 1, 2, 3

_IN_KERNEL = [False]


def roll(x, shift, axis):
    """Periodic shift usable both inside the fused kernel and in plain
    jnp code (write the RHS once, run it anywhere)."""
    if _IN_KERNEL[0]:
        return pltpu.roll(x, shift % x.shape[axis], axis)
    return jnp.roll(x, shift, axis)


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


def _integrate(fun, sprad_at, sc, y_init, *, mmax, max_steps, uround,
               sqrtmin, snap=None):
    """Whole adaptive RKC integration of one grid, shared by the
    single-grid and member-ensemble kernels.  ``fun(t, y) -> dy`` on
    the grid-shaped y; ``sprad_at(t, y) -> scalar``; ``sc`` the 6
    solver scalars.  Runs the Chebyshev stage recurrence in
    double-single arithmetic (see solve_fused_rkc docstring) and
    returns the final ``_S`` state.

    ``snap``: optional (teval_ref, yq_ref, nq) — after each accepted
    step, every snapshot time crossed by the step is written to
    ``yq_ref`` via cubic Hermite interpolation from the carried
    (y, f) endpoint pairs.  Points at/before t0 get y0; points the
    integration never reaches are flushed with the final state by the
    caller."""
    t0s, tfs, rtol_s, atol_s, dir_s, h0s = sc
    f_init = fun(t0s, y_init)
    max_step_eff = jnp.abs(tfs - t0s)

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
        sprad = sprad_at(t, y)
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

        # t_eval snapshots: write every grid point this step crossed,
        # cubic-Hermite interpolated from the carried (y, f) endpoint
        # pairs (the reference's own RKC dense output is cubic
        # Hermite, sommeijer.py:400-406)
        iq = st.iq
        if snap is not None:
            teval_ref, yq_ref, nq = snap

            def qbody(i, iq_c):
                tq = teval_ref[i]
                cross = (accepted & (i == iq_c)
                         & (dir_s * tq <= dir_s * t_new))

                @pl.when(cross)
                def _():
                    theta = ((tq - st.t) - st.t_lo) / h
                    yq_ref[i] = _hermite(theta, h, y, f, yk, f_new)
                return iq_c + jnp.where(cross, 1, 0)

            iq = jax.lax.fori_loop(0, nq, qbody, iq)

        status = jnp.where(
            bad, _OVERFLOW,
            jnp.where(too_small, _TOO_SMALL,
                      jnp.where(is_last, _FINISHED,
                                st.status))).astype(jnp.int32)
        status = jnp.where((st.it + 1 >= max_steps)
                           & (status == _RUNNING),
                           jnp.int32(_OVERFLOW), status)

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
            iq=iq)

    # snapshot points at/before t0 take the initial state
    iq0 = jnp.int32(0)
    if snap is not None:
        teval_ref, yq_ref, nq = snap

        def q0body(i, iq_c):
            tq = teval_ref[i]
            hit = (i == iq_c) & (dir_s * tq <= dir_s * t0s)

            @pl.when(hit)
            def _():
                yq_ref[i] = y_init
            return iq_c + jnp.where(hit, 1, 0)

        iq0 = jax.lax.fori_loop(0, nq, q0body, iq0)

    st0 = _S(it=jnp.int32(0), t=t0s, t_lo=jnp.float32(0.0),
             y=y_init, y_lo=y_init * 0.0, f=f_init, h_abs=h0s,
             h_prev=jnp.float32(0.0), err_old=jnp.float32(1.0),
             status=jnp.int32(_RUNNING), nstep=jnp.int32(0),
             nfev=jnp.int32(1), iq=iq0)
    st = jax.lax.while_loop(cond, body, st0)

    # flush snapshot points the integration never reached (beyond tf,
    # or anything left by an early failure) with the final state
    if snap is not None:
        teval_ref, yq_ref, nq = snap

        def qfbody(i, _):
            @pl.when(i >= st.iq)
            def _():
                yq_ref[i] = st.y
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


def solve_fused_rkc(fun, t_span, y0, rho, rtol=1e-4, atol=1e-6,
                    first_step=None, max_steps=100_000,
                    interpret=False, m_max=None, t_eval=None):
    """Integrate one stiff semi-discretized system in one TPU kernel.

    y0: float32 array of any VMEM-tileable shape (e.g. ``(2, ny, nx)``)
    — NOT flattened; ``fun(t, y) -> dy`` of the same shape, stencil
    shifts via :func:`roll`.  ``rho``: float upper bound of the
    Jacobian spectral radius or a traceable callback ``rho(t, y)``.
    Returns (y_final, status, nsteps, nfev) with the fused-ERK status
    convention.

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
    given, the return becomes (y_final, status, nsteps, nfev, y_eval)
    with ``y_eval`` of shape (len(t_eval), *y0.shape); points at or
    before t0 take y0, points past tf take y(tf).
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
    rho_const = None if callable(rho) else float(rho)

    nq = 0 if t_eval is None else int(np.asarray(t_eval).shape[0])
    if t_eval is not None:
        t_eval = jnp.asarray(t_eval, jnp.float32)

    def kernel(sc_ref, *refs):
        if t_eval is not None:
            (teval_ref, y0_ref, yout_ref, stat_ref, nstep_ref,
             nfev_ref, yq_ref) = refs
            snap = (teval_ref, yq_ref, nq)
        else:
            y0_ref, yout_ref, stat_ref, nstep_ref, nfev_ref = refs
            snap = None
        _IN_KERNEL[0] = True
        sc = tuple(sc_ref[i] for i in range(6))

        def sprad_at(t, y):
            if rho_const is not None:
                return jnp.float32(rho_const)
            return jnp.asarray(rho(t, y), jnp.float32)

        st = _integrate(fun, sprad_at, sc, y0_ref[:], mmax=mmax,
                        max_steps=max_steps, uround=uround,
                        sqrtmin=sqrtmin, snap=snap)

        yout_ref[:] = st.y
        stat_ref[0] = st.status
        nstep_ref[0] = st.nstep
        nfev_ref[0] = st.nfev
        _IN_KERNEL[0] = False

    out_shapes = [
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
    ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [scalars]
    if t_eval is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(t_eval)
        out_shapes.append(
            jax.ShapeDtypeStruct((nq,) + shape, jnp.float32))
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    args.append(y0)
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    if t_eval is not None:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(*args)
    y_out, status, nsteps, nfev = outs[:4]
    if t_eval is not None:
        return y_out, status[0], nsteps[0], nfev[0], outs[4]
    return y_out, status[0], nsteps[0], nfev[0]


def solve_fused_rkc_ensemble(fun, t_span, y0, rho, params=None,
                             rtol=1e-4, atol=1e-6, first_step=None,
                             max_steps=100_000, interpret=False,
                             m_max=None):
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
    rho : float spectral-radius bound, or traceable callback —
        ``rho(t, y)`` / ``rho(t, y, p)`` matching ``fun``'s arity.
    params : optional (n_members, k) float32 — per-member scalar
        parameters, delivered to ``fun`` as a k-tuple of SMEM scalars.

    Returns (y_final, status, nsteps, nfev): per-member arrays of
    shapes (n_members, *grid_shape) and (n_members,).  Per-member
    semantics (step sequence, controller, counters) are IDENTICAL to
    :func:`solve_fused_rkc` on that member alone — the same
    ``_integrate`` body runs per program instance.
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
    rho_const = None if callable(rho) else float(rho)

    if params is not None:
        params = jnp.asarray(params, jnp.float32)
        if params.ndim != 2 or params.shape[0] != n_members:
            raise ValueError("params must be (n_members, k)")
        n_par = params.shape[1]
    else:
        n_par = 0

    def kernel(sc_ref, *refs):
        if params is not None:
            par_ref, y0_ref, yout_ref, stat_ref, nstep_ref, \
                nfev_ref = refs
        else:
            y0_ref, yout_ref, stat_ref, nstep_ref, nfev_ref = refs
        _IN_KERNEL[0] = True
        sc = tuple(sc_ref[i] for i in range(6))
        i = pl.program_id(0)

        if params is not None:
            p = tuple(par_ref[i, j] for j in range(n_par))
            fun1 = lambda t, y: fun(t, y, p)                 # noqa: E731

            def sprad_at(t, y):
                if rho_const is not None:
                    return jnp.float32(rho_const)
                return jnp.asarray(rho(t, y, p), jnp.float32)
        else:
            fun1 = fun

            def sprad_at(t, y):
                if rho_const is not None:
                    return jnp.float32(rho_const)
                return jnp.asarray(rho(t, y), jnp.float32)

        st = _integrate(fun1, sprad_at, sc, y0_ref[0], mmax=mmax,
                        max_steps=max_steps, uround=uround,
                        sqrtmin=sqrtmin)

        yout_ref[0] = st.y
        # the int outputs are whole-(n_members,) SMEM blocks (Mosaic
        # rejects 1-element rank-1 blocks); each program writes slot i
        stat_ref[i] = st.status
        nstep_ref[i] = st.nstep
        nfev_ref[i] = st.nfev
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
    in_specs.append(member_spec)
    args.append(y0)

    out_shapes = (
        jax.ShapeDtypeStruct((n_members,) + gshape, jnp.float32),
        jax.ShapeDtypeStruct((n_members,), jnp.int32),
        jax.ShapeDtypeStruct((n_members,), jnp.int32),
        jax.ShapeDtypeStruct((n_members,), jnp.int32),
    )
    with jax.enable_x64(False):
        y_out, status, nsteps, nfev = pl.pallas_call(
            kernel,
            grid=(n_members,),
            in_specs=in_specs,
            out_specs=(member_spec, scalar_out_spec, scalar_out_spec,
                       scalar_out_spec),
            out_shape=out_shapes,
            interpret=interpret,
        )(*args)
    return y_out, status, nsteps, nfev
