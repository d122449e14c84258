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


def solve_fused_rkc(fun, t_span, y0, rho, rtol=1e-4, atol=1e-6,
                    first_step=None, max_steps=100_000,
                    interpret=False, m_max=None):
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

    eps32 = float(np.finfo(np.float32).eps)
    sqrtmin = float(np.sqrt(np.finfo(np.float32).tiny))
    # the stage recurrence runs in double-single (hi, lo) arithmetic:
    # per-stage round-off injected into the Chebyshev recurrence (the
    # quantity internal stability amplifies ~m^2, sommeijer.py:134-135)
    # is ~eps32^2 instead of eps32, so the f64-grade stage cap applies.
    # A hard cap of 200 bounds kernel time and the (damped) f32
    # RHS-evaluation noise.
    uround = eps32 * eps32
    mmax = int(max(np.round(np.sqrt(rtol / (10.0 * uround))), 2.0))
    mmax = min(mmax, 200)
    mmax = int(m_max) if m_max is not None else mmax
    rho_const = None if callable(rho) else float(rho)

    def kernel(sc_ref, y0_ref, yout_ref, stat_ref, nstep_ref, nfev_ref):
        _IN_KERNEL[0] = True
        t0s = sc_ref[0]
        tfs = sc_ref[1]
        rtol_s = sc_ref[2]
        atol_s = sc_ref[3]
        dir_s = sc_ref[4]
        h0s = sc_ref[5]

        y_init = y0_ref[:]
        f_init = fun(t0s, y_init)

        max_step_eff = jnp.abs(tfs - t0s)

        def sprad_at(t, y):
            if rho_const is not None:
                return jnp.float32(rho_const)
            return jnp.asarray(rho(t, y), jnp.float32)

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

        class S(NamedTuple):
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

        def cond(st):
            return st.status == _RUNNING

        def stages(t, Y, f, h, m):
            """Chebyshev three-term recurrence (sommeijer.py:273-329)
            in double-single arithmetic.

            The homogeneous part of the recurrence (mu, nu, 1-mu-nu and
            the stage carries) runs in DS: round-off injected there is
            what internal stability amplifies ~m^2.  The f-terms and
            the w1/mus/th chain stay f32 — they are damped (f enters
            with O(1/m^2) coefficients; w1 errors act as a relative
            h perturbation, not per-stage noise).  ``Y`` is the DS
            step-start state; returns the DS final stage.
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

            def body(j, c):
                (yjm2, yjm1, thjm2, thjm1, zjm2, zjm1, dzjm2, dzjm1,
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
                cc1 = D.ds_add_f(D.ds_neg(D.ds_add(mu, nu)),
                                 jnp.float32(1.0))
                muc = D.ds_collapse(mu)
                nuc = D.ds_collapse(nu)
                ajc = D.ds_collapse(ajm1)
                mus = muc * w1 / w0c

                fj = fun(t + h * thjm1, D.ds_collapse(yjm1))
                yj = D.ds_add(D.ds_add(D.ds_mul(mu, yjm1),
                                       D.ds_mul(nu, yjm2)),
                              D.ds_mul(cc1, Y))
                yj = D.ds_add_f(yj, h * mus * (fj - ajc * f))
                thj = muc * thjm1 + nuc * thjm2 + mus * (1.0 - ajc)
                return (yjm1, yj, thjm1, thj, zjm1, zj, dzjm1, dzj,
                        d2zjm1, d2zj, bjm1, bj)

            c0 = (Y, D.ds_add_f(Y, h * mus0 * f),
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
            m = 1 + jnp.sqrt(1.54 * absh * sprad + 1.0).astype(jnp.int32)
            hit_cap = m > mmax
            m = jnp.where(hit_cap, mmax, m)
            absh = jnp.where(hit_cap,
                             (m.astype(jnp.float32) ** 2 - 1.0)
                             / (1.54 * sprad), absh)
            h = dir_s * absh
            mf = m.astype(jnp.float32)
            hmin = jnp.maximum(
                jnp.float32(sqrtmin),
                13.3 * uround * (jnp.abs(t) + absh) * (mf * mf - 1.0))

            Y = (y, st.y_lo)
            YK = stages(t, Y, f, h, m)
            yk = D.ds_collapse(YK)
            f_new = fun(t + h, yk)
            nfev = nfev + (m - 1) + 1

            wt = atol_s + rtol_s * jnp.maximum(jnp.abs(y),
                                               jnp.abs(yk))
            # y - yk in DS: the difference is O(tol), cancellation-safe
            dy = D.ds_add(Y, D.ds_neg(YK))
            est = 0.8 * D.ds_collapse(dy) + 0.4 * h * (f + f_new)
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

            # the stage recurrence already produced the DS solution;
            # renormalize the pair for the carry
            y_hi, y_lo_new = _two_sum(YK[0], YK[1])

            status = jnp.where(
                bad, _OVERFLOW,
                jnp.where(too_small, _TOO_SMALL,
                          jnp.where(is_last, _FINISHED,
                                    st.status))).astype(jnp.int32)
            status = jnp.where((st.it + 1 >= max_steps)
                               & (status == _RUNNING),
                               jnp.int32(_OVERFLOW), status)

            am = accepted.astype(jnp.float32)
            return S(
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
                nfev=nfev)

        st0 = S(it=jnp.int32(0), t=t0s, t_lo=jnp.float32(0.0),
                y=y_init, y_lo=y_init * 0.0, f=f_init, h_abs=h0s,
                h_prev=jnp.float32(0.0), err_old=jnp.float32(1.0),
                status=jnp.int32(_RUNNING), nstep=jnp.int32(0),
                nfev=jnp.int32(1))
        st = jax.lax.while_loop(cond, body, st0)

        yout_ref[:] = st.y
        stat_ref[0] = st.status
        nstep_ref[0] = st.nstep
        nfev_ref[0] = st.nfev
        _IN_KERNEL[0] = False

    out_shapes = (
        jax.ShapeDtypeStruct(shape, jnp.float32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
    )
    with jax.enable_x64(False):
        y_out, status, nsteps, nfev = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(scalars, y0)
    return y_out, status[0], nsteps[0], nfev[0]
