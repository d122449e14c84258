"""Fused Pallas CKdisc solver: the variable-order quit/twiddle
cascade for NON-SMOOTH problems, whole integrations in one TPU kernel.

CKdisc (reference cash.py:115-416) anticipates failure: staged error
assessments E1/E2 after stages 2/4 veto the remaining stages, and
fallback solutions of reduced order (2 or 3) advance to an internal
point c = 1/5 or 3/5 of the step without extra RHS work.  On the
XLA device path each attempt costs dozens of kernel launches; here the
whole adaptive integration — cascade, twiddle/quit factor adaptation,
fallback acceptance, time loop, t_eval snapshots and events — runs in
one ``pallas_call`` with the ensemble resident in VMEM.

Member-tile vectorization note: the VPU evaluates stages for all 1024
members of a block in lock-step, so the per-member stage SKIPPING that
motivates the cascade on a CPU cannot save wall-clock here — stages
3-6 are always computed and the cascade applies as result masks.  The
ACCEPTED step sequence (order decisions, twiddle/quit evolution, step
sizes) matches the stepper's, and ``nfev`` counts what the reference
WOULD evaluate (1 + 2*go2 + 2*go4 + accepted endpoint), so work
parity remains meaningful.  f32 only; the XLA f64 path
(steppers/ckdisc.py) is the conformance solver.

The adaptive loop is layout-generic (``_run_ck_loop``): this module's
kernel unrolls the state as member-tile rows (small n);
``fused_ckdisc_grid`` drives the same loop with the state on the
128-lane axis (mid-size n).
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_erk import (_RUNNING, _FINISHED, _TOO_SMALL, _OVERFLOW,
                        _EVENT, _fblend, _iblend, _sanitize,
                        _member_norm, _hermite_tiles, _make_ev_spec,
                        _handle_events)

SAFETY = 0.9
MAX_FACTOR_CK = 5.0
MIN_FACTOR_CK = 0.2
_BIG = 1e30      # stands in for the skipped-assessment inf sentinel


class _CS(NamedTuple):
    it: Any
    tf: Any
    direction: Any
    rtol: Any
    atol: Any
    t: Any
    y: Any
    f: Any
    h_abs: Any
    status: Any
    tw0: Any        # twiddle factors (per member)
    tw1: Any
    q0: Any         # quit factors
    q1: Any
    rejected: Any   # a rejection happened earlier in this step
    fresh: Any
    min_step: Any
    nstep: Any
    nfev: Any
    qrows: Any
    ev: Any


def _cbrt(x):
    # Mosaic cannot legalize powf: x**(1/3) via exp/log, clamped
    return jnp.exp(jnp.log(jnp.maximum(x, 1e-30)) * (1.0 / 3.0))


def _p5rt(x):
    return jnp.exp(jnp.log(jnp.maximum(x, 1e-30)) * 0.2)


def _wsum(rows, w):
    acc = None
    for wi, r in zip(w, rows):
        if wi == 0.0:
            continue
        term = float(wi) * r
        acc = term if acc is None else acc + term
    return jnp.zeros_like(rows[0]) if acc is None else acc


def _run_ck_loop(fun1, tables, max_steps, nq, tq_vals, fzero, izero,
                 mnorm, split_rows, join_rows, t, tf_r, dir_r,
                 rtol_r, atol_r, h_abs0, y, f, ev_spec=None,
                 nfev0=None, max_step=None):
    """Run the CKdisc cascade to completion — layout-generic.

    The tile shapes enter through ``fzero``/``izero`` (member-scalar
    zeros), ``mnorm`` (state-axis RMS -> member scalar),
    ``split_rows`` (state array -> list of row tiles) and
    ``join_rows`` (its inverse).  Both ``solve_fused_ckdisc`` (members
    on (8,128) tiles, state unrolled as rows) and
    ``solve_fused_ckdisc_grid`` (state on the lane axis) drive this
    loop; the accepted-step semantics are steppers/ckdisc.py's
    (== cash.py:253-394).
    """
    (A, B_w, C, E, B_as, E_as, C_fb, B_fb, E_fb, s,
     h_min_a, tiny_err) = tables
    n_ev = 0 if ev_spec is None else len(ev_spec)
    n_rows = len(split_rows(y))

    def cond(st):
        return jnp.max(_iblend(st.status == _RUNNING,
                               izero + 1, izero)) > 0

    def body(st):
        running = st.status == _RUNNING
        fresh_b = st.fresh != 0
        rejected_b = st.rejected != 0
        rtol_ = st.rtol
        atol_ = st.atol

        # fresh-step preparation (reassess_stepsize,
        # steppers/ckdisc.py:122-130)
        ms = jnp.maximum(h_min_a * (jnp.abs(st.t) + st.h_abs),
                         tiny_err)
        h_pre = jnp.maximum(st.h_abs, ms)
        if max_step is not None:
            h_pre = jnp.minimum(h_pre, float(max_step))
        d = jnp.abs(st.tf - st.t)
        split = (d < 2.0 * h_pre) & (d > h_pre)
        h_f = _fblend(split, jnp.maximum(0.5 * d, ms),
                      _fblend(d <= h_pre, d, h_pre))
        h_abs = _fblend(fresh_b, h_f, st.h_abs)
        min_step = _fblend(fresh_b, ms, st.min_step)
        too_small = h_abs < min_step
        h = h_abs * st.direction

        # all 6 stages (SIMD: the tile computes them for every
        # member; the cascade masks the results)
        rows = [st.f]
        for i in range(1, s):
            dy = h * _wsum(rows, A[i, :i])
            rows.append(fun1(st.t + C[i] * h, st.y + dy))

        def sol_err_norm(Bv, Ev, k, root):
            solk = st.y + h * _wsum(rows[:k], Bv[:k])
            errk = h * _wsum(rows[:k], Ev[:k])
            tolk = atol_ + rtol_ * jnp.maximum(jnp.abs(st.y),
                                               jnp.abs(solk))
            nm = mnorm(errk / tolk)
            nm, badk = _sanitize(nm)
            # sanitized lanes must REJECT, not accept
            nm = nm + badk.astype(jnp.float32) * _BIG
            return solk, root(nm), badk

        # E1 after 2 stages, E2 after 4, E4 after 6
        _, E1, _ = sol_err_norm(B_as[0], E_as[0], 2, jnp.sqrt)
        _, E2, _ = sol_err_norm(B_as[1], E_as[1], 4, _cbrt)
        y5, E4, b4 = sol_err_norm(B_w, E[:s], 6, _p5rt)
        E4 = _fblend(E4 == 0.0, fzero + 1e-38, E4)

        go2 = E1 < st.tw0 * st.q0
        go4 = go2 & (E2 < st.tw1 * st.q1)
        E2_eff = _fblend(go2, E2, fzero + _BIG)
        E4_eff = _fblend(go4, E4, fzero + _BIG)
        accept4 = go4 & (E4_eff < 1.0) & ~too_small & running
        bad4 = b4                      # NaN/inf overflow lanes

        # twiddle update on 5th-order rejection (cash.py:330-335)
        EQ1 = E1 / st.q0
        EQ2 = E2 / st.q1
        tw0n = _fblend(EQ1 < st.tw0, jnp.maximum(
            fzero + 1.1, EQ1), st.tw0)
        tw1n = _fblend(EQ2 < st.tw1, jnp.maximum(
            fzero + 1.1, EQ2), st.tw1)
        rej5 = go4 & ~accept4 & running
        tw0 = _fblend(rej5, tw0n, st.tw0)
        tw1 = _fblend(rej5, tw1n, st.tw1)

        # quit update on acceptance (cash.py:316-322)
        def quit_new(Ei, qf):
            qv = Ei / jnp.maximum(E4, 1e-30)
            q_adj = _fblend(qv > qf,
                            jnp.minimum(qv, 10.0 * qf),
                            jnp.maximum(qv, (2.0 / 3.0) * qf))
            return jnp.clip(q_adj, 1.0, 10000.0)
        q0 = _fblend(accept4, quit_new(E1, st.q0), st.q0)
        q1 = _fblend(accept4, quit_new(E2, st.q1), st.q1)

        # fallbacks (cash.py:337-368)
        y3, e3n, _ = sol_err_norm(B_fb[1], E_fb[1], 4,
                                  lambda x: x)
        fb3_try = go4 & ~accept4 & ~bad4 & (E2_eff < 1.0) \
            & ~too_small & running
        fb3_ok = fb3_try & (e3n < 1.0)
        y2, e2n, _ = sol_err_norm(B_fb[0], E_fb[0], 2,
                                  lambda x: x)
        fb2_try = go2 & ~accept4 & ~bad4 & ~fb3_ok & (E1 < 1.0) \
            & ~too_small & running
        fb2_ok = fb2_try & (e2n < 1.0)
        fb2_failed = fb2_try & ~fb2_ok

        accepted = accept4 | fb3_ok | fb2_ok

        # step-size update (cash.py:310-313, 346-372)
        esttol = _fblend(go4, E4,
                         _fblend(go2, E2 / st.q1, E1 / st.q0))
        fac4 = jnp.minimum(MAX_FACTOR_CK,
                           SAFETY / jnp.maximum(E4, 1e-30))
        fac4 = _fblend(rejected_b, jnp.minimum(1.0, fac4), fac4)
        h_next = _fblend(
            accept4, h_abs * fac4,
            _fblend(fb3_ok, h_abs * float(C_fb[1]),
                    _fblend(fb2_ok | fb2_failed,
                            h_abs * float(C_fb[0]),
                            h_abs * jnp.maximum(
                                MIN_FACTOR_CK,
                                SAFETY / jnp.maximum(esttol,
                                                     1e-30)))))
        h_next, _ = _sanitize(h_next)

        # fallback acceptance shortens THIS step: the fallback
        # weights sum to C_fallback
        h_used = _fblend(
            accept4, h,
            _fblend(fb3_ok, h * float(C_fb[1]),
                    h * float(C_fb[0])))
        y_new = _fblend(jnp.broadcast_to(accept4, st.y.shape),
                        y5,
                        _fblend(jnp.broadcast_to(fb3_ok,
                                                 st.y.shape),
                                y3, y2))

        is_last = accepted & (jnp.abs(h_used) >= d)
        t_new = _fblend(is_last, st.tf, st.t + h_used)

        f_new = fun1(t_new, y_new)
        y_new, _ = _sanitize(y_new)
        f_new, _ = _sanitize(f_new)

        status = _iblend(
            running & too_small, izero + _TOO_SMALL,
            _iblend(running & go4 & bad4, izero + _OVERFLOW,
                    st.status))
        status = _iblend((status == _RUNNING) & is_last,
                         izero + _FINISHED, status)
        hit_cap = (st.it + 1 >= max_steps) & (status == _RUNNING)
        status = _iblend(hit_cap, izero + _OVERFLOW, status)

        upd = accepted
        # reference work counts: stage 2 always, stages 3-4 when
        # go2, 5-6 when go4, endpoint eval on acceptance
        dfev = _iblend(running, izero + 1, izero)
        dfev = dfev + _iblend(running & go2, izero + 2, izero)
        dfev = dfev + _iblend(running & go4, izero + 2, izero)
        dfev = dfev + _iblend(upd, izero + 1, izero)

        # snapshots + events on the ACCEPTED SUB-STEP
        # [t, t + h_used] with endpoints (y, f) / (y_new, f_new)
        qrows_new = st.qrows
        if nq or n_ev:
            y_old_rows = split_rows(st.y)
            f_old_rows = split_rows(st.f)
            y_new_rows = split_rows(y_new)
            f_new_rows = split_rows(f_new)
            h_safe = _fblend(h_used == 0.0, fzero + 1.0, h_used)
        if nq:
            qrows_new = []
            for q in range(nq):
                tqc = tq_vals[q]
                crossed = (upd
                           & (st.direction * (tqc - st.t) > 0.0)
                           & (st.direction * tqc
                              <= st.direction * t_new))
                theta = (tqc - st.t) / h_safe
                vals = _hermite_tiles(theta, h_used, y_old_rows,
                                      f_old_rows, y_new_rows,
                                      f_new_rows)
                qrows_new.append(tuple(
                    _fblend(crossed, vals[j], st.qrows[q][j])
                    for j in range(n_rows)))
            qrows_new = tuple(qrows_new)

        ev_new = st.ev
        trunc = izero != izero
        te = fzero
        y_te_rows = None
        if n_ev:
            ev_new, trunc, te, y_te_rows = _handle_events(
                ev_spec, st.ev, upd, st.direction, st.t, t_new,
                h_used, h_safe, y_old_rows, f_old_rows,
                y_new_rows, f_new_rows, fzero, izero, join_rows)
            status = _iblend(trunc, izero + _EVENT, status)

        updn = jnp.broadcast_to(upd, st.y.shape)
        y_out = _fblend(updn, y_new, st.y)
        t_out = _fblend(upd, t_new, st.t)
        if n_ev and y_te_rows is not None:
            truncn = jnp.broadcast_to(trunc, st.y.shape)
            y_out = _fblend(truncn, join_rows(y_te_rows), y_out)
            t_out = _fblend(trunc, te, t_out)

        return _CS(
            it=st.it + 1,
            tf=st.tf, direction=st.direction,
            rtol=st.rtol, atol=st.atol,
            t=t_out,
            y=y_out,
            f=_fblend(updn, f_new, st.f),
            h_abs=_fblend(running, h_next, st.h_abs),
            status=status,
            tw0=tw0, tw1=tw1, q0=q0, q1=q1,
            rejected=_iblend(upd, izero,
                             _iblend(rejected_b
                                     | (running & ~accepted),
                                     izero + 1, izero)),
            fresh=_iblend(upd | (status != _RUNNING),
                          izero + 1, izero),
            min_step=min_step,
            nstep=st.nstep + _iblend(upd, izero + 1, izero),
            nfev=st.nfev + dfev,
            qrows=qrows_new,
            ev=ev_new)

    qrows0 = tuple(tuple(split_rows(y)) for _ in range(nq))
    if n_ev:
        ev0 = (tuple(ge(t, y) for ge, _, _ in ev_spec),
               tuple(izero for _ in range(n_ev)),
               tuple(fzero for _ in range(n_ev)),
               tuple(tuple(split_rows(y)) for _ in range(n_ev)))
    else:
        ev0 = ()
    st0 = _CS(
        it=jnp.zeros((), jnp.int32),
        tf=tf_r, direction=dir_r, rtol=rtol_r, atol=atol_r,
        t=t, y=y, f=f, h_abs=h_abs0,
        status=izero,
        tw0=fzero + 1.5, tw1=fzero + 1.1,
        q0=fzero + 100.0, q1=fzero + 100.0,
        rejected=izero, fresh=izero + 1, min_step=fzero,
        nstep=izero, nfev=izero + 1 if nfev0 is None else nfev0,
        qrows=qrows0, ev=ev0)
    return jax.lax.while_loop(cond, body, st0)


def _ck_tables():
    """The CKdisc coefficient set as f32 numpy, shared by both
    layouts (methods/erk.py transcription of cash.py:115-217)."""
    from ..methods.erk import CKdisc as _M, CKDISC_DATA as _D

    tab = _M.tableau
    A = np.asarray(tab.A, dtype=np.float32)
    B_w = np.asarray(tab.B, dtype=np.float32)
    C = np.asarray(tab.C, dtype=np.float32)
    E = np.asarray(tab.E, dtype=np.float32)
    B_as = np.asarray(_D["B_assess"], dtype=np.float32)
    E_as = np.asarray(_D["E_assess"], dtype=np.float32)
    C_fb = np.asarray(_D["C_fallback"], dtype=np.float32)
    B_fb = np.asarray(_D["B_fallback"], dtype=np.float32)
    E_fb = np.asarray(_D["E_fallback"], dtype=np.float32)
    s = tab.n_stages                       # 6
    eps32 = float(np.finfo(np.float32).eps)
    tiny_err = float(np.sqrt(np.finfo(np.float32).tiny))
    h_min_a = 10.0 * eps32 / tab.c_spacing()
    return (A, B_w, C, E, B_as, E_as, C_fb, B_fb, E_fb, s,
            h_min_a, tiny_err), tab


def solve_fused_ckdisc(fun, t_span, y0_batch, rtol=1e-4, atol=1e-6,
                       first_step=None, max_steps=100_000,
                       block_members=1024, interpret=False,
                       t_eval=None, events=None, max_step=None,
                       params=None):
    """Integrate an ensemble of non-smooth small systems in one Pallas
    kernel with the CKdisc variable-order cascade.

    y0_batch: (B, n) float32.  Returns (y_final (B, n), status (B,),
    nsteps (B,), nfev (B,)) with the fused-ERK status convention;
    ``t_eval`` appends y_eval (len(t_eval), B, n) (cubic Hermite over
    the accepted sub-steps — the stepper's own fallback interpolant,
    cash.py:408-416); ``events`` appends (t_events, y_events,
    n_events) with the solve_ivp terminal/direction protocol exactly
    like ``solve_fused_erk``.

    Cascade semantics (cash.py:253-394 == steppers/ckdisc.py):
    E1 (after 2 stages) and E2 (after 4) gate the attempt against the
    adaptive twiddle*quit thresholds; the full 5th-order solution is
    accepted when E4 < 1; otherwise 3rd/2nd-order fallback solutions
    advance the member to t + 3/5 h or t + 1/5 h when their own error
    tests pass.  Twiddle factors shrink toward observed E/quit ratios
    on 5th-order rejections; quit factors track E1/E4, E2/E4 on
    acceptance, clipped to [1, 1e4] with the 10x / 2/3 rate limits.

    ``params``: optional (B, k) float32 per-member scalar parameters;
    when given, ``fun`` and every event callable take a third
    argument ``p``, a k-tuple of per-member tiles broadcastable
    against the rows of ``y``.
    """
    tables, tab = _ck_tables()

    y0_batch = jnp.asarray(y0_batch, jnp.float32)
    n_total, n = y0_batch.shape
    bm = block_members
    if bm % 128:
        raise ValueError("block_members must be a multiple of 128")
    pad = (-n_total) % bm
    if pad:
        y0_batch = jnp.concatenate(
            [y0_batch, jnp.tile(y0_batch[-1:], (pad, 1))])
    grid = y0_batch.shape[0] // bm
    sub = bm // 128

    if params is not None:
        params = jnp.asarray(params, jnp.float32)
        if params.ndim != 2 or params.shape[0] != n_total:
            raise ValueError("params must be (B, k)")
        n_par = params.shape[1]
        if pad:
            params = jnp.concatenate(
                [params, jnp.tile(params[-1:], (pad, 1))])
    else:
        n_par = 0

    t0, tf = t_span
    if first_step is not None:
        h0 = jnp.asarray(first_step, jnp.float32)
    else:
        h0 = jnp.float32(-1.0)       # sentinel: in-kernel h_start
    t0 = jnp.asarray(t0, jnp.float32)
    tf = jnp.asarray(tf, jnp.float32)
    direction = jnp.sign(tf - t0)
    scalars = jnp.stack([t0, tf, jnp.float32(rtol), jnp.float32(atol),
                         direction, h0])

    nq = 0 if t_eval is None else int(np.asarray(t_eval).shape[0])
    tq_vals = (None if t_eval is None
               else [float(v) for v in np.asarray(t_eval)])

    ev_spec = _make_ev_spec(events)
    n_ev = 0 if ev_spec is None else len(ev_spec)

    def kernel(sc_ref, y0_ref, *rest):
        rest = list(rest)
        par_ref = rest.pop(0) if n_par else None
        yout_ref, stat_ref, nstep_ref, nfev_ref = rest[:4]
        rest = rest[4:]
        yq_ref = rest.pop(0) if nq else None
        if n_ev:
            tev_ref, yev_ref, fev_ref = rest[:3]
        y = y0_ref[:].T.reshape(n, sub, 128)
        if n_par:
            prt = par_ref[:].T.reshape(n_par, sub, 128)
            p = tuple(prt[j] for j in range(n_par))
            fun1 = lambda t, yy: fun(t, yy, p)            # noqa: E731
            wrap = lambda g: (lambda t, yy: g(t, yy, p))  # noqa: E731
        else:
            fun1 = fun
            wrap = lambda g: g                            # noqa: E731
        ev_spec_k = (None if ev_spec is None else
                     [(wrap(ge), tm, dr) for ge, tm, dr in ev_spec])
        fzero = y[0] * 0.0
        izero = fzero.astype(jnp.int32)
        t = sc_ref[0] + fzero
        tf_r = sc_ref[1] + fzero
        rtol_r = sc_ref[2] + fzero
        atol_r = sc_ref[3] + fzero
        dir_r = sc_ref[4] + fzero
        h_abs0 = sc_ref[5] + fzero
        f = fun1(t, y)

        nfev_init = izero + 1
        if first_step is None:
            # in-kernel Watts h_start (steppers/ckdisc.py:96 semantics)
            from ._hstart_tile import hstart_tile
            bq = t + dir_r * jnp.minimum(
                jnp.abs(tf_r - t),
                jnp.zeros_like(t) + (np.inf if max_step is None
                                     else float(max_step)))
            h_abs0 = jnp.abs(hstart_tile(
                fun1, t, bq, y, f, tab.order_secondary, rtol_r, atol_r,
                mnorm=_member_norm,
                msum=lambda x: jnp.sum(x, axis=0),
                mmin=lambda x: jnp.min(x, axis=0), n=n))
            nfev_init = izero + 2 + min(n + 1, 3)

        st = _run_ck_loop(
            fun1, tables, max_steps, nq, tq_vals, fzero, izero,
            _member_norm, lambda yy: [yy[j] for j in range(n)],
            jnp.stack, t, tf_r, dir_r, rtol_r, atol_r, h_abs0, y, f,
            ev_spec=ev_spec_k, nfev0=nfev_init, max_step=max_step)

        yout_ref[:] = st.y.reshape(n, bm).T
        stat_ref[:] = st.status.reshape(1, bm)
        nstep_ref[:] = st.nstep.reshape(1, bm)
        nfev_ref[:] = st.nfev.reshape(1, bm)
        if nq:
            for q in range(nq):
                unreached = dir_r * tq_vals[q] > dir_r * st.t
                rows_q = [_fblend(unreached, st.y[j],
                                  st.qrows[q][j])
                          for j in range(n)]
                yq_ref[q] = jnp.stack(rows_q).reshape(n, bm).T
        if n_ev:
            _, evf, ev_t, ev_rows = st.ev
            for i in range(n_ev):
                tev_ref[i] = ev_t[i].reshape(1, bm)
                yev_ref[i] = jnp.stack(ev_rows[i]).reshape(n, bm).T
                fev_ref[i] = evf[i].reshape(1, bm)

    n_padded = y0_batch.shape[0]
    out_shapes = [
        jax.ShapeDtypeStruct((n_padded, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n_padded), jnp.int32),
        jax.ShapeDtypeStruct((1, n_padded), jnp.int32),
        jax.ShapeDtypeStruct((1, n_padded), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((bm, n), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    if nq:
        out_shapes.append(
            jax.ShapeDtypeStruct((nq, n_padded, n), jnp.float32))
        out_specs.append(
            pl.BlockSpec((nq, bm, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM))
    if n_ev:
        out_shapes += [
            jax.ShapeDtypeStruct((n_ev, 1, n_padded), jnp.float32),
            jax.ShapeDtypeStruct((n_ev, n_padded, n), jnp.float32),
            jax.ShapeDtypeStruct((n_ev, 1, n_padded), jnp.int32),
        ]
        out_specs += [
            pl.BlockSpec((n_ev, 1, bm), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ev, bm, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ev, 1, bm), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((bm, n), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [scalars, y0_batch]
    if n_par:
        in_specs.append(pl.BlockSpec((bm, n_par), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(params)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(*args)

    y_out, status, nsteps, nfev = outs[:4]
    y_out = y_out[:n_total]
    ret = (y_out, status[0, :n_total], nsteps[0, :n_total],
           nfev[0, :n_total])
    k = 4
    if nq:
        ret = ret + (outs[k][:, :n_total],)
        k += 1
    if n_ev:
        tev, yev, fev = outs[k], outs[k + 1], outs[k + 2]
        fired = fev[:, 0, :n_total]
        nanv = jnp.float32(np.nan)
        t_events = jnp.where(fired != 0, tev[:, 0, :n_total], nanv)
        y_events = jnp.where((fired != 0)[:, :, None],
                             yev[:, :n_total], nanv)
        ret = ret + (t_events, y_events, fired)
    return ret
