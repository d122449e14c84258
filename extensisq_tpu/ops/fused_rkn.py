"""Fused Pallas ensemble solver for Runge-Kutta-Nyström methods.

Same architecture as :mod:`fused_erk` — the entire adaptive
integration of a second-order ensemble in ONE TPU kernel — specialized
to the partitioned form: the state is (u, v) with ``u' = v``,
``v' = acc(t, u, v)``, stages store accelerations only, displacement
updates use h²·A and velocity updates h·Ap
(reference structure: /root/reference/extensisq/common.py:1207-1310).

``acc(t, u, v) -> a`` with u, v, a of shape (m, 8, 128) must be
row-indexed elementwise jnp code, like the fused-ERK RHS convention.

All fused-ERK Mosaic workarounds and the mixed-precision
(``compensated=True``) machinery apply unchanged; see fused_erk.py.
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.controller import resolve_controller
from .fused_erk import (_RUNNING, _FINISHED, _TOO_SMALL, _OVERFLOW,
                        _EVENT, _fblend, _iblend, _sanitize,
                        _member_norm, _two_sum, _comp_wsum, _df_add,
                        _hermite_tiles, _make_ev_spec, _handle_events)
from .fused_dense import _REC_UNSET


class _RS(NamedTuple):
    """Layout-generic while-loop carry for the fused RKN loop."""
    it: Any
    tf: Any
    direction: Any
    rtol: Any
    atol: Any
    t: Any
    t_lo: Any
    u: Any
    u_lo: Any
    v: Any
    v_lo: Any
    f: Any
    h_abs: Any
    status: Any
    std_sc: Any
    err_old: Any
    h_prev: Any
    max_fac: Any
    fresh: Any
    rejected: Any
    min_step: Any
    nstep: Any
    nfev: Any
    qrows: Any  # (nq) of (u, v) snapshot pairs
    ev: Any     # (gprev, fired, ev_t, ev_rows) event tuples


def _run_rkn_loop(acc, consts, cc, compensated, max_steps, nq, tq_vals,
                  fzero, izero, mnorm, cat,
                  t, tf_r, dir_r, rtol_r, atol_r, h_abs0, u, v, f,
                  ev_spec=None, split_part=None, join_rows=None,
                  unsplit=None, nfev0=None, max_step=None,
                  record=None):
    """The whole adaptive RKN integration loop, LAYOUT-GENERIC.

    Shared by the two fused-RKN member layouts (the fused-ERK split,
    see fused_erk._run_erk_loop):

    * ``solve_fused_rkn`` — members on the 128-lane axis, state rows
      unrolled: u, v (m, sub, 128), per-member scalars (sub, 128);
    * ``solve_fused_rkn_grid`` — state on the lane axis, members on
      sublanes: u, v (bm, n), per-member scalars (bm, 1).

    ``mnorm`` reduces the state axis to a member-scalar tile and
    ``cat`` concatenates the u/v partitions along the state axis for
    the combined error norm.  ``consts`` is the static tableau tuple
    (A, Ap, B_w, Bp, C, E, Ep, s, fsal, h_min_a, tiny_err).
    Returns the final ``_RS`` carry.

    ``record``: optional ``record(it, upd, t_out, u_out, v_out,
    f_out)`` in-kernel dense-recording hook, called once per loop
    iteration with the committed carry values (the cubic Hermite of
    [u, v] with derivative [v, a] is this family's interpolant).
    ``ev_spec``: None or the static (g, terminal, direction) event
    triples from fused_erk._make_ev_spec.  The partitioned state
    plugs into the shared ``_handle_events`` as-is: the cubic Hermite
    of [u, v] with derivative [v, a] IS the partitioned interpolant
    the t_eval path uses, so event rows are y = u-rows + v-rows with
    derivative rows v-rows + a-rows.  ``split_part`` splits one
    partition array into hermite rows, ``join_rows`` builds the state
    object g sees from 2m rows, ``unsplit`` inverts it into
    (u_arr, v_arr) for the terminal-truncation blend.
    """
    A, Ap, B_w, Bp, C, E, Ep, s, fsal, h_min_a, tiny_err = consts
    n_ev = 0 if ev_spec is None else len(ev_spec)

    def _wsum(rows, w):
        acc_ = None
        for wi, r in zip(w, rows):
            if wi == 0.0:
                continue
            term = wi * r
            acc_ = term if acc_ is None else acc_ + term
        return jnp.zeros_like(rows[0]) if acc_ is None else acc_

    def _dot(rows, w):
        if compensated:
            hi, lo = _comp_wsum(rows, w)
            return hi, lo
        return _wsum(rows, w), None


    def cond(st):
        return jnp.max(_iblend(st.status == _RUNNING,
                               izero + 1, izero)) > 0

    def body(st):
        tf = st.tf
        direction = st.direction
        rtol = st.rtol
        atol = st.atol
        running = st.status == _RUNNING
        fresh_b = st.fresh != 0
        rejected_b = st.rejected != 0
        std_b = st.std_sc != 0

        ms = jnp.maximum(h_min_a * (jnp.abs(st.t) + st.h_abs),
                         tiny_err)
        h_pre = jnp.maximum(st.h_abs, ms)
        if max_step is not None:
            h_pre = jnp.minimum(h_pre, float(max_step))
        d = jnp.abs(tf - st.t)
        split = (d < 2.0 * h_pre) & (d > h_pre)
        h_f = _fblend(split, jnp.maximum(0.5 * d, ms),
                      _fblend(d <= h_pre, d, h_pre))
        h_abs = _fblend(fresh_b, h_f, st.h_abs)
        min_step = _fblend(fresh_b, ms, st.min_step)
        std_b = std_b | (fresh_b & split)

        too_small = h_abs < min_step
        h = h_abs * direction
        hh = h * h

        # stages: K rows are accelerations (common.py:1281-1287)
        rows = [st.f]
        for i in range(1, s):
            du = hh * _wsum(rows, A[i, :i]) + (C[i] * h) * st.v
            dv = h * _wsum(rows, Ap[i, :i])
            if compensated:
                du = du + st.u_lo
                dv = dv + st.v_lo
            rows.append(acc(st.t + C[i] * h, st.u + du, st.v + dv))

        bs, bc = _dot(rows, B_w)
        ps, pc = _dot(rows, Bp)
        if compensated:
            u_hi, u_l1 = _df_add(st.u, st.u_lo, h * st.v)
            u_hi, u_l2 = _two_sum(u_hi, u_l1 + hh * bs)
            u_new, u_lo_new = _two_sum(u_hi, u_l2 + hh * bc)
            v_hi, v_l1 = _df_add(st.v, st.v_lo, h * ps)
            v_new, v_lo_new = _two_sum(v_hi, v_l1 + h * pc)
        else:
            u_new = st.u + h * st.v + hh * bs
            v_new = st.v + h * ps
            u_lo_new = st.u_lo
            v_lo_new = st.v_lo
        if fsal:
            rows.append(acc(st.t + h, u_new, v_new))
        mm = s + (1 if fsal else 0)
        es, ec = _dot(rows[:mm], E[:mm])
        eps_, epc = _dot(rows[:mm], Ep[:mm])
        if compensated:
            err_u = hh * (es + ec)
            err_v = h * (eps_ + epc)
        else:
            err_u = hh * es
            err_v = h * eps_
        err = cat(err_u, err_v)
        scale = atol + rtol * jnp.maximum(
            jnp.abs(cat(st.u, st.v)),
            jnp.abs(cat(u_new, v_new)))
        err_norm = mnorm(err / scale)
        err_norm, bad_e = _sanitize(err_norm)
        err_norm = err_norm + bad_e.astype(jnp.float32) * 10.0

        accepted = (err_norm < 1.0) & ~too_small & running

        err_c = jnp.maximum(err_norm, 1e-30)
        f_std = cc.safety * err_c ** cc.error_exponent
        hr = h / _fblend(st.h_prev == 0.0, h, st.h_prev)
        f_2nd = jnp.clip(
            cc.safety_sc * err_c ** cc.minbeta1
            * jnp.maximum(st.err_old, 1e-30) ** cc.minbeta2
            * hr ** cc.minalpha, cc.min_factor, st.max_fac)
        is_tiny = err_norm < tiny_err
        fac_acc = _fblend(is_tiny, st.max_fac,
                          _fblend(std_b, f_std, f_2nd))
        fac_acc = _fblend(rejected_b, jnp.minimum(1.0, fac_acc),
                          fac_acc)
        std_after = _iblend(is_tiny, izero + 1,
                            _iblend(std_b, izero, st.std_sc))
        max_fac_new = _fblend(fac_acc < 4.0, fzero + 4.0,
                              st.max_fac)
        fac_rej = jnp.maximum(
            cc.min_factor, cc.safety * err_c ** cc.error_exponent)
        h_abs_next = h_abs * _fblend(accepted, fac_acc, fac_rej)
        h_abs_next, _ = _sanitize(h_abs_next)

        status = _iblend(running & too_small, izero + _TOO_SMALL,
                         _iblend(running & bad_e,
                                 izero + _OVERFLOW, st.status))

        is_last = accepted & (h_abs >= d)
        if compensated:
            t_adv, t_lo_adv = _df_add(st.t, st.t_lo, h)
            t_new = _fblend(is_last, tf, t_adv)
            t_lo_new = _fblend(is_last, fzero, t_lo_adv)
        else:
            t_new = _fblend(is_last, tf, st.t + h)
            t_lo_new = st.t_lo
        status = _iblend((status == _RUNNING) & is_last,
                         izero + _FINISHED, status)

        if fsal:
            f_new = rows[s]
        else:
            f_new = acc(t_new, u_new, v_new)
        u_new, _ = _sanitize(u_new)
        v_new, _ = _sanitize(v_new)
        f_new, _ = _sanitize(f_new)

        upd = accepted
        dfev = _iblend(running, izero + (s if fsal else s - 1),
                       izero)
        if not fsal:
            dfev = dfev + _iblend(upd, izero + 1, izero)
        hit_cap = (st.it + 1 >= max_steps) & (status == _RUNNING)
        status = _iblend(hit_cap, izero + _OVERFLOW, status)

        # t_eval snapshots: partitioned cubic Hermite — u rows
        # with derivative v, v rows with the carried acceleration
        # (common.py:766-790 evaluation form)
        qrows_new = st.qrows
        if nq:
            h_safe = _fblend(h == 0.0, fzero + 1.0, h)
            qrows_new = []
            for q in range(nq):
                tqc = tq_vals[q]
                crossed = (upd
                           & (direction * (tqc - st.t) > 0.0)
                           & (direction * tqc
                              <= direction * t_new))
                theta = (tqc - st.t) / h_safe
                qu = _hermite_tiles(theta, h, [st.u], [st.v],
                                    [u_new], [v_new])[0]
                qv = _hermite_tiles(theta, h, [st.v], [st.f],
                                    [v_new], [f_new])[0]
                crm = jnp.broadcast_to(crossed, st.u.shape)
                qrows_new.append(
                    (_fblend(crm, qu, st.qrows[q][0]),
                     _fblend(crm, qv, st.qrows[q][1])))
            qrows_new = tuple(qrows_new)

        # events: the shared handler on the PARTITIONED rows — the
        # cubic Hermite of [u, v] with derivative [v, a] is exactly
        # the partitioned interpolant above
        ev_new = st.ev
        trunc = izero != izero
        te = fzero
        y_te_rows = None
        if n_ev:
            h_safe_e = _fblend(h == 0.0, fzero + 1.0, h)
            y_old_rows = split_part(st.u) + split_part(st.v)
            f_old_rows = split_part(st.v) + split_part(st.f)
            y_new_rows = split_part(u_new) + split_part(v_new)
            f_new_rows = split_part(v_new) + split_part(f_new)
            ev_new, trunc, te, y_te_rows = _handle_events(
                ev_spec, st.ev, upd, direction, st.t, t_new, h,
                h_safe_e, y_old_rows, f_old_rows, y_new_rows,
                f_new_rows, fzero, izero, join_rows)
            status = _iblend(trunc, izero + _EVENT, status)

        updm = jnp.broadcast_to(upd, st.u.shape)
        t_out = _fblend(upd, t_new, st.t)
        t_lo_out = _fblend(upd, t_lo_new, st.t_lo)
        u_out = _fblend(updm, u_new, st.u)
        v_out = _fblend(updm, v_new, st.v)
        if n_ev and y_te_rows is not None:
            u_te, v_te = unsplit(y_te_rows)
            truncm = jnp.broadcast_to(trunc, st.u.shape)
            u_out = _fblend(truncm, u_te, u_out)
            v_out = _fblend(truncm, v_te, v_out)
            t_out = _fblend(trunc, te, t_out)
            t_lo_out = _fblend(trunc, fzero, t_lo_out)
        if record is not None:
            record(st.it, upd, t_out, u_out, v_out,
                   _fblend(updm, f_new, st.f))
        return _RS(
            it=st.it + 1,
            tf=st.tf, direction=st.direction,
            rtol=st.rtol, atol=st.atol,
            t=t_out,
            t_lo=t_lo_out,
            u=u_out,
            u_lo=_fblend(updm, u_lo_new, st.u_lo),
            v=v_out,
            v_lo=_fblend(updm, v_lo_new, st.v_lo),
            f=_fblend(updm, f_new, st.f),
            h_abs=_fblend(running, h_abs_next, st.h_abs),
            status=status,
            std_sc=_iblend(upd, std_after, st.std_sc),
            err_old=_fblend(upd, err_norm, st.err_old),
            h_prev=_fblend(upd, h, st.h_prev),
            max_fac=_fblend(upd, max_fac_new, st.max_fac),
            fresh=_iblend(upd | (status != _RUNNING), izero + 1,
                          izero),
            rejected=_iblend(upd, izero,
                             _iblend(rejected_b
                                     | (running & ~accepted),
                                     izero + 1, izero)),
            min_step=min_step,
            nstep=st.nstep + _iblend(upd, izero + 1, izero),
            nfev=st.nfev + dfev,
            qrows=qrows_new,
            ev=ev_new,
        )

    # snapshot rows start at (u0, v0): covers points at/before t0
    qrows0 = tuple((u, v) for _ in range(nq))
    if n_ev:
        rows0 = tuple(split_part(u) + split_part(v))
        ev0 = (tuple(ge(t, join_rows(list(rows0)))
                     for ge, _, _ in ev_spec),
               tuple(izero for _ in range(n_ev)),
               tuple(fzero for _ in range(n_ev)),
               tuple(rows0 for _ in range(n_ev)))
    else:
        ev0 = ()
    st0 = _RS(
        it=jnp.zeros((), jnp.int32),
        tf=tf_r, direction=dir_r, rtol=rtol_r, atol=atol_r,
        t=t, t_lo=fzero, u=u, u_lo=u * 0.0, v=v, v_lo=v * 0.0,
        f=f, h_abs=h_abs0,
        status=izero, std_sc=izero + 1, err_old=fzero + 1.0,
        h_prev=fzero, max_fac=fzero + 10.0, fresh=izero + 1,
        rejected=izero, min_step=fzero, nstep=izero,
        nfev=izero + 1 if nfev0 is None else nfev0,
        qrows=qrows0, ev=ev0)
    return jax.lax.while_loop(cond, body, st0)

def solve_fused_rkn(acc, t_span, y0_batch, method=None, rtol=1e-4,
                    atol=1e-6, first_step=None, max_steps=100_000,
                    block_members=1024, interpret=False,
                    compensated=False, t_eval=None, events=None,
                    max_step=None, params=None, dense=None):
    """Integrate an ensemble of small 2nd-order systems in one kernel.

    y0_batch: (B, 2m) float32 — [u, v] per member.  Returns
    (y_final (B, 2m), status (B,), nsteps (B,), nfev (B,)).

    ``t_eval``: optional increasing snapshot times, interpolated FROM
    INSIDE the kernel as each member crosses each point
    (common.py:766-790 evaluation form, partitioned: u rows take
    cubic Hermite with derivative v, v rows with the carried
    acceleration).  Appends ``y_eval`` (len(t_eval), B, 2m).

    ``events``: optional callable(s) ``g(t, y)`` over the row-stacked
    full state (y[j] for j < m displacements, j >= m velocities) with
    the reference's ``terminal``/``direction`` attributes.  In-kernel
    Hermite bisection on the PARTITIONED interpolant (u from (u, v),
    v from (v, a)); appends (t_events (n_ev, B), y_events
    (n_ev, B, 2m), n_events (n_ev, B)) like ``solve_fused_erk``;
    terminal events truncate with status 8.

    ``params``: optional (B, k) float32 per-member scalar parameters;
    when given, ``acc`` is called as ``acc(t, u, v, p)`` and every
    event callable as ``g(t, y, p)`` with ``p`` a k-tuple of
    per-member tiles broadcastable against the state rows.

    ``dense``: optional int ``R`` — record up to ``R`` per-step
    ``(t, [u, v], [v, a])`` rows in-kernel and append the evaluable
    per-member :class:`~extensisq_tpu.ops.fused_dense.
    FusedDenseSolution` as the LAST return element.  The recorded
    interpolant is CUBIC HERMITE on accepted-step endpoints with the
    partitioned derivative ([v, a] — u rows interpolate with slope v,
    v rows with the acceleration), the same convention as
    ``solve_fused_rkn_grid``; the f64 XLA path keeps the conformance
    (Nyström/quintic) dense output.
    """
    if method is None:
        from ..methods import Fi5N as method
    tab = method.tableau
    A = np.asarray(tab.A, dtype=np.float32)
    Ap = (np.zeros_like(A) if tab.Ap is None
          else np.asarray(tab.Ap, dtype=np.float32))
    B_w = np.asarray(tab.B, dtype=np.float32)
    Bp = np.asarray(tab.Bp, dtype=np.float32)
    C = np.asarray(tab.C, dtype=np.float32)
    E = np.asarray(tab.E, dtype=np.float32)
    Ep = np.asarray(tab.Ep, dtype=np.float32)
    s = tab.n_stages
    fsal = bool(Ep[-1] != 0.0)
    err_order = min(tab.order_secondary, tab.order)
    cc = resolve_controller(None, tab.sc_params, -1.0 / (err_order + 1))
    eps32 = float(np.finfo(np.float32).eps)
    tiny_err = float(np.sqrt(np.finfo(np.float32).tiny))
    h_min_a = 10.0 * eps32 / tab.c_spacing()

    y0_batch = jnp.asarray(y0_batch, jnp.float32)
    n_total, n = y0_batch.shape
    if n % 2:
        raise ValueError("state must be [u, v] with even length")
    m = n // 2
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

    n_rec = 0 if dense is None else int(dense)
    if n_rec:
        # (R, n, bm) rows: n on SUBLANES (pads to 8), members on the
        # lane axis — same budget rule as the flat ERK recorder
        vmem = (2 * -(-n // 8) * 8 + 8) * n_rec * bm * 4
        if vmem > 6 * 2 ** 20:
            raise ValueError(
                f"dense={n_rec} recording needs {vmem / 2**20:.1f} MiB "
                f"of VMEM at block_members={bm}; lower block_members "
                "(the buffers scale with it) or record fewer rows")

    def kernel(sc_ref, y0_ref, *rest):
        rest = list(rest)
        par_ref = rest.pop(0) if n_par else None
        yout_ref, stat_ref, nstep_ref, nfev_ref = rest[:4]
        rest = rest[4:]
        yq_ref = rest.pop(0) if nq else None
        if n_ev:
            tev_ref, yev_ref, fev_ref = rest[:3]
            rest = rest[3:]
        if n_rec:
            rect_ref, recy_ref, recf_ref, f0_ref = rest[:4]
        yin = y0_ref[:].T.reshape(n, sub, 128)
        u = yin[:m]
        v = yin[m:]
        if n_par:
            prt = par_ref[:].T.reshape(n_par, sub, 128)
            p = tuple(prt[j] for j in range(n_par))
            acc1 = lambda t, uu, vv: acc(t, uu, vv, p)    # noqa: E731
            wrap = lambda g: (lambda t, yy: g(t, yy, p))  # noqa: E731
        else:
            acc1 = acc
            wrap = lambda g: g                            # noqa: E731
        ev_spec_k = (None if ev_spec is None else
                     [(wrap(ge), tm, dr) for ge, tm, dr in ev_spec])
        fzero = u[0] * 0.0
        izero = fzero.astype(jnp.int32)
        t = sc_ref[0] + fzero
        tf_r = sc_ref[1] + fzero
        rtol_r = sc_ref[2] + fzero
        atol_r = sc_ref[3] + fzero
        dir_r = sc_ref[4] + fzero
        h_abs0 = sc_ref[5] + fzero
        f = acc1(t, u, v)

        nfev0 = None
        if first_step is None:
            # in-kernel Watts h_start on the first-order form
            # (steppers/rkn.py:81 semantics)
            from ._hstart_tile import hstart_tile

            def df_full(tt, Y):
                return jnp.concatenate([Y[m:], acc1(tt, Y[:m], Y[m:])])

            bq = t + dir_r * jnp.minimum(
                jnp.abs(tf_r - t),
                jnp.zeros_like(t) + (np.inf if max_step is None
                                     else float(max_step)))
            yfull = jnp.concatenate([u, v])
            ffull = jnp.concatenate([v, f])
            h_abs0 = jnp.abs(hstart_tile(
                df_full, t, bq, yfull, ffull, tab.order_secondary,
                rtol_r, atol_r, mnorm=_member_norm,
                msum=lambda x: jnp.sum(x, axis=0),
                mmin=lambda x: jnp.min(x, axis=0), n=n))
            nfev0 = izero + 2 + min(n + 1, 3)

        record = None
        if n_rec:
            f0_ref[:] = jnp.concatenate([v, f]).reshape(n, bm).T
            # non-accepted / never-reached rows read the sentinel
            # (arithmetic blends forbid NaN coding: 0 * NaN = NaN)
            rect_ref[:] = jnp.full((n_rec, 1, bm), _REC_UNSET,
                                   jnp.float32)

            def record(itv, upd, t_out, u_out, v_out,  # noqa: F811
                       f_out):
                @pl.when(itv < n_rec)
                def _():
                    rect_ref[itv] = _fblend(
                        upd, t_out, fzero + _REC_UNSET).reshape(1, bm)
                    recy_ref[itv] = jnp.concatenate(
                        [u_out, v_out]).reshape(n, bm)
                    recf_ref[itv] = jnp.concatenate(
                        [v_out, f_out]).reshape(n, bm)

        st = _run_rkn_loop(
            acc1, (A, Ap, B_w, Bp, C, E, Ep, s, fsal, h_min_a,
                   tiny_err), cc, compensated, max_steps, nq, tq_vals,
            fzero, izero, _member_norm,
            lambda a, b: jnp.concatenate([a, b]),
            t, tf_r, dir_r, rtol_r, atol_r, h_abs0, u, v, f,
            ev_spec=ev_spec_k,
            split_part=lambda arr: [arr[j] for j in range(m)],
            join_rows=jnp.stack,
            unsplit=lambda rows: (jnp.stack(rows[:m]),
                                  jnp.stack(rows[m:])),
            nfev0=nfev0, max_step=max_step, record=record)

        yout_ref[:] = jnp.concatenate([st.u, st.v]).reshape(n, bm).T
        stat_ref[:] = st.status.reshape(1, bm)
        nstep_ref[:] = st.nstep.reshape(1, bm)
        nfev_ref[:] = st.nfev.reshape(1, bm)
        if nq:
            # flush points the member never reached with the final y
            for q in range(nq):
                unreached = jnp.broadcast_to(
                    dir_r * tq_vals[q] > dir_r * st.t, st.u.shape)
                qu = _fblend(unreached, st.u, st.qrows[q][0])
                qv = _fblend(unreached, st.v, st.qrows[q][1])
                yq_ref[q] = jnp.concatenate([qu, qv]).reshape(n, bm).T
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
    if n_rec:
        out_shapes += [
            jax.ShapeDtypeStruct((n_rec, 1, n_padded), jnp.float32),
            jax.ShapeDtypeStruct((n_rec, n, n_padded), jnp.float32),
            jax.ShapeDtypeStruct((n_rec, n, n_padded), jnp.float32),
            jax.ShapeDtypeStruct((n_padded, n), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((n_rec, 1, bm), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rec, n, bm), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rec, n, bm), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, n), lambda i: (i, 0),
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
            out_specs=out_specs,
            out_shape=out_shapes,
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
        k += 3
    if n_rec:
        from .fused_dense import build_fused_dense
        rect, recy, recf, f0 = outs[k:k + 4]
        rect = rect[:, 0, :n_total]
        flags = (rect < 0.5 * _REC_UNSET).astype(jnp.int32)
        sol = build_fused_dense(
            t0, tf, y0_batch[:n_total], f0[:n_total],
            jnp.where(flags != 0, rect, 0.0), flags,
            jnp.swapaxes(recy[:, :, :n_total], 1, 2),
            jnp.swapaxes(recf[:, :, :n_total], 1, 2), ret[2])
        ret = ret + (sol,)
    return ret
