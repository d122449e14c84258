"""Fused Pallas CKdisc solver for MID-SIZE non-smooth systems:
states on lanes.

``fused_ckdisc`` unrolls the state dimension as separate member-tile
rows, capping it at small n — leaving mid-size NON-SMOOTH systems
(n ~ 128-512: discontinuous-forcing method-of-lines models, switched
networks, piecewise-defined reaction systems — the workloads CKdisc
exists for, cash.py:115-165) with only the dispatch-bound XLA device
path.  This kernel closes the last cell of the family×layout matrix
with the same transposed layout the other ``*_grid`` kernels use:

* the STATE occupies the 128-lane vector axis (n a multiple of 128 —
  pad the system; lane padding would corrupt stencil rolls, so it is
  required, not faked);
* MEMBERS occupy sublanes: per-member scalars (t, h, twiddle/quit
  factors, error ratios) are (bm, 1) column tiles broadcast against
  (bm, n) state arrays;
* further members run over the pallas grid dimension.

The quit/twiddle cascade itself (staged E1/E2/E4 assessments,
adaptive twiddle/quit factors, reduced-order fallback acceptance at
c = 1/5, 3/5, t_eval snapshots, events) is IDENTICAL to
``fused_ckdisc``: both layouts run ``fused_ckdisc._run_ck_loop``,
which is shape-polymorphic over the member-scalar/state tile shapes
(cash.py:253-394 semantics == steppers/ckdisc.py).

The RHS convention matches the other grid kernels: ``fun(t, y)``
receives t (bm, 1) and y (bm, n) and returns (bm, n) — elementwise
along the lane axis, stencils via ``jnp.roll(y, s, -1)``.

f32 only; the XLA f64 path (steppers/ckdisc.py) is the conformance
solver.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import _lane_pad as _lp
from .fused_erk import _fblend, _make_ev_spec
from .fused_ckdisc import _ck_tables, _run_ck_loop


def solve_fused_ckdisc_grid(fun, t_span, y0_batch, rtol=1e-4,
                            atol=1e-6, first_step=None,
                            max_steps=100_000, block_members=32,
                            interpret=False, t_eval=None, events=None,
                            max_step=None, params=None):
    """Integrate a mid-size-system ensemble with the CKdisc
    variable-order cascade in one Pallas kernel.

    y0_batch: (B, n) float32, ANY n — non-multiples of 128 are
    zero-padded internally with inert masked lanes (ops/_lane_pad.py;
    ``fun`` and event callables still see exactly n lanes, the step
    sequence equals the unpadded problem's exactly; requires
    atol > 0).  ``fun(t, y)``: t (bm, 1), y (bm, n) ->
    (bm, n), vectorized over the member sublanes.  Returns
    (y_final (B, n), status (B,), nsteps (B,), nfev (B,)); ``t_eval``
    appends y_eval (len(t_eval), B, n), cubic Hermite over the
    accepted sub-steps (the stepper's fallback interpolant,
    cash.py:408-416).  ``events``: callable(s) g(t, y) -> (bm, 1)
    member column (reduce the lane axis yourself), with the
    reference's ``terminal``/``direction`` protocol; appends
    (t_events, y_events, n_events) exactly like
    ``solve_fused_erk_grid``.  ``params``: optional (B, k) float32
    per-member scalars; the RHS and event callables then take a third
    argument ``p``, a k-tuple of (bm, 1) member columns.
    """
    tables, tab = _ck_tables()

    y0_batch = jnp.asarray(y0_batch, jnp.float32)
    n_total, n_true = y0_batch.shape
    n = _lp.pad_width(n_true)
    if n != n_true and not atol > 0.0:
        raise ValueError("masked lane padding (n not a multiple of "
                         "128) requires atol > 0: pad-lane error "
                         "weights are atol exactly")
    y0_batch = _lp.pad_lanes(y0_batch, n)
    bm = block_members
    if bm % 8:
        raise ValueError("block_members must be a multiple of 8")
    pad = (-n_total) % bm
    if pad:
        y0_batch = jnp.concatenate(
            [y0_batch, jnp.tile(y0_batch[-1:], (pad, 1))])
    B = y0_batch.shape[0]
    grid = B // bm

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
        y = y0_ref[:]
        if n_par:
            pv = par_ref[:]
            p = tuple(pv[:, j:j + 1] for j in range(n_par))
            fun1 = lambda t, yy: fun(t, yy, p)            # noqa: E731
            wrap = lambda g: (lambda t, yy: g(t, yy, p))  # noqa: E731
        else:
            fun1 = fun
            wrap = lambda g: g                            # noqa: E731
        # masked lane padding: arbitrary n rides the kernel with the
        # EXACT unpadded step sequence (see ops/_lane_pad.py)
        lt = _lp.lane_tools(bm, n, n_true)
        mnorm, msum, mmin = lt.mnorm, lt.msum, lt.mmin
        fun1 = lt.wrap_fun(fun1)
        ev_spec_k = (None if ev_spec is None else
                     [(lt.wrap_obs(wrap(ge)), tm, dr)
                      for ge, tm, dr in ev_spec])
        # distributed-layout member-scalar zeros, derived from runtime
        # data so they cannot fold into replicated splats (fused_erk)
        fzero = y[:, :1] * 0.0
        izero = fzero.astype(jnp.int32)
        t = sc_ref[0] + fzero
        tf_r = sc_ref[1] + fzero
        rtol_r = sc_ref[2] + fzero
        atol_r = sc_ref[3] + fzero
        dir_r = sc_ref[4] + fzero
        h_abs0 = sc_ref[5] + fzero
        f = fun1(t, y)

        nfev0 = izero + 1
        if first_step is None:
            # in-kernel Watts h_start (steppers/ckdisc.py:96 semantics)
            from ._hstart_tile import hstart_tile
            bq = t + dir_r * jnp.minimum(
                jnp.abs(tf_r - t),
                jnp.zeros_like(t) + (np.inf if max_step is None
                                     else float(max_step)))
            h_abs0 = jnp.abs(hstart_tile(
                fun1, t, bq, y, f, tab.order_secondary, rtol_r, atol_r,
                mnorm=mnorm, msum=msum, mmin=mmin, n=n_true))
            nfev0 = izero + 2 + min(n_true + 1, 3)

        st = _run_ck_loop(
            fun1, tables, max_steps, nq, tq_vals, fzero, izero,
            mnorm, lambda yy: [yy], lambda rows: rows[0],
            t, tf_r, dir_r, rtol_r, atol_r, h_abs0, y, f,
            ev_spec=ev_spec_k, nfev0=nfev0, max_step=max_step)

        yout_ref[:] = st.y
        stat_ref[:] = st.status
        nstep_ref[:] = st.nstep
        nfev_ref[:] = st.nfev
        if nq:
            # flush points the member never reached with its final y
            for q in range(nq):
                unreached = dir_r * tq_vals[q] > dir_r * st.t
                yq_ref[q] = _fblend(unreached, st.y, st.qrows[q][0])
        if n_ev:
            _, evf, ev_t, ev_rows = st.ev
            for i in range(n_ev):
                tev_ref[i] = ev_t[i]
                yev_ref[i] = ev_rows[i][0]
                fev_ref[i] = evf[i]

    out_shapes = [
        jax.ShapeDtypeStruct((B, n), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((bm, n), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if nq:
        out_shapes.append(
            jax.ShapeDtypeStruct((nq, B, n), jnp.float32))
        out_specs.append(
            pl.BlockSpec((nq, bm, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM))
    if n_ev:
        out_shapes += [
            jax.ShapeDtypeStruct((n_ev, B, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_ev, B, n), jnp.float32),
            jax.ShapeDtypeStruct((n_ev, B, 1), jnp.int32),
        ]
        out_specs += [
            pl.BlockSpec((n_ev, bm, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ev, bm, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ev, bm, 1), lambda i: (0, i, 0),
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
    # trace with x64 OFF: TPU Pallas has no 64-bit types and the
    # library enables x64 globally (weak literals would promote)
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
    ret = (y_out[:n_total, :n_true], status[:n_total, 0],
           nsteps[:n_total, 0], nfev[:n_total, 0])
    k = 4
    if nq:
        ret = ret + (outs[k][:, :n_total, :n_true],)
        k += 1
    if n_ev:
        tev, yev, fev = outs[k], outs[k + 1], outs[k + 2]
        fired = fev[:, :n_total, 0]
        nanv = jnp.float32(np.nan)
        t_events = jnp.where(fired != 0, tev[:, :n_total, 0], nanv)
        y_events = jnp.where((fired != 0)[:, :, None],
                             yev[:, :n_total, :n_true], nanv)
        ret = ret + (t_events, y_events, fired)
    return ret
