"""Fused Pallas ERK solver for MID-SIZE systems: states on lanes.

``fused_erk`` unrolls the state dimension as separate member-tile
rows, which caps it at small n — leaving mid-size nonstiff systems
(n ~ 16-512: method-of-lines advection/reaction PDEs, oscillator
chains, reaction networks) with only the dispatch-bound XLA device
path.  This kernel closes that hole with the same transposed layout
``fused_adams_grid`` uses for multistep work:

* the STATE occupies the 128-lane vector axis; any n is accepted —
  non-multiples of 128 are zero-padded internally with INERT masked
  lanes (ops/_lane_pad.py: masked RHS, true-n norms), preserving the
  unpadded step sequence exactly;
* MEMBERS occupy sublanes: each block integrates ``block_members``
  members, per-member scalars (t, h, error ratios, controller state)
  are (bm, 1) column tiles broadcast against (bm, n) state arrays;
* further members run over the pallas grid dimension.

The adaptive loop itself (stages, embedded error, accept/reject
controller, t_eval snapshots, compensated mixed-precision mode) is
IDENTICAL to ``fused_erk``: both layouts run
``fused_erk._run_erk_loop``, which is shape-polymorphic over the
member-scalar/state tile shapes.

The RHS convention matches the other grid kernels: ``fun(t, y)``
receives t (bm, 1) and y (bm, n) and returns (bm, n) — elementwise
along the lane axis, stencils via ``jnp.roll(y, s, -1)``.

f32 (+ the compensated mode for official tolerances); the XLA f64
path remains the conformance solver.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.controller import resolve_controller
from . import _lane_pad as _lp
from .fused_dense import _REC_UNSET
from .fused_erk import _fblend, _make_ev_spec, _run_erk_loop


def solve_fused_erk_grid(fun, t_span, y0_batch, method=None, rtol=1e-4,
                         atol=1e-6, first_step=None, max_steps=100_000,
                         block_members=32, interpret=False,
                         compensated=False, t_eval=None, events=None,
                         max_step=None, params=None, dense=None):
    """Integrate a mid-size-system ensemble with an ERK pair in one
    Pallas kernel.

    y0_batch: (B, n) float32, ANY n — the state rides the lane axis;
    when n is not a multiple of 128 it is zero-padded internally with
    inert masked lanes (ops/_lane_pad.py): the step sequence equals
    the unpadded problem's exactly, and ``fun`` still sees exactly n
    lanes (inputs are sliced back to the true width before each call).
    ``fun(t, y)``: t (bm, 1), y (bm, n) -> (bm, n), vectorized over
    the member sublanes.  Returns (y_final (B, n), status (B,),
    nsteps (B,), nfev (B,)); with ``t_eval`` (increasing snapshot
    times) appends y_eval (len(t_eval), B, n), rows cubic-Hermite
    interpolated from inside the kernel as each member crosses each
    point (common.py:766-790 evaluation form).  ``compensated=True``
    enables the mixed-precision mode (Neumaier dots + double-single
    y/t carries) for official tolerances, exactly as in
    ``solve_fused_erk``.  ``events``: callable(s) g(t, y) ->
    (bm, 1) member column (reduce the lane axis yourself, e.g. a
    lane slice ``y[:, 63:64]``), with the reference's ``terminal`` /
    ``direction`` attributes honoured; appends (t_events, y_events,
    n_events) exactly like ``solve_fused_erk`` (in-kernel Hermite
    bisection, first crossing, terminal truncation -> status 8).
    ``params``: optional (B, k) float32 per-member scalar parameters;
    when given, ``fun`` and every event callable take a third
    argument ``p``, a k-tuple of (bm, 1) member columns broadcastable
    against the (bm, n) state (``p[j]`` acts like a scalar).
    ``dense``: optional int ``R`` — record up to ``R`` per-step
    ``(t, y, f)`` rows from inside the kernel and append an evaluable
    per-member :class:`~extensisq_tpu.ops.fused_dense.
    FusedDenseSolution` as the LAST return element, exactly like
    ``solve_fused_erk`` (the reference's ``sol`` capability,
    common.py:766-821).  In THIS layout the state already rides the
    lane axis, so the buffers are (R, bm, n) — no sublane transpose
    — and VMEM costs (2n + 1) * R * block_members * 4 bytes: at
    n = 256 use block_members = 8 and R <= ~350.  ``R`` counts loop
    iterations (accepted + rejected attempts); members that need more
    get ``sol.valid[b] = False``.
    """
    if method is None:
        from ..methods import BS5 as method
    tab = method.tableau
    A = np.asarray(tab.A, dtype=np.float32)
    B_w = np.asarray(tab.B, dtype=np.float32)
    C = np.asarray(tab.C, dtype=np.float32)
    E = np.asarray(tab.E, dtype=np.float32)
    s = tab.n_stages
    fsal = tab.fsal
    err_order = min(tab.order_secondary, tab.order)
    cc = resolve_controller(None, tab.sc_params, -1.0 / (err_order + 1))
    eps32 = float(np.finfo(np.float32).eps)
    tiny_err = float(np.sqrt(np.finfo(np.float32).tiny))
    h_min_a = 10.0 * eps32 / tab.c_spacing()

    y0_batch = jnp.asarray(y0_batch, jnp.float32)
    n_total, n_true = y0_batch.shape
    n = _lp.pad_width(n_true)
    if n != n_true and not atol > 0.0:
        raise ValueError("masked lane padding (n not a multiple of "
                         "128) requires atol > 0: pad-lane error "
                         "scales are atol exactly")
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

    n_rec = 0 if dense is None else int(dense)
    if n_rec:
        # (R, bm, n) rows: the state already occupies the lane axis in
        # this layout, so no sublane transpose and no 64x lane-pad
        # blowup (the fused_erk lesson applies to the FLAT layout only)
        vmem = (2 * n + 1) * n_rec * bm * 4 + bm * n * 4
        if vmem > 6 * 2 ** 20:
            raise ValueError(
                f"dense={n_rec} recording needs {vmem / 2**20:.1f} MiB "
                f"of VMEM at block_members={bm}, n={n}; lower "
                "block_members (the buffers scale with it) or record "
                "fewer rows")

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

        nfev0 = None
        if first_step is None:
            # in-kernel Watts h_start (steppers/erk.py:129 semantics)
            from ._hstart_tile import hstart_tile
            bq = t + dir_r * jnp.minimum(
                jnp.abs(tf_r - t),
                jnp.zeros_like(t) + (np.inf if max_step is None
                                     else float(max_step)))
            h_abs0 = jnp.abs(hstart_tile(
                fun1, t, bq, y, f, tab.order_secondary, rtol_r, atol_r,
                mnorm=mnorm, msum=msum, mmin=mmin, n=n_true))
            nfev0 = izero + 2 + min(n_true + 1, 3)

        record = None
        if n_rec:
            f0_ref[:] = f
            # non-accepted / never-reached rows read the sentinel
            # (arithmetic blends forbid NaN coding: 0 * NaN = NaN)
            rect_ref[:] = jnp.full((n_rec, bm, 1), _REC_UNSET,
                                   jnp.float32)

            def record(itv, upd, t_out, y_out, f_new):  # noqa: F811
                @pl.when(itv < n_rec)
                def _():
                    rect_ref[itv] = _fblend(upd, t_out,
                                            fzero + _REC_UNSET)
                    recy_ref[itv] = y_out
                    recf_ref[itv] = f_new

        st = _run_erk_loop(
            fun1, (A, B_w, C, E, s, fsal, h_min_a, tiny_err), cc,
            compensated, max_steps, nq, tq_vals, fzero, izero,
            mnorm, lambda yy: [yy],
            t, tf_r, dir_r, rtol_r, atol_r, h_abs0, y, f,
            ev_spec=ev_spec_k, join_rows=lambda rows: rows[0],
            nfev0=nfev0, max_step=max_step, record=record)

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
    if n_rec:
        out_shapes += [
            jax.ShapeDtypeStruct((n_rec, B, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_rec, B, n), jnp.float32),
            jax.ShapeDtypeStruct((n_rec, B, n), jnp.float32),
            jax.ShapeDtypeStruct((B, n), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((n_rec, bm, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rec, bm, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rec, bm, n), lambda i: (0, i, 0),
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
        k += 3
    if n_rec:
        from .fused_dense import build_fused_dense
        rect, recy, recf, f0 = outs[k:k + 4]
        rect = rect[:, :n_total, 0]
        flags = (rect < 0.5 * _REC_UNSET).astype(jnp.int32)
        sol = build_fused_dense(
            t0, tf, y0_batch[:n_total, :n_true],
            f0[:n_total, :n_true],
            jnp.where(flags != 0, rect, 0.0), flags,
            recy[:, :n_total, :n_true], recf[:, :n_total, :n_true],
            ret[2])
        ret = ret + (sol,)
    return ret
