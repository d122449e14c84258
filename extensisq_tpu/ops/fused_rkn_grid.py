"""Fused Pallas RKN solver for MID-SIZE second-order systems.

``fused_rkn`` unrolls the state as member-tile rows (small m only) —
mid-size second-order systems (coupled oscillator lattices, discretized
wave equations, n ~ 128-512 positions) had only the XLA device path.
This kernel applies the grid family's transposed layout (states on the
128-lane axis, members on sublanes, further members over the pallas
grid dimension) to the partitioned Nyström form: u' = v,
v' = acc(t, u, v), stages store accelerations only, displacement
updates use h^2 A and velocity updates h Ap
(/root/reference/extensisq/common.py:1207-1310 structure).

The adaptive loop is ``fused_rkn._run_rkn_loop`` verbatim — the layout
enters as two closures (the member-norm axis and the u/v concatenation
axis).  The RHS convention: ``acc(t, u, v)`` receives t (bm, 1) and
u, v (bm, n), returns (bm, n); stencils via ``jnp.roll(..., -1)``.

f32 (+ the compensated double-single mode); the XLA f64 path remains
the conformance solver.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.controller import resolve_controller
from . import _lane_pad as _lp
from .fused_dense import _REC_UNSET
from .fused_erk import _fblend, _make_ev_spec
from .fused_rkn import _run_rkn_loop


def solve_fused_rkn_grid(acc, t_span, y0_batch, method=None, rtol=1e-4,
                         atol=1e-6, first_step=None, max_steps=100_000,
                         block_members=32, interpret=False,
                         compensated=False, t_eval=None, events=None,
                         max_step=None, params=None, dense=None):
    """Integrate a mid-size second-order ensemble with an RKN pair in
    one Pallas kernel.

    y0_batch: (B, 2n) float32 — [u, v] per member, ANY n (each
    partition rides the lane axis; non-multiples of 128 are
    zero-padded internally with inert masked lanes, ops/_lane_pad.py —
    ``acc`` and event callables still see exactly n lanes per
    partition and the step sequence equals the unpadded problem's
    exactly).  ``acc(t, u, v)``:
    t (bm, 1), u, v (bm, n) -> (bm, n).  Returns (y_final (B, 2n),
    status (B,), nsteps (B,), nfev (B,)); ``t_eval`` appends y_eval
    (len(t_eval), B, 2n) interpolated from inside the kernel
    (partitioned cubic Hermite, common.py:766-790 form).
    ``compensated=True`` enables the double-single mixed-precision
    mode exactly as in ``solve_fused_rkn``.

    ``events``: optional callable(s) ``g(t, y)`` with y (bm, 2n) — u
    then v on the lane axis — returning a (bm, 1) member tile;
    reference ``terminal``/``direction`` protocol.  Bisection runs on
    the partitioned Hermite interpolant; appends (t_events (n_ev, B),
    y_events (n_ev, B, 2n), n_events (n_ev, B)); terminal events
    truncate with status 8.
    ``params``: optional (B, k) float32 per-member scalar parameters;
    when given, ``acc`` is called as ``acc(t, u, v, p)`` and every
    event callable as ``g(t, y, p)`` with ``p`` a k-tuple of (bm, 1)
    member columns broadcastable against (bm, n) arrays.
    ``dense``: optional int ``R`` — record up to ``R`` per-step
    ``(t, [u, v], [v, a])`` rows in-kernel and append an evaluable
    per-member :class:`~extensisq_tpu.ops.fused_dense.
    FusedDenseSolution` over the FULL 2n-wide state as the LAST
    return element (the partitioned cubic Hermite this family's
    t_eval/events already use).  Buffers are (R, bm, 2n) in VMEM
    ((4n + 1) * R * block_members * 4 bytes); overflowing members get
    ``sol.valid[b] = False``.
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
    n_total, n2 = y0_batch.shape
    if n2 % 2:
        raise ValueError("state must be [u, v] with even length")
    n_true = n2 // 2
    n = _lp.pad_width(n_true)
    if n != n_true and not atol > 0.0:
        raise ValueError("masked lane padding (n not a multiple of "
                         "128) requires atol > 0: pad-lane error "
                         "scales are atol exactly")
    y0_batch = _lp.pad_lanes(y0_batch, n, parts=2)
    n2 = 2 * n
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
        vmem = (2 * n2 + 1) * n_rec * bm * 4 + bm * n2 * 4
        if vmem > 6 * 2 ** 20:
            raise ValueError(
                f"dense={n_rec} recording needs {vmem / 2**20:.1f} MiB "
                f"of VMEM at block_members={bm}, 2n={n2}; lower "
                "block_members or record fewer rows")

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
        yin = y0_ref[:]
        u = yin[:, :n]
        v = yin[:, n:]
        if n_par:
            pv = par_ref[:]
            p = tuple(pv[:, j:j + 1] for j in range(n_par))
            acc1 = lambda t, uu, vv: acc(t, uu, vv, p)    # noqa: E731
            wrap = lambda g: (lambda t, yy: g(t, yy, p))  # noqa: E731
        else:
            acc1 = acc
            wrap = lambda g: g                            # noqa: E731
        # masked lane padding: arbitrary n rides the kernel with the
        # EXACT unpadded step sequence (see ops/_lane_pad.py)
        lt = _lp.lane_tools(bm, n, n_true)
        mnorm, msum, mmin = lt.mnorm, lt.msum, lt.mmin
        acc_u = acc1
        acc1 = lambda t, uu, vv: lt.pb(                   # noqa: E731
            acc_u(t, lt.sl(uu), lt.sl(vv)))

        def _sl2(Y):
            """Slice a joined [u, v] array back to the true widths."""
            return jnp.concatenate([lt.sl(Y[:, :n]), lt.sl(Y[:, n:])],
                                   axis=-1)

        ev_spec_k = (None if ev_spec is None else
                     [((lambda t, yy, _g=wrap(ge): _g(t, _sl2(yy))),
                       tm, dr) for ge, tm, dr in ev_spec])
        fzero = yin[:, :1] * 0.0          # (bm, 1) member scalars
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
            from ._hstart_tile import hstart_tile

            def df_full(tt, Y):
                return jnp.concatenate(
                    [Y[:, n:], acc1(tt, Y[:, :n], Y[:, n:])], axis=-1)

            bq = t + dir_r * jnp.minimum(
                jnp.abs(tf_r - t),
                jnp.zeros_like(t) + (np.inf if max_step is None
                                     else float(max_step)))
            yfull = jnp.concatenate([u, v], axis=-1)
            ffull = jnp.concatenate([v, f], axis=-1)
            h_abs0 = jnp.abs(hstart_tile(
                df_full, t, bq, yfull, ffull, tab.order_secondary,
                rtol_r, atol_r, mnorm=mnorm, msum=msum, mmin=mmin,
                n=2 * n_true))
            nfev0 = izero + 2 + min(2 * n_true + 1, 3)

        record = None
        if n_rec:
            f0_ref[:] = jnp.concatenate([v, f], axis=-1)
            # non-accepted / never-reached rows read the sentinel
            # (arithmetic blends forbid NaN coding: 0 * NaN = NaN)
            rect_ref[:] = jnp.full((n_rec, bm, 1), _REC_UNSET,
                                   jnp.float32)

            def record(itv, upd, t_out, u_out, v_out,  # noqa: F811
                       f_out):
                @pl.when(itv < n_rec)
                def _():
                    rect_ref[itv] = _fblend(upd, t_out,
                                            fzero + _REC_UNSET)
                    recy_ref[itv] = jnp.concatenate([u_out, v_out],
                                                    axis=-1)
                    recf_ref[itv] = jnp.concatenate([v_out, f_out],
                                                    axis=-1)

        st = _run_rkn_loop(
            acc1, (A, Ap, B_w, Bp, C, E, Ep, s, fsal, h_min_a,
                   tiny_err), cc, compensated, max_steps, nq, tq_vals,
            fzero, izero, mnorm,
            lambda a, b: jnp.concatenate([a, b], axis=-1),
            t, tf_r, dir_r, rtol_r, atol_r, h_abs0, u, v, f,
            ev_spec=ev_spec_k,
            split_part=lambda arr: [arr],
            join_rows=lambda rows: jnp.concatenate(rows, axis=-1),
            unsplit=lambda rows: (rows[0], rows[1]),
            nfev0=nfev0, max_step=max_step, record=record)

        yout_ref[:] = jnp.concatenate([st.u, st.v], axis=-1)
        stat_ref[:] = st.status
        nstep_ref[:] = st.nstep
        nfev_ref[:] = st.nfev
        if nq:
            # flush points the member never reached with the final y
            for q in range(nq):
                unreached = dir_r * tq_vals[q] > dir_r * st.t
                qu = _fblend(unreached, st.u, st.qrows[q][0])
                qv = _fblend(unreached, st.v, st.qrows[q][1])
                yq_ref[q] = jnp.concatenate([qu, qv], axis=-1)
        if n_ev:
            _, evf, ev_t, ev_rows = st.ev
            for i in range(n_ev):
                tev_ref[i] = ev_t[i]
                yev_ref[i] = jnp.concatenate(list(ev_rows[i]),
                                             axis=-1)
                fev_ref[i] = evf[i]

    out_shapes = [
        jax.ShapeDtypeStruct((B, n2), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((bm, n2), lambda i: (i, 0),
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
            jax.ShapeDtypeStruct((nq, B, n2), jnp.float32))
        out_specs.append(
            pl.BlockSpec((nq, bm, n2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM))
    if n_ev:
        out_shapes += [
            jax.ShapeDtypeStruct((n_ev, B, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_ev, B, n2), jnp.float32),
            jax.ShapeDtypeStruct((n_ev, B, 1), jnp.int32),
        ]
        out_specs += [
            pl.BlockSpec((n_ev, bm, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ev, bm, n2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ev, bm, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ]
    if n_rec:
        out_shapes += [
            jax.ShapeDtypeStruct((n_rec, B, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_rec, B, n2), jnp.float32),
            jax.ShapeDtypeStruct((n_rec, B, n2), jnp.float32),
            jax.ShapeDtypeStruct((B, n2), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((n_rec, bm, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rec, bm, n2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rec, bm, n2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, n2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((bm, n2), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [scalars, y0_batch]
    if n_par:
        in_specs.append(pl.BlockSpec((bm, n_par), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(params)
    # trace with x64 OFF (TPU Pallas has no 64-bit types)
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

    def _unpad(arr):
        return _lp.unpad_lanes(arr, n_true, n, parts=2)

    ret = (_unpad(y_out[:n_total]), status[:n_total, 0],
           nsteps[:n_total, 0], nfev[:n_total, 0])
    k = 4
    if nq:
        ret = ret + (_unpad(outs[k][:, :n_total]),)
        k += 1
    if n_ev:
        tev, yev, fev = outs[k], outs[k + 1], outs[k + 2]
        fired = fev[:, :n_total, 0]
        nanv = jnp.float32(np.nan)
        t_events = jnp.where(fired != 0, tev[:, :n_total, 0], nanv)
        y_events = jnp.where((fired != 0)[:, :, None],
                             _unpad(yev[:, :n_total]), nanv)
        ret = ret + (t_events, y_events, fired)
        k += 3
    if n_rec:
        from .fused_dense import build_fused_dense
        rect, recy, recf, f0 = outs[k:k + 4]
        rect = rect[:, :n_total, 0]
        flags = (rect < 0.5 * _REC_UNSET).astype(jnp.int32)
        sol = build_fused_dense(
            t0, tf, _unpad(y0_batch[:n_total]),
            _unpad(f0[:n_total]),
            jnp.where(flags != 0, rect, 0.0), flags,
            _unpad(recy[:, :n_total]), _unpad(recf[:, :n_total]),
            ret[2])
        ret = ret + (sol,)
    return ret
