"""Fused Pallas SWAG solver for MID-SIZE systems: states on lanes.

``fused_adams`` unrolls the state dimension as separate member-tile
rows, which caps it at n <= 8 — leaving mid-size systems (n ~ 16-512:
method-of-lines PDEs, reaction networks, coupled oscillator chains)
with only the dispatch-bound XLA path (~170 kernel launches per step,
docs/TPU_NOTES.md).  This kernel closes that hole with the transposed
layout:

* the STATE occupies the 128-lane vector axis; any n is accepted —
  non-multiples of 128 are zero-padded internally with INERT masked
  lanes (ops/_lane_pad.py: sliced RHS inputs, true-n norms),
  preserving the unpadded step sequence exactly;
* MEMBERS occupy sublanes: each block integrates ``block_members``
  members, per-member scalars (t, h, psi, alpha, ..., k, ns) are
  (bm, 1) column tiles broadcast against (bm, n) state arrays;
* further members run over the pallas grid dimension.

The SWAG logic itself (predict / error ladder / correct / order and
step selection — shampine.py semantics, steppers/adams.py:292-808) is
IDENTICAL to fused_adams: the dsteps block-1 coefficient machinery is
shared verbatim via _adams_common.make_coefficients, which is
shape-polymorphic over the layout's tile shapes.

The RHS convention differs from the row-stacked small-system kernels:
``fun(t, y)`` receives t (bm, 1) and y (bm, n) and returns (bm, n) —
elementwise along the lane axis, stencils via ``jnp.roll(y, s, -1)``.

f32 with a double-single t carry (2^-30 min-step floor) like
fused_adams; the XLA f64 path remains the conformance solver.
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..steppers.adams import AdamsStepper, _GSTR
from ..types import IVPParams
from . import _lane_pad as _lp
from ._adams_common import TileOps, make_coefficients
from .fused_dense import _REC_UNSET
from .fused_erk import (_sanitize, _df_add, _hermite_tiles,
                        _make_ev_spec, _handle_events, _EVENT)

_RUNNING, _FINISHED, _TOO_SMALL, _OVERFLOW = 0, 1, 2, 3


class _G(NamedTuple):
    """While-loop carry: per-member (bm, 1) scalars, (bm, n) states."""
    it: Any
    t: Any
    t_lo: Any
    h: Any
    hold: Any
    y: Any            # (bm, n)
    yp: Any           # (bm, n)
    wt: Any           # (bm, n)
    phi: Any          # tuple (km+2) of (bm, n)
    psi: Any          # tuple (km)
    alpha: Any
    beta: Any
    sig: Any          # tuple (km+1)
    v: Any
    w: Any
    g: Any            # tuple (km+1)
    gi: Any           # tuple (km-1)
    iv: Any           # tuple (km-2) i32
    k: Any
    kold: Any
    kprev: Any
    ns: Any
    ivc: Any
    kgi: Any
    phase1: Any
    fresh: Any
    ifail: Any
    status: Any
    nfev: Any
    nsteps: Any
    nfailed: Any
    qrows: Any        # tuple (nq) of (bm, n) t_eval snapshots
    ev: Any           # (gprev, fired, ev_t, ev_rows) event tuples


def solve_fused_adams_grid(fun, t_span, y0_batch, rtol=1e-4, atol=1e-6,
                           first_step=None, k_max=12,
                           max_steps=200_000, block_members=32,
                           interpret=False, t_eval=None, events=None,
                           max_step=None, params=None, dense=None):
    """Integrate a mid-size-system ensemble with SWAG in one kernel.

    y0_batch: (B, n) float32, ANY n — non-multiples of 128 are
    zero-padded internally with inert masked lanes (ops/_lane_pad.py;
    ``fun`` and event callables still see exactly n lanes, the step
    sequence equals the unpadded problem's exactly; requires
    atol > 0).
    ``fun(t, y)``: t (bm, 1), y (bm, n) -> (bm, n), vectorized over
    the member sublanes.  Returns (y_final (B, n), status (B,),
    nsteps (B,), nfev (B,)); with ``t_eval`` (increasing snapshot
    times) appends y_eval (len(t_eval), B, n), rows cubic-Hermite
    interpolated from inside the kernel as each member crosses each
    point (common.py:766-790 evaluation form).  ``events``:
    callable(s) g(t, y) -> (bm, 1) member column with the reference's
    ``terminal`` / ``direction`` attributes; appends (t_events,
    y_events, n_events) like the other fused kernels.  ``max_step``:
    optional static float cap on |h| (steppers/adams.py:784-786).
    ``params``: optional (B, k) float32 per-member scalar parameters;
    when given, ``fun`` and every event callable take a third
    argument ``p``, a k-tuple of (bm, 1) member columns broadcastable
    against (bm, n) arrays (host init and kernel both honour it).
    ``dense``: optional int ``R`` — record up to ``R`` per-step
    ``(t, y, y')`` rows in-kernel and append an evaluable per-member
    :class:`~extensisq_tpu.ops.fused_dense.FusedDenseSolution` as the
    LAST return element.  NOTE the recorded interpolant is the
    unified cubic Hermite on step endpoints — NOT SWAG's own order-k
    polynomial (between-point accuracy is O(h^4) of the ACCEPTED
    steps, the same convention as every fused kernel's dense); the
    f64 XLA path keeps the conformance dense output.  Buffers are
    (R, bm, n) in VMEM; overflowing members get
    ``sol.valid[b] = False``.
    """
    y0_batch = jnp.asarray(y0_batch, jnp.float32)
    n_total, n_true = y0_batch.shape
    n = _lp.pad_width(n_true)
    if n != n_true and not atol > 0.0:
        raise ValueError("masked lane padding (n not a multiple of "
                         "128) requires atol > 0: pad-lane error "
                         "weights are atol exactly")
    km = int(k_max)
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

    t0 = float(t_span[0])
    tf = float(t_span[1])
    direction = float(np.sign(tf - t0) or 1.0)
    eps32 = float(np.finfo(np.float32).eps)
    fouru_t = 4.0 * 2.0 ** -30    # DS t carry floor (fused_adams.py)
    gstr = [float(v) for v in _GSTR]
    iqq = [float(1.0 / (q * (q + 1.0))) for q in range(1, km + 2)]
    n_iv = max(km - 2, 1)

    nq = 0 if t_eval is None else int(np.asarray(t_eval).shape[0])
    tq_vals = (None if t_eval is None
               else [float(v) for v in np.asarray(t_eval)])

    ev_spec = _make_ev_spec(events)
    n_ev = 0 if ev_spec is None else len(ev_spec)

    n_rec = 0 if dense is None else int(dense)
    if n_rec:
        vmem = (2 * n + 1) * n_rec * bm * 4 + bm * n * 4
        if vmem > 6 * 2 ** 20:
            raise ValueError(
                f"dense={n_rec} recording needs {vmem / 2**20:.1f} MiB "
                f"of VMEM at block_members={bm}, n={n}; lower "
                "block_members or record fewer rows")

    # initial state via the XLA stepper (h_start etc.); its RHS takes
    # (n,) vectors — adapt the (bm, n) kernel convention
    with jax.enable_x64(False):
        ivp_params = IVPParams(
            t_bound=jnp.asarray(tf, jnp.float32),
            direction=jnp.asarray(direction, jnp.float32),
            rtol=jnp.asarray(rtol, jnp.float32),
            atol=jnp.asarray(atol, jnp.float32),
            max_step=jnp.asarray(np.finfo(np.float32).max
                                 if max_step is None else max_step,
                                 jnp.float32))
        if n_par:
            def init_one(y, pp):
                p = tuple(jnp.reshape(pp[j], (1, 1))
                          for j in range(n_par))

                def fv(t, yy):
                    return fun(jnp.reshape(t, (1, 1)), yy[None, :],
                               p)[0]
                st = AdamsStepper(fv, n_true, np.float32,
                                  options={"k_max": km})
                return st.init(t0, y, ivp_params,
                               first_step=first_step)
            states0 = jax.vmap(init_one)(y0_batch, params)
        else:
            def fun_vec(t, y):
                return fun(jnp.reshape(t, (1, 1)), y[None, :])[0]

            stepper = AdamsStepper(fun_vec, n_true, np.float32,
                                   options={"k_max": km})
            states0 = jax.vmap(
                lambda y: stepper.init(t0, y, ivp_params,
                                       first_step=first_step))(
                                           y0_batch)

    # state-sized input: [y, yp, wt, phi(km+2), qrows(nq),
    # ev_rows(n_ev)] on lanes; host init ran at the TRUE width, the
    # kernel slots are padded (inert lanes: y/yp/phi zero, wt ONE so
    # 1/wt stays finite — pad-lane phi terms are 0 so they cannot
    # contribute anyway; norms mask pads, ops/_lane_pad.py)
    _pl = lambda a: _lp.pad_lanes(a, n)                  # noqa: E731
    if n == n_true:
        wt_pad = states0.wt
        phi_pad = states0.phi.reshape(B, -1)
    else:
        wt_pad = jnp.pad(states0.wt,
                         [(0, 0), (0, n - n_true)],
                         constant_values=1.0)
        phi_pad = _lp.pad_lanes(states0.phi, n).reshape(B, -1)
    sparts = ([_pl(states0.y), _pl(states0.yp), wt_pad, phi_pad]
              + [_pl(y0_batch)] * (nq + n_ev))
    FS0 = jnp.concatenate([p.astype(jnp.float32) for p in sparts],
                          axis=1)
    n_sslot = 3 + (km + 2) + nq + n_ev
    # per-member scalars: [t, t_lo, h, hold, psi(km), alpha(km),
    # beta(km), sig(km+1), v(km), w(km), g(km+1), gi(km-1)]
    cparts = [states0.t[:, None],
              jnp.zeros((B, 1), jnp.float32),
              states0.h[:, None], states0.hold[:, None],
              states0.psi, states0.alpha, states0.beta, states0.sig,
              states0.v, states0.w, states0.g, states0.gi]
    if n_ev:
        with jax.enable_x64(False):
            t0_col = jnp.full((B, 1), t0, jnp.float32)
            p_host = (tuple(params[:, j:j + 1] for j in range(n_par))
                      if n_par else None)
            for ge, _, _ in ev_spec:
                ge_h = ((lambda t, y, ge=ge: ge(t, y, p_host))
                        if n_par else ge)
                g0 = jnp.asarray(ge_h(t0_col, y0_batch),
                                 jnp.float32).reshape(B, 1)
                cparts += [g0, jnp.zeros((B, 1), jnp.float32)]
    FC0 = jnp.concatenate([p.astype(jnp.float32) for p in cparts],
                          axis=1)
    iparts = [states0.k[:, None], states0.kold[:, None],
              states0.kprev[:, None], states0.ns[:, None],
              states0.ivc[:, None], states0.kgi[:, None], states0.iv,
              states0.phase1[:, None].astype(jnp.int32),
              states0.status[:, None], states0.nfev[:, None],
              states0.nsteps[:, None], states0.nfailed[:, None]]
    iparts += [jnp.zeros((B, 1), jnp.int32)] * n_ev    # fired latches
    IC0 = jnp.concatenate([p.astype(jnp.int32) for p in iparts],
                          axis=1)
    n_fc = FC0.shape[1]
    n_ic = IC0.shape[1]

    def kernel(fs_ref, fc_ref, ic_ref, *rest):
        rest = list(rest)
        par_ref = rest.pop(0) if n_par else None
        yout_ref, stat_ref, nstep_ref, nfev_ref = rest[:4]
        rest = rest[4:]
        yq_ref = rest.pop(0) if nq else None
        if n_ev:
            tev_ref, yev_ref, fev_ref = rest[:3]
            rest = rest[3:]
        if n_rec:
            rect_ref, recy_ref, recf_ref = rest[:3]
        FS = fs_ref[:]
        FC = fc_ref[:]
        IC = ic_ref[:]
        if n_par:
            pv = par_ref[:]
            ptup = tuple(pv[:, j:j + 1] for j in range(n_par))
            fun1 = lambda t, yy: fun(t, yy, ptup)            # noqa: E731
            wrap = lambda g: (lambda t, yy: g(t, yy, ptup))  # noqa: E731
        else:
            fun1 = fun
            wrap = lambda g: g                            # noqa: E731
        # masked lane padding: arbitrary n rides the kernel with the
        # EXACT unpadded step sequence (see ops/_lane_pad.py)
        lt = _lp.lane_tools(bm, n, n_true)
        member_norm = lt.mnorm
        fun1 = lt.wrap_fun(fun1)
        ev_spec_k = (None if ev_spec is None else
                     [(lt.wrap_obs(wrap(ge)), tm, dr)
                      for ge, tm, dr in ev_spec])
        szero = jnp.zeros((bm, 1), jnp.float32)
        izero = szero.astype(jnp.int32)
        fzero = szero               # TileOps zero: per-member scalars

        O = TileOps(fzero, izero)
        fb, ib = O.fb, O.ib
        vtake, vitake, vput = O.vtake, O.vitake, O.vput
        ctake, cliped = O.ctake, O.cliped
        coefficients = make_coefficients(km, iqq, n_iv, O)

        def fs_slot(s):
            return FS[:, s * n:(s + 1) * n]

        def fc_col(c):
            return FC[:, c:c + 1]

        def ic_col(c):
            return IC[:, c:c + 1]

        # the while carry is THREE stacked arrays (+ the iteration
        # counter), not the ~55 individual tiles of _G: each carried
        # array costs fixed per-iteration overhead (the layout-A
        # kernel measured ~180 us/iter at ~100 tiles, fused_adams.py),
        # so state slices ride one (n_sslot, bm, n) stack and the
        # per-member scalars one f32 / one i32 (rows, bm, 1) stack,
        # re-split by STATIC leading-dim indexing each iteration.
        def unpack(SA, FA, IA, it):
            co = 4

            def fcols(off, count):
                return [FA[off + r] for r in range(count)]

            psi = fcols(co, km); co += km
            alpha = fcols(co, km); co += km
            beta = fcols(co, km); co += km
            sig = fcols(co, km + 1); co += km + 1
            v = fcols(co, km); co += km
            w = fcols(co, km); co += km
            g = fcols(co, km + 1); co += km + 1
            gi = fcols(co, km - 1); co += km - 1
            ev_gp, ev_tt = [], []
            for _ in range(n_ev):
                ev_gp.append(FA[co]); co += 1
                ev_tt.append(FA[co]); co += 1
            io = 6 + n_iv
            return _G(
                it=it,
                t=FA[0], t_lo=FA[1], h=FA[2], hold=FA[3],
                y=SA[0], yp=SA[1], wt=SA[2],
                phi=tuple(SA[3 + r] for r in range(km + 2)),
                psi=tuple(psi), alpha=tuple(alpha),
                beta=tuple(beta), sig=tuple(sig), v=tuple(v),
                w=tuple(w), g=tuple(g), gi=tuple(gi),
                iv=tuple(IA[6 + r] for r in range(n_iv)),
                k=IA[0], kold=IA[1], kprev=IA[2], ns=IA[3],
                ivc=IA[4], kgi=IA[5],
                phase1=IA[io], status=IA[io + 1], nfev=IA[io + 2],
                nsteps=IA[io + 3], nfailed=IA[io + 4],
                fresh=IA[io + 5], ifail=IA[io + 6],
                qrows=tuple(SA[3 + km + 2 + q] for q in range(nq)),
                ev=((tuple(ev_gp),
                     tuple(IA[io + 7 + i] for i in range(n_ev)),
                     tuple(ev_tt),
                     tuple((SA[3 + km + 2 + nq + i],)
                           for i in range(n_ev)))
                    if n_ev else ()))

        def pack(st):
            ev_srows, ev_frows, ev_irows = [], [], []
            if n_ev:
                gp, evf, evt, evr = st.ev
                for i in range(n_ev):
                    ev_srows.append(evr[i][0])
                    ev_frows += [gp[i], evt[i]]
                ev_irows = list(evf)
            SA = jnp.stack([st.y, st.yp, st.wt] + list(st.phi)
                           + list(st.qrows) + ev_srows)
            FA = jnp.stack([st.t, st.t_lo, st.h, st.hold]
                           + list(st.psi) + list(st.alpha)
                           + list(st.beta) + list(st.sig)
                           + list(st.v) + list(st.w) + list(st.g)
                           + list(st.gi) + ev_frows)
            IA = jnp.stack([st.k, st.kold, st.kprev, st.ns, st.ivc,
                            st.kgi] + list(st.iv)
                           + [st.phase1, st.status, st.nfev,
                              st.nsteps, st.nfailed, st.fresh,
                              st.ifail] + ev_irows)
            return SA, FA, IA

        i_status = 6 + n_iv + 1
        st_init = _G(
            it=jnp.zeros((), jnp.int32),
            t=fc_col(0), t_lo=fc_col(1), h=fc_col(2), hold=fc_col(3),
            y=fs_slot(0), yp=fs_slot(1), wt=fs_slot(2),
            phi=tuple(fs_slot(3 + r) for r in range(km + 2)),
            psi=tuple(fc_col(4 + r) for r in range(km)),
            alpha=tuple(fc_col(4 + km + r) for r in range(km)),
            beta=tuple(fc_col(4 + 2 * km + r) for r in range(km)),
            sig=tuple(fc_col(4 + 3 * km + r) for r in range(km + 1)),
            v=tuple(fc_col(5 + 4 * km + r) for r in range(km)),
            w=tuple(fc_col(5 + 5 * km + r) for r in range(km)),
            g=tuple(fc_col(5 + 6 * km + r) for r in range(km + 1)),
            gi=tuple(fc_col(6 + 7 * km + r) for r in range(km - 1)),
            iv=tuple(ic_col(6 + r) for r in range(n_iv)),
            k=ic_col(0), kold=ic_col(1), kprev=ic_col(2),
            ns=ic_col(3), ivc=ic_col(4), kgi=ic_col(5),
            phase1=ic_col(6 + n_iv), status=ic_col(6 + n_iv + 1),
            nfev=ic_col(6 + n_iv + 2), nsteps=ic_col(6 + n_iv + 3),
            nfailed=ic_col(6 + n_iv + 4),
            fresh=izero + 1, ifail=izero,
            qrows=tuple(fs_slot(3 + km + 2 + q) for q in range(nq)),
            ev=((tuple(fc_col(n_fc - 2 * n_ev + 2 * i)
                       for i in range(n_ev)),
                 tuple(izero for _ in range(n_ev)),
                 tuple(fc_col(n_fc - 2 * n_ev + 2 * i + 1)
                       for i in range(n_ev)),
                 tuple((fs_slot(3 + km + 2 + nq + i),)
                       for i in range(n_ev)))
                if n_ev else ()))

        tfs = tf + szero
        dirs = direction

        def cond_loop(carry):
            SA, FA, IA, it = carry
            run = ib(IA[i_status] == _RUNNING, izero + 1, izero)
            return (jnp.max(run) > 0) & (it < max_steps)

        def body(carry):
            SA_c, FA_c, IA_c, it_c = carry
            st = unpack(SA_c, FA_c, IA_c, it_c)
            running = st.status == _RUNNING
            tc = st.t + st.t_lo          # double-single time carry
            min_step = fouru_t * jnp.abs(tc)
            d = (tfs - st.t) - st.t_lo   # DS remaining interval
            near_end = jnp.abs(d) <= min_step

            fresh_b = st.fresh != 0
            h_cl = fb(dirs * (st.h - d) > 0, d, st.h)
            if max_step is not None:
                # per fresh step, like steppers/adams.py:784-786
                h_cl = jnp.sign(h_cl) * jnp.minimum(
                    jnp.abs(h_cl), float(max_step))
            h_in = fb(fresh_b, h_cl, st.h)
            ifail = ib(fresh_b, izero, st.ifail)

            kk, nss = st.k, st.ns
            kp1, km1, km2 = kk + 1, kk - 1, kk - 2

            ns2 = ib(h_in != st.hold, izero, nss)
            ns2 = ib(ns2 <= st.kold, ns2 + 1, ns2)

            (psi_n, alpha_n, beta_n, sig_n, v_n, w_n, g_n, gi_n,
             iv_n, ivc_n, kgi_n) = coefficients(
                h_in, kk, ns2, st.psi, st.alpha, st.beta, st.sig,
                st.v, st.w, st.g, st.gi, st.iv, st.ivc, st.kgi,
                st.kprev, st.kold)

            # block 2: predict
            beta_ext = beta_n + [beta_n[km - 1], beta_n[km - 1]]
            g_ext = g_n + [g_n[km]]
            phi_n = [fb((r >= ns2) & (r < kk),
                        st.phi[r] * beta_ext[r], st.phi[r])
                     for r in range(km + 2)]
            phi_k = vtake(phi_n, cliped(kk, 0, km + 1))
            phi_n = vput(phi_n, cliped(kp1, 0, km + 1), phi_k)
            phi_n = vput(phi_n, cliped(kk, 0, km + 1), szero)
            acc = szero
            for r in range(km + 1):
                gw = fb(r < kk, g_ext[r], szero)
                acc = acc + gw * phi_n[r]
            p = h_in * acc + st.y
            # reverse cumulative sum over rows < k
            acc = szero
            new_phi = [None] * (km + 2)
            for r in range(km + 1, -1, -1):
                masked = fb(r < kk, phi_n[r], szero)
                acc = acc + masked
                new_phi[r] = fb(r < kk, acc, phi_n[r])
            phi_n = new_phi

            x = tc + h_in
            yp_pred = fun1(x, p)
            attempted = running & ~near_end
            nfev2 = st.nfev + ib(attempted, izero + 1, izero)

            wtn = jnp.float32(atol) + jnp.float32(rtol) * 0.5 \
                * (jnp.abs(p) + jnp.abs(st.y))
            inv_wt = 1.0 / wtn
            temp4 = yp_pred - phi_n[0]
            absh = jnp.abs(h_in)

            erk = absh * member_norm(temp4 * inv_wt)
            phi_km1 = vtake(phi_n, cliped(km1, 0, km + 1))
            phi_km2 = vtake(phi_n, cliped(km2, 0, km + 1))
            erkm1 = absh * member_norm((phi_km1 + temp4) * inv_wt) \
                * vtake(sig_n, cliped(km1, 0, km)) \
                * ctake(gstr, cliped(km2, 0, 12))
            erkm2 = absh * member_norm((phi_km2 + temp4) * inv_wt) \
                * vtake(sig_n, cliped(km2, 0, km)) \
                * ctake(gstr, cliped(km2 - 1, 0, 12))
            err = erk * (vtake(g_n, cliped(km1, 0, km))
                         - vtake(g_n, cliped(kk, 0, km)))
            erk = erk * vtake(sig_n, cliped(kk, 0, km)) \
                * ctake(gstr, cliped(km1, 0, 12))
            err, bad_e = _sanitize(err)
            err = err + bad_e.astype(jnp.float32) * 10.0

            knew = ib((kk > 2) & (jnp.maximum(erkm1, erkm2) < erk),
                      km1,
                      ib((kk == 2) & (erkm1 < 0.5 * erk), km1, kk))

            success = (err <= 1.0) & running & ~near_end & ~bad_e

            # block 3: failure restore
            phi_r = [None] * (km + 2)
            for r in range(km + 2):
                up = phi_n[r + 1] if r + 1 < km + 2 \
                    else phi_n[km + 1]
                val = fb(r < kk, phi_n[r] - up, phi_n[r])
                bsafe = fb(beta_ext[r] == 0.0, szero + 1.0,
                           beta_ext[r])
                phi_r[r] = fb(r < kk, val / bsafe, val)
            psi_r = [fb(r < km1,
                        (psi_n[r + 1] if r + 1 < km
                         else psi_n[km - 1]) - h_in, psi_n[r])
                     for r in range(km)]

            ifail2 = ifail + 1
            temp2 = fb((ifail2 >= 4) & (0.5 < 0.25 * erk),
                       jnp.sqrt(0.5 / jnp.maximum(erk, 1e-30)),
                       szero + 0.5)
            knew_fail = ib(ifail2 >= 3, izero + 1, knew)
            h_fail = h_in * temp2
            failed = attempted & ~success
            status2 = ib(failed & (jnp.abs(h_fail) < min_step),
                         izero + _TOO_SMALL, st.status)

            # block 4: correct, evaluate, order/step selection
            g_k = vtake(g_n, cliped(kk, 0, km))
            y_corr = h_in * g_k * temp4 + p
            yp_new = fun1(x, y_corr)
            nfev2 = nfev2 + ib(success, izero + 1, izero)

            pkn = yp_new - phi_n[0]
            col = vput(list(phi_n), cliped(kk, 0, km + 1), pkn)
            col = vput(col, cliped(kp1, 0, km + 1),
                       pkn - vtake(col, cliped(kp1, 0, km + 1)))
            phi_f = [fb(r < kk, col[r] + pkn, col[r])
                     for r in range(km + 2)]

            phase1_b = (st.phase1 != 0) & ~((knew == km1)
                                            | (kk == km))
            phi_kp1 = vtake(phi_f, cliped(kp1, 0, km + 1))
            erkp1 = ctake(gstr, cliped(kk, 0, 12)) * absh \
                * member_norm(phi_kp1 / wtn)
            can_est = (~phase1_b) & (knew != km1) & (kk < ns2)

            raise1 = (kk == 1) & (erkp1 < 0.5 * erk) & (kk < km)
            lower_b = (kk != 1) & (erkm1 <= jnp.minimum(erk, erkp1))
            raise2 = (kk != 1) & ~lower_b & ~((erkp1 > erk)
                                              | (kk == km))

            k_next = ib(phase1_b, kp1,
                        ib(knew == km1, km1,
                           ib(can_est & raise1, kp1,
                              ib(can_est & lower_b, km1,
                                 ib(can_est & raise2, kp1, kk)))))
            erk_next = fb(phase1_b, erkp1,
                          fb(knew == km1, erkm1,
                             fb(can_est & raise1, erkp1,
                                fb(can_est & lower_b, erkm1,
                                   fb(can_est & raise2, erkp1,
                                      erk)))))

            two_next = ctake([float(2.0 ** (q + 1))
                              for q in range(km + 2)],
                             cliped(k_next, 0, km + 1))
            double = phase1_b | (0.5 >= erk_next * two_next)
            keep_h = 0.5 >= erk_next
            rr = jnp.exp(jnp.log(jnp.maximum(
                0.5 / jnp.maximum(erk_next, 1e-30), 1e-30))
                / (k_next.astype(jnp.float32) + 1.0))
            h_red = absh * jnp.clip(rr, 0.5, 0.9)
            h_red = jnp.sign(h_in) * jnp.maximum(h_red, min_step)
            h_next = fb(double, h_in + h_in,
                        fb(keep_h, h_in, h_red))

            t_adv, t_lo_adv = _df_add(st.t, st.t_lo, h_in)
            rem = (tfs - t_adv) - t_lo_adv
            is_last = success & (jnp.abs(rem)
                                 <= 8.0 * eps32 * jnp.abs(h_in))
            t_new = fb(is_last, tfs, t_adv)
            t_lo_new = fb(is_last, szero, t_lo_adv)

            # near-end linear extrapolation
            y_ext = st.y + d * st.yp
            extrap = running & near_end

            ok = success
            ok_any = ok | extrap
            status3 = ib((status2 == _RUNNING) & (is_last | extrap),
                         izero + _FINISHED, status2)
            hit_cap = (st.it + 1 >= max_steps) & (status3 == _RUNNING)
            status3 = ib(hit_cap, izero + _OVERFLOW, status3)

            # t_eval snapshots (common.py:766-790 evaluation form)
            qrows_new = st.qrows
            if nq:
                h_safe = fb(h_in == 0.0, szero + 1.0, h_in)
                qrows_new = []
                for q in range(nq):
                    tqc = tq_vals[q]
                    ahead = dirs * (tqc - st.t) > 0.0
                    crossed = ok & ahead & (dirs * tqc
                                            <= dirs * t_new)
                    theta = (tqc - st.t) / h_safe
                    vals = _hermite_tiles(theta, h_in, [st.y],
                                          [st.yp], [y_corr],
                                          [yp_new])[0]
                    cross_e = extrap & ahead & (dirs * tqc
                                                <= dirs * tfs)
                    ext = st.y + (tqc - st.t) * st.yp
                    qrows_new.append(
                        fb(crossed, vals,
                           fb(cross_e, ext, st.qrows[q])))
                qrows_new = tuple(qrows_new)

            # events (y_corr / yp_new are the step's endpoints)
            ev_new = st.ev
            trunc = izero != izero
            te = szero
            y_te_rows = None
            if n_ev:
                ev_new, trunc, te, y_te_rows = _handle_events(
                    ev_spec_k, st.ev, ok, dirs, st.t, t_new, h_in,
                    h_safe if nq else fb(h_in == 0.0, szero + 1.0,
                                         h_in),
                    [st.y], [st.yp], [y_corr], [yp_new],
                    szero, izero, lambda rows: rows[0])
                status3 = ib(trunc, izero + _EVENT, status3)

            # writeback (flat semantics: failed-attempt restores carry)
            y_out = fb(extrap, y_ext, fb(ok, y_corr, st.y))
            if n_ev and y_te_rows is not None:
                y_out = fb(trunc, y_te_rows[0], y_out)
            y_out, _ = _sanitize(y_out)
            yp_out = fb(ok, yp_new, st.yp)
            yp_out, _ = _sanitize(yp_out)
            if n_rec:
                t_rec = fb(trunc, te, fb(extrap, tfs,
                                         fb(ok, t_new, st.t)))

                @pl.when(st.it < n_rec)
                def _():
                    rect_ref[st.it] = fb(ok | extrap, t_rec,
                                         szero + _REC_UNSET)
                    recy_ref[st.it] = y_out
                    recf_ref[st.it] = yp_out
            h_out = fb(ok, h_next, fb(extrap, st.h, h_fail))
            h_out = fb(attempted | extrap, h_out, st.h)
            h_out, _ = _sanitize(h_out)
            phi_out = [fb(attempted, fb(ok, phi_f[r], phi_r[r]),
                          st.phi[r]) for r in range(km + 2)]
            psi_out = [fb(attempted, fb(ok, psi_n[r], psi_r[r]),
                          st.psi[r]) for r in range(km)]

            def outv(new, old):
                return [fb(attempted, a, b)
                        for a, b in zip(new, old)]

            def outiv(new, old):
                return [ib(attempted, a, b)
                        for a, b in zip(new, old)]

            st2 = _G(
                it=st.it + 1,
                t=fb(trunc, te, fb(extrap, tfs,
                                   fb(ok, t_new, st.t))),
                t_lo=fb(trunc | extrap | (ok & is_last), szero,
                        fb(ok, t_lo_new, st.t_lo)),
                h=h_out,
                hold=fb(ok, h_in, st.hold),
                y=y_out, yp=yp_out,
                wt=fb(ok, wtn, st.wt),
                phi=tuple(phi_out),
                psi=tuple(psi_out),
                alpha=tuple(outv(alpha_n, st.alpha)),
                beta=tuple(outv(beta_n, st.beta)),
                sig=tuple(outv(sig_n, st.sig)),
                v=tuple(outv(v_n, st.v)),
                w=tuple(outv(w_n, st.w)),
                g=tuple(outv(g_n, st.g)),
                gi=tuple(outv(gi_n, st.gi)),
                iv=tuple(outiv(iv_n, st.iv)),
                k=ib(attempted, ib(ok, k_next, knew_fail), st.k),
                kold=ib(extrap, izero, ib(ok, kk, st.kold)),
                kprev=ib(attempted, kk, st.kprev),
                ns=ib(attempted, ib(ok, ns2, izero), st.ns),
                ivc=ib(attempted, ivc_n, st.ivc),
                kgi=ib(attempted, kgi_n, st.kgi),
                phase1=ib(attempted,
                          ib(ok, phase1_b.astype(jnp.int32),
                             izero), st.phase1),
                fresh=ib(ok | (status3 != _RUNNING) | extrap,
                         izero + 1, izero),
                ifail=ib(ok, izero, ifail2),
                status=status3,
                nfev=nfev2,
                nsteps=st.nsteps + ib(ok_any, izero + 1, izero),
                nfailed=st.nfailed + ib(failed, izero + 1, izero),
                qrows=qrows_new,
                ev=ev_new)
            SA2, FA2, IA2 = pack(st2)
            return SA2, FA2, IA2, st2.it

        if n_rec:
            # non-accepted / never-reached rows read the sentinel
            # (arithmetic blends forbid NaN coding: 0 * NaN = NaN)
            rect_ref[:] = jnp.full((n_rec, bm, 1), _REC_UNSET,
                                   jnp.float32)
        SA0, FA0, IA0 = pack(st_init)
        SAf, FAf, IAf, _ = jax.lax.while_loop(
            cond_loop, body, (SA0, FA0, IA0,
                              jnp.zeros((), jnp.int32)))
        stf = unpack(SAf, FAf, IAf, jnp.zeros((), jnp.int32))

        yout_ref[:] = stf.y
        stat_ref[:] = stf.status
        nstep_ref[:] = stf.nsteps
        nfev_ref[:] = stf.nfev
        if nq:
            # flush points the member never reached with its final y
            for q in range(nq):
                unreached = dirs * tq_vals[q] > dirs * stf.t
                yq_ref[q] = O.fb(unreached, stf.y, stf.qrows[q])
        if n_ev:
            _, evf, ev_t, ev_rows = stf.ev
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
        ]
        out_specs += [
            pl.BlockSpec((n_rec, bm, 1), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rec, bm, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rec, bm, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ]
    in_specs = [
        pl.BlockSpec((bm, n_sslot * n), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, n_fc), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, n_ic), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    call_args = [FS0, FC0, IC0]
    if n_par:
        in_specs.append(pl.BlockSpec((bm, n_par), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        call_args.append(params)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(*call_args)
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
        rect, recy, recf = outs[k:k + 3]
        rect = rect[:, :n_total, 0]
        flags = (rect < 0.5 * _REC_UNSET).astype(jnp.int32)
        # f0 comes from the HOST init (states0.yp is yp(t0) at the
        # true width, before padding)
        sol = build_fused_dense(
            jnp.float32(t0), jnp.float32(tf),
            y0_batch[:n_total, :n_true],
            states0.yp[:n_total, :n_true],
            jnp.where(flags != 0, rect, 0.0), flags,
            recy[:, :n_total, :n_true], recf[:, :n_total, :n_true],
            ret[2])
        ret = ret + (sol,)
    return ret
