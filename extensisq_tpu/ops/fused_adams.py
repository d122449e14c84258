"""Fused Pallas SWAG (Adams PECE) solver: the whole variable-order
multistep integration in ONE TPU kernel.

Config 2 (Van der Pol mu=1e3, SWAG) is this framework's pathological
case: ~43k sequential adaptive steps with narrow batches, so the XLA
device loop pays the tunnel's fixed per-iteration dispatch floor tens
of thousands of times.  Here the entire integration runs inside one
``pallas_call`` — per-iteration cost drops from ~0.3-0.5 ms of
dispatch to microseconds of VPU arithmetic.

The kernel is a HAND-TILED translation of steppers/adams.py (itself
the dsteps/DDEABM port, shampine.py:180-480): every per-member scalar
is an (sub, 128) tile, every k_max-indexed vector is a Python LIST of
tiles, and the dynamic index ranges of the dsteps recurrences become
per-row masks — exactly the fused_esdirk architecture.  (A double-vmap
of the stepper traces but batches with leading batch dims, which
Mosaic lays out catastrophically; lists of member tiles keep every op
2-D.)  All selection is arithmetic blending (Mosaic rejects i1
broadcasts/selects); NaN/Inf from overflowing members are sanitized
bit-level before entering the carry, as in ops/fused_erk.py.

f32 only — the fast path for rtol >= ~1e-4; the XLA f64 path remains
the conformance solver.  Dropped relative to the XLA stepper: dense
output / t_old bookkeeping and the kle4 stiffness hint.  ``n <= 8``
(small-system ensembles).  The user RHS is the ordinary ``fun(t, y)``
row convention of the other fused kernels: ``y`` is the (n, ...) stack
of member tiles and the result stacks rows.
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..steppers.adams import AdamsStepper, _GSTR
from ..types import IVPParams
from .fused_erk import (_fblend, _iblend, _sanitize, _df_add, _two_sum,
                        _hermite_tiles, _make_ev_spec, _handle_events,
                        _EVENT)
from ._adams_common import TileOps, make_coefficients
from .fused_dense import _REC_UNSET

_RUNNING, _FINISHED, _TOO_SMALL, _OVERFLOW = 0, 1, 2, 3


class _K(NamedTuple):
    """While-loop carry: per-member tiles; vectors as tuples."""
    it: Any
    t: Any
    t_lo: Any
    h: Any
    hold: Any
    y: Any            # tuple (n)
    y_lo: Any         # tuple (n): double-single low words (comp mode)
    yp: Any           # tuple (n)
    wt: Any           # tuple (n)
    phi: Any          # tuple (km+2) of tuple (n)
    psi: Any          # tuple (km)
    alpha: Any
    beta: Any
    sig: Any          # tuple (km+1)
    v: Any
    w: Any
    g: Any            # tuple (km+1)
    gi: Any           # tuple (km-1)
    iv: Any           # tuple (km-2) i32
    k: Any            # i32 tiles
    kold: Any
    kprev: Any
    ns: Any
    ivc: Any
    kgi: Any
    phase1: Any       # i32 mask
    fresh: Any        # i32 mask
    ifail: Any
    status: Any
    nfev: Any
    nsteps: Any
    nfailed: Any
    qrows: Any        # tuple (nq) of tuple (n) t_eval snapshot tiles
    ev: Any           # (gprev, fired, ev_t, ev_rows) event tuples


def solve_fused_adams(fun, t_span, y0_batch, rtol=1e-4, atol=1e-6,
                      first_step=None, k_max=12, max_steps=200_000,
                      block_members=1024, interpret=False,
                      compensated=False, t_eval=None, events=None,
                      max_step=None, params=None, dense=None):
    """Integrate an ensemble with SWAG entirely in one TPU kernel.

    y0_batch: (B, n) float32, n <= 8.  Returns (y_final (B, n),
    status (B,), nsteps (B,), nfev (B,)) with the fused status
    convention (1 finished, 2 too-small-step, 3 overflow/step cap).

    ``compensated=True`` enables the mixed-precision mode (fused_erk
    machinery): a double-single (hi, lo) carry for y and t plus
    Neumaier-compensated predictor/corrector increment sums.  At tens
    of thousands of steps the plain-f32 per-step rounding is a
    ~sqrt(nsteps)*eps32 relative random walk (~1e-5 at 43k steps) —
    above rtol 1e-6; the DS carry reduces it to O(eps32^2) per step,
    extending the fused multistep path to rtol ~1e-6 / atol ~1e-9.
    The phi difference tables remain f32 (their noise enters the
    error estimates, not the solution accumulation).

    ``t_eval``: optional increasing (in integration direction)
    sequence of snapshot times, written FROM INSIDE the kernel as each
    member crosses each point — cubic Hermite from the carried
    step-endpoint (y, yp) pairs (the reference's inter-step evaluation
    form, common.py:766-790; SWAG's own dintp interpolant matches the
    step order but needs the full phi history per point — Hermite from
    the C1 (y, yp) data is the fused-path trade, accurate to ~O(h^4)
    local which the tests pin at tolerance scale).  Appends ``y_eval``
    of shape (len(t_eval), B, n) to the return.  Points at/before t0
    take y0; points a member never reaches take its final state.

    ``events``: callable(s) g(t, y) in the row-stacked convention
    with the reference's ``terminal`` / ``direction`` attributes;
    appends (t_events, y_events, n_events) like the other fused
    kernels (Hermite-bisection roots on the (y, yp) step endpoints,
    first crossing per member, terminal truncation -> status 8).
    Crossings inside the final near-end LINEAR-extrapolation interval
    (below min-step scale) are not detected — use the XLA driver if
    that matters.

    ``max_step``: optional static float cap on |h|, applied on the
    host init and per fresh step (steppers/adams.py:784-786 ==
    shampine.py's hmax clamp).

    ``params``: optional (B, k) float32 per-member scalar parameters;
    when given, ``fun`` and every event callable take a third
    argument ``p``, a k-tuple of per-member tiles broadcastable
    against the rows of ``y`` (host init and kernel both honour it).

    ``dense``: optional int ``R`` — record up to ``R`` per-step
    ``(t, y, yp)`` rows in-kernel and append the evaluable per-member
    :class:`~extensisq_tpu.ops.fused_dense.FusedDenseSolution` as the
    LAST return element.  NOTE the recorded interpolant is CUBIC
    HERMITE on accepted-step endpoints (the fused t_eval convention),
    NOT SWAG's order-k polynomial; ``f0`` comes from the host init.
    The f64 XLA path keeps the conformance dense output.
    """
    y0_batch = jnp.asarray(y0_batch, jnp.float32)
    n_total, n = y0_batch.shape
    if n > 8:
        raise ValueError("fused SWAG targets small systems (n <= 8)")
    km = int(k_max)
    bm = block_members
    if bm % 128:
        raise ValueError("block_members must be a multiple of 128")
    pad = (-n_total) % bm
    if pad:
        y0_batch = jnp.concatenate(
            [y0_batch, jnp.tile(y0_batch[-1:], (pad, 1))])
    B = y0_batch.shape[0]
    grid = B // bm
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

    t0 = float(t_span[0])
    tf = float(t_span[1])
    direction = float(np.sign(tf - t0) or 1.0)
    eps32 = float(np.finfo(np.float32).eps)
    # the min-step floor guards t-accumulation round-off; with the
    # double-single t carry the effective resolution is ~2^-46, so the
    # bare-f32 floor (which kills Van der Pol spikes once t > ~300) is
    # obsolete.  2^-30 leaves ample DS headroom while still bounding a
    # runaway h collapse.  (Stage times still collapse at eps32*|t| for
    # NON-autonomous RHS — the f64 path is the conformance solver.)
    fouru_t = 4.0 * 2.0 ** -30
    gstr = [float(v) for v in _GSTR]
    iqq = [float(1.0 / (q * (q + 1.0))) for q in range(1, km + 2)]

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

    # initial state via the XLA stepper (h_start etc.), then packed
    # into one f32 and one i32 row array
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
                p = tuple(pp[j] for j in range(n_par))
                st = AdamsStepper(lambda t, yy: fun(t, yy, p), n,
                                  np.float32, options={"k_max": km})
                return st.init(t0, y, ivp_params,
                               first_step=first_step)
            states0 = jax.vmap(init_one)(y0_batch, params)
        else:
            stepper = AdamsStepper(fun, n, np.float32,
                                   options={"k_max": km})
            states0 = jax.vmap(
                lambda y: stepper.init(t0, y, ivp_params,
                                       first_step=first_step))(
                                           y0_batch)

    # float rows: t, h, hold, y(n), yp(n), wt(n), phi((km+2)*n),
    # psi(km), alpha(km), beta(km), sig(km+1), v(km), w(km), g(km+1),
    # gi(km-1)
    fparts = [states0.t[:, None],
              jnp.zeros((B, 1), jnp.float32),           # t_lo
              states0.h[:, None],
              states0.hold[:, None], states0.y,
              jnp.zeros((B, n), jnp.float32),           # y_lo
              states0.yp, states0.wt,
              states0.phi.reshape(B, -1), states0.psi, states0.alpha,
              states0.beta, states0.sig, states0.v, states0.w,
              states0.g, states0.gi]
    # snapshot rows start at y0: covers points at/before t0
    fparts += [y0_batch] * nq
    if n_ev:
        with jax.enable_x64(False):
            y0_rows_host = jnp.asarray(y0_batch, jnp.float32).T
            t0_host = jnp.full((B,), t0, jnp.float32)
            p_host = (tuple(params[:, j] for j in range(n_par))
                      if n_par else None)
            for ge, _, _ in ev_spec:
                ge_h = ((lambda t, y, ge=ge: ge(t, y, p_host))
                        if n_par else ge)
                g0 = jnp.asarray(ge_h(t0_host, y0_rows_host),
                                 jnp.float32).reshape(B, 1)
                fparts += [g0,
                           jnp.zeros((B, 1), jnp.float32),  # ev_t
                           y0_batch]                        # ev_rows
    F0 = jnp.concatenate([p.astype(jnp.float32) for p in fparts],
                         axis=1).T                      # (f_rows, B)
    # int rows: k, kold, kprev, ns, ivc, kgi, iv(km-2), phase1, status,
    # nfev, nsteps, nfailed
    iparts = [states0.k[:, None], states0.kold[:, None],
              states0.kprev[:, None], states0.ns[:, None],
              states0.ivc[:, None], states0.kgi[:, None], states0.iv,
              states0.phase1[:, None].astype(jnp.int32),
              states0.status[:, None], states0.nfev[:, None],
              states0.nsteps[:, None], states0.nfailed[:, None],
              jnp.ones((B, 1), jnp.int32),       # fresh
              jnp.zeros((B, 1), jnp.int32)]      # ifail
    iparts += [jnp.zeros((B, 1), jnp.int32)] * n_ev   # fired latches
    I0 = jnp.concatenate([p.astype(jnp.int32) for p in iparts],
                         axis=1).T
    f_rows = F0.shape[0]
    i_rows = I0.shape[0]
    n_iv = max(km - 2, 1)
    status_row = 6 + n_iv + 1

    def kernel(F_ref, I_ref, *rest):
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
        F_in = F_ref[:].reshape(f_rows, sub, 128)
        I_in = I_ref[:].reshape(i_rows, sub, 128)
        if n_par:
            prt = par_ref[:].reshape(n_par, sub, 128)
            p = tuple(prt[j] for j in range(n_par))
            fun1 = lambda t, yy: fun(t, yy, p)            # noqa: E731
            wrap = lambda g: (lambda t, yy: g(t, yy, p))  # noqa: E731
        else:
            fun1 = fun
            wrap = lambda g: g                            # noqa: E731
        ev_spec_k = (None if ev_spec is None else
                     [(wrap(ge), tm, dr) for ge, tm, dr in ev_spec])
        fzero = F_in[0] * 0.0
        izero = fzero.astype(jnp.int32)

        # the while carry is just (F, I, it): three consolidated
        # arrays.  Carrying the ~100 individual member tiles instead
        # costs ~180 us/iteration of fixed overhead on v5e.
        def unpack(F, I, it):
            def frows(off, count):
                return [F[off + r] for r in range(count)]

            fo = 4
            y = frows(fo, n); fo += n
            y_lo = frows(fo, n); fo += n
            yp = frows(fo, n); fo += n
            wt = frows(fo, n); fo += n
            phi = [frows(fo + i * n, n) for i in range(km + 2)]
            fo += (km + 2) * n
            psi = frows(fo, km); fo += km
            alpha = frows(fo, km); fo += km
            beta = frows(fo, km); fo += km
            sig = frows(fo, km + 1); fo += km + 1
            v = frows(fo, km); fo += km
            w = frows(fo, km); fo += km
            g = frows(fo, km + 1); fo += km + 1
            gi = frows(fo, km - 1); fo += km - 1
            qrows = [tuple(frows(fo + q * n, n)) for q in range(nq)]
            fo += nq * n
            ev_gp, ev_tt, ev_rw = [], [], []
            for _ in range(n_ev):
                ev_gp.append(F[fo]); fo += 1
                ev_tt.append(F[fo]); fo += 1
                ev_rw.append(tuple(frows(fo, n))); fo += n
            io = 6
            iv = [I[io + r] for r in range(n_iv)]; io += n_iv
            return _K(
                it=it, t=F[0], t_lo=F[1], h=F[2], hold=F[3],
                y=tuple(y), y_lo=tuple(y_lo), yp=tuple(yp),
                wt=tuple(wt),
                phi=tuple(tuple(rw) for rw in phi),
                psi=tuple(psi), alpha=tuple(alpha), beta=tuple(beta),
                sig=tuple(sig), v=tuple(v), w=tuple(w), g=tuple(g),
                gi=tuple(gi), iv=tuple(iv),
                k=I[0], kold=I[1], kprev=I[2], ns=I[3], ivc=I[4],
                kgi=I[5], phase1=I[io], status=I[io + 1],
                nfev=I[io + 2], nsteps=I[io + 3], nfailed=I[io + 4],
                fresh=I[io + 5], ifail=I[io + 6],
                qrows=tuple(qrows),
                ev=((tuple(ev_gp),
                     tuple(I[io + 7 + i] for i in range(n_ev)),
                     tuple(ev_tt), tuple(ev_rw))
                    if n_ev else ()))

        def pack(st):
            frows_out = [st.t, st.t_lo, st.h, st.hold]
            frows_out += (list(st.y) + list(st.y_lo) + list(st.yp)
                          + list(st.wt))
            for rw in st.phi:
                frows_out += list(rw)
            frows_out += (list(st.psi) + list(st.alpha)
                          + list(st.beta) + list(st.sig) + list(st.v)
                          + list(st.w) + list(st.g) + list(st.gi))
            for rw in st.qrows:
                frows_out += list(rw)
            if n_ev:
                gp, evf, evt, evr = st.ev
                for i in range(n_ev):
                    frows_out += [gp[i], evt[i]] + list(evr[i])
            irows_out = [st.k, st.kold, st.kprev, st.ns, st.ivc,
                         st.kgi] + list(st.iv) \
                + [st.phase1, st.status, st.nfev, st.nsteps,
                   st.nfailed, st.fresh, st.ifail]
            if n_ev:
                irows_out += list(st.ev[1])
            return jnp.stack(frows_out), jnp.stack(irows_out)

        tfs = tf + fzero
        dirs = direction

        # tile/list helpers + the dsteps block-1 coefficient update:
        # layout-generic machinery shared with fused_adams_grid
        # (_adams_common.py; arithmetic blends, not selects — measured
        # ~1.5x faster than select_n on v5e)
        O = TileOps(fzero, izero)
        fb, ib = O.fb, O.ib
        vsel, visel = O.vsel, O.visel
        vtake, vitake, vput = O.vtake, O.vitake, O.vput
        ctake, cliped = O.ctake, O.cliped
        coefficients = make_coefficients(km, iqq, n_iv, O)

        def member_norm(rows):
            acc = fzero
            for r in rows:
                acc = acc + r * r
            return jnp.sqrt(acc * (1.0 / len(rows)))

        def fcall(tt, rows):
            out = fun1(tt, jnp.stack(rows))
            return [out[r] for r in range(n)]

        # ------------------------------------------------------------------
        def cond_loop(carry):
            F, I, it = carry
            run = ib(I[status_row] == _RUNNING, izero + 1, izero)
            return (jnp.max(run) > 0) & (it < max_steps)

        def body(carry):
            F, I, it = carry
            st = unpack(F, I, it)
            running = st.status == _RUNNING
            tc = st.t + st.t_lo          # double-single time carry
            min_step = fouru_t * jnp.abs(tc)
            # remaining interval in DS (see fused_esdirk.py)
            d = (tfs - st.t) - st.t_lo
            near_end = jnp.abs(d) <= min_step

            fresh_b = st.fresh != 0
            # clamp h toward the boundary on fresh steps
            h_cl = fb(dirs * (st.h - d) > 0, d, st.h)
            if max_step is not None:
                # per fresh step, like steppers/adams.py:784-786
                h_cl = jnp.sign(h_cl) * jnp.minimum(
                    jnp.abs(h_cl), float(max_step))
            h_in = fb(fresh_b, h_cl, st.h)
            ifail = ib(fresh_b, izero, st.ifail)

            kk, nss = st.k, st.ns
            kp1, km1, km2 = kk + 1, kk - 1, kk - 2

            # ns update (reset on h change happened via ns=0 writeback)
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
            phi_n = [[fb((r >= ns2) & (r < kk),
                         st.phi[r][j] * beta_ext[r], st.phi[r][j])
                      for j in range(n)] for r in range(km + 2)]
            phi_k = [vtake([phi_n[r][j] for r in range(km + 2)],
                           cliped(kk, 0, km + 1)) for j in range(n)]
            for j in range(n):
                col = [phi_n[r][j] for r in range(km + 2)]
                col = vput(col, cliped(kp1, 0, km + 1), phi_k[j])
                col = vput(col, cliped(kk, 0, km + 1), fzero)
                for r in range(km + 2):
                    phi_n[r][j] = col[r]
            p = []
            pred_s = []          # comp mode: increment sum + low part
            pred_c = []
            for j in range(n):
                if compensated:
                    acc = fzero
                    comp = fzero
                    for r in range(km + 1):
                        gw = fb(r < kk, g_ext[r], fzero)
                        acc, e = _two_sum(acc, gw * phi_n[r][j])
                        comp = comp + e
                    inc = h_in * acc
                    small = h_in * comp
                    pred_s.append(inc)
                    pred_c.append(small)
                    p.append(st.y[j] + (inc + (small + st.y_lo[j])))
                else:
                    acc = fzero
                    for r in range(km + 1):
                        gw = fb(r < kk, g_ext[r], fzero)
                        acc = acc + gw * phi_n[r][j]
                    p.append(h_in * acc + st.y[j])
            # reverse cumulative sum over rows < k
            for j in range(n):
                acc = fzero
                new_col = [None] * (km + 2)
                for r in range(km + 1, -1, -1):
                    masked = fb(r < kk, phi_n[r][j], fzero)
                    acc = acc + masked
                    new_col[r] = fb(r < kk, acc, phi_n[r][j])
                for r in range(km + 2):
                    phi_n[r][j] = new_col[r]

            x = tc + h_in
            yp_pred = fcall(x, p)
            attempted = running & ~near_end
            nfev2 = st.nfev + ib(attempted, izero + 1, izero)

            wtn = [jnp.float32(atol) + jnp.float32(rtol) * 0.5
                   * (jnp.abs(p[j]) + jnp.abs(st.y[j]))
                   for j in range(n)]
            inv_wt = [1.0 / wtn[j] for j in range(n)]
            temp4 = [yp_pred[j] - phi_n[0][j] for j in range(n)]
            absh = jnp.abs(h_in)

            erk = absh * member_norm([temp4[j] * inv_wt[j]
                                      for j in range(n)])
            phi_km1 = [vtake([phi_n[r][j] for r in range(km + 2)],
                             cliped(km1, 0, km + 1)) for j in range(n)]
            phi_km2 = [vtake([phi_n[r][j] for r in range(km + 2)],
                             cliped(km2, 0, km + 1)) for j in range(n)]
            erkm1 = absh * member_norm(
                [(phi_km1[j] + temp4[j]) * inv_wt[j]
                 for j in range(n)]) \
                * vtake(sig_n, cliped(km1, 0, km)) \
                * ctake(gstr, cliped(km2, 0, 12))
            erkm2 = absh * member_norm(
                [(phi_km2[j] + temp4[j]) * inv_wt[j]
                 for j in range(n)]) \
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
            phi_r = [[None] * n for _ in range(km + 2)]
            for j in range(n):
                for r in range(km + 2):
                    up = phi_n[r + 1][j] if r + 1 < km + 2 \
                        else phi_n[km + 1][j]
                    val = fb(r < kk, phi_n[r][j] - up, phi_n[r][j])
                    bsafe = fb(beta_ext[r] == 0.0, fzero + 1.0,
                               beta_ext[r])
                    phi_r[r][j] = fb(r < kk, val / bsafe, val)
            psi_r = [fb(r < km1,
                        (psi_n[r + 1] if r + 1 < km
                         else psi_n[km - 1]) - h_in, psi_n[r])
                     for r in range(km)]

            ifail2 = ifail + 1
            temp2 = fb((ifail2 >= 4) & (0.5 < 0.25 * erk),
                       jnp.sqrt(0.5 / jnp.maximum(erk, 1e-30)),
                       fzero + 0.5)
            knew_fail = ib(ifail2 >= 3, izero + 1, knew)
            h_fail = h_in * temp2
            failed = attempted & ~success
            status2 = ib(failed & (jnp.abs(h_fail) < min_step),
                         izero + _TOO_SMALL, st.status)

            # block 4: correct, evaluate, order/step selection
            g_k = vtake(g_n, cliped(kk, 0, km))
            if compensated:
                # full step increment in double-single: the per-step
                # y + inc rounding (eps32*|y| random walk over tens of
                # thousands of steps) moves to the low word
                y_corr, y_corr_lo = [], []
                for j in range(n):
                    s1, e1 = _two_sum(pred_s[j],
                                      h_in * g_k * temp4[j])
                    lo = e1 + pred_c[j]
                    hi, lo1 = _df_add(st.y[j], st.y_lo[j], s1)
                    hi, lo2 = _two_sum(hi, lo1 + lo)
                    y_corr.append(hi)
                    y_corr_lo.append(lo2)
            else:
                y_corr = [h_in * g_k * temp4[j] + p[j]
                          for j in range(n)]
                y_corr_lo = list(st.y_lo)
            yp_new = fcall(x, y_corr)
            nfev2 = nfev2 + ib(success, izero + 1, izero)

            phi_f = [[None] * n for _ in range(km + 2)]
            for j in range(n):
                col = [phi_n[r][j] for r in range(km + 2)]
                pkn = yp_new[j] - phi_n[0][j]
                col = vput(col, cliped(kk, 0, km + 1), pkn)
                col = vput(col, cliped(kp1, 0, km + 1),
                           pkn - vtake(col, cliped(kp1, 0, km + 1)))
                for r in range(km + 2):
                    phi_f[r][j] = fb(r < kk, col[r] + pkn, col[r])

            phase1_b = (st.phase1 != 0) & ~((knew == km1)
                                            | (kk == km))
            phi_kp1 = [vtake([phi_f[r][j] for r in range(km + 2)],
                             cliped(kp1, 0, km + 1)) for j in range(n)]
            erkp1 = ctake(gstr, cliped(kk, 0, 12)) * absh \
                * member_norm([phi_kp1[j] / wtn[j] for j in range(n)])
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
                                   fb(can_est & raise2, erkp1, erk)))))

            two_next = ctake([float(2.0 ** (q + 1))
                              for q in range(km + 2)],
                             cliped(k_next, 0, km + 1))
            double = phase1_b | (0.5 >= erk_next * two_next)
            keep_h = 0.5 >= erk_next
            # r = (0.5/erk_next)^(1/(k_next+1)) via exp/log
            rr = jnp.exp(jnp.log(jnp.maximum(
                0.5 / jnp.maximum(erk_next, 1e-30), 1e-30))
                / (k_next.astype(jnp.float32) + 1.0))
            h_red = absh * jnp.clip(rr, 0.5, 0.9)
            h_red = jnp.sign(h_in) * jnp.maximum(h_red, min_step)
            h_next = fb(double, h_in + h_in,
                        fb(keep_h, h_in, h_red))

            t_adv, t_lo_adv = _df_add(st.t, st.t_lo, h_in)
            # landing test on the DOUBLE-SINGLE remainder: an f32
            # |tf - x| <= eps*|x| test is blind once eps*|t| exceeds
            # the remaining interval (e.g. unit spans at t ~ 1e6);
            # the true remainder reaches ~ulp(h) only on the clamped
            # landing step, and a missed landing self-corrects via
            # further (tiny) steps
            rem = (tfs - t_adv) - t_lo_adv
            is_last = success & (jnp.abs(rem)
                                 <= 8.0 * eps32 * jnp.abs(h_in))
            t_new = fb(is_last, tfs, t_adv)
            t_lo_new = fb(is_last, fzero, t_lo_adv)

            # near-end linear extrapolation
            if compensated:
                y_ext, y_ext_lo = [], []
                for j in range(n):
                    hi, lo = _df_add(st.y[j], st.y_lo[j],
                                     d * st.yp[j])
                    y_ext.append(hi)
                    y_ext_lo.append(lo)
            else:
                y_ext = [st.y[j] + d * st.yp[j] for j in range(n)]
                y_ext_lo = list(st.y_lo)
            extrap = running & near_end

            ok = success
            ok_any = ok | extrap
            status3 = ib((status2 == _RUNNING) & (is_last | extrap),
                         izero + _FINISHED, status2)
            hit_cap = (st.it + 1 >= max_steps) & (status3 == _RUNNING)
            status3 = ib(hit_cap, izero + _OVERFLOW, status3)

            # t_eval snapshots: accepted steps that crossed tq get
            # cubic Hermite from the step-endpoint (y, yp) pairs
            # (common.py:766-790 semantics); near-end extrapolation
            # steps evaluate the same line at tq
            qrows_new = st.qrows
            if nq:
                h_safe = fb(h_in == 0.0, fzero + 1.0, h_in)
                y_old_rows = list(st.y)
                f_old_rows = list(st.yp)
                qrows_new = []
                for q in range(nq):
                    tqc = tq_vals[q]
                    ahead = dirs * (tqc - st.t) > 0.0
                    crossed = ok & ahead & (dirs * tqc
                                            <= dirs * t_new)
                    theta = (tqc - st.t) / h_safe
                    vals = _hermite_tiles(theta, h_in, y_old_rows,
                                          f_old_rows, y_corr, yp_new)
                    cross_e = extrap & ahead & (dirs * tqc
                                                <= dirs * tfs)
                    ext = [st.y[j] + (tqc - st.t) * st.yp[j]
                           for j in range(n)]
                    qrows_new.append(tuple(
                        fb(crossed, vals[j],
                           fb(cross_e, ext[j], st.qrows[q][j]))
                        for j in range(n)))
                qrows_new = tuple(qrows_new)

            # events (y_corr / yp_new are the step's endpoints)
            ev_new = st.ev
            trunc = izero != izero
            te = fzero
            y_te_rows = None
            if n_ev:
                h_safe_e = fb(h_in == 0.0, fzero + 1.0, h_in)
                ev_new, trunc, te, y_te_rows = _handle_events(
                    ev_spec_k, st.ev, ok, dirs, st.t, t_new, h_in,
                    h_safe_e, list(st.y), list(st.yp),
                    list(y_corr), list(yp_new), fzero, izero,
                    jnp.stack)
                status3 = ib(trunc, izero + _EVENT, status3)

            # writeback (flat semantics: failed-attempt restores carry)
            y_out = []
            ylo_out = []
            for j in range(n):
                val = fb(extrap, y_ext[j],
                         fb(ok, y_corr[j], st.y[j]))
                if n_ev and y_te_rows is not None:
                    val = fb(trunc, y_te_rows[j], val)
                val, _ = _sanitize(val)
                y_out.append(val)
                lval = fb(extrap, y_ext_lo[j],
                          fb(ok, y_corr_lo[j], st.y_lo[j]))
                lval, _ = _sanitize(lval)
                ylo_out.append(lval)
            yp_out = []
            for j in range(n):
                val = fb(ok, yp_new[j], st.yp[j])
                val, _ = _sanitize(val)
                yp_out.append(val)
            if n_rec:
                t_rec = fb(trunc, te, fb(extrap, tfs,
                                         fb(ok, t_new, st.t)))

                @pl.when(st.it < n_rec)
                def _():
                    rect_ref[st.it] = fb(
                        ok | extrap, t_rec,
                        fzero + _REC_UNSET).reshape(1, bm)
                    recy_ref[st.it] = jnp.stack(y_out).reshape(n, bm)
                    recf_ref[st.it] = jnp.stack(yp_out).reshape(n, bm)
            h_out = fb(ok, h_next, fb(extrap, st.h, h_fail))
            h_out = fb(attempted | extrap, h_out, st.h)
            h_out, _ = _sanitize(h_out)
            phi_out = [[fb(attempted,
                           fb(ok, phi_f[r][j], phi_r[r][j]),
                           st.phi[r][j])
                        for j in range(n)] for r in range(km + 2)]
            psi_out = [fb(attempted, fb(ok, psi_n[r], psi_r[r]),
                          st.psi[r]) for r in range(km)]

            def outv(new, old):
                return [fb(attempted, a, b) for a, b in zip(new, old)]

            def outiv(new, old):
                return [ib(attempted, a, b) for a, b in zip(new, old)]

            st2 = _K(
                it=st.it + 1,
                t=fb(trunc, te, fb(extrap, tfs,
                                   fb(ok, t_new, st.t))),
                t_lo=fb(trunc | extrap | (ok & is_last), fzero,
                        fb(ok, t_lo_new, st.t_lo)),
                h=h_out,
                hold=fb(ok, h_in, st.hold),
                y=tuple(y_out), y_lo=tuple(ylo_out),
                yp=tuple(yp_out),
                wt=tuple([fb(ok, wtn[j], st.wt[j]) for j in range(n)]),
                phi=tuple(tuple(rw) for rw in phi_out),
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
            F2, I2 = pack(st2)
            return F2, I2, st2.it

        if n_rec:
            # non-accepted / never-reached rows read the sentinel
            # (arithmetic blends forbid NaN coding: 0 * NaN = NaN)
            rect_ref[:] = jnp.full((n_rec, 1, bm), _REC_UNSET,
                                   jnp.float32)
        Ff, If, _ = jax.lax.while_loop(
            cond_loop, body,
            (F_in, I_in, jnp.zeros((), jnp.int32)))
        stf = unpack(Ff, If, jnp.zeros((), jnp.int32))

        yout_ref[:] = jnp.stack(list(stf.y)).reshape(n, bm).T
        stat_ref[:] = stf.status.reshape(1, bm)
        nstep_ref[:] = stf.nsteps.reshape(1, bm)
        nfev_ref[:] = stf.nfev.reshape(1, bm)
        if nq:
            # flush points the member never reached with its final y
            for q in range(nq):
                unreached = direction * tq_vals[q] > direction * stf.t
                rows = [_fblend(unreached, stf.y[j],
                                stf.qrows[q][j]) for j in range(n)]
                yq_ref[q] = jnp.stack(rows).reshape(n, bm).T
        if n_ev:
            _, evf, ev_t, ev_rows = stf.ev
            for i in range(n_ev):
                tev_ref[i] = ev_t[i].reshape(1, bm)
                yev_ref[i] = jnp.stack(
                    list(ev_rows[i])).reshape(n, bm).T
                fev_ref[i] = evf[i].reshape(1, bm)

    out_shapes = [
        jax.ShapeDtypeStruct((B, n), jnp.float32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
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
            jax.ShapeDtypeStruct((nq, B, n), jnp.float32))
        out_specs.append(
            pl.BlockSpec((nq, bm, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM))
    if n_ev:
        out_shapes += [
            jax.ShapeDtypeStruct((n_ev, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((n_ev, B, n), jnp.float32),
            jax.ShapeDtypeStruct((n_ev, 1, B), jnp.int32),
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
            jax.ShapeDtypeStruct((n_rec, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((n_rec, n, B), jnp.float32),
            jax.ShapeDtypeStruct((n_rec, n, B), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((n_rec, 1, bm), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rec, n, bm), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rec, n, bm), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ]
    in_specs = [
        pl.BlockSpec((f_rows, bm), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((i_rows, bm), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [F0, I0]
    if n_par:
        in_specs.append(pl.BlockSpec((n_par, bm), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(params.T)
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
        rect, recy, recf = outs[k:k + 3]
        rect = rect[:, 0, :n_total]
        flags = (rect < 0.5 * _REC_UNSET).astype(jnp.int32)
        # f0 comes from the HOST init (states0.yp is yp(t0))
        sol = build_fused_dense(
            jnp.float32(t0), jnp.float32(tf), y0_batch[:n_total],
            states0.yp[:n_total],
            jnp.where(flags != 0, rect, 0.0), flags,
            jnp.swapaxes(recy[:, :, :n_total], 1, 2),
            jnp.swapaxes(recf[:, :, :n_total], 1, 2), ret[2])
        ret = ret + (sol,)
    return ret
