"""Fused Pallas ESDIRK solver: implicit ensemble integration in ONE
TPU kernel (round-1 VERDICT item 3 / SURVEY section 7.1 step 8).

The XLA device path for small-n implicit ensembles is dispatch-bound:
~100 kernels per step plus ~20 per Newton iteration (config 4b, the
pendulum-DAE ensemble, ran at 2.7 ms/step in round 1).  Here the whole
adaptive implicit integration — per-stage modified-Newton iterations,
per-member dense linear solves, the error filter, the implicit
controller and the time loop — runs inside a single ``pallas_call``.

Layout follows ops/fused_erk.py: members fill (8, 128) vector tiles,
state is (n, sub, 128) per block, every operation vectorizes across
members on the VPU.  ``n`` is small (<= 8) and everything over the
state dimension is UNROLLED at trace time:

* the Jacobian is n forward-mode JVPs of the row-stacked RHS (one
  basis tangent per column — autodiff, no user ``jac`` needed);
* the Newton matrix W = Sc (M - h d J) is an n x n grid of member
  tiles; each Newton iteration solves it by fully unrolled Gaussian
  elimination with bubble partial pivoting, all row selection done by
  arithmetic blending (Mosaic rejects most selects);
* re-factoring per iteration replaces the reference's LU-reuse ladder
  (common.py:2110-2127): a vectorized n<=8 elimination costs a few
  hundred VPU ops — cheaper than divergent per-member reuse
  bookkeeping, and it keeps J always current, so the
  retry-with-fresh-Jacobian rung of the failure ladder vanishes
  (a convergence failure goes straight to the step-size reduction,
  common.py:2063-2077 with current_J=True).

Newton semantics (rate tracking, divergence prediction, early exit)
mirror steppers/esdirk.py:_stage_newton == common.py:2183-2232.
Mass matrices: diagonal M is handled natively; DENSE (incl. hidden /
similarity-transformed, rank-deficient) M is auto-rotated on the host
via SVD into an equivalent unit-mass diagonal DAE (w = V^T y,
w'_d = (U^T f)_d / s_d), solved in rotated coordinates with all error
and Newton norms taken back in USER coordinates, and un-rotated on
output — the fused twin of the stepper's _handle_M machinery
(common.py:1778-1821).  Algebraic rows get the 1/(h d) rescale of
common.py:2038-2044.  For a DAE, pass a consistent ``yp0`` (e.g. from
the host driver's consistent-IC projection); for ODEs it defaults to
f(t0, y0).

f32 only, like the other fused kernels: the fast path for tolerance
regimes f32 supports; the XLA f64 path remains the conformance solver.
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._config import (NEWTON_MAXITER, MAX_RATE, MAX_FACTOR_NRF,
                       MIN_FACTOR, MAX_FACTOR, MAX_FACTOR0)
from ..core.controller import resolve_controller
from .fused_erk import (_fblend, _iblend, _sanitize, _member_norm,
                        _df_add, _two_sum, _comp_wsum, _hermite_tiles,
                        _make_ev_spec, _handle_events, _EVENT)

_RUNNING, _FINISHED, _TOO_SMALL, _OVERFLOW = 0, 1, 2, 3
from .fused_dense import _REC_UNSET  # noqa: E402


def _pow(x, e):
    """x**e for member tiles; Mosaic cannot legalize powf."""
    return jnp.exp(jnp.log(jnp.maximum(x, 1e-30)) * e)


def solve_fused_esdirk(fun, t_span, y0_batch, method=None, M=None,
                       yp0_batch=None, rtol=1e-4, atol=1e-6,
                       first_step=None, max_steps=100_000,
                       block_members=1024, interpret=False,
                       compensated=False, t_eval=None, events=None,
                       max_step=None, params=None, block_base=None,
                       dense=None):
    """Integrate an ensemble of small stiff systems / index-1 DAEs in
    one TPU kernel.

    y0_batch: (B, n) float32, n <= 8.  ``fun(t, y)`` row-stacked like
    the other fused kernels (y is (n, ...) and the result stacks rows).
    ``M``: None or a length-n diagonal (zeros mark algebraic rows).
    ``yp0_batch``: (B, n) consistent initial derivatives (required for
    DAEs; defaults to fun(t0, y0) otherwise).  Returns
    (y_final (B, n), status (B,), nsteps (B,), nfev (B,)).

    ``compensated=True`` enables the mixed-precision mode (the
    fused_erk machinery): a double-single (hi, lo) carry for y and
    Neumaier-compensated dots over the stage increments z_j for the
    solution update and the embedded error.  Since h*K_j == z_j
    exactly, the compensated dots work on the z rows directly —
    removing both the per-step accumulation rounding and the
    error-estimate cancellation (the two f32 failure modes at tight
    tolerances), and the K_j = z_j/h double rounding with them.  This
    extends the fused implicit path to rtol ~1e-6 / atol ~1e-9.  The
    per-stage Newton floor is unchanged (f(y_pred) arguments still
    round to f32), so stage solutions carry O(eps32/rtol)-of-scale
    noise; the controller absorbs it (see test
    test_fused_esdirk_compensated_official_tol).

    ``t_eval``: optional increasing (in integration direction)
    sequence of snapshot times, interpolated FROM INSIDE the kernel as
    each member crosses each point — cubic Hermite from the carried
    step-endpoint (y, y') pairs, the reference's inter-step evaluation
    semantics (common.py:766-790; y' at the endpoints is the stiffly
    accurate last stage K_{s-1}).  Appends ``y_eval`` of shape
    (len(t_eval), B, n) to the return.  Points at/before t0 take y0;
    points a member never reaches take its final state.  For
    dense/hidden-M DAEs the snapshots are un-rotated to user
    coordinates like the endpoint.

    ``events``: callable(s) g(t, y) in the row-stacked convention,
    honouring the reference's ``terminal`` / ``direction`` attribute
    protocol; appends (t_events, y_events, n_events) exactly like
    ``solve_fused_erk`` (in-kernel Hermite bisection on the carried
    (y, y') endpoints, first crossing per member, terminal
    truncation -> status 8).  With a DENSE / hidden mass matrix the
    kernel integrates in rotated coordinates; event functions still
    see USER coordinates (each g is wrapped through the y = V w
    back-rotation) and y_events is un-rotated on output.

    ``max_step``: optional static float cap on |h|, the stepper's
    reassess-stepsize semantics (steppers/esdirk.py:465-466 ==
    common.py:2168-2181): exceeding it clamps h and forces the
    standard controller for that step.

    ``params``: optional (B, k) float32 per-member scalar parameters;
    when given, ``fun`` and every event callable take a third
    argument ``p``, a k-tuple of per-member tiles broadcastable
    against the rows of ``y`` (the Newton Jacobian JVPs differentiate
    through the parameterized RHS per member).

    ``block_base``: the simultaneous-corrector mode for augmented
    variational systems (ops/fused_sens.py).  The state is
    ``n = block_base * n_blocks`` rows whose TRUE Jacobian is block
    lower triangular with every diagonal block equal to the base
    block J = df/dy (sensitivity rows are linear: s' = J s + f_p).
    The kernel then builds W = I - h d J on the ``block_base`` x
    ``block_base`` BASE block only and each Newton iteration solves
    blockwise with that one factor — the classical simultaneous
    corrector (CVODES's SIM scheme): the neglected strictly-lower
    coupling makes the Newton error matrix nilpotent, so the
    iteration still converges; the rate/divergence guard of
    common.py:2183-2232 handles it like any modified-Newton lag.
    Error control runs on the FULL augmented state (internal
    differentiation).  Plain ODEs only (M/rot unsupported here —
    DAE sensitivities stay on the XLA path).

    ``dense``: optional int ``R`` — record up to ``R`` per-step
    ``(t, y, y')`` rows from inside the kernel (y' is the stiffly
    accurate last stage K_{s-1}) and append an evaluable per-member
    :class:`~extensisq_tpu.ops.fused_dense.FusedDenseSolution` (cubic
    Hermite segments — the reference's inter-step evaluation,
    common.py:766-821) as the LAST return element.  ``R`` counts loop
    iterations (accepted + rejected); overflowing members get
    ``sol.valid[b] = False``.  For dense/hidden-M DAEs the rows are
    un-rotated to user coordinates like every other output.
    """
    if method is None:
        from ..methods import Kv3I as method
    tab = method.tableau
    A = np.asarray(tab.A, dtype=np.float32)
    C = np.asarray(tab.C, dtype=np.float32)
    E = np.asarray(tab.E, dtype=np.float32)
    Az = np.asarray(tab.Az, dtype=np.float32)
    dd = float(tab.d)
    kappa = float(tab.kappa)
    s = tab.n_stages
    filter_error = tab.filter_error
    err_order = min(tab.order_secondary, tab.order)
    cc = resolve_controller(None, tab.sc_params, -1.0 / (err_order + 1),
                            implicit=True)
    eps32 = float(np.finfo(np.float32).eps)
    # min-step floor: the double-single t carry resolves ~2^-46, so
    # use a 2^-30-based floor instead of the bare-f32 one (see
    # fused_adams.py; non-autonomous stage times still see eps32*|t|)
    h_min_a = 10.0 * 2.0 ** -31 / tab.c_spacing()
    h_min_b = float(np.sqrt(np.finfo(np.float32).tiny))

    y0_batch = jnp.asarray(y0_batch, jnp.float32)
    n_total, n = y0_batch.shape
    if block_base is not None:
        nb = int(block_base)
        if M is not None:
            raise ValueError("block_base (simultaneous corrector) "
                             "supports plain ODEs only — no mass "
                             "matrix; use the XLA path for DAE "
                             "sensitivities")
        if n % nb or nb > 8 or n > 64:
            raise ValueError("block_base must divide n, with "
                             "block_base <= 8 and n <= 64")
    else:
        nb = n
        if n > 8:
            raise ValueError("fused ESDIRK targets small systems "
                             "(n <= 8); use the XLA path for larger "
                             "states")
    # Newton round-off floor.  The reference's sqrt(n)*eps^0.8
    # (common.py:1935) assumes the dz noise floor sits below it; in f32
    # the floor in SCALE units is ~eps32*|y|/(rtol*|y|) = eps32/rtol —
    # far above eps32^0.8 at practical tolerances.  Updates below a few
    # ulps of y cannot improve the f32 iterate, so treat them as
    # converged (otherwise the rate measurement turns to noise, reads
    # as divergence, and the member loops h down for ever).
    tiny_err = float(np.sqrt(n) * max(eps32 ** 0.8, 4.0 * eps32 / rtol))

    rot = None
    if M is not None:
        M = np.asarray(M, dtype=np.float64)
        if M.ndim == 2 and not np.array_equal(M, np.diag(np.diag(M))):
            # dense / hidden mass matrix: host-side SVD pre-rotation
            # (the stepper's _handle_M split, common.py:1778-1821).
            # With M = U S V^T, substituting w = V^T y and
            # premultiplying M y' = f by diag(1/s_d) U^T gives the
            # UNIT-mass system  w'_d = (U^T f)_d / s_d,
            # 0 = (U^T f)_a  — exactly the form this kernel solves.
            # Absorbing the nonzero singular values keeps the error
            # filter's mass-multiply at unit scale (a bare S w' = g
            # rotation inflates the filtered error by |s| and costs
            # ~s^(1/3) extra steps); all norms are taken back in USER
            # coordinates via to_user below.
            Urot, sv, Vhrot = np.linalg.svd(M)
            cond_lim = sv[0] * n ** 2 * eps32
            sv = np.where(sv < cond_lim, 0.0, sv)
            rot = (Urot, Vhrot, sv)
            M = (sv > 0.0).astype(np.float64)
        elif M.ndim == 2:
            M = np.diag(M)
        M = M.astype(np.float32)
        if M.shape != (n,):
            raise ValueError("M must be (n,), a diagonal (n, n), or a "
                             "general (n, n) mass matrix")
        if yp0_batch is None and np.any(M == 0.0):
            raise ValueError("DAE: pass consistent yp0_batch (e.g. "
                             "from the host driver's projection)")
    m_diag = M                     # None or (n,) np.float32

    if rot is not None:
        Urot, Vhrot, svrot = rot
        # scaled left transform: rows of U^T divided by s_d (unit-mass
        # differential rows; algebraic rows unscaled)
        UTs = Urot.T / np.where(svrot > 0.0, svrot, 1.0)[:, None]
        user_fun = fun

        def fun(t, w, *pargs):     # noqa: F811 — rotated-system RHS
            # y = V w; g = diag(1/s) U^T f(t, y); unrolled matvecs
            # with python-float coefficients (n <= 8), the
            # tableau-constant pattern.  *pargs forwards the optional
            # per-member params tuple to the user RHS.
            y_rows = [sum((float(Vhrot[j, i]) * w[j] for j in range(n)
                           if Vhrot[j, i] != 0.0), w[0] * 0.0)
                      for i in range(n)]
            fr = user_fun(t, jnp.stack(y_rows), *pargs)
            g_rows = [sum((float(UTs[i, j]) * fr[j] for j in range(n)
                           if UTs[i, j] != 0.0), fr[0] * 0.0)
                      for i in range(n)]
            return jnp.stack(g_rows)

        # full-precision rotations: TPU's default f32 matmul uses
        # bf16 multiplies (~3e-3 relative), which perturbs the
        # consistent DAE start enough to double the step count and
        # push the endpoint to ~4e-3 (measured on-chip; interpret
        # mode was 11 steps / 1.8e-4).  HIGHEST restores f32.
        _hi = jax.lax.Precision.HIGHEST
        VhT = jnp.asarray(Vhrot.T, jnp.float32)
        y0_batch = jnp.matmul(y0_batch, VhT,
                              precision=_hi)            # w = V^T y
        if yp0_batch is not None:
            yp0_batch = jnp.matmul(
                jnp.asarray(yp0_batch, jnp.float32), VhT,
                precision=_hi)
    is_alg = ([bool(m_diag[i] == 0.0) for i in range(n)]
              if m_diag is not None else [False] * n)

    bm = block_members
    if bm % 128:
        raise ValueError("block_members must be a multiple of 128")
    pad = (-n_total) % bm
    if pad:
        y0_batch = jnp.concatenate(
            [y0_batch, jnp.tile(y0_batch[-1:], (pad, 1))])
        if yp0_batch is not None:
            yp0_batch = jnp.concatenate(
                [jnp.asarray(yp0_batch, jnp.float32),
                 jnp.tile(jnp.asarray(yp0_batch, jnp.float32)[-1:],
                          (pad, 1))])
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
        h0 = 0.01 * jnp.abs(jnp.asarray(tf, jnp.float32)
                            - jnp.asarray(t0, jnp.float32))
    t0 = jnp.asarray(t0, jnp.float32)
    tf = jnp.asarray(tf, jnp.float32)
    direction = jnp.sign(tf - t0)
    scalars = jnp.stack([t0, tf, jnp.float32(rtol), jnp.float32(atol),
                         direction, h0])

    have_yp0 = yp0_batch is not None
    if have_yp0:
        yp0_batch = jnp.asarray(yp0_batch, jnp.float32)

    nq = 0 if t_eval is None else int(np.asarray(t_eval).shape[0])
    tq_vals = (None if t_eval is None
               else [float(v) for v in np.asarray(t_eval)])

    ev_spec = _make_ev_spec(events)
    n_ev = 0 if ev_spec is None else len(ev_spec)

    n_rec = 0 if dense is None else int(dense)
    if n_rec:
        # (R, n, bm) rows: n on SUBLANES, members on lanes (see
        # fused_erk.py — the (R, bm, n) layout pads n to 128 lanes
        # and blows VMEM 64x)
        vmem = (2 * -(-n // 8) * 8 + 8) * n_rec * bm * 4
        if vmem > 6 * 2 ** 20:
            raise ValueError(
                f"dense={n_rec} recording needs {vmem / 2**20:.1f} MiB "
                f"of VMEM at block_members={bm}; lower block_members "
                "(the buffers scale with it) or record fewer rows")

    def _rows(y):
        return [y[i] for i in range(n)]

    def _stack(rows):
        return jnp.stack(rows)

    def _mat_rows(Mnp, rows):
        return [sum((float(Mnp[i, j]) * rows[j] for j in range(n)
                     if Mnp[i, j] != 0.0), rows[0] * 0.0)
                for i in range(n)]

    if rot is not None:
        _V = rot[1].T              # y = V w

        def to_user(rows):
            """w-space state rows -> user coordinates (y = V w): all
            error and Newton norms are taken in USER coordinates so
            the per-component scales atol + rtol|y| match the
            reference's control exactly (rotated-space scales mix
            components and inflate step counts whenever a w component
            passes near zero).  With the unit-mass absorb (see above)
            the filtered error is state-like too, so one transform
            covers every normed vector."""
            return _mat_rows(_V, rows)
    else:
        def to_user(rows):
            return rows

    if n_ev and rot is not None:
        # the kernel integrates in rotated coordinates w = V^T y; user
        # event functions see user coordinates, so wrap each g through
        # the same back-rotation the norms use (y = V w).  y_events
        # outputs are un-rotated on the host below.
        def _wrap_ev(ge):
            return lambda t, w, *pa: ge(t, _stack(to_user(_rows(w))),
                                        *pa)
        ev_spec = [(_wrap_ev(ge), term, edir)
                   for ge, term, edir in ev_spec]

    def _jacobian(t, y, fn):
        """J[i][j] member tiles via nb basis tangents of ONE
        linearization (jax.linearize evaluates the primal once; nb
        separate jvp calls would re-trace it nb times).  With
        ``block_base`` only the BASE block (first nb rows/columns) is
        formed — the simultaneous corrector's shared Newton factor."""
        _, jvp_fn = jax.linearize(lambda yy: fn(t, yy), y)
        cols = []
        for j in range(nb):
            seed = jnp.stack([jnp.ones_like(y[0]) if i == j
                              else jnp.zeros_like(y[0])
                              for i in range(n)])
            cols.append(jvp_fn(seed))
        return [[cols[j][i] for j in range(nb)] for i in range(nb)]

    def _gauss(Aij, b):
        """Solve the nb x nb member-tile system by unrolled elimination
        with bubble partial pivoting (arithmetic row blending)."""
        Am = [[Aij[i][j] for j in range(nb)] for i in range(nb)]
        x = list(b)
        for k in range(nb):
            for i in range(k + 1, nb):
                sw = (jnp.abs(Am[i][k])
                      > jnp.abs(Am[k][k])).astype(jnp.float32)
                ns_ = 1.0 - sw
                for j in range(k, nb):
                    akj, aij = Am[k][j], Am[i][j]
                    Am[k][j] = sw * aij + ns_ * akj
                    Am[i][j] = sw * akj + ns_ * aij
                bk, bi = x[k], x[i]
                x[k] = sw * bi + ns_ * bk
                x[i] = sw * bk + ns_ * bi
            inv = 1.0 / Am[k][k]
            for i in range(k + 1, nb):
                fkt = Am[i][k] * inv
                for j in range(k + 1, nb):
                    Am[i][j] = Am[i][j] - fkt * Am[k][j]
                x[i] = x[i] - fkt * x[k]
        for k in range(nb - 1, -1, -1):
            acc = x[k]
            for j in range(k + 1, nb):
                acc = acc - Am[k][j] * x[j]
            x[k] = acc / Am[k][k]
        return x

    def _bsolve(W, rows):
        """Solve with the nb x nb base factor, blockwise over the
        n // nb row blocks (identity when block_base is None)."""
        if nb == n:
            return _gauss(W, rows)
        out = []
        for b in range(n // nb):
            out.extend(_gauss(W, rows[b * nb:(b + 1) * nb]))
        return out

    def kernel(sc_ref, y0_ref, yp0_ref, *rest):
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
        y = y0_ref[:].T.reshape(n, sub, 128)
        if n_par:
            prt = par_ref[:].T.reshape(n_par, sub, 128)
            ptup = tuple(prt[j] for j in range(n_par))
            fun1 = lambda t, yy: fun(t, yy, ptup)   # noqa: E731
            wrap = lambda g: (lambda t, yy:         # noqa: E731
                              g(t, yy, ptup))
        else:
            fun1 = fun
            wrap = lambda g: g                      # noqa: E731
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
        if have_yp0:
            yp = yp0_ref[:].T.reshape(n, sub, 128)
        else:
            yp = fun1(t, y)
            if m_diag is not None and rot is None:
                # initial derivative solves M yp0 = f0 (the stepper's
                # init, steppers/esdirk.py; zeros in M require an
                # explicit yp0 and never reach here).  The rotated
                # path is already unit-mass.
                yp = jnp.stack([yp[i] * (1.0 / float(m_diag[i]))
                                for i in range(n)])

        if first_step is None and m_diag is None and rot is None:
            # in-kernel Watts h_start, plain-ODE case only
            # (steppers/esdirk.py:354-361; evals uncounted — the
            # reference's fun_single convention)
            from ._hstart_tile import hstart_tile
            bq = t + dir_r * jnp.minimum(
                jnp.abs(tf_r - t),
                jnp.zeros_like(t) + (np.inf if max_step is None
                                     else float(max_step)))
            h_abs0 = jnp.abs(hstart_tile(
                fun1, t, bq, y, yp,
                min(tab.order_secondary, tab.order), rtol_r, atol_r,
                mnorm=_member_norm,
                msum=lambda x: jnp.sum(x, axis=0),
                mmin=lambda x: jnp.min(x, axis=0), n=n))

        if n_rec:
            f0_ref[:] = yp.reshape(n, bm).T
            # non-accepted / never-reached rows read the sentinel
            # (arithmetic blends forbid NaN coding: 0 * NaN = NaN)
            rect_ref[:] = jnp.full((n_rec, 1, bm), _REC_UNSET,
                                   jnp.float32)

        class S(NamedTuple):
            it: Any
            tf: Any
            direction: Any
            rtol: Any
            atol: Any
            t: Any
            t_lo: Any
            y: Any
            y_lo: Any
            yp: Any
            h_abs: Any
            status: Any
            std_sc: Any
            err_old: Any
            h_prev: Any
            max_fac: Any
            rejected: Any
            nstep: Any
            nfev: Any
            qrows: Any      # ((nq) x (n)) carried t_eval snapshot tiles
            ev: Any         # (gprev, fired, ev_t, ev_rows) tuples

        def cond(st):
            return jnp.max(_iblend(st.status == _RUNNING,
                                   izero + 1, izero)) > 0

        def newton(t_stage, z0, h, psi, y_c, W, rtol, atol):
            """Modified Newton for one stage, unrolled, per-member
            masked (common.py:2183-2232 semantics).  Returns the
            stacked (n, sub, 128) stage z."""
            z = _stack(z0)
            rate = fzero - 1.0           # <0 == not yet measured
            dz_old = fzero
            conv = izero                 # bool as int mask
            stop = izero
            nfev = izero
            bad_any = izero
            for it in range(NEWTON_MAXITER):
                active = stop == 0
                y_pred_rows = [psi[i] + dd * z[i] for i in range(n)]
                fs = fun1(t_stage, _stack(y_pred_rows))
                nfev = nfev + _iblend(active, izero + 1, izero)
                rhs = []
                bad = fzero > 1.0        # all-false mask
                for i in range(n):
                    fi, bi = _sanitize(fs[i])
                    bad = bad | bi
                    if is_alg[i]:
                        # Sc row: (h f - 0) / (h d) = f / d
                        rhs.append(fi * (1.0 / dd))
                    else:
                        mi = float(m_diag[i]) if m_diag is not None \
                            else 1.0
                        rhs.append(h * fi - mi * z[i])
                dz = _bsolve(W, rhs)
                dz_s = []
                for i in range(n):
                    di, bi = _sanitize(dz[i])
                    bad = bad | bi
                    dz_s.append(di)
                yu_c = to_user(y_c)
                yu_pred = to_user(y_pred_rows)
                dz_u = to_user(dz_s)
                scale = [atol + rtol
                         * jnp.maximum(jnp.abs(yu_c[i]),
                                       jnp.abs(yu_pred[i]))
                         for i in range(n)]
                dz_norm = _member_norm(_stack(
                    [dz_u[i] / scale[i] for i in range(n)]))
                dz_norm, bn = _sanitize(dz_norm)
                bad = bad | bn

                tiny_ok = dz_norm <= tiny_err
                if it == 0:
                    rate_new = rate
                    diverged = bad & False
                    conv_normal = diverged
                else:
                    upd_rate = (rate < 0.0) | (dz_old > kappa)
                    ratio = dz_norm / jnp.maximum(dz_old, 1e-30)
                    rate_new = _fblend(upd_rate,
                                       jnp.maximum(rate, ratio), rate)
                    remaining = NEWTON_MAXITER - it
                    rp = fzero + 1.0
                    for _ in range(remaining):
                        rp = rp * rate_new
                    diverged = ((rate_new >= 1.0)
                                | (dz_norm * rp
                                   >= kappa * (1.0 - rate_new)))
                    conv_normal = (dz_norm * rate_new
                                   < kappa * (1.0 - rate_new)) \
                        & ~diverged
                converged_new = tiny_ok | conv_normal
                stop_new = bad | tiny_ok | diverged | conv_normal

                keep = active & ~bad
                keepn = jnp.broadcast_to(keep, (n,) + keep.shape)
                z = z + _fblend(keepn, _stack(dz_s),
                                jnp.zeros_like(z))
                conv = _iblend(active, converged_new.astype(jnp.int32),
                               conv)
                rate = _fblend(active, rate_new, rate)
                dz_old = _fblend(active, dz_norm, dz_old)
                bad_any = bad_any | _iblend(active & bad, izero + 1,
                                            izero)
                stop = stop | _iblend(active & stop_new, izero + 1,
                                      izero)
            return (conv != 0, z, jnp.maximum(rate, fzero), nfev,
                    bad_any != 0)

        def body(st):
            tf_ = st.tf
            direction = st.direction
            rtol = st.rtol
            atol = st.atol
            running = st.status == _RUNNING
            rejected_b = st.rejected != 0
            std_b = st.std_sc != 0

            # reassess_stepsize (common.py:2168-2181)
            tc = st.t + st.t_lo
            min_step = jnp.maximum(h_min_a * (jnp.abs(tc)
                                              + st.h_abs),
                                   h_min_b)
            out_rng = (st.h_abs < min_step)
            h_abs = jnp.maximum(min_step, st.h_abs)
            if max_step is not None:
                out_rng = out_rng | (st.h_abs > float(max_step))
                h_abs = jnp.minimum(h_abs, float(max_step))
            std_b = std_b | out_rng
            # remaining interval in DS: tf - t is exact in f32 for
            # nearby values (Sterbenz), then subtract the low word
            d = jnp.abs((tf_ - st.t) - st.t_lo)
            take_d = (jnp.abs(d / h_abs - 1.0) < 1e-2) | (d < h_abs)
            h_abs = _fblend(take_d, d, h_abs)
            too_small = h_abs < min_step
            h = h_abs * direction

            y_c = _rows(st.y)
            # Jacobian + Newton matrix W = Sc (M - h d J), fresh per
            # attempt (J always current; no reuse ladder)
            J = _jacobian(tc, st.y, fun1)
            W = [[None] * nb for _ in range(nb)]
            for i in range(nb):
                for j in range(nb):
                    if is_alg[i]:
                        # 1/(h d) * (0 - h d J) = -J
                        W[i][j] = -J[i][j]
                    else:
                        mi = float(m_diag[i]) if m_diag is not None \
                            else 1.0
                        diag = mi if i == j else 0.0
                        W[i][j] = diag - (h * dd) * J[i][j]

            # stages (stage 0 explicit: K0 = yp)
            K = [_rows(st.yp)]
            Z = [[h * K[0][i] for i in range(n)]]   # h*K_j == z_j
            y_lo_rows = _rows(st.y_lo)
            conv_all = running & ~too_small
            Rate = fzero
            nfev_d = izero
            psi = y_c
            z = [fzero for _ in range(n)]
            for st_i in range(1, s):
                if compensated:
                    psi = []
                    for i in range(n):
                        acc, cmp = _comp_wsum(
                            [Z[j][i] for j in range(st_i)],
                            A[st_i, :st_i])
                        psi.append(y_c[i] + (acc + (cmp
                                                    + y_lo_rows[i])))
                else:
                    psi = [y_c[i]
                           + h * sum((A[st_i, j] * K[j][i]
                                      for j in range(st_i)
                                      if A[st_i, j] != 0.0), fzero)
                           for i in range(n)]
                z0 = [h * sum((Az[st_i, j] * K[j][i]
                               for j in range(st_i)
                               if Az[st_i, j] != 0.0), fzero)
                      for i in range(n)]
                t_stage = tc + C[st_i] * h
                conv_s, z, rate_s, nfev_s, bad_s = newton(
                    t_stage, z0, h, psi, y_c, W, rtol, atol)
                conv_all = conv_all & conv_s & ~bad_s
                Rate = jnp.maximum(Rate, rate_s)
                nfev_d = nfev_d + nfev_s
                K.append([z[i] * (1.0 / h) for i in range(n)])
                Z.append([z[i] for i in range(n)])

            # solution + error (common.py:2079-2087); stiffly accurate:
            # y_new = y + sum_j A[s-1, j] z_j (A[s-1, s-1] = d)
            if compensated:
                y_rows, ylo_rows_new = [], []
                for i in range(n):
                    inc_s, inc_c = _comp_wsum(
                        [Z[j][i] for j in range(s)], A[s - 1, :s])
                    hi, lo1 = _df_add(y_c[i], y_lo_rows[i], inc_s)
                    hi, lo2 = _two_sum(hi, lo1 + inc_c)
                    y_rows.append(hi)
                    ylo_rows_new.append(lo2)
                y_new = _stack(y_rows)
                y_lo_new = _stack(ylo_rows_new)
            else:
                y_new = _stack([psi[i] + dd * z[i] for i in range(n)])
                y_lo_new = st.y_lo
            y_new, bad_y = _sanitize(y_new)
            if rot is not None:
                scale = atol + rtol * jnp.maximum(
                    jnp.abs(_stack(to_user(_rows(st.y)))),
                    jnp.abs(_stack(to_user(_rows(y_new)))))
            else:
                scale = atol + rtol * jnp.maximum(jnp.abs(st.y),
                                                  jnp.abs(y_new))
            if compensated:
                err_rows = []
                for i in range(n):
                    acc, cmp = _comp_wsum([Z[j][i] for j in range(s)],
                                          E[:s])
                    err_rows.append(acc + cmp)
            else:
                err_rows = [h * sum((E[j] * K[j][i] for j in range(s)
                                     if E[j] != 0.0), fzero)
                            for i in range(n)]
            if filter_error:
                sc_err = [err_rows[i] * ((1.0 / (h * dd))
                                         if is_alg[i] else 1.0)
                          for i in range(n)]
                solved = _bsolve(W, sc_err)
                err_rows = [
                    (float(m_diag[i]) if m_diag is not None else 1.0)
                    * solved[i] for i in range(n)]
            err = _stack(to_user(err_rows))
            err_norm = _member_norm(err / scale)
            err_norm, bad_e = _sanitize(err_norm)
            # Mosaic: no bool reductions — reduce as f32
            bad_m = (jnp.max(bad_y.astype(jnp.float32), axis=0)
                     > 0.0) | bad_e
            err_norm = err_norm + bad_m.astype(jnp.float32) * 10.0

            accepted = conv_all & (err_norm < 1.0) & ~bad_m

            # implicit controller (blended esdirk_accept_update)
            err_c = jnp.maximum(err_norm, 1e-30)
            f_std = jnp.minimum(cc.safety
                                * _pow(err_c, cc.error_exponent),
                                st.max_fac)
            hr = h / _fblend(st.h_prev == 0.0, h, st.h_prev)
            f_2nd = jnp.clip(
                cc.safety_sc * _pow(err_c, cc.minbeta1)
                * _pow(jnp.maximum(st.err_old, 1e-30), cc.minbeta2)
                * _pow(jnp.maximum(jnp.abs(hr), 1e-30), cc.minalpha),
                cc.min_factor, st.max_fac)
            is_tiny = err_norm < tiny_err
            fac_acc = _fblend(is_tiny, st.max_fac,
                              _fblend(std_b, f_std, f_2nd))
            on_scale = st.max_fac == MAX_FACTOR
            std_after = _iblend(
                is_tiny, izero + 1,
                _iblend(std_b & on_scale, izero, st.std_sc))
            fac_acc = _fblend(rejected_b, jnp.minimum(1.0, fac_acc),
                              fac_acc)
            std_after = _iblend(rejected_b, izero + 1, std_after)
            max_fac_new = _fblend(fac_acc < MAX_FACTOR,
                                  fzero + MAX_FACTOR, st.max_fac)

            f_rej = jnp.maximum(cc.min_factor,
                                cc.safety * _pow(err_c,
                                                 cc.error_exponent))
            # convergence failure: rate-based reduction
            # (common.py:2063-2077 with current_J always true)
            f_nrf = jnp.clip(
                _fblend(Rate > 0.0,
                        MAX_RATE / jnp.maximum(Rate, 1e-30),
                        fzero + MIN_FACTOR),
                MIN_FACTOR, MAX_FACTOR_NRF)
            h_fac = _fblend(accepted, fac_acc,
                            _fblend(conv_all, f_rej, f_nrf))
            h_abs_next = h_abs * h_fac
            h_abs_next, _ = _sanitize(h_abs_next)

            # genuine step-size underflow: a rejected attempt whose
            # reduced h falls below min_step would only be clamped back
            # up next attempt (infinite loop) — terminate instead
            too_small = too_small | (running & ~accepted
                                     & (h_abs_next < min_step))
            status = _iblend(running & too_small, izero + _TOO_SMALL,
                             st.status)
            # double-single t advance: long horizons where
            # h << ulp(t) would otherwise stall.  The landing test uses
            # the DS remainder (an f32 h_abs >= d test mis-lands when
            # eps*|t| is comparable to the remaining interval).
            t_adv, t_lo_adv = _df_add(st.t, st.t_lo, h)
            rem = (tf_ - t_adv) - t_lo_adv
            is_last = accepted & (jnp.abs(rem)
                                  <= 8.0 * eps32 * h_abs)
            t_new = _fblend(is_last, tf_, t_adv)
            t_lo_new = _fblend(is_last, fzero, t_lo_adv)
            status = _iblend((status == _RUNNING) & is_last,
                             izero + _FINISHED, status)
            hit_cap = (st.it + 1 >= max_steps) & (status == _RUNNING)
            status = _iblend(hit_cap, izero + _OVERFLOW, status)

            yp_new = _stack(K[s - 1])      # stiffly accurate
            yp_new, _ = _sanitize(yp_new)

            upd = accepted

            # t_eval snapshots: members that crossed tq this step get
            # their row cubic-Hermite interpolated from the step's
            # (y, y') endpoint pairs (common.py:766-790 semantics;
            # y' = K_{s-1}, the stiffly accurate last stage)
            qrows_new = st.qrows
            if nq:
                y_old_rows = _rows(st.y)
                f_old_rows = _rows(st.yp)
                y_new_rows = _rows(y_new)
                f_new_rows = _rows(yp_new)
                h_safe = _fblend(h == 0.0, fzero + 1.0, h)
                qrows_new = []
                for q in range(nq):
                    tqc = tq_vals[q]
                    crossed = (upd
                               & (direction * (tqc - st.t) > 0.0)
                               & (direction * tqc
                                  <= direction * t_new))
                    theta = (tqc - st.t) / h_safe
                    vals = _hermite_tiles(theta, h, y_old_rows,
                                          f_old_rows, y_new_rows,
                                          f_new_rows)
                    qrows_new.append(tuple(
                        _fblend(crossed, vals[j], st.qrows[q][j])
                        for j in range(n)))
                qrows_new = tuple(qrows_new)

            ev_new = st.ev
            trunc = izero != izero
            te = fzero
            y_te_rows = None
            if n_ev:
                h_safe_e = _fblend(h == 0.0, fzero + 1.0, h)
                ev_new, trunc, te, y_te_rows = _handle_events(
                    ev_spec_k, st.ev, upd, direction, st.t, t_new, h,
                    h_safe_e, _rows(st.y), _rows(st.yp),
                    _rows(y_new), _rows(yp_new), fzero, izero,
                    _stack)
                status = _iblend(trunc, izero + _EVENT, status)

            updn = jnp.broadcast_to(upd, st.y.shape)
            y_out_c = _fblend(updn, y_new, st.y)
            t_out_c = _fblend(upd, t_new, st.t)
            t_lo_out_c = _fblend(upd, t_lo_new, st.t_lo)
            if n_ev and y_te_rows is not None:
                truncn = jnp.broadcast_to(trunc, st.y.shape)
                y_out_c = _fblend(truncn, _stack(y_te_rows), y_out_c)
                t_out_c = _fblend(trunc, te, t_out_c)
                t_lo_out_c = _fblend(trunc, fzero, t_lo_out_c)
            rej_new = _iblend(
                upd, izero,
                _iblend(rejected_b | (running & ~too_small
                                      & ~accepted),
                        izero + 1, izero))
            if n_rec:
                @pl.when(st.it < n_rec)
                def _():
                    rect_ref[st.it] = _fblend(
                        upd, t_out_c,
                        fzero + _REC_UNSET).reshape(1, bm)
                    recy_ref[st.it] = y_out_c.reshape(n, bm)
                    recf_ref[st.it] = yp_new.reshape(n, bm)
            return S(
                it=st.it + 1,
                tf=st.tf, direction=st.direction,
                rtol=st.rtol, atol=st.atol,
                t=t_out_c,
                t_lo=t_lo_out_c,
                y=y_out_c,
                y_lo=_fblend(updn, y_lo_new, st.y_lo),
                yp=_fblend(updn, yp_new, st.yp),
                h_abs=_fblend(running, h_abs_next, st.h_abs),
                status=status,
                std_sc=_iblend(upd, std_after,
                               _iblend(running & ~accepted,
                                       izero + 1, st.std_sc)),
                err_old=_fblend(upd, err_norm, st.err_old),
                h_prev=_fblend(upd, h, st.h_prev),
                max_fac=_fblend(upd, max_fac_new, st.max_fac),
                rejected=rej_new,
                nstep=st.nstep + _iblend(upd, izero + 1, izero),
                nfev=st.nfev + _iblend(running, nfev_d, izero),
                qrows=qrows_new,
                ev=ev_new,
            )

        # snapshot rows start at y0: covers points at/before t0
        qrows0 = tuple(tuple(y[j] for j in range(n))
                       for _ in range(nq))
        if n_ev:
            ev0 = (tuple(ge(t, y) for ge, _, _ in ev_spec_k),
                   tuple(izero for _ in range(n_ev)),
                   tuple(fzero for _ in range(n_ev)),
                   tuple(tuple(y[j] for j in range(n))
                         for _ in range(n_ev)))
        else:
            ev0 = ()
        st0 = S(
            it=jnp.zeros((), jnp.int32),
            tf=tf_r, direction=dir_r, rtol=rtol_r, atol=atol_r,
            t=t, t_lo=fzero, y=y, y_lo=y * 0.0, yp=yp, h_abs=h_abs0,
            status=izero, std_sc=izero + 1, err_old=fzero + 1.0,
            h_prev=fzero, max_fac=fzero + MAX_FACTOR0,
            rejected=izero, nstep=izero,
            nfev=izero + (0 if have_yp0 else 1), qrows=qrows0,
            ev=ev0)
        st = jax.lax.while_loop(cond, body, st0)

        yout_ref[:] = st.y.reshape(n, bm).T
        stat_ref[:] = st.status.reshape(1, bm)
        nstep_ref[:] = st.nstep.reshape(1, bm)
        nfev_ref[:] = st.nfev.reshape(1, bm)
        if nq:
            # flush points the member never reached with its final y
            for q in range(nq):
                unreached = dir_r * tq_vals[q] > dir_r * st.t
                rows = [_fblend(unreached, st.y[j], st.qrows[q][j])
                        for j in range(n)]
                yq_ref[q] = jnp.stack(rows).reshape(n, bm).T
        if n_ev:
            _, evf, ev_t, ev_rows = st.ev
            for i in range(n_ev):
                tev_ref[i] = ev_t[i].reshape(1, bm)
                yev_ref[i] = jnp.stack(ev_rows[i]).reshape(n, bm).T
                fev_ref[i] = evf[i].reshape(1, bm)

    n_padded = y0_batch.shape[0]
    if not have_yp0:
        yp0_batch = jnp.zeros_like(y0_batch)
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
        pl.BlockSpec((bm, n), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    call_args = [scalars, y0_batch, yp0_batch]
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

    y_out = y_out[:n_total]
    if rot is not None:
        # un-rotate back to user coordinates: y = V w (full-precision
        # matmul — see the input-rotation note above)
        Vmat = jnp.asarray(rot[1], jnp.float32)
        y_out = jnp.matmul(y_out, Vmat,
                           precision=jax.lax.Precision.HIGHEST)
    ret = (y_out, status[0, :n_total], nsteps[0, :n_total],
           nfev[0, :n_total])
    k = 4
    if nq:
        y_eval = outs[k][:, :n_total]
        if rot is not None:
            y_eval = jnp.matmul(y_eval, Vmat,
                                precision=jax.lax.Precision.HIGHEST)
        ret = ret + (y_eval,)
        k += 1
    if n_ev:
        tev, yev, fev = outs[k], outs[k + 1], outs[k + 2]
        fired = fev[:, 0, :n_total]
        nanv = jnp.float32(np.nan)
        t_events = jnp.where(fired != 0, tev[:, 0, :n_total], nanv)
        yev = yev[:, :n_total]
        if rot is not None:
            yev = jnp.matmul(yev, Vmat,
                             precision=jax.lax.Precision.HIGHEST)
        y_events = jnp.where((fired != 0)[:, :, None], yev, nanv)
        ret = ret + (t_events, y_events, fired)
        k += 3
    if n_rec:
        from .fused_dense import build_fused_dense
        rect, recy, recf, f0 = outs[k:k + 4]
        rect = rect[:, 0, :n_total]
        flags = (rect < 0.5 * _REC_UNSET).astype(jnp.int32)
        recy = jnp.swapaxes(recy[:, :, :n_total], 1, 2)
        recf = jnp.swapaxes(recf[:, :, :n_total], 1, 2)
        f0 = f0[:n_total]
        y00 = y0_batch[:n_total]
        if rot is not None:
            # rows were recorded in rotated coordinates: y = V w and
            # y' = V w' (full-precision, like every other output)
            _hi2 = jax.lax.Precision.HIGHEST
            recy = jnp.matmul(recy, Vmat, precision=_hi2)
            recf = jnp.matmul(recf, Vmat, precision=_hi2)
            f0 = jnp.matmul(f0, Vmat, precision=_hi2)
            y00 = jnp.matmul(y00, Vmat, precision=_hi2)
        t0h, tfh = t_span
        sol = build_fused_dense(
            t0h, tfh, y00, f0, jnp.where(flags != 0, rect, 0.0),
            flags, recy, recf, ret[2])
        ret = ret + (sol,)
    return ret
