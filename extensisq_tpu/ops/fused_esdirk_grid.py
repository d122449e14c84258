"""Fused Pallas ESDIRK solver for MID-SIZE systems: states on lanes,
tridiagonal Newton matrices solved by parallel cyclic reduction.

``fused_esdirk`` unrolls the state as member-tile rows and solves the
n x n Newton system by unrolled pivoted elimination — which caps it at
n <= 8.  Mid-size IMPLICIT work (stiff method-of-lines PDEs, n ~
128-512) was the one family left on the dispatch-bound XLA path (the
known residual in docs/TPU_NOTES.md).  This kernel closes it for the
dominant mid-size structure: TRIDIAGONAL Jacobians (1-D MoL stencils,
nearest-neighbour chains), including periodic (circulant corner)
coupling.

Layout is the grid family's (fused_adams_grid / fused_erk_grid):

* the STATE rides the 128-lane axis; any n is accepted — cyclic
  reduction needs a power-of-two multiple of 128, so other sizes are
  zero-padded internally with INERT masked lanes (ops/_lane_pad.py;
  strictly tridiagonal — non-periodic — Jacobians only when padded);
* MEMBERS ride sublanes; per-member scalars are (bm, 1) columns;
* further members run over the pallas grid dimension.

TPU-native pieces:

* the Jacobian's three bands come from FOUR forward-mode JVP products
  of one linearization with mod-4 striped tangents (distance-1
  graph coloring of a cyclic tridiagonal pattern; 4 | n always holds
  since 128 | n) — in-kernel autodiff, no user ``jac`` needed;
* each Newton iteration solves W dz = rhs, W = M - h d J tridiagonal
  (+ periodic corners), by PARALLEL CYCLIC REDUCTION: log2(n) rounds
  of ``jnp.roll`` lane shifts and elementwise blends.  The circulant
  form needs no boundary cases — strictly tridiagonal systems keep
  their zero corner entries through every round (alpha/gamma vanish
  with them), and after log2(n) rounds the residual couplings wrap
  to self-couplings, so x = d / (a + b + c) closes both variants;
* Newton semantics (rate tracking, divergence prediction, tiny-update
  floor, fresh-J-per-attempt) and the implicit controller mirror
  ops/fused_esdirk.py == common.py:2183-2232 / steppers/esdirk.py.

Mass matrices: None or a DIAGONAL (n,) vector; zero entries mark
algebraic rows (index-1 DAEs) and get the 1/(h d) rescale of
common.py:2038-2044 as lane masks.  Dense/hidden M stays with the
small-system kernel (its SVD rotation is a dense-matvec construct).

If the true Jacobian has bandwidth > 1 (wider stencils), the
tridiagonal W is an APPROXIMATION: Newton residuals stay exact, so
converged results remain correct, but convergence degrades and the
controller compensates with smaller steps — same contract as the
reference's modified Newton with a stale Jacobian.

f32 with the double-single t carry; ``compensated=True`` adds the DS
y-carry + Neumaier stage dots (official tolerances).  The XLA f64
path remains the conformance solver.
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .._config import (NEWTON_MAXITER, MAX_RATE, MAX_FACTOR_NRF,
                       MIN_FACTOR, MAX_FACTOR, MAX_FACTOR0)
from . import _lane_pad as _lp
from ..core.controller import resolve_controller
from .fused_dense import _REC_UNSET
from .fused_erk import (_fblend, _iblend, _sanitize, _df_add,
                        _two_sum, _comp_wsum, _hermite_tiles,
                        _make_ev_spec, _handle_events, _EVENT)
from .fused_esdirk import _pow

_RUNNING, _FINISHED, _TOO_SMALL, _OVERFLOW = 0, 1, 2, 3


class _G(NamedTuple):
    """While-loop carry: (bm, 1) member scalars, (bm, n) states."""
    it: Any
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
    qrows: Any        # tuple (nq) of (bm, n) t_eval snapshots
    ev: Any           # (gprev, fired, ev_t, ev_rows) tuples


def _pcr_solve(wl, wd, wu, rhs, n_log2, pos=None, nb=None):
    """Parallel cyclic reduction for a circulant-pattern tridiagonal
    system over the lane axis: (wl, wd, wu, rhs) are (bm, n) with
    wl[i] = W[i, i-1 mod n], wu[i] = W[i, i+1 mod n].  Strictly
    tridiagonal systems are the special case wl[:, 0] = wu[:, -1] = 0
    (the zeros propagate through every round, so no boundary masking
    is needed).  After log2(n) rounds each equation's remaining
    neighbour couplings wrap onto itself: x = d / (a + b + c).

    BLOCK-DIAGONAL mode (``pos`` = block-local lane positions
    ``lane % nb``, ``nb`` = the block width): solves block-diag(W, ...,
    W) where every nb x nb diagonal block has the SAME bands — the
    simultaneous-corrector structure (one base factor, 1 + k
    back-solves, all performed at once over n = nb * n_blocks lanes).
    The band arrays are nb-periodic along lanes, so every band roll is
    already a within-block roll; only the RHS ``d`` differs per block
    and gets block-cyclic rolls (two lane rolls + one iota blend per
    direction per round).  Rounds count log2(nb)."""
    a, b, c, d = wl, wd, wu, rhs

    def droll(x, s):
        if pos is None:
            return jnp.roll(x, s, -1)
        if s >= 0:
            return _fblend(pos < s, jnp.roll(x, s - nb, -1),
                           jnp.roll(x, s, -1))
        ss = -s
        return _fblend(pos >= nb - ss, jnp.roll(x, nb - ss, -1),
                       jnp.roll(x, -ss, -1))

    s = 1
    for _ in range(n_log2):
        b_m = jnp.roll(b, s, -1)
        b_p = jnp.roll(b, -s, -1)
        b_m = _fblend(b_m == 0.0, jnp.ones_like(b_m), b_m)
        b_p = _fblend(b_p == 0.0, jnp.ones_like(b_p), b_p)
        alpha = -a / b_m
        gamma = -c / b_p
        a_new = alpha * jnp.roll(a, s, -1)
        c_new = gamma * jnp.roll(c, -s, -1)
        b_new = b + alpha * jnp.roll(c, s, -1) \
            + gamma * jnp.roll(a, -s, -1)
        d_new = d + alpha * droll(d, s) + gamma * droll(d, -s)
        a, b, c, d = a_new, b_new, c_new, d_new
        s *= 2
    den = a + b + c
    den = _fblend(den == 0.0, jnp.ones_like(den), den)
    return d / den


def solve_fused_esdirk_grid(fun, t_span, y0_batch, method=None, M=None,
                            yp0_batch=None, rtol=1e-4, atol=1e-6,
                            first_step=None, max_steps=100_000,
                            block_members=8, interpret=False,
                            compensated=False, t_eval=None,
                            events=None, max_step=None, params=None,
                            dense=None, block_base=None):
    """Integrate a mid-size stiff-system / index-1-DAE ensemble with
    an ESDIRK method in one TPU kernel.

    y0_batch: (B, n) float32, ANY n — non-power-of-two-multiple-of-128
    sizes are zero-padded internally with inert masked lanes
    (ops/_lane_pad.py; ``fun`` and event callables still see exactly n
    lanes, the step sequence equals the unpadded problem's exactly;
    requires atol > 0 and a STRICTLY tridiagonal — non-periodic —
    Jacobian).
    ``fun(t, y)``: t (bm, 1), y (bm, n) -> (bm, n) — the grid-kernel
    convention (stencils via ``jnp.roll(y, s, -1)``); the Jacobian
    must be (approximately) tridiagonal with optional periodic
    corners (see module docstring).  ``M``: None or a length-n
    diagonal (zeros mark algebraic rows; pass consistent
    ``yp0_batch`` for DAEs).  Returns (y_final (B, n), status (B,),
    nsteps (B,), nfev (B,)); ``t_eval`` appends y_eval
    (len(t_eval), B, n) interpolated from inside the kernel
    (common.py:766-790 form, y' = the stiffly accurate last stage).
    ``events``: callable(s) g(t, y) -> (bm, 1) member column with the
    reference's ``terminal`` / ``direction`` attributes; appends
    (t_events, y_events, n_events) like the other fused kernels.
    ``max_step``: optional static float cap on |h| (reassess-stepsize
    semantics, steppers/esdirk.py:465-466).
    ``params``: optional (B, k) float32 per-member scalar parameters;
    when given, ``fun`` and every event callable take a third
    argument ``p``, a k-tuple of (bm, 1) member columns broadcastable
    against (bm, n) arrays (the tridiagonal-band JVPs differentiate
    through the parameterized RHS per member).
    ``dense``: optional int ``R`` — record up to ``R`` per-step
    ``(t, y, y')`` rows in-kernel (y' = the stiffly accurate last
    stage) and append an evaluable per-member
    :class:`~extensisq_tpu.ops.fused_dense.FusedDenseSolution` as the
    LAST return element, like ``solve_fused_esdirk``.  Buffers are
    (R, bm, n) in VMEM ((2n + 1) * R * block_members * 4 bytes —
    at n = 256 keep block_members = 8 and R <= ~350); overflowing
    members get ``sol.valid[b] = False``.
    ``block_base``: the SIMULTANEOUS-CORRECTOR mode (CVODES SIM — the
    grid twin of ``solve_fused_esdirk(block_base=)``): the state is
    ``n_blocks = n // block_base`` stacked blocks [y | s_1 .. s_k]
    whose true Jacobian is block lower triangular with every diagonal
    block equal to the BASE block's tridiagonal J (forward
    sensitivities / variational systems, ops/fused_sens.py).  The
    tridiagonal bands are extracted from the base block only (striped
    JVP seeds restricted to its lanes) and TILED; each Newton
    iteration solves block-diag(W, ..., W) dz = rhs in ONE
    block-cyclic PCR pass, so the base factorization effort is shared
    by all 1 + k blocks.  Newton residuals use the exact augmented
    RHS, so converged results are exact; the neglected strictly-lower
    coupling only lags the (guarded) Newton rate — the same contract
    as the reference's modified Newton with a stale Jacobian.  Each
    block is lane-padded individually (``atol > 0`` required when
    padding); requires ``M=None`` (plain ODEs).
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
    h_min_a = 10.0 * 2.0 ** -31 / tab.c_spacing()
    h_min_b = float(np.sqrt(np.finfo(np.float32).tiny))

    y0_batch = jnp.asarray(y0_batch, jnp.float32)
    n_total, n_true = y0_batch.shape
    if block_base is not None:
        nb_true = int(block_base)
        if M is not None:
            raise ValueError(
                "block_base (simultaneous corrector) requires M=None: "
                "the tiled base bands assume identity mass on every "
                "block")
        if nb_true < 1 or n_true % nb_true:
            raise ValueError(
                f"block_base={nb_true} must divide the state width "
                f"{n_true} into equal [y | s_j] blocks")
        kb = n_true // nb_true
    else:
        nb_true = n_true
        kb = 1
    # cyclic reduction needs a power of two: pad any n with inert
    # masked lanes (ops/_lane_pad.py).  The padded ring breaks at the
    # n_true boundary, so padding supports STRICTLY tridiagonal
    # Jacobians only — periodic (circulant-corner) problems must keep
    # n a power-of-two multiple of 128 themselves.  In block_base
    # mode EACH block pads individually (PCR runs per block).
    nb = _lp.pad_width(nb_true, pow2=True)
    n = nb * kb
    if nb != nb_true and not atol > 0.0:
        raise ValueError("masked lane padding (n not a power-of-two "
                         "multiple of 128) requires atol > 0: "
                         "pad-lane error scales are atol exactly")
    y0_batch = _lp.pad_lanes(y0_batch, nb, parts=kb)
    n_log2 = int(nb).bit_length() - 1
    # Newton round-off floor (see fused_esdirk.py's derivation);
    # the TRUE state size — pad lanes carry no round-off
    tiny_err = float(np.sqrt(n_true)
                     * max(eps32 ** 0.8, 4.0 * eps32 / rtol))

    if M is not None:
        M = np.asarray(M, dtype=np.float64)
        if M.ndim == 2:
            if not np.array_equal(M, np.diag(np.diag(M))):
                raise ValueError("fused grid ESDIRK supports diagonal "
                                 "mass matrices only; dense/hidden M "
                                 "is the small-system kernel's domain")
            M = np.diag(M)
        if M.shape != (n_true,):
            raise ValueError("M must be (n,) or a diagonal (n, n)")
        if yp0_batch is None and np.any(M == 0.0):
            raise ValueError("DAE: pass consistent yp0_batch")
        # the mass diagonal enters as a kernel INPUT (Mosaic rejects
        # captured float-array constants, see fused_adams.py rules);
        # pad lanes get mass ONE (differential, decoupled, inert)
        M = np.concatenate([M, np.ones(n - n_true)])
        m_row = jnp.asarray(M, jnp.float32)[None, :]    # (1, n)
        any_alg = bool(np.any(M == 0.0))
        have_m = True
    else:
        m_row = None
        any_alg = False
        have_m = False

    bm = block_members
    if bm % 8:
        raise ValueError("block_members must be a multiple of 8")
    if yp0_batch is not None:
        yp0_batch = _lp.pad_lanes(
            jnp.asarray(yp0_batch, jnp.float32), nb, parts=kb)
    pad = (-n_total) % bm
    if pad:
        y0_batch = jnp.concatenate(
            [y0_batch, jnp.tile(y0_batch[-1:], (pad, 1))])
        if yp0_batch is not None:
            yp0_batch = jnp.concatenate(
                [yp0_batch, jnp.tile(yp0_batch[-1:], (pad, 1))])
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
        # (R, bm, n) rows: the state already rides the lane axis here
        vmem = (2 * n + 1) * n_rec * bm * 4 + bm * n * 4
        if vmem > 6 * 2 ** 20:
            raise ValueError(
                f"dense={n_rec} recording needs {vmem / 2**20:.1f} MiB "
                f"of VMEM at block_members={bm}, n={n}; lower "
                "block_members or record fewer rows")

    def kernel(sc_ref, y0_ref, yp0_ref, *rest):
        rest = list(rest)
        m_ref = rest.pop(0) if have_m else None
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
            ptup = tuple(pv[:, j:j + 1] for j in range(n_par))
            fun1 = lambda t, yy: fun(t, yy, ptup)   # noqa: E731
            wrap = lambda g: (lambda t, yy:         # noqa: E731
                              g(t, yy, ptup))
        else:
            fun1 = fun
            wrap = lambda g: g                      # noqa: E731
        # masked lane padding: arbitrary n rides the kernel with the
        # EXACT unpadded step sequence (see ops/_lane_pad.py); the
        # wrapped RHS's pad-lane Jacobian rows AND columns vanish, so
        # the PCR blocks stay decoupled (zero couplings propagate
        # through every round)
        lt = _lp.lane_tools(bm, nb, nb_true, parts=kb)
        mnorm = lt.mnorm
        fun1 = lt.wrap_fun(fun1)
        ev_spec_k = (None if ev_spec is None else
                     [(lt.wrap_obs(wrap(ge)), tm, dr)
                      for ge, tm, dr in ev_spec])
        fzero = y[:, :1] * 0.0            # (bm, 1) member scalars
        izero = fzero.astype(jnp.int32)
        nzero = y * 0.0                   # (bm, n) state zeros
        t = sc_ref[0] + fzero
        tf_r = sc_ref[1] + fzero
        rtol_r = sc_ref[2] + fzero
        atol_r = sc_ref[3] + fzero
        dir_r = sc_ref[4] + fzero
        h_abs0 = sc_ref[5] + fzero
        if have_m:
            m_lane = m_ref[:]                           # (1, n)
            alg_lane = ((m_lane == 0.0).astype(jnp.float32)
                        if any_alg else None)
        else:
            m_lane = None
            alg_lane = None
        if have_yp0:
            yp = yp0_ref[:]
        else:
            yp = fun1(t, y)
            if have_m:
                # initial derivative solves M yp0 = f0 (zeros in M
                # require an explicit yp0 and never reach here)
                yp = yp / m_lane

        if first_step is None and not have_m:
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
                mnorm=mnorm, msum=lt.msum, mmin=lt.mmin, n=n_true))

        if n_rec:
            f0_ref[:] = yp
            # non-accepted / never-reached rows read the sentinel
            # (arithmetic blends forbid NaN coding: 0 * NaN = NaN)
            rect_ref[:] = jnp.full((n_rec, bm, 1), _REC_UNSET,
                                   jnp.float32)

        # lane residue one-hots for the mod-4 striped Jacobian seeds
        lane = jax.lax.broadcasted_iota(jnp.int32, (bm, n), 1)
        res4 = [(lane % 4 == c).astype(jnp.float32) for c in range(4)]
        if kb > 1:
            # block_base: seeds live in the BASE block only (block-0
            # rows of the augmented Jacobian have block-0 columns
            # only, so its bands come out uncontaminated); 4 | nb
            # holds so lane % 4 == (lane % nb) % 4
            base_m = (lane < nb).astype(jnp.float32)
            pos_nb = lane % nb
        else:
            base_m = None
            pos_nb = None

        def pcr(l3, d3, u3, r3):
            return _pcr_solve(l3, d3, u3, r3, n_log2, pos_nb,
                              nb if kb > 1 else None)

        def jac_bands(tt, yy):
            """(lower, diag, upper) of the circulant-pattern
            tridiagonal Jacobian via 4 JVPs of one linearization
            (distance-1 coloring: lanes i-1, i, i+1 mod n have
            distinct residues mod 4 because 4 | n).  The shifted
            selector masks come from iota ARITHMETIC, not from
            rolling the residue masks — rolled constant vectors
            trip Mosaic's layout pass (measured: recursion blowup /
            ApplyVectorLayoutPass abort); iota-derived int masks
            lower fine."""
            _, jvp_fn = jax.linearize(lambda w: fun1(tt, w), yy)
            # anchor the tangent seeds on runtime data: CONSTANT
            # (iota-only) tangents at bm >= 16 send Mosaic's constant
            # handling into unbounded recursion (measured; bm = 8 is
            # one native sublane tile and happens to survive)
            nz = yy * 0.0
            seeds = (res4 if kb == 1
                     else [r * base_m for r in res4])
            jv = [jvp_fn(r + nz) for r in seeds]
            # J[i, i+k] = jv_{(i+k) % 4}[i]
            low = sum(((lane + 3) % 4 == c).astype(jnp.float32)
                      * jv[c] for c in range(4))
            dia = sum(res4[c] * jv[c] for c in range(4))
            upp = sum(((lane + 1) % 4 == c).astype(jnp.float32)
                      * jv[c] for c in range(4))
            if kb > 1:
                # tile the base-block bands to every [y | s_j] block:
                # the simultaneous corrector's block-diag(W, ..., W)
                low, dia, upp = (
                    jnp.concatenate([v[..., :nb]] * kb, axis=-1)
                    for v in (low, dia, upp))
            return low, dia, upp

        def newton(t_stage, z0, h, psi, y_c, W, rtol, atol):
            """Modified Newton for one stage, per-member masked
            (common.py:2183-2232 semantics); W = (wl, wd, wu)."""
            z = z0
            rate = fzero - 1.0
            dz_old = fzero
            conv = izero
            stop = izero
            nfev = izero
            bad_any = izero
            for it in range(NEWTON_MAXITER):
                active = stop == 0
                y_pred = psi + dd * z
                fs = fun1(t_stage, y_pred)
                nfev = nfev + _iblend(active, izero + 1, izero)
                fs, bad_f = _sanitize(fs)
                if any_alg:
                    rhs = _fblend(alg_lane > 0.0, fs * (1.0 / dd),
                                  h * fs - m_lane * z)
                elif m_lane is not None:
                    rhs = h * fs - m_lane * z
                else:
                    rhs = h * fs - z
                dz = pcr(W[0], W[1], W[2], rhs)
                dz, bad_d = _sanitize(dz)
                bad = (jnp.max((bad_f | bad_d).astype(jnp.float32),
                               axis=-1, keepdims=True) > 0.0)
                scale = atol + rtol * jnp.maximum(jnp.abs(y_c),
                                                  jnp.abs(y_pred))
                dz_norm = mnorm(dz / scale)
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
                z = z + _fblend(keep, dz, nzero)
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

        def cond(st):
            return jnp.max(_iblend(st.status == _RUNNING,
                                   izero + 1, izero)) > 0

        def body(st):
            running = st.status == _RUNNING
            rejected_b = st.rejected != 0
            std_b = st.std_sc != 0

            # reassess_stepsize (common.py:2168-2181)
            tc = st.t + st.t_lo
            min_step = jnp.maximum(h_min_a * (jnp.abs(tc)
                                              + st.h_abs),
                                   h_min_b)
            out_rng = st.h_abs < min_step
            h_abs = jnp.maximum(min_step, st.h_abs)
            if max_step is not None:
                out_rng = out_rng | (st.h_abs > float(max_step))
                h_abs = jnp.minimum(h_abs, float(max_step))
            std_b = std_b | out_rng
            d = jnp.abs((tf_r - st.t) - st.t_lo)
            take_d = (jnp.abs(d / h_abs - 1.0) < 1e-2) | (d < h_abs)
            h_abs = _fblend(take_d, d, h_abs)
            too_small = h_abs < min_step
            h = h_abs * dir_r

            # Newton matrix bands W = M - h d J (algebraic rows get
            # the 1/(h d) rescale: -J), fresh per attempt
            jl, jd, ju = jac_bands(tc, st.y)
            hd = h * dd
            if any_alg:
                wl = _fblend(alg_lane > 0.0, -jl, -hd * jl)
                wd = _fblend(alg_lane > 0.0, -jd, m_lane - hd * jd)
                wu = _fblend(alg_lane > 0.0, -ju, -hd * ju)
            elif m_lane is not None:
                wl, wd, wu = -hd * jl, m_lane - hd * jd, -hd * ju
            else:
                wl, wd, wu = -hd * jl, 1.0 - hd * jd, -hd * ju
            W = (wl, wd, wu)

            # stages (stage 0 explicit: K0 = yp; h*K_j == z_j)
            K = [st.yp]
            Z = [h * st.yp]
            conv_all = running & ~too_small
            Rate = fzero
            nfev_d = izero
            psi = st.y
            z = nzero
            for st_i in range(1, s):
                if compensated:
                    acc, cmp = _comp_wsum(Z[:st_i], A[st_i, :st_i])
                    psi = st.y + (acc + (cmp + st.y_lo))
                else:
                    psi = st.y + h * sum(
                        (A[st_i, j] * K[j] for j in range(st_i)
                         if A[st_i, j] != 0.0), nzero)
                z0 = h * sum((Az[st_i, j] * K[j] for j in range(st_i)
                              if Az[st_i, j] != 0.0), nzero)
                t_stage = tc + C[st_i] * h
                conv_s, z, rate_s, nfev_s, bad_s = newton(
                    t_stage, z0, h, psi, st.y, W, rtol_r, atol_r)
                conv_all = conv_all & conv_s & ~bad_s
                Rate = jnp.maximum(Rate, rate_s)
                nfev_d = nfev_d + nfev_s
                K.append(z * (1.0 / h))
                Z.append(z)

            # solution + error (common.py:2079-2087); stiffly accurate
            if compensated:
                inc_s, inc_c = _comp_wsum(Z, A[s - 1, :s])
                hi, lo1 = _df_add(st.y, st.y_lo, inc_s)
                hi, lo2 = _two_sum(hi, lo1 + inc_c)
                y_new, y_lo_new = hi, lo2
            else:
                y_new = psi + dd * z
                y_lo_new = st.y_lo
            y_new, bad_y = _sanitize(y_new)
            scale = atol_r + rtol_r * jnp.maximum(jnp.abs(st.y),
                                                  jnp.abs(y_new))
            if compensated:
                acc, cmp = _comp_wsum(Z, E[:s])
                err = acc + cmp
            else:
                err = h * sum((E[j] * K[j] for j in range(s)
                               if E[j] != 0.0), nzero)
            if filter_error:
                if any_alg:
                    sc_err = _fblend(alg_lane > 0.0,
                                     err * (1.0 / (h * dd)), err)
                else:
                    sc_err = err
                solved = pcr(wl, wd, wu, sc_err)
                err = (m_lane * solved if m_lane is not None
                       else solved)
            err_norm = mnorm(err / scale)
            err_norm, bad_e = _sanitize(err_norm)
            bad_m = (jnp.max(bad_y.astype(jnp.float32), axis=-1,
                             keepdims=True) > 0.0) | bad_e
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
            f_nrf = jnp.clip(
                _fblend(Rate > 0.0,
                        MAX_RATE / jnp.maximum(Rate, 1e-30),
                        fzero + MIN_FACTOR),
                MIN_FACTOR, MAX_FACTOR_NRF)
            h_fac = _fblend(accepted, fac_acc,
                            _fblend(conv_all, f_rej, f_nrf))
            h_abs_next = h_abs * h_fac
            h_abs_next, _ = _sanitize(h_abs_next)

            too_small = too_small | (running & ~accepted
                                     & (h_abs_next < min_step))
            status = _iblend(running & too_small, izero + _TOO_SMALL,
                             st.status)
            t_adv, t_lo_adv = _df_add(st.t, st.t_lo, h)
            rem = (tf_r - t_adv) - t_lo_adv
            is_last = accepted & (jnp.abs(rem)
                                  <= 8.0 * eps32 * h_abs)
            t_new = _fblend(is_last, tf_r, t_adv)
            t_lo_new = _fblend(is_last, fzero, t_lo_adv)
            status = _iblend((status == _RUNNING) & is_last,
                             izero + _FINISHED, status)
            hit_cap = (st.it + 1 >= max_steps) & (status == _RUNNING)
            status = _iblend(hit_cap, izero + _OVERFLOW, status)

            yp_new = K[s - 1]              # stiffly accurate
            yp_new, _ = _sanitize(yp_new)

            upd = accepted

            # t_eval snapshots (common.py:766-790; y' = K_{s-1})
            qrows_new = st.qrows
            if nq:
                h_safe = _fblend(h == 0.0, fzero + 1.0, h)
                qrows_new = []
                for q in range(nq):
                    tqc = tq_vals[q]
                    crossed = (upd
                               & (dir_r * (tqc - st.t) > 0.0)
                               & (dir_r * tqc <= dir_r * t_new))
                    theta = (tqc - st.t) / h_safe
                    vals = _hermite_tiles(theta, h, [st.y], [st.yp],
                                          [y_new], [yp_new])[0]
                    qrows_new.append(
                        _fblend(crossed, vals, st.qrows[q]))
                qrows_new = tuple(qrows_new)

            ev_new = st.ev
            trunc = izero != izero
            te = fzero
            y_te_rows = None
            if n_ev:
                h_safe_e = _fblend(h == 0.0, fzero + 1.0, h)
                ev_new, trunc, te, y_te_rows = _handle_events(
                    ev_spec_k, st.ev, upd, dir_r, st.t, t_new, h,
                    h_safe_e, [st.y], [st.yp], [y_new], [yp_new],
                    fzero, izero, lambda rows: rows[0])
                status = _iblend(trunc, izero + _EVENT, status)
            y_out_c = _fblend(upd, y_new, st.y)
            t_out_c = _fblend(upd, t_new, st.t)
            t_lo_out_c = _fblend(upd, t_lo_new, st.t_lo)
            if n_ev and y_te_rows is not None:
                y_out_c = _fblend(trunc, y_te_rows[0], y_out_c)
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
                    rect_ref[st.it] = _fblend(upd, t_out_c,
                                              fzero + _REC_UNSET)
                    recy_ref[st.it] = y_out_c
                    recf_ref[st.it] = yp_new
            return _G(
                it=st.it + 1,
                t=t_out_c,
                t_lo=t_lo_out_c,
                y=y_out_c,
                y_lo=_fblend(upd, y_lo_new, st.y_lo),
                yp=_fblend(upd, yp_new, st.yp),
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
                ev=ev_new)

        st0 = _G(
            it=jnp.zeros((), jnp.int32),
            t=t, t_lo=fzero, y=y, y_lo=nzero, yp=yp, h_abs=h_abs0,
            status=izero, std_sc=izero + 1, err_old=fzero + 1.0,
            h_prev=fzero, max_fac=fzero + MAX_FACTOR0,
            rejected=izero, nstep=izero,
            nfev=izero + (0 if have_yp0 else 1),
            qrows=tuple(y for _ in range(nq)),
            ev=((tuple(ge(t, y) for ge, _, _ in ev_spec_k),
                 tuple(izero for _ in range(n_ev)),
                 tuple(fzero for _ in range(n_ev)),
                 tuple((y,) for _ in range(n_ev)))
                if n_ev else ()))
        st = jax.lax.while_loop(cond, body, st0)

        yout_ref[:] = st.y
        stat_ref[:] = st.status
        nstep_ref[:] = st.nstep
        nfev_ref[:] = st.nfev
        if nq:
            # flush points the member never reached with its final y
            for q in range(nq):
                unreached = dir_r * tq_vals[q] > dir_r * st.t
                yq_ref[q] = _fblend(unreached, st.y, st.qrows[q])
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
    yp_in = (yp0_batch if have_yp0
             else jnp.zeros_like(y0_batch))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((bm, n), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bm, n), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    call_args = [scalars, y0_batch, yp_in]
    if have_m:
        in_specs.append(pl.BlockSpec((1, n), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        call_args.append(m_row)
    if n_par:
        in_specs.append(pl.BlockSpec((bm, n_par), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        call_args.append(params)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(*call_args)

    def _unp(a):
        # per-block lane unpadding (plain [..., :n_true] when kb == 1)
        return _lp.unpad_lanes(a, nb_true, nb, parts=kb)

    y_out, status, nsteps, nfev = outs[:4]
    ret = (_unp(y_out[:n_total]), status[:n_total, 0],
           nsteps[:n_total, 0], nfev[:n_total, 0])
    k = 4
    if nq:
        ret = ret + (_unp(outs[k][:, :n_total]),)
        k += 1
    if n_ev:
        tev, yev, fev = outs[k], outs[k + 1], outs[k + 2]
        fired = fev[:, :n_total, 0]
        nanv = jnp.float32(np.nan)
        t_events = jnp.where(fired != 0, tev[:, :n_total, 0], nanv)
        y_events = jnp.where((fired != 0)[:, :, None],
                             _unp(yev[:, :n_total]), nanv)
        ret = ret + (t_events, y_events, fired)
        k += 3
    if n_rec:
        from .fused_dense import build_fused_dense
        rect, recy, recf, f0 = outs[k:k + 4]
        rect = rect[:, :n_total, 0]
        flags = (rect < 0.5 * _REC_UNSET).astype(jnp.int32)
        sol = build_fused_dense(
            t0, tf, _unp(y0_batch[:n_total]),
            _unp(f0[:n_total]),
            jnp.where(flags != 0, rect, 0.0), flags,
            _unp(recy[:, :n_total]), _unp(recf[:, :n_total]),
            ret[2])
        ret = ret + (sol,)
    return ret
