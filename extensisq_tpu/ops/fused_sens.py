"""Forward sensitivities AND ``jax.grad`` at fused-kernel speed.

The XLA paths already differentiate (sensitivity.py: the three
reference APIs ``sens_forward`` / ``sens_adjoint_end`` /
``sens_adjoint_int`` re-own scipy-style forward/adjoint sensitivity,
reference ``/root/reference/extensisq/sensitivity.py``; plus the
beyond-reference ``solve_final`` continuous-adjoint custom_vjp).
This module brings the FORWARD flavour to the fused Pallas kernels:

* :func:`solve_fused_sens` — integrate the augmented variational
  system [y; dy/dp_j (; dy/dy0_i)] for a whole parameter-sweep
  ensemble in ONE kernel.  The tangent RHS rows come from
  ``jax.jvp`` of the user RHS traced INSIDE the kernel (the same
  in-kernel JVP machinery fused_esdirk_grid uses for its Newton
  bands), so the variational matrix is never materialized.  Error
  control runs on the full augmented state — exactly the classical
  "internal differentiation" scheme ``sens_forward`` implements
  (staggered=False), so sensitivities are tolerance-accurate.
* :func:`solve_fused_final` — y(t_f) as a differentiable function of
  (t_span, y0_batch, params): a ``jax.custom_vjp`` twin of
  ``sensitivity.solve_final`` whose backward pass runs ONE fused
  augmented solve and contracts the cotangent against the recovered
  S_y0/S_p blocks.  ``jax.grad``/``value_and_grad`` of a per-member
  scalar loss therefore costs two fused kernel launches total —
  for the whole ensemble.

Both layouts, ERK *and* ESDIRK: an explicit ``method`` whose
``family`` is "esdirk" routes the augmented system through
``solve_fused_esdirk(block_base=n)`` (flat rows) or
``solve_fused_esdirk_grid(block_base=n)`` (states-on-lanes, mid-size
MoL sweeps) — the simultaneous-corrector scheme (CVODES SIM): the
augmented Newton matrix is block lower triangular with every diagonal
block equal to the base W = I - h d J, so ONE base factor (dense
unrolled elimination on the flat kernel; tiled tridiagonal bands
solved in one block-cyclic PCR pass on the grid kernel) solves all
1 + k (+ n) blocks per iteration and the neglected strictly-lower
coupling only lags the (guarded) Newton rate.  This is what the reference's flagship
sensitivity workload actually needs — ``sens_forward`` on *stiff*
problems (/root/reference/tests/test_sens.py:8,61-70, Robertson with
BDF/Radau) — at fused-kernel speed.  f32 (+ the compensated
mixed-precision mode); gradients are accurate to solver tolerance,
like every forward-sensitivity method.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .fused_erk import solve_fused_erk
from .fused_erk_grid import solve_fused_erk_grid
from .fused_esdirk import solve_fused_esdirk
from .fused_esdirk_grid import solve_fused_esdirk_grid


def _family(method):
    if method is None:
        return "erk"
    fam = getattr(method, "family", None)
    if fam not in ("erk", "esdirk"):
        raise ValueError(
            f"fused sensitivities support erk/esdirk methods, not "
            f"family {fam!r}; use sensitivity.sens_forward (XLA) for "
            "the other families")
    return fam


def _aug_fun(fun, n, k, n_sens_y0, with_params):
    """The variational RHS over stacked rows.

    Input rows: [y (n); s_1..s_k (n each); v_1..v_{n_sens_y0} (n
    each)].  Tangent rows are jax.jvp directional derivatives of the
    user RHS — traced in-kernel, Mosaic-safe (seeds are anchored on
    runtime zeros: constant splat seeds miscompile at bm>=16, see
    docs/TPU_NOTES.md).
    """
    def aug(t, Y, p=()):
        y = Y[:n]

        def prim(yy, pp):
            return fun(t, yy, pp) if with_params else fun(t, yy)

        blocks = [prim(y, p)]
        # runtime-anchored constants (never constant-folded splats)
        one = 1.0 + 0.0 * y[0]
        zero_p = tuple(0.0 * pj for pj in p)
        for j in range(k):
            s = Y[n * (1 + j):n * (2 + j)]
            seed = tuple(one if i == j else 0.0 * p[i]
                         for i in range(len(p)))
            _, fd = jax.jvp(prim, (y, p), (s, seed))
            blocks.append(fd)
        for i in range(n_sens_y0):
            v = Y[n * (1 + k + i):n * (2 + k + i)]
            _, fd = jax.jvp(prim, (y, p), (v, zero_p))
            blocks.append(fd)
        return jnp.concatenate(blocks, axis=0)

    return aug


def _aug_fun_grid(fun, n, k, with_params):
    """The variational RHS in the GRID (states-on-lanes) convention:
    t (bm, 1), Y (bm, n*(1+k)) -> (bm, n*(1+k)); blocks on the lane
    axis [y | s_1..s_k], tangents from jax.jvp like :func:`_aug_fun`.
    """
    def aug(t, Y, p=()):
        y = Y[..., :n]

        def prim(yy, pp):
            return fun(t, yy, pp) if with_params else fun(t, yy)

        blocks = [prim(y, p)]
        one = 1.0 + 0.0 * t                # runtime-anchored (bm, 1)
        for j in range(k):
            s = Y[..., n * (1 + j):n * (2 + j)]
            seed = tuple(one if i == j else 0.0 * p[i]
                         for i in range(len(p)))
            _, fd = jax.jvp(prim, (y, p), (s, seed))
            blocks.append(fd)
        return jnp.concatenate(blocks, axis=-1)

    return aug


def solve_fused_sens(fun, t_span, y0_batch, params=None, method=None,
                     sens_y0=False, rtol=1e-4, atol=1e-6,
                     first_step=None, max_steps=100_000,
                     block_members=None, interpret=False,
                     compensated=False, max_step=None, layout=None):
    """Fused forward sensitivities for an ensemble of small systems.

    ``fun(t, y, p)`` in the flat-kernel rows convention (``y[j]`` row
    tiles, ``p`` a k-tuple of member tiles; ``fun(t, y)`` when
    ``params is None``).  ``params``: (B, k) per-member parameters —
    sensitivities are computed w.r.t. EACH of the k parameters.
    ``sens_y0=True`` additionally carries the n initial-condition
    sensitivity blocks (the full (n, n) fundamental-solution slice).

    ``layout``: "flat" (rows convention — the DEFAULT) or "grid"
    (the augmented state [y | s_1..s_k] rides the states-on-lanes
    kernel, ``fun`` in the GRID convention: t (bm, 1), y (bm, n), p a
    k-tuple of (bm, 1) columns).  The two conventions hand ``fun``
    TRANSPOSED arrays, so the layout is an API contract, never
    inferred from the problem size: pass ``layout="grid"`` explicitly
    for MID-SIZE parameter sweeps (MoL fields, n ~ 64-512).  Grid
    ``sens_y0`` is rejected (the n*n fundamental blocks exceed any
    lane budget — use :func:`solve_fused_adjoint` for dL/dy0 at large
    n).  ``block_members`` defaults to 1024 (flat) / 32 (grid).

    Returns ``(y_final (B, n), S_p (B, n, k), S_y0 (B, n, n) | None,
    status (B,), nsteps (B,), nfev (B,))``.  S_p[b, m, j] =
    d y_m(t_f) / d p_j for member b; S_y0[b, m, i] =
    d y_m(t_f) / d y0_i.  Error is controlled on the augmented state
    (internal differentiation — ``sens_forward``'s scheme), so the
    step sequence adapts to the sensitivities too and nfev counts
    augmented-system evaluations.
    """
    y0_batch = jnp.asarray(y0_batch, jnp.float32)
    B, n = y0_batch.shape
    if params is not None:
        params = jnp.asarray(params, jnp.float32)
        if params.ndim != 2 or params.shape[0] != B:
            raise ValueError("params must be (B, k)")
        k = params.shape[1]
    else:
        k = 0
        if not sens_y0:
            raise ValueError("nothing to differentiate: give params "
                             "and/or sens_y0=True")
    n_v = n if sens_y0 else 0
    n_aug = n * (1 + k + n_v)

    fam = _family(method)
    if layout is None:
        # NEVER inferred from the problem size: the two layouts hand
        # ``fun`` transposed arrays (rows vs (bm, n) lanes), so a
        # silent auto-pick would compute wrong sensitivities for a
        # shape-compatible fun written for the other convention
        layout = "flat"
    if layout == "grid":
        if sens_y0:
            raise ValueError(
                "sens_y0 on the grid layout would carry n*n "
                "fundamental-solution lanes; use solve_fused_adjoint "
                "for dL/dy0 at mid-size n")
    if block_members is None:
        block_members = 32 if layout == "grid" else 1024

    cols = [y0_batch, jnp.zeros((B, n * k), jnp.float32)]
    if sens_y0:
        eye = jnp.tile(jnp.eye(n, dtype=jnp.float32).reshape(1, n * n),
                       (B, 1))
        cols.append(eye)
    Y0 = jnp.concatenate(cols, axis=1)
    assert Y0.shape == (B, n_aug)

    kw = dict(method=method, rtol=rtol, atol=atol,
              first_step=first_step, max_steps=max_steps,
              block_members=block_members, interpret=interpret,
              compensated=compensated, max_step=max_step,
              params=params)
    if layout == "grid":
        aug = _aug_fun_grid(fun, n, k, with_params=params is not None)
        if fam == "esdirk":
            # simultaneous corrector on the lane layout: every
            # diagonal block of the augmented Newton matrix is the
            # base tridiagonal W, tiled and solved in ONE block-cyclic
            # PCR pass (CVODES SIM; solve_fused_esdirk_grid docstring)
            out = solve_fused_esdirk_grid(aug, t_span, Y0,
                                          block_base=n, **kw)
        else:
            out = solve_fused_erk_grid(aug, t_span, Y0, **kw)
    elif fam == "esdirk":
        aug = _aug_fun(fun, n, k, n_v, with_params=params is not None)
        out = solve_fused_esdirk(aug, t_span, Y0, block_base=n, **kw)
    else:
        aug = _aug_fun(fun, n, k, n_v, with_params=params is not None)
        out = solve_fused_erk(aug, t_span, Y0, **kw)
    y_aug, status, nsteps, nfev = out

    y_f = y_aug[:, :n]
    S_p = (y_aug[:, n:n * (1 + k)].reshape(B, k, n).transpose(0, 2, 1)
           if k else jnp.zeros((B, n, 0), jnp.float32))
    S_y0 = (y_aug[:, n * (1 + k):].reshape(B, n, n).transpose(0, 2, 1)
            if sens_y0 else None)
    return y_f, S_p, S_y0, status, nsteps, nfev


def _rows_eval(fun, t, Y, params):
    """Evaluate the rows-convention RHS on host-side (B, n) arrays."""
    yr = Y.T                                   # (n, B) row tiles
    tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32), yr[0].shape)
    if params is None:
        return fun(tt, yr).T
    p = tuple(params[:, j] for j in range(params.shape[1]))
    return fun(tt, yr, p).T


def _grid_eval(fun, t, Y, params):
    """Evaluate the GRID-convention RHS on host-side (B, n) arrays."""
    tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32),
                          (Y.shape[0], 1))
    if params is None:
        return fun(tt, Y)
    p = tuple(params[:, j:j + 1] for j in range(params.shape[1]))
    return fun(tt, Y, p)


@partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5, 6, 7, 8, 9, 10))
def solve_fused_final(fun, t_span, y0_batch, params, method=None,
                      rtol=1e-4, atol=1e-6, max_steps=100_000,
                      block_members=1024, interpret=False,
                      compensated=False):
    """y(t_f) for a fused ensemble, differentiable w.r.t.
    (t_span, y0_batch, params).

    The fused twin of ``sensitivity.solve_final``: the primal is one
    fused solve (ERK, or ESDIRK when ``method.family == "esdirk"`` —
    stiff ``jax.grad`` at fused speed); the backward pass is ONE fused
    augmented solve (forward sensitivities, :func:`solve_fused_sens`)
    contracted with the cotangent — two kernel launches for
    value-and-grad of the entire parameter-sweep ensemble.  ``params``
    may be None (grads w.r.t. t_span/y0 only).  Gradients are
    tolerance-accurate.
    """
    solver = (solve_fused_esdirk if _family(method) == "esdirk"
              else solve_fused_erk)
    out = solver(fun, t_span, y0_batch, method=method,
                 rtol=rtol, atol=atol, max_steps=max_steps,
                 block_members=block_members,
                 interpret=interpret, compensated=compensated,
                 params=params)
    return out[0]


def _fused_final_fwd(fun, t_span, y0_batch, params, method, rtol,
                     atol, max_steps, block_members, interpret,
                     compensated):
    y = solve_fused_final(fun, t_span, y0_batch, params, method, rtol,
                          atol, max_steps, block_members, interpret,
                          compensated)
    return y, (t_span, y0_batch, params, y)


def _fused_final_bwd(fun, method, rtol, atol, max_steps,
                     block_members, interpret, compensated,
                     residuals, ct):
    t_span, y0_batch, params, y_f = residuals
    _, S_p, S_y0, status, _, _ = solve_fused_sens(
        fun, t_span, y0_batch, params=params, method=method,
        sens_y0=True, rtol=rtol, atol=atol, max_steps=max_steps,
        block_members=block_members, interpret=interpret,
        compensated=compensated)
    ct = jnp.asarray(ct, jnp.float32)
    y0_bar = jnp.einsum("bm,bmi->bi", ct, S_y0)
    p_bar = (jnp.einsum("bm,bmj->bj", ct, S_p)
             if params is not None else None)
    # t_span cotangents: dy_f/dtf = f(tf, y_f); dy_f/dt0 = -S_y0 f(t0, y0)
    t0, tf = t_span
    f_tf = _rows_eval(fun, tf, y_f, params)
    f_t0 = _rows_eval(fun, t0, y0_batch, params)
    dtf = jnp.vdot(ct, f_tf)
    dt0 = -jnp.vdot(ct, jnp.einsum("bmi,bi->bm", S_y0, f_t0))
    return ((dt0, dtf), y0_bar, p_bar)


solve_fused_final.defvjp(_fused_final_fwd, _fused_final_bwd)


# ---------------------------------------------------------------------------
# continuous adjoint THROUGH a fused forward solve
# ---------------------------------------------------------------------------
#
# solve_fused_final's backward pass is a fused FORWARD-sensitivity
# solve: cost scales with the parameter count k (the augmented state
# is n*(1+k+n) wide).  The classical alternative for LARGE k is the
# continuous adjoint (what the reference's sens_adjoint_end does,
# /root/reference/extensisq/sensitivity.py — one backward n+k system
# regardless of k, interpolating y(t) through the forward's dense
# output, common.py:766-821).  Round 4's fused dense-output recording
# (ops/fused_dense.py) makes that possible through a FUSED forward:
# the primal is one fused kernel launch; the backward integrates
# mu' = -J^T mu, xi' = (df/dp)^T mu per member with the f64 XLA device
# driver, reading y(t) from the recorded FusedDenseSolution — O(1)
# memory in k on the tape side and gradient cost independent of k.

def _adjoint_family(method):
    """Adjoint routing accepts more families than the forward-sens
    augmentation: the backward only needs the recorded dense output,
    which every fused family can produce."""
    if method is None:
        return "erk"
    fam = getattr(method, "family", None)
    if fam not in ("erk", "esdirk", "rkn", "adams"):
        raise ValueError(
            f"solve_fused_adjoint supports erk/esdirk/rkn/adams "
            f"methods, not family {fam!r}; use "
            "sensitivity.sens_adjoint_end (XLA) for the others")
    return fam


def _adjoint_solver(method, layout, k_max=12):
    fam = _adjoint_family(method)
    if fam == "adams":
        # SWAG kernels take no method= kwarg (one method per family);
        # k_max bounds the unrolled order machinery (trace cost)
        from .fused_adams import solve_fused_adams
        from .fused_adams_grid import solve_fused_adams_grid
        base = (solve_fused_adams_grid if layout == "grid"
                else solve_fused_adams)
        return lambda *a, method=None, **kw: base(*a, k_max=k_max,
                                                  **kw)
    if fam == "rkn":
        from .fused_rkn import solve_fused_rkn
        from .fused_rkn_grid import solve_fused_rkn_grid
        return (solve_fused_rkn_grid if layout == "grid"
                else solve_fused_rkn)
    if layout == "grid":
        return (solve_fused_esdirk_grid if fam == "esdirk"
                else solve_fused_erk_grid)
    return solve_fused_esdirk if fam == "esdirk" else solve_fused_erk


def solve_fused_adjoint(fun, t_span, y0_batch, params, method=None,
                        rtol=1e-4, atol=1e-6, max_steps=100_000,
                        block_members=1024, interpret=False,
                        dense=512, bw_method=None, bw_rtol=None,
                        bw_atol=None, layout="flat", k_max=12):
    """y(t_f) for a fused ensemble, differentiable via the CONTINUOUS
    ADJOINT — gradient cost independent of the parameter count.

    The fused twin of ``sensitivity.sens_adjoint_end`` /
    ``solve_final``'s backward: the primal is ONE fused kernel launch
    (routed by ``method.family``: ERK, ESDIRK, RKN or Adams/SWAG —
    matching the reference's any-solver adjoint,
    sensitivity.py:220-387); under
    ``jax.grad`` the forward additionally records per-step ``(t, y,
    f)`` rows in-kernel (``dense=R`` capacity, ops/fused_dense.py) and
    the backward integrates the (n + k)-dimensional adjoint system per
    member with the f64 XLA driver, interpolating y(t) through the
    recorded cubic-Hermite dense output.  Prefer this over
    :func:`solve_fused_final` when k is large (forward sensitivities
    cost a factor ~(1 + k + n) in fused state width; the adjoint is
    flat in k).

    ``fun(t, y[, p])`` in the fused rows convention — or the GRID
    (states-on-lanes) convention with ``layout="grid"``: t (bm, 1),
    y (bm, n), p a k-tuple of (bm, 1) columns.  For an RKN method
    ``fun`` is the ACCELERATION ``acc(t, u, v[, p])`` in the same
    convention (``y0_batch`` is [u, v]; the backward differentiates
    the full-state form [v, a] automatically).  The grid layout
    routes the primal through the grid kernels so MID-SIZE systems
    (MoL fields,
    n ~ 64-512) get fused-speed continuous-adjoint gradients too
    (mind the VMEM recording budget: at n = 256 use
    ``block_members=8`` and ``dense`` <= ~350).  ``params`` is (B, k)
    or None.  ``dense`` must cover the forward's loop iterations —
    members that overflow it get NaN gradients (check
    ``jnp.isfinite``; enlarge ``dense`` or shrink the span).
    ``bw_method/bw_rtol/bw_atol`` control the backward XLA solve
    (defaults: the driver default method at the forward tolerances);
    ``k_max`` bounds the SWAG order machinery on Adams routes
    (ignored otherwise).
    Gradients are tolerance-accurate, like every continuous-adjoint
    method (and the reference's).

    Adams/SWAG routes require a STATIC ``t_span`` (the multistep
    kernels bake the horizon into the host init) and therefore carry
    no t_span gradients — matching the reference, whose adjoint has
    none for any solver; the other families also differentiate
    (t0, tf).
    """
    args = (fun, t_span, y0_batch, params, method, rtol, atol,
            max_steps, block_members, interpret, dense, bw_method,
            bw_rtol, bw_atol, layout, k_max)
    if _adjoint_family(method) == "adams":
        try:
            ts = (float(t_span[0]), float(t_span[1]))
        except (TypeError, jax.errors.ConcretizationTypeError) as e:
            raise ValueError(
                "Adams/SWAG fused adjoint needs a static t_span "
                "(concrete floats): the multistep host init bakes "
                "the horizon in") from e
        return _fused_adjoint_static_t(fun, ts, *args[2:])
    return _fused_adjoint_diff_t(*args)


@partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5, 6, 7, 8, 9, 10,
                                          11, 12, 13, 14, 15))
def _fused_adjoint_diff_t(fun, t_span, y0_batch, params, method,
                          rtol, atol, max_steps, block_members,
                          interpret, dense, bw_method, bw_rtol,
                          bw_atol, layout, k_max):
    out = _adjoint_solver(method, layout, k_max)(
        fun, t_span, y0_batch, method=method, rtol=rtol,
        atol=atol, max_steps=max_steps,
        block_members=block_members, interpret=interpret,
        params=params)
    return out[0]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 4, 5, 6, 7, 8, 9, 10,
                                          11, 12, 13, 14, 15))
def _fused_adjoint_static_t(fun, t_span, y0_batch, params, method,
                            rtol, atol, max_steps, block_members,
                            interpret, dense, bw_method, bw_rtol,
                            bw_atol, layout, k_max):
    out = _adjoint_solver(method, layout, k_max)(
        fun, t_span, y0_batch, method=method, rtol=rtol,
        atol=atol, max_steps=max_steps,
        block_members=block_members, interpret=interpret,
        params=params)
    return out[0]


def _fused_adjoint_fwd(fun, t_span, y0_batch, params, method, rtol,
                       atol, max_steps, block_members, interpret,
                       dense, bw_method, bw_rtol, bw_atol, layout,
                       k_max):
    out = _adjoint_solver(method, layout, k_max)(
        fun, t_span, y0_batch, method=method, rtol=rtol,
        atol=atol, max_steps=max_steps,
        block_members=block_members, interpret=interpret,
        params=params, dense=int(dense))
    y_f, sol = out[0], out[-1]
    return y_f, (t_span, y0_batch, params, y_f, sol)


def _fused_adjoint_bwd(fun, method, rtol, atol, max_steps,
                       block_members, interpret, dense, bw_method,
                       bw_rtol, bw_atol, layout, k_max, residuals,
                       ct):
    from ..solve import solve
    from ..core.interpolate import OdeSolution

    t_span, y0_batch, params, y_f, dsol = residuals
    t0, tf = t_span
    n = y0_batch.shape[-1]
    k = 0 if params is None else params.shape[-1]
    has_p = params is not None
    rt = rtol if bw_rtol is None else bw_rtol
    at = atol if bw_atol is None else bw_atol
    ct = jnp.asarray(ct, jnp.float64)
    fam = _adjoint_family(method)
    m = n // 2   # RKN: y = [u, v]

    def one(ts, ta, hh, ya, Q, ct_m, p_m, valid):
        soln = OdeSolution(ts=ts, t_anchor=ta, h=hh, y_anchor=ya,
                           Q=Q)

        def f_of(t, yy, pv):
            pt_flat = (tuple(pv[j] for j in range(k)) if has_p
                       else None)
            if layout == "grid":
                tt = jnp.reshape(jnp.asarray(t, yy.dtype), (1, 1))
                Y = yy[None, :]
                pt = (tuple(jnp.reshape(pv[j], (1, 1))
                            for j in range(k)) if has_p else None)
                if fam == "rkn":
                    # fun is acc(t, u, v[, p]); full-state derivative
                    # for the adjoint vjp is [v, a]
                    u, v = Y[:, :m], Y[:, m:]
                    a = jnp.asarray(fun(tt, u, v, pt) if has_p
                                    else fun(tt, u, v))
                    return jnp.concatenate([v, a], axis=-1)[0]
                if has_p:
                    return jnp.asarray(fun(tt, Y, pt))[0]
                return jnp.asarray(fun(tt, Y))[0]
            if fam == "rkn":
                u, v = yy[:m], yy[m:]
                a = jnp.asarray(fun(t, u, v, pt_flat) if has_p
                                else fun(t, u, v))
                return jnp.concatenate([v, a])
            if has_p:
                return jnp.asarray(fun(t, yy, pt_flat))
            return jnp.asarray(fun(t, yy))

        def fun_bw(t, z):
            mu = z[:n]
            y = jnp.asarray(soln(jnp.asarray(t, jnp.float32)),
                            z.dtype)
            _, pull = jax.vjp(lambda yy, pv: f_of(t, yy, pv), y, p_m)
            JTmu, DTmu = pull(mu)
            return jnp.concatenate([-JTmu, DTmu])

        zf = jnp.concatenate([ct_m, jnp.zeros((k,), ct_m.dtype)])
        bw = solve(fun_bw, (tf, t0), zf, method=bw_method, rtol=rt,
                   atol=at, max_steps=max_steps)
        guard = jnp.where(valid & (bw.status == 1), 1.0, jnp.nan)
        mu0 = bw.y[:n] * guard
        dp = -bw.y[n:] * guard
        return mu0, dp

    p_b = (jnp.asarray(params, jnp.float64) if has_p
           else jnp.zeros((y0_batch.shape[0], 0), jnp.float64))
    mu0, dp = jax.vmap(one)(dsol.ts, dsol.t_anchor, dsol.h,
                            dsol.y_anchor, dsol.Q, ct, p_b,
                            dsol.valid)

    # t_span cotangents (summed over members: t_span is shared):
    # dL/dtf = sum_b ct_b . f(tf, yf_b); dL/dt0 = -sum_b mu0_b . f(t0, y0_b)
    ev = _grid_eval if layout == "grid" else _rows_eval
    if fam == "rkn":
        # the full-state derivative [v, a] of the acceleration form
        if layout == "grid":
            def eval_fun(t, y, *p):
                a = jnp.asarray(fun(t, y[..., :m], y[..., m:], *p))
                return jnp.concatenate([y[..., m:], a], axis=-1)
        else:
            def eval_fun(t, y, *p):
                a = jnp.asarray(fun(t, y[:m], y[m:], *p))
                return jnp.concatenate([y[m:], a])
    else:
        eval_fun = fun
    f_tf = ev(eval_fun, tf, y_f, params)
    f_t0 = ev(eval_fun, t0, y0_batch, params)
    dtf = jnp.vdot(ct, jnp.asarray(f_tf, jnp.float64))
    dt0 = -jnp.vdot(mu0, jnp.asarray(f_t0, jnp.float64))
    y0_bar = jnp.asarray(mu0, jnp.float32)
    p_bar = jnp.asarray(dp, jnp.float32) if has_p else None
    return ((dt0, dtf), y0_bar, p_bar)


_fused_adjoint_diff_t.defvjp(_fused_adjoint_fwd, _fused_adjoint_bwd)


def _fused_adjoint_static_fwd(fun, t_span, y0_batch, params, method,
                              rtol, atol, max_steps, block_members,
                              interpret, dense, bw_method, bw_rtol,
                              bw_atol, layout, k_max):
    y_f, res = _fused_adjoint_fwd(
        fun, t_span, y0_batch, params, method, rtol, atol, max_steps,
        block_members, interpret, dense, bw_method, bw_rtol, bw_atol,
        layout, k_max)
    return y_f, res[1:]          # t_span is static: not a residual


def _fused_adjoint_static_bwd(fun, t_span, method, rtol, atol,
                              max_steps, block_members, interpret,
                              dense, bw_method, bw_rtol, bw_atol,
                              layout, k_max, residuals, ct):
    _, y0_bar, p_bar = _fused_adjoint_bwd(
        fun, method, rtol, atol, max_steps, block_members, interpret,
        dense, bw_method, bw_rtol, bw_atol, layout, k_max,
        (t_span,) + tuple(residuals), ct)
    return y0_bar, p_bar


_fused_adjoint_static_t.defvjp(_fused_adjoint_static_fwd,
                               _fused_adjoint_static_bwd)
