"""Complex-valued ODE ensembles on the fused Pallas path.

The f64 XLA drivers support complex states end to end (the
reference's ``support_complex=True``, common.py:193).  Mosaic has no
complex dtype, so the fused path encodes z = x + iy as REAL lanes and
rides the UNCHANGED real kernels — RK arithmetic is linear in the
state, so a real weighted sum of stacked (re, im) rows IS complex RK
arithmetic exactly (design note: docs/TPU_NOTES.md "Complex-valued
ODEs on the fused path").

Layout: a complex state of n components becomes 2n real entries
BLOCKED as [Re z_0..Re z_{n-1} | Im z_0..Im z_{n-1}] — each partition
contiguous, so the split wrapper is two static slices (the RKN [u, v]
trick) and grid-layout masked lane padding pads the END of the joint
2n state without touching the partition boundary.

The user RHS is written over a (re, im) pair of real arrays with
ordinary jnp arithmetic and returns the (re', im') pair; complex
literals cannot reach Mosaic.  ``cmul``/``conj_mul`` cover the common
products.

Error control: the split kernel controls the REAL COMPONENTS (scale
``atol + rtol*|re_i|`` / ``|im_i|``, RMS over 2n entries) instead of
the reference's modulus scaling ``atol + rtol*|z_i|``
(common.py:147-159).  Since |re|,|im| <= |z|, the split scale is
smaller, hence CONSERVATIVE; the 2n-RMS equals the n-RMS of |e_i|
over sqrt(2)-equivalent weights, so the controllers agree to a
~sqrt(2) tolerance factor.  Tolerance-level equivalent, not
bit-pinned — the f64 complex XLA path remains the conformance solver.
"""
import jax
import jax.numpy as jnp
import numpy as np

from .fused_erk import solve_fused_erk
from .fused_erk_grid import solve_fused_erk_grid


def cmul(ar, ai, br, bi):
    """(ar + i ai) * (br + i bi) as a (re, im) pair."""
    return ar * br - ai * bi, ar * bi + ai * br


def conj_mul(ar, ai, br, bi):
    """conj(a) * b as a (re, im) pair."""
    return ar * br + ai * bi, ar * bi - ai * br


def _split(z_batch):
    """[Re | Im] blocked encoding.  Concrete inputs split on HOST
    (numpy): TPU backends (axon) cannot transfer complex buffers at
    all, so the complex boundary must never touch the device there.
    Tracers (CPU-jit composition) split with jnp."""
    if isinstance(z_batch, jax.core.Tracer):
        if not jnp.issubdtype(z_batch.dtype, jnp.complexfloating):
            raise ValueError("y0_batch must be complex")
        return jnp.concatenate(
            [jnp.real(z_batch), jnp.imag(z_batch)],
            axis=-1).astype(jnp.float32)
    z = np.asarray(z_batch)
    if not np.issubdtype(z.dtype, np.complexfloating):
        raise ValueError("y0_batch must be complex (use the real "
                         "kernels for real states)")
    return np.concatenate([z.real, z.imag],
                          axis=-1).astype(np.float32)


def complex_join(y, n=None):
    """Re-join a blocked [Re | Im] real array (host numpy) into the
    complex form: the inverse of the kernel encoding, for use with
    ``split_output=True`` results fetched from a TPU."""
    y = np.asarray(y)
    if n is None:
        n = y.shape[-1] // 2
    return (y[..., :n] + 1j * y[..., n:]).astype(np.complex64)


def _join(y, n):
    if isinstance(y, jax.core.Tracer):
        return (y[..., :n] + 1j * y[..., n:]).astype(jnp.complex64)
    # concrete: fetch and join on HOST (axon TPU cannot hold complex)
    return complex_join(np.asarray(y), n)


def _wrap_rows(fun, n):
    """rows convention: y is (2n, ...) stacked tiles; the user fun
    sees the (re, im) slice pair and returns the derivative pair."""
    def fun_split(t, y, *p):
        fr, fi = fun(t, y[:n], y[n:], *p)
        return jnp.concatenate([jnp.stack(fr) if isinstance(fr, list)
                                else fr,
                                jnp.stack(fi) if isinstance(fi, list)
                                else fi])
    return fun_split


def _wrap_grid(fun, n):
    """grid convention: y is (bm, 2n_padded-sliced-to-2n); split on
    the lane axis."""
    def fun_split(t, y, *p):
        fr, fi = fun(t, y[..., :n], y[..., n:], *p)
        return jnp.concatenate([fr, fi], axis=-1)
    return fun_split


def solve_fused_erk_complex(fun, t_span, z0_batch, layout=None,
                            split_output=False, **kw):
    """Fused ERK integration of a COMPLEX ensemble.

    ``z0_batch``: (B, n) complex.  ``fun(t, re, im[, p]) ->
    (re', im')`` over real arrays in the fused layout's convention
    (rows for ``layout="flat"``: re/im are (n, ...) stacked tiles;
    lanes for ``layout="grid"``: re/im are (bm, n)).  The default
    ``layout=None`` follows :mod:`.dispatch`'s size rule (grid when
    the split state 2n >= 48) — safe for ELEMENTWISE RHS, which read
    identically under both conventions; an RHS that indexes or
    shifts the state axis must pass ``layout`` explicitly.  Every
    kwarg of the underlying real kernel passes through
    (``rtol``/``atol``, ``compensated``, ``t_eval``,
    ``block_members``, ``params``, ``max_step``, ``interpret``,
    ...); ``events`` callables see the SPLIT real state
    ([re | im], 2n wide).

    Returns the real kernel's tuple with complex ``y_final`` (B, n)
    complex64 and, when ``t_eval`` is given, complex ``y_eval``.
    Concrete results join to complex ON HOST (numpy): TPU backends
    (axon) cannot hold or transfer complex buffers, so the complex
    boundary never touches the device; under CPU jit tracing the
    join emits device complex64 instead.  ``split_output=True``
    skips the join entirely and returns the raw blocked [Re | Im]
    real arrays (use :func:`complex_join` after fetching) — the
    all-real program a TPU deployment jits end to end.
    ``dense=`` recording is not re-wrapped (the recorded solution
    evaluates in the split real coordinates); use the f64 XLA path
    for complex dense output.
    """
    # never jnp.asarray a concrete complex input: that would place a
    # complex buffer on the device (unsupported on axon TPU)
    z0 = (z0_batch if isinstance(z0_batch, jax.core.Tracer)
          else np.asarray(z0_batch))
    n = z0.shape[-1]
    y0 = _split(z0)
    if layout is None:
        from .dispatch import _GRID_MIN
        layout = "grid" if 2 * n >= _GRID_MIN else "flat"
    if layout == "grid":
        solver, wrapped = solve_fused_erk_grid, _wrap_grid(fun, n)
    elif layout == "flat":
        solver, wrapped = solve_fused_erk, _wrap_rows(fun, n)
    else:
        raise ValueError(f"unknown layout {layout!r}")
    if kw.get("dense") is not None:
        raise ValueError("dense= recording is split-real; evaluate "
                         "through the real kernels directly or use "
                         "the f64 XLA complex path")
    out = solver(wrapped, t_span, y0, **kw)
    if split_output:
        return out
    ret = (_join(out[0], n),) + tuple(out[1:4])
    k = 4
    if kw.get("t_eval") is not None:
        ret = ret + (_join(out[k], n),)
        k += 1
    # events (if any) stay in split-real coordinates: t_events and
    # counts are layout-free; y_events re-joins
    if kw.get("events") is not None:
        tev, yev, fired = out[k], out[k + 1], out[k + 2]
        ret = ret + (tev, _join(yev, n), fired)
    return ret


def reference_complex_norm_scale(atol, rtol, z, z_new):
    """The reference's modulus-based error scale (common.py:147-159)
    for comparison in tests: atol + rtol * max(|z|, |z_new|)."""
    return atol + rtol * np.maximum(np.abs(z), np.abs(z_new))
