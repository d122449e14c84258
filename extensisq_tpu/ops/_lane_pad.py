"""Masked lane padding: arbitrary-n systems on the grid kernels.

The grid-layout fused kernels put the STATE on the 128-lane vector
axis, which used to hard-require ``n % 128 == 0`` (and a power of two
for the ESDIRK grid's cyclic reduction) — the reference's own mid-size
showcase, Medazko at n=400 (/root/reference/tests/test_ivp.py:262-291),
could not ride any fused kernel without hand-padding.  This module
makes padding a kernel-internal detail with EXACT step-sequence
equality to the unpadded problem:

* the state is zero-padded to the next legal lane width; pad lanes are
  *inert*: the wrapped RHS slices its input back to the TRUE width
  before calling the user function (which therefore needs NO change —
  its stencils, coefficient arrays and rolls all see exactly n lanes;
  Mosaic handles the unaligned intermediate shapes, verified on
  hardware) and zero-pads the output, so padded y stays identically 0
  and the Jacobian rows AND columns of pad lanes vanish (the implicit
  kernels' Newton matrices stay decoupled);
* every lane reduction (error RMS, h_start's sum/min) masks pad lanes
  and divides by the TRUE lane count, so error norms, the Watts
  starting step, and the controller sequence are bit-identical to an
  unpadded run of the same arithmetic.  The reducers are
  shape-polymorphic over WIDTH MULTIPLES of n_pad (the RKN loop norms
  the joined [u, v] array of width 2 n_pad).

All masks derive from ``broadcasted_iota`` ARITHMETIC — rolled
constant vectors trip Mosaic's layout pass (docs/TPU_NOTES.md).
"""
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


_BIG = 3.0e38


class LaneTools(NamedTuple):
    """In-kernel closures for a padded lane layout.

    ``mask``: (bm, n_pad) f32 0/1 live-lane mask (None when no padding
    is active — every closure is then the original kernels' unmasked
    form, so an aligned n compiles to the identical program).
    ``sl``: slice one partition back to the true width; ``pb``:
    zero-pad a true-width partition to n_pad.  ``wrap_fun`` wraps an
    RHS (input sliced, output padded); ``wrap_obs`` an observable
    (input sliced, member-column output passed through).  ``mnorm``:
    RMS over TRUE lanes; ``msum``/``mmin``: masked sum/min (h_start's
    reducers).  The reducers accept widths k * n_pad (k partitions
    concatenated) and divide by k * n_true.
    """
    mask: Optional[Any]
    sl: Callable
    pb: Callable
    wrap_fun: Callable
    wrap_obs: Callable
    mnorm: Callable
    msum: Callable
    mmin: Callable


def pad_width(n, multiple=128, pow2=False):
    """Next legal lane width >= n (static host arithmetic)."""
    m = -(-n // multiple) * multiple
    if pow2:
        p = multiple
        while p < m:
            p *= 2
        m = p
    return m


def pad_lanes(arr, n_pad, parts=1):
    """Zero-pad the last axis to parts * n_pad (host level, before the
    pallas_call).  With ``parts > 1`` the last axis is parts stacked
    partitions of equal width, each padded separately (RKN's [u, v])."""
    n2 = arr.shape[-1]
    n = n2 // parts
    if n == n_pad:
        return arr
    arr = arr.reshape(arr.shape[:-1] + (parts, n))
    cfg = [(0, 0)] * (arr.ndim - 1) + [(0, n_pad - n)]
    arr = jnp.pad(arr, cfg)
    return arr.reshape(arr.shape[:-2] + (parts * n_pad,))


def unpad_lanes(arr, n_true, n_pad, parts=1):
    """Invert :func:`pad_lanes` (host level, after the pallas_call)."""
    if n_true == n_pad:
        return arr
    arr = arr.reshape(arr.shape[:-1] + (parts, n_pad))
    return arr[..., :n_true].reshape(
        arr.shape[:-2] + (parts * n_true,))


def lane_tools(bm, n_pad, n_true, parts=1):
    """Build the in-kernel :class:`LaneTools` for a (bm, parts * n_pad)
    layout with ``n_true`` live lanes per partition.

    ``parts > 1``: the state is ``parts`` equal-width partitions
    concatenated on the lane axis, each padded from n_true to n_pad
    individually (the ESDIRK grid kernel's block_base simultaneous-
    corrector layout: [y | s_1 .. s_k] blocks).  ``sl``/``pb`` then
    slice/pad EVERY partition (static slices + concat, Mosaic-safe);
    the reducers already accept any multiple of n_pad."""
    if n_true == n_pad:
        ident = lambda f: f                              # noqa: E731
        same = lambda x: x                               # noqa: E731
        return LaneTools(
            None, same, same, ident, ident,
            lambda x: jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True)),
            lambda x: jnp.sum(x, axis=-1, keepdims=True),
            lambda x: jnp.min(x, axis=-1, keepdims=True),
        )
    lane = jax.lax.broadcasted_iota(jnp.int32, (bm, n_pad), 1)
    mask1 = (lane < n_true).astype(jnp.float32)
    _masks = {1: mask1}

    def _mask_for(width):
        k, rem = divmod(width, n_pad)
        if rem or k < 1:
            raise ValueError(
                f"masked reduction over width {width}, not a "
                f"multiple of the padded partition width {n_pad}")
        if k not in _masks:
            _masks[k] = jnp.concatenate([mask1] * k, axis=-1)
        return _masks[k], k

    def sl(x):
        if parts == 1:
            return x[..., :n_true]
        return jnp.concatenate(
            [x[..., j * n_pad:j * n_pad + n_true]
             for j in range(parts)], axis=-1)

    def pb(x):
        zpad = jnp.zeros(x.shape[:-1] + (n_pad - n_true,), x.dtype)
        if parts == 1:
            return jnp.concatenate([x, zpad], axis=-1)
        segs = []
        for j in range(parts):
            segs.append(x[..., j * n_true:(j + 1) * n_true])
            segs.append(zpad)
        return jnp.concatenate(segs, axis=-1)

    def wrap_fun(f):
        return lambda t, yy, *rest: pb(f(t, sl(yy), *rest))

    def wrap_obs(g):
        return lambda t, yy, *rest: g(t, sl(yy), *rest)

    def mnorm(x):
        mk, k = _mask_for(x.shape[-1])
        return jnp.sqrt(jnp.sum(x * x * mk, axis=-1, keepdims=True)
                        * (1.0 / (k * n_true)))

    def msum(x):
        mk, _ = _mask_for(x.shape[-1])
        return jnp.sum(x * mk, axis=-1, keepdims=True)

    def mmin(x):
        mk, _ = _mask_for(x.shape[-1])
        return jnp.min(x * mk + (1.0 - mk) * _BIG, axis=-1,
                       keepdims=True)

    return LaneTools(mask1, sl, pb, wrap_fun, wrap_obs, mnorm, msum,
                     mmin)
