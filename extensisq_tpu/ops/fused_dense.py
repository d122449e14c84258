"""Continuous dense output FROM the fused kernels.

The fused kernels integrate whole adaptive trajectories inside one
``pallas_call``; until round 4 they could only emit t_eval snapshots
(solve-time-known points).  This module adds the reference's
``sol``-object capability (an evaluable dense output on every solver,
/root/reference/extensisq/common.py:766-821) to the fused path:

* the kernel records one row per LOOP ITERATION to a VMEM/HBM ring
  buffer — the step-endpoint ``(t, y, f)`` plus a per-member accept
  flag.  The row index is the loop-iteration counter, which is
  UNIFORM across the member block (members that rejected or already
  finished simply write flag 0), so the store needs only a scalar
  dynamic index — no per-lane scatter, which Mosaic does not have;
* :func:`build_fused_dense` compacts the rows per member (cumsum of
  the accept flags -> segment index, one scatter) into the
  framework's unified anchor form (core/interpolate.py:OdeSolution)
  with cubic Hermite segment coefficients — the reference's
  inter-step evaluation semantics (common.py:766-821; RKC's own dense
  output is the same cubic Hermite, sommeijer.py:400-406; ESDIRK rows
  carry the stiffly accurate K_{s-1} as the endpoint derivative).

Everything here is jnp on static shapes: the builder runs under jit
and the resulting :class:`FusedDenseSolution` is a pytree whose
evaluation is traceable (e.g. inside an adjoint backward RHS), like
the XLA driver's ``OdeSolution``.

Capacity: the ring buffer holds ``R`` rows; a member whose loop
needed more iterations (accepted + rejected attempts) than ``R`` gets
``valid[b] = False`` (its recorded prefix is still exact).  Size
``R`` at ~1.3x the expected step count.
"""
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core.interpolate import OdeSolution, hermite_cubic_coefficients

# sentinel marking a non-accepted recording row inside the kernels
# (arithmetic blends forbid NaN coding: 0 * NaN = NaN); real t values
# are always far below it
_REC_UNSET = 3.0e38


class FusedDenseSolution(NamedTuple):
    """Per-member evaluable dense output from a fused solve (pytree).

    Fields carry a leading member axis ``B``.  ``member(b)`` returns
    that member's :class:`OdeSolution`; calling the object evaluates
    ALL members at once: ``sol(t)`` -> (B, n) for scalar ``t``,
    (B, n, m) for an (m,) vector.  ``valid[b]`` is False when member
    b overflowed the recording capacity (see module docstring).
    """
    ts: Any          # (B, R+1)
    t_anchor: Any    # (B, R)
    h: Any           # (B, R) signed; 1.0 on inert tail segments
    y_anchor: Any    # (B, R, n)
    Q: Any           # (B, R, n, 3)
    valid: Any       # (B,) bool

    def member(self, b):
        return OdeSolution(ts=self.ts[b], t_anchor=self.t_anchor[b],
                           h=self.h[b], y_anchor=self.y_anchor[b],
                           Q=self.Q[b])

    def __call__(self, t):
        t = jnp.asarray(t)

        def one(ts, ta, hh, ya, Q):
            sol = OdeSolution(ts=ts, t_anchor=ta, h=hh, y_anchor=ya,
                              Q=Q)
            return sol(t)

        return jax.vmap(one)(self.ts, self.t_anchor, self.h,
                             self.y_anchor, self.Q)


def build_fused_dense(t0, tf, y0_b, f0_b, rec_t, rec_flag, rec_y,
                      rec_f, nsteps):
    """Compact per-iteration recording rows into a
    :class:`FusedDenseSolution`.

    rec_t (R, B), rec_flag (R, B) int, rec_y / rec_f (R, B, n);
    y0_b / f0_b (B, n); nsteps (B,) accepted-step counts from the
    kernel.  All jnp — runs under jit.
    """
    R, Bm = rec_t.shape
    t0 = jnp.float32(t0)
    tf = jnp.float32(tf)

    def one(y0m, f0m, rt, rf, ry, rfv, ns):
        flag = rf > 0
        pos = jnp.cumsum(flag.astype(jnp.int32))     # 1-indexed node
        nacc = pos[-1]
        # scatter accepted rows to their node slots (drop the rest)
        idx = jnp.where(flag, pos, R + 2)
        tN = jnp.zeros((R + 1,), jnp.float32).at[0].set(t0)
        tN = tN.at[idx].set(rt, mode="drop")
        yN = jnp.zeros((R + 1,) + y0m.shape,
                       jnp.float32).at[0].set(y0m)
        yN = yN.at[idx].set(ry, mode="drop")
        fN = jnp.zeros((R + 1,) + y0m.shape,
                       jnp.float32).at[0].set(f0m)
        fN = fN.at[idx].set(rfv, mode="drop")
        # inert tail: repeat the last real node so evaluation past the
        # trajectory returns the final state (searchsorted lands on
        # the first tail segment: anchor y_last, Q = 0, h = 1 guard)
        jj = jnp.arange(R + 1)
        live = jj <= nacc
        t_last = tN[nacc]
        tN = jnp.where(live, tN, t_last)
        yN = jnp.where(live[:, None], yN, yN[nacc])
        fN = jnp.where(live[:, None], fN, fN[nacc])
        h = tN[1:] - tN[:-1]
        h_safe = jnp.where(h == 0.0, jnp.float32(1.0), h)
        Q = jax.vmap(hermite_cubic_coefficients)(
            h_safe, yN[:-1], yN[1:], fN[:-1], fN[1:])
        # Q rows on zero-length tail segments are exactly 0 (dy = 0
        # and the slopes are multiplied by h = 0 before the guard)
        Q = jnp.where((h == 0.0)[:, None, None], 0.0, Q)
        # capacity check: every accepted step must have been recorded
        ok = nacc == ns
        return tN, tN[:-1], h_safe, yN[:-1], Q, ok

    ts, ta, h, ya, Q, ok = jax.vmap(one, in_axes=(0, 0, 1, 1, 1, 1, 0)
                                    )(y0_b, f0_b, rec_t, rec_flag,
                                      rec_y, rec_f, nsteps)
    return FusedDenseSolution(ts=ts, t_anchor=ta, h=h, y_anchor=ya,
                              Q=Q, valid=ok)
