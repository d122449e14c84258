"""Explicit shard_map halo exchange for stencil right-hand sides.

The stencil RHSs in :mod:`extensisq_tpu.parallel.pde` are written with
plain ``jnp.roll`` and rely on GSPMD to turn the shifts into halo
exchanges.  That is the recommended path.  This module provides the
manual equivalent (SURVEY.md section 5.8): the state lives sharded over
a mesh axis, each device computes its local stencil, and the one-point
halos move as explicit ``jax.lax.ppermute`` collectives over ICI.  Use
it when the automatic partitioner's choice needs to be pinned down (or
audited), and as the template for wider-stencil kernels.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:                                   # jax>=0.4.35 spelling
    from jax.experimental.shard_map import shard_map
except ImportError:                    # pragma: no cover
    shard_map = jax.shard_map


def heat_1d_rhs_shardmap(mesh, axis="space", kappa=1.0, n=None, dx=None):
    """Periodic 1-D heat RHS with explicit one-point halo exchange.

    Numerically identical to ``pde.heat_1d_rhs`` (same stencil, same
    dtype arithmetic); the returned function expects ``u`` sharded as
    ``P(axis)`` over ``mesh`` and is jit/vmap-compatible.
    """
    if dx is None:
        dx = 1.0 / n
    k = mesh.shape[axis]
    send_right = [(i, (i + 1) % k) for i in range(k)]   # dest i gets i-1
    send_left = [((i + 1) % k, i) for i in range(k)]    # dest i gets i+1

    def local(u):
        left = jax.lax.ppermute(u[-1:], axis, perm=send_right)
        right = jax.lax.ppermute(u[:1], axis, perm=send_left)
        um = jnp.concatenate([left, u, right])
        return kappa * (um[:-2] - 2.0 * u + um[2:]) / dx ** 2

    inner = shard_map(local, mesh=mesh, in_specs=P(axis),
                      out_specs=P(axis))

    def rhs(t, u):
        return inner(u)

    return rhs
