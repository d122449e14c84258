"""Pod-scale fused ensembles: shard_map over the member axis around a
whole-integration Pallas kernel.

The fused kernels (ops/fused_*.py) already put an entire adaptive
integration inside ONE ``pallas_call`` on one chip.  Ensemble members
never exchange state — each carries its own error norm, controller and
counters — so scaling members across chips needs NO collectives at
all: shard the member axis over the mesh, run one kernel per device,
gather nothing until the results are fetched.  This is the fused twin
of the hierarchy.py placement rule ("ensemble members -> the outer
axis; the slow links see zero solver bytes") and the TPU-native
replacement for the reference's one-process-per-rank ensemble scaling
of the Demo_SSV2stab.ipynb workload (SURVEY.md section 5.8).

``solve_fused_sharded`` wraps :func:`extensisq_tpu.ops.solve_fused`
(the family/size dispatcher) in a ``shard_map`` whose in/out specs
shard ONLY the member axis; every kwarg of the underlying kernels
(rtol/atol/first_step/max_step/t_eval/events/compensated/rho/M/...)
passes through unchanged.  Requires B % mesh.size == 0 (shard_map
blocks must tile the member axis) — pad the ensemble like you would
for block_members.
"""
import hashlib
from collections import OrderedDict

import numpy as np

import jax
from jax.sharding import PartitionSpec as P

try:                                       # newer jax exports it
    from jax import shard_map
except ImportError:                        # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.dispatch import solve_fused

# Compiled-callable cache: rebuilding the shard_map closure and
# re-jitting it on EVERY call costs ~1.2 s of retrace/lowering (the
# kernel itself runs in ~30 ms), because jax.jit's cache is keyed on
# the function object and the closure is fresh each time.  Key on the
# call signature instead (arrays like t_eval hashed by shape/dtype +
# content DIGEST, never raw bytes — large grids would bloat the key;
# callables/method/mesh by identity — the same semantics jit itself
# uses for static closures).  Unhashable signatures just skip the
# cache.  Bounded LRU: long sweeps over varying signatures (different
# t_span/t_eval/kw) must not pin compiled executables forever.
_COMPILED = OrderedDict()
_COMPILED_MAX = 32


def _sig_hash(v):
    if isinstance(v, (np.ndarray, jax.Array)):
        a = np.asarray(v)
        return ("arr", a.shape, str(a.dtype),
                hashlib.sha1(np.ascontiguousarray(a).tobytes())
                .hexdigest())
    if isinstance(v, (list, tuple)):
        return ("seq", tuple(_sig_hash(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _sig_hash(x))
                                    for k, x in v.items())))
    return v


def _cache_key(fun, t_span, mesh, axis, method, kw, has_params):
    try:
        key = (fun, _sig_hash(tuple(np.asarray(t_span).ravel()
                                    .tolist())),
               mesh, axis, method, has_params, _sig_hash(kw))
        hash(key)
        return key
    except (TypeError, ValueError):
        return None


def solve_fused_sharded(fun, t_span, y0_batch, mesh, axis=None,
                        method=None, **kw):
    """Fused whole-integration solve, members sharded over ``mesh``.

    Parameters
    ----------
    fun, t_span, y0_batch, method, **kw :
        exactly :func:`extensisq_tpu.ops.solve_fused` (which routes to
        the family's kernel; see its table).  ``y0_batch`` has members
        on axis 0 — (B, n) for the flat/grid layouts, or
        (B, *grid_shape) for the RKC ensemble (``ensemble=True`` is
        implied here; a single-grid RKC solve has no member axis to
        shard — run it unsharded, or shard the GRID via parallel/pde's
        GSPMD stencils).  Every kernel's per-member ``params`` array
        is sharded alongside the members.
    mesh : ``jax.sharding.Mesh`` whose ``axis`` dimension divides B.
    axis : mesh axis name for the member shards (default: the mesh's
        first axis).

    Returns the underlying kernel's tuple — (y, status, nsteps,
    nfev[, nfesig][, y_eval][, t_events, y_events, n_events]) — each
    element sharded over its member axis (axis 0 for the per-member
    outputs and the RKC-ensemble ``y_eval``; axis 1 for the flat/grid
    kernels' ``y_eval (nq, B, n)`` and all event arrays).  The call is
    jitted with ``shard_map`` inside; per-device work is one
    ``pallas_call`` covering that device's members end to end (zero
    collectives in the solve).
    """
    if axis is None:
        axis = mesh.axis_names[0]
    ndev = mesh.shape[axis]
    B = int(np.shape(y0_batch)[0])
    if B % ndev:
        raise ValueError(
            f"member count {B} must divide over mesh axis "
            f"{axis!r} ({ndev} devices); pad the ensemble")

    # axis 0 is ALWAYS the member axis here (the function's contract),
    # so for the RKC family the stack is an ensemble regardless of the
    # members' grid rank — unlike ops.solve_fused's direct door, where
    # a bare 3-D array is read as one 3-D grid unless ensemble=True.
    is_rkc_ens = getattr(method, "family", None) == "rkc"
    if is_rkc_ens:
        if kw.get("ensemble") is False:
            raise ValueError(
                "solve_fused_sharded shards axis 0 as the member axis "
                "by contract, so an RKC y0_batch is always an ensemble "
                "of grids here; ensemble=False contradicts that. Drop "
                "the flag (or use ops.solve_fused / parallel.pde for a "
                "single grid).")
        kw["ensemble"] = True              # RKC member-of-grids stack
        if np.ndim(y0_batch) < 3:
            raise ValueError(
                "RKC ensemble members must be >= 2-D VMEM-tileable "
                f"grids; got member shape {np.shape(y0_batch)[1:]}. "
                "Reshape each 1-D member to (1, n) — i.e. y0_batch to "
                f"(B, 1, {int(np.prod(np.shape(y0_batch)[1:]))}).")

    nq = (0 if kw.get("t_eval") is None
          else int(np.shape(kw["t_eval"])[0]))
    ev = kw.get("events")
    n_ev = (0 if ev is None
            else len(ev) if isinstance(ev, (list, tuple)) else 1)

    params = kw.pop("params", None)        # per-member: shard it too
    operands = (np.asarray(y0_batch, np.float32),)
    in_specs = (P(axis),)
    if params is not None:
        operands += (np.asarray(params, np.float32),)
        in_specs += (P(axis),)

    key = _cache_key(fun, t_span, mesh, axis, method, kw,
                     params is not None)
    hit = _COMPILED.get(key) if key is not None else None
    if hit is not None:
        _COMPILED.move_to_end(key)         # LRU refresh
        return hit(*operands)

    def local(y0_block, *rest):
        kk = dict(kw)
        if rest:
            kk["params"] = rest[0]
        return solve_fused(fun, t_span, y0_block, method=method, **kk)

    # probe the output structure (arity differs by kernel/options)
    out_shape = jax.eval_shape(
        local, *(jax.ShapeDtypeStruct(np.shape(o), o.dtype)
                 for o in operands))
    n_out = len(out_shape)
    n_trail = (1 if nq else 0) + (3 if n_ev else 0)
    base = n_out - n_trail                 # y, status, counters...

    def member_axis(pos):
        if pos < base:
            return 0
        if nq and pos == base:
            # y_eval: (B, nq, *grid) for the RKC ensemble,
            # (nq, B, n) for the flat/grid kernels
            return 0 if is_rkc_ens else 1
        return 1                           # t/y/n_events (n_ev, B, ..)

    out_specs = tuple(P(*([None] * member_axis(i) + [axis]))
                      for i in range(n_out))

    # check_vma=False: pallas_call's output ShapeDtypeStructs carry no
    # vma annotation, and the member-sharded computation has no
    # cross-shard traffic for the checker to validate anyway
    run = shard_map(local, mesh=mesh, in_specs=in_specs,
                    out_specs=out_specs, check_vma=False)
    fn = jax.jit(run)
    if key is not None:
        _COMPILED[key] = fn
        while len(_COMPILED) > _COMPILED_MAX:
            _COMPILED.popitem(last=False)  # evict least recently used
    return fn(*operands)
