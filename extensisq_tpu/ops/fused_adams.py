"""Fused Pallas SWAG (Adams PECE) solver: the whole variable-order
multistep integration in ONE TPU kernel.

Config 2 (Van der Pol mu=1e3, SWAG) is this framework's pathological
case: ~43k sequential adaptive steps with narrow batches, so the XLA
device loop pays the tunnel's fixed per-iteration dispatch floor tens
of thousands of times.  Here the entire integration runs inside one
``pallas_call`` — per-iteration cost drops from ~0.3-0.5 ms of
dispatch to microseconds of VPU arithmetic.

Unlike the other fused kernels, this one does NOT reimplement the
stepper: ``steppers/adams.py`` is already straight-line masked
arithmetic over tiny static-shape arrays (no dynamic gathers — the
one-hot ``_take``/``_put`` forms, unrolled ``_cumprod``/``_cumsum_rev``),
so the SAME ``step_flat`` traces into the kernel under a double
``jax.vmap`` that appends the (sub, 128) member tiling as trailing
axes.  One stepper, three execution tiers: host driver, XLA device
loop, fused kernel.

The while carry is the solver-state pytree PACKED into one f32 array
and one i32 array of per-member rows (bools encoded as i32): Mosaic
rejects bool-carried selects, and packing also keeps the carry layout
trivially stable.  f32 only — the fast path for rtol >= ~1e-4; the
XLA f64 path remains the conformance solver.  The user RHS is the
ordinary ``fun(t, y)`` with ``y`` of shape (n,) (vmap batches it).
"""
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..steppers.adams import AdamsStepper
from ..types import IVPParams

_RUNNING, _FINISHED = 0, 1
_OVERFLOW = 3


def _pack_template(state, aux):
    """Leaf bookkeeping: (treedefs, per-leaf (shape, size, kind))."""
    leaves_s, td_s = jax.tree.flatten(state)
    leaves_a, td_a = jax.tree.flatten(aux)
    spec = []
    for leaf in leaves_s + leaves_a:
        arr = jnp.asarray(leaf)
        kind = ("f" if jnp.issubdtype(arr.dtype, jnp.floating)
                else "b" if arr.dtype == jnp.bool_ else "i")
        spec.append((arr.shape, int(np.prod(arr.shape, dtype=int)),
                     kind, arr.dtype))
    return td_s, td_a, len(leaves_s), spec


def solve_fused_adams(fun, t_span, y0_batch, rtol=1e-4, atol=1e-6,
                      first_step=None, k_max=12, max_steps=200_000,
                      block_members=1024, interpret=False):
    """Integrate an ensemble with SWAG entirely in one TPU kernel.

    y0_batch: (B, n) float32.  Returns (y_final (B, n), status (B,),
    nsteps (B,), nfev (B,)) with the fused status convention
    (1 finished, 2 too-small-step/tol-too-tight, 3 overflow/step cap).
    """
    y0_batch = jnp.asarray(y0_batch, jnp.float32)
    n_total, n = y0_batch.shape
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

    t0, tf = t_span
    t0 = float(t0)
    tf = float(tf)

    stepper = AdamsStepper(fun, n, np.float32,
                           options={"k_max": int(k_max)})

    # initial state on the XLA path (h_start etc. — one-time); x64 OFF
    # so every constant baked into the traced kernel is 32-bit
    with jax.enable_x64(False):
        params = IVPParams(
            t_bound=jnp.asarray(tf, jnp.float32),
            direction=jnp.asarray(np.sign(tf - t0) or 1.0,
                                  jnp.float32),
            rtol=jnp.asarray(rtol, jnp.float32),
            atol=jnp.asarray(atol, jnp.float32),
            max_step=jnp.asarray(np.inf, jnp.float32))
        states0 = jax.vmap(
            lambda y: stepper.init(t0, y, params,
                                   first_step=first_step))(y0_batch)
        aux0 = (jnp.ones((B,), bool), jnp.zeros((B,), jnp.int32))

    # template from one member for shapes/dtypes
    st1 = jax.tree.map(lambda l: l[0], states0)
    ax1 = jax.tree.map(lambda l: l[0], aux0)
    td_s, td_a, n_state_leaves, spec = _pack_template(st1, ax1)

    f_rows = sum(s for (_, s, k, _) in spec if k == "f")
    i_rows = sum(s for (_, s, k, _) in spec if k != "f")

    def pack(state, aux, batch_last):
        """Flatten pytrees into (rows, ...) f32 / i32 arrays."""
        leaves = jax.tree.leaves(state) + jax.tree.leaves(aux)
        fparts, iparts = [], []
        for leaf, (shape, size, kind, _) in zip(leaves, spec):
            if batch_last:
                flat = leaf.reshape((size,) + leaf.shape[len(shape):])
            else:
                flat = leaf.reshape(leaf.shape[:1] + (size,))
            (fparts if kind == "f" else iparts).append(
                flat.astype(jnp.float32 if kind == "f" else jnp.int32))
        ax = 0 if batch_last else 1
        return (jnp.concatenate(fparts, axis=ax),
                jnp.concatenate(iparts, axis=ax))

    def unpack(F, I):
        """(rows, sub, 128) packs -> (state, aux) with member tiles
        as trailing axes."""
        leaves = []
        fo = io = 0
        for shape, size, kind, dtype in spec:
            if kind == "f":
                part = F[fo:fo + size]
                fo += size
            else:
                part = I[io:io + size]
                io += size
            part = part.reshape(shape + part.shape[1:])
            if kind == "b":
                part = part != 0
            leaves.append(part)
        state = jax.tree.unflatten(td_s, leaves[:n_state_leaves])
        aux = jax.tree.unflatten(td_a, leaves[n_state_leaves:])
        return state, aux

    F0, I0 = pack(states0, aux0, batch_last=False)   # (B, f_rows) etc
    F0 = F0.T       # (f_rows, B)
    I0 = I0.T

    # index of the status / nsteps rows inside the int pack (for the
    # loop condition and the step cap)
    int_leaf_names = []
    names_s = list(type(st1)._fields)
    leaves_by_name = list(zip(names_s, jax.tree.leaves(st1)))
    io = 0
    int_offsets = {}
    si = 0
    for (shape, size, kind, _), (name, _l) in zip(
            spec[:n_state_leaves], leaves_by_name):
        if kind != "f":
            int_offsets[name] = io
            io += size
        si += 1
    status_row = int_offsets["status"]
    nsteps_row = int_offsets["nsteps"]
    nfev_row = int_offsets["nfev"]
    del int_leaf_names

    # y rows inside the float pack
    fo = 0
    f_offsets = {}
    for (shape, size, kind, _), (name, _l) in zip(
            spec[:n_state_leaves], leaves_by_name):
        if kind == "f":
            f_offsets[name] = (fo, size)
            fo += size
    y_off, y_size = f_offsets["y"]

    def kernel(F_ref, I_ref, yout_ref, stat_ref, nstep_ref, nfev_ref):
        import copy

        F = F_ref[:].reshape(f_rows, sub, 128)
        I = I_ref[:].reshape(i_rows, sub, 128)
        it0 = jnp.zeros((), jnp.int32)

        # Pallas rejects captured float-array constants; rebuild the
        # stepper's coefficient tables in-trace, anchored on a traced
        # zero (stacks of literal+zero scalars lower fine), and use
        # literal scalars for params.
        z = F[0, 0, 0] * 0.0
        stp = copy.copy(stepper)
        stp.matmul_free = True
        stp.iq = jnp.stack([z + float(v) for v in stepper.iq])
        stp.iqq = jnp.stack([z + float(v) for v in stepper.iqq])
        stp.gstr = jnp.stack([z + float(v) for v in stepper.gstr])
        stp.two = jnp.stack([z + float(v) for v in stepper.two])
        params_k = IVPParams(
            t_bound=np.float32(tf),
            direction=np.float32(np.sign(tf - t0) or 1.0),
            rtol=np.float32(rtol), atol=np.float32(atol),
            max_step=np.float32(np.finfo(np.float32).max))

        step2 = jax.vmap(jax.vmap(
            lambda s, a: stp.step_flat(params_k, s, a),
            in_axes=(-1, -1), out_axes=(-1, -1, -1)),
            in_axes=(-1, -1), out_axes=(-1, -1, -1))

        def cond(carry):
            _F, I_c, it = carry
            status = I_c[status_row]
            run = jnp.where(status == _RUNNING,
                            jnp.ones_like(status),
                            jnp.zeros_like(status))
            return (jnp.max(run) > 0) & (it < max_steps)

        def body(carry):
            F_c, I_c, it = carry
            state, aux = unpack(F_c, I_c)
            new, aux_new, _acc = step2(state, aux)
            F_n, I_n = pack(new, aux_new, batch_last=True)
            return F_n, I_n, it + 1

        F_f, I_f, it_f = jax.lax.while_loop(cond, body, (F, I, it0))

        status = I_f[status_row]
        # step-cap members report overflow like the other kernels
        hit_cap = (status == _RUNNING) & (it_f >= max_steps)
        status = status + jnp.where(hit_cap,
                                    jnp.full_like(status, _OVERFLOW),
                                    jnp.zeros_like(status))
        yout_ref[:] = F_f[y_off:y_off + y_size].reshape(n, bm).T
        stat_ref[:] = status.reshape(1, bm)
        nstep_ref[:] = I_f[nsteps_row].reshape(1, bm)
        nfev_ref[:] = I_f[nfev_row].reshape(1, bm)

    out_shapes = (
        jax.ShapeDtypeStruct((B, n), jnp.float32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.int32),
    )
    with jax.enable_x64(False):
        y_out, status, nsteps, nfev = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((f_rows, bm), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((i_rows, bm), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((bm, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bm), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bm), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bm), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(F0, I0)

    y_out = y_out[:n_total]
    return (y_out, status[0, :n_total], nsteps[0, :n_total],
            nfev[0, :n_total])
