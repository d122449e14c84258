"""Continuous adjoint THROUGH a fused forward solve.

solve_fused_adjoint: primal = one fused kernel launch; backward =
the per-member (n + k) continuous-adjoint system integrated by the
f64 XLA driver against the fused forward's recorded dense output
(ops/fused_dense.py) — the fused twin of sens_adjoint_end /
solve_final's backward (reference sensitivity semantics,
/root/reference/extensisq/sensitivity.py), with gradient cost
independent of k.  All runs interpret mode (the conftest forces CPU).
"""
import numpy as np
import jax
import jax.numpy as jnp

from extensisq_tpu.ops.fused_sens import (solve_fused_adjoint,
                                          solve_fused_final)

B = 8


def _vdp_rows(t, y, p):
    return jnp.stack([y[1], p[0] * (1 - y[0] ** 2) * y[1] - y[0]])


def _setup():
    Y0 = np.zeros((B, 2), np.float32)
    Y0[:, 0] = 2.0
    mus = np.linspace(1.0, 2.0, B).astype(np.float32)[:, None]
    return jnp.asarray(Y0), jnp.asarray(mus)


def test_fused_adjoint_matches_forward_sens_grads():
    """dL/dy0 and dL/dp from the adjoint backward match
    solve_fused_final's (FD-validated) fused forward-sensitivity
    gradients across the whole mu sweep; dt0 + dtf ~ 0 on the
    autonomous system."""
    Y0, mus = _setup()

    def loss_adj(tsp, Y, P):
        yf = solve_fused_adjoint(_vdp_rows, tsp, Y, P, None,
                                 1e-5, 1e-8, 100_000, 128, True, 512)
        return jnp.sum(yf[:, 0])

    def loss_fwd(tsp, Y, P):
        yf = solve_fused_final(_vdp_rows, tsp, Y, P, None,
                               1e-5, 1e-8, 100_000, 128, True, False)
        return jnp.sum(yf[:, 0])

    va, ga = jax.value_and_grad(loss_adj, argnums=(0, 1, 2))(
        (0.0, 3.0), Y0, mus)
    vf, gf = jax.value_and_grad(loss_fwd, argnums=(0, 1, 2))(
        (0.0, 3.0), Y0, mus)
    assert float(va) == float(vf)          # identical fused primal
    (at0, atf), ay0, ap = ga
    (ft0, ftf), fy0, fp = gf
    # gradients O(1)-O(300) across the sweep; adjoint vs forward-sens
    # agree to solver tolerance
    scale = np.abs(np.asarray(fy0)).max()
    assert np.max(np.abs(np.asarray(ay0) - np.asarray(fy0))) \
        < 2e-3 * scale
    ps = np.abs(np.asarray(fp)).max()
    assert np.max(np.abs(np.asarray(ap) - np.asarray(fp))) \
        < 2e-3 * ps
    # autonomous: shifting both endpoints together changes nothing
    assert abs(float(at0) + float(atf)) < 0.05 * abs(float(atf))
    assert abs(float(atf) - float(ftf)) < 2e-3 * abs(float(ftf))


def test_fused_adjoint_capacity_overflow_nans():
    """A dense capacity too small for the trajectory yields NaN
    gradients (the documented overflow signal), not silently wrong
    ones."""
    Y0, mus = _setup()

    def loss(Y):
        yf = solve_fused_adjoint(_vdp_rows, (0.0, 3.0), Y, mus, None,
                                 1e-5, 1e-8, 100_000, 128, True, 8)
        return jnp.sum(yf[:, 0])

    g = jax.grad(loss)(Y0)
    assert not np.any(np.isfinite(np.asarray(g)))


def test_fused_adjoint_esdirk_stiff():
    """Stiff ESDIRK route: adjoint gradients through the fused
    implicit kernel match jacrev of the f64 XLA continuous adjoint
    (spot member) and FD of the fused primal in mu."""
    from extensisq_tpu.methods import TRBDF2
    from extensisq_tpu.ops import solve_fused_esdirk
    from extensisq_tpu import sensitivity

    def rows(t, y, p):
        return jnp.stack([-p[0] * (y[0] - jnp.sin(y[1])),
                          -y[1] + 0.1 * y[0]])

    y0b = np.tile([2.0, 1.0], (B, 1)).astype(np.float32)
    ks = np.linspace(50.0, 400.0, B).astype(np.float32)[:, None]

    def loss(Y, P):
        yf = solve_fused_adjoint(rows, (0.0, 1.0), Y, P, TRBDF2,
                                 1e-5, 1e-8, 100_000, 128, True, 256)
        return jnp.sum(yf[:, 0])

    gy0, gp = jax.grad(loss, argnums=(0, 1))(jnp.asarray(y0b),
                                             jnp.asarray(ks))

    eps = np.float32(0.5)
    kw = dict(method=TRBDF2, rtol=1e-6, atol=1e-9, block_members=128,
              interpret=True)
    yp = solve_fused_esdirk(rows, (0.0, 1.0), y0b, params=ks + eps,
                            **kw)[0]
    ym = solve_fused_esdirk(rows, (0.0, 1.0), y0b, params=ks - eps,
                            **kw)[0]
    fd = (np.asarray(yp)[:, 0] - np.asarray(ym)[:, 0]) / (2 * eps)
    assert np.max(np.abs(np.asarray(gp)[:, 0] - fd)) < 5e-5

    k0 = float(ks[0, 0])
    J = jax.jacrev(lambda y0: sensitivity.solve_final(
        lambda t, y, p: jnp.stack([-p * (y[0] - jnp.sin(y[1])),
                                   -y[1] + 0.1 * y[0]]),
        (0.0, 1.0), y0, k0, None, 1e-9, 1e-12, 10_000))(
            jnp.array([2.0, 1.0]))
    assert np.max(np.abs(np.asarray(gy0)[0]
                         - np.asarray(J)[0, :])) < 1e-4
