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


def test_fused_adjoint_grid_reaction_diffusion():
    """GRID-layout continuous adjoint at MoL scale (VERDICT r4 item
    2's done-criterion shape): jax.grad of an objective over a Fisher
    reaction-diffusion ensemble through the fused GRID forward
    matches the XLA ``solve_final`` adjoint gradient (spot member)
    and the per-member growth-rate gradient matches FD of the fused
    grid primal."""
    from extensisq_tpu.ops import solve_fused_erk_grid
    from extensisq_tpu import sensitivity

    n = 128
    x = np.linspace(0, 1, n, endpoint=False)
    Y0 = np.tile((0.5 + 0.3 * np.sin(2 * np.pi * x))
                 .astype(np.float32), (B, 1))
    rates = np.linspace(0.8, 1.6, B).astype(np.float32)[:, None]
    # mild diffusion: explicit-ERK-friendly (stability h ~ 2.1e-3 ->
    # ~150 loop iterations, inside the dense=400 recording capacity)
    D = 0.02 * n * n

    def fisher_g(t, y, p):              # grid convention (bm, n)
        return (jnp.roll(y, 1, -1) - 2.0 * y
                + jnp.roll(y, -1, -1)) * D + p[0] * y * (1.0 - y)

    def loss(Y, P):
        yf = solve_fused_adjoint(fisher_g, (0.0, 0.25), Y, P, None,
                                 1e-5, 1e-8, 100_000, 8, True, 400,
                                 None, None, None, "grid")
        return jnp.sum(jnp.mean(yf, axis=1))

    gy0, gp = jax.grad(loss, argnums=(0, 1))(jnp.asarray(Y0),
                                             jnp.asarray(rates))
    assert np.all(np.isfinite(np.asarray(gy0)))

    # spot member 0 vs the XLA f64 continuous adjoint (solve_final)
    def fisher_1(t, y, p):              # single-member (n,) vector
        return (jnp.roll(y, 1) - 2.0 * y
                + jnp.roll(y, -1)) * D + p * y * (1.0 - y)

    r0 = float(rates[0, 0])
    gref = jax.grad(lambda y0: jnp.mean(sensitivity.solve_final(
        fisher_1, (0.0, 0.25), y0, r0, None, 1e-9, 1e-12,
        100_000)))(jnp.asarray(Y0[0], jnp.float64))
    sc = np.abs(np.asarray(gref)).max()
    assert np.abs(np.asarray(gy0)[0] - np.asarray(gref)).max() \
        < 2e-3 * sc

    # per-member dL/dr vs central differences of the fused primal
    eps = np.float32(2e-3)
    kw = dict(rtol=1e-7, atol=1e-10, block_members=8, interpret=True)
    yp = solve_fused_erk_grid(fisher_g, (0.0, 0.25), Y0,
                              params=rates + eps, **kw)[0]
    ym = solve_fused_erk_grid(fisher_g, (0.0, 0.25), Y0,
                              params=rates - eps, **kw)[0]
    fd = (np.asarray(yp).mean(1) - np.asarray(ym).mean(1)) / (2 * eps)
    fsc = np.abs(fd).max()
    assert np.abs(np.asarray(gp)[:, 0] - fd).max() < 5e-3 * fsc


def test_fused_adjoint_grid_esdirk_stiff():
    """GRID-layout STIFF adjoint: gradients through the fused
    tridiagonal-Newton ESDIRK forward (reaction-diffusion with a fast
    linear sink) match FD of the fused grid primal."""
    from extensisq_tpu.methods import TRBDF2
    from extensisq_tpu.ops import solve_fused_esdirk_grid

    n = 64
    x = np.linspace(0, 1, n)
    Y0 = np.tile((1.0 + 0.5 * np.sin(np.pi * x))
                 .astype(np.float32), (B, 1))
    # k and the horizon sized so dL/dk ~ -0.318 t e^{-kt} stays
    # O(1e-3..1e-2): a converged steady state (y -> 1) has zero
    # gradient and FD of the f32 primal is then pure rounding noise
    ks = np.linspace(5.0, 30.0, B).astype(np.float32)[:, None]

    def rd_g(t, y, p):
        left = jnp.concatenate([y[:, :1], y[:, :-1]], axis=1)
        right = jnp.concatenate([y[:, 1:], y[:, -1:]], axis=1)
        return (left - 2.0 * y + right) * 200.0 \
            - p[0] * (y - 1.0)

    def loss(Y, P):
        yf = solve_fused_adjoint(rd_g, (0.0, 0.04), Y, P, TRBDF2,
                                 1e-5, 1e-8, 100_000, 8, True, 256,
                                 None, None, None, "grid")
        return jnp.sum(jnp.mean(yf, axis=1))

    gy0, gp = jax.grad(loss, argnums=(0, 1))(jnp.asarray(Y0),
                                             jnp.asarray(ks))
    assert np.all(np.isfinite(np.asarray(gy0)))
    eps = np.float32(0.1)
    kw = dict(method=TRBDF2, rtol=1e-6, atol=1e-9, block_members=8,
              interpret=True)
    yp = solve_fused_esdirk_grid(rd_g, (0.0, 0.04), Y0,
                                 params=ks + eps, **kw)[0]
    ym = solve_fused_esdirk_grid(rd_g, (0.0, 0.04), Y0,
                                 params=ks - eps, **kw)[0]
    fd = (np.asarray(yp).mean(1) - np.asarray(ym).mean(1)) / (2 * eps)
    fsc = max(np.abs(fd).max(), 1e-12)
    assert np.abs(np.asarray(gp)[:, 0] - fd).max() < 5e-3 * fsc


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


def test_fused_adjoint_rkn_oscillator():
    """RKN-family adjoint routing: the primal is the fused RKN kernel
    (fun = acceleration acc(t, u, v, p)), the backward differentiates
    the full-state [v, a] form.  Oscillator u'' = -w^2 u has closed
    forms: dL/dw = -tf sin(w tf), dL/du0 = cos(w tf) for
    L = sum u(tf)."""
    from extensisq_tpu.methods import Fi5N

    ws = np.linspace(1.0, 2.0, B).astype(np.float32)[:, None]
    Y0 = np.zeros((B, 2), np.float32)
    Y0[:, 0] = 1.0
    tf = 2.0

    def acc(t, u, v, p):
        return -(p[0] ** 2) * u

    def loss(Y, P):
        yf = solve_fused_adjoint(acc, (0.0, tf), Y, P, Fi5N,
                                 1e-6, 1e-9, 100_000, 128, True, 512)
        return jnp.sum(yf[:, 0])

    loss = jax.jit(loss)
    gy0, gp = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        jnp.asarray(Y0), jnp.asarray(ws))
    w = ws[:, 0]
    # dL/dw via central FD of the fused primal; dL/du0 has the closed
    # form cos(w tf)
    eps = 1e-3
    fd = []
    for j in range(B):
        wp = ws.copy(); wp[j, 0] += eps
        wm = ws.copy(); wm[j, 0] -= eps
        lp = loss(jnp.asarray(Y0), jnp.asarray(wp))
        lm = loss(jnp.asarray(Y0), jnp.asarray(wm))
        fd.append((float(lp) - float(lm)) / (2 * eps))
    fd = np.asarray(fd)
    assert np.max(np.abs(np.asarray(gp)[:, 0] - fd)) \
        < 5e-3 * max(np.abs(fd).max(), 1.0)
    exact_dy0 = np.cos(w * tf)
    assert np.max(np.abs(np.asarray(gy0)[:, 0] - exact_dy0)) < 5e-3


def test_fused_adjoint_adams_vdp():
    """Adams/SWAG-family adjoint routing: fused SWAG primal + the
    standard continuous-adjoint backward; dL/dp matches central FD of
    the fused primal across the mu sweep."""
    from extensisq_tpu.methods import SWAG

    Y0, mus = _setup()

    def loss(Y, P):
        yf = solve_fused_adjoint(_vdp_rows, (0.0, 3.0), Y, P, SWAG,
                                 1e-5, 1e-8, 100_000, 128, True, 512,
                                 None, None, None, "flat", 6)
        return jnp.sum(yf[:, 0])

    # the flat SWAG kernel requires a STATIC t_span (host init, DS
    # windows), so the grad call stays unjitted — t_span must reach
    # the custom_vjp as concrete floats; the FD loop uses the jitted
    # primal (same kernel, cached)
    loss_j = jax.jit(loss)
    gp = jax.grad(loss, argnums=1)(Y0, mus)
    eps = 1e-2
    fd = []
    mn = np.asarray(mus)
    for j in range(B):
        mp = mn.copy(); mp[j, 0] += eps
        mm = mn.copy(); mm[j, 0] -= eps
        lp = loss_j(Y0, jnp.asarray(mp))
        lm = loss_j(Y0, jnp.asarray(mm))
        fd.append((float(lp) - float(lm)) / (2 * eps))
    fd = np.asarray(fd)
    scale = max(np.abs(fd).max(), 1.0)
    assert np.max(np.abs(np.asarray(gp)[:, 0] - fd)) < 2e-2 * scale
