"""Problem-library smoke tests: every factory builds, its RHS
evaluates at (t0, y0) with the right shape/dtype, and the attached
structure (jac, M, sparsity, exact solution) is self-consistent."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from extensisq_tpu import problems

FACTORIES = [
    problems.rational,
    problems.exponential_decay,
    problems.robertson,
    problems.kaps,
    problems.vdp,
    problems.pendulum_dae,
    problems.pleiades,
    lambda: problems.medazko(50),
    lambda: problems.brusselator_2d((16, 16)),
    lambda: problems.combustion_3d(8),
]


@pytest.mark.parametrize("factory", FACTORIES,
                         ids=lambda f: getattr(f, "__name__", "lambda"))
def test_problem_smoke(factory):
    P = factory()
    t0, tf = P.t_span
    y0 = jnp.asarray(P.y0)
    dy = jax.jit(P.rhs)(jnp.asarray(t0 + 1e-3), y0)
    assert dy.shape == y0.shape
    assert np.all(np.isfinite(np.asarray(dy)))
    if P.jac is not None:
        J = np.asarray(P.jac(t0 + 1e-3, y0))
        assert J.shape == (y0.size, y0.size)
        Jad = np.asarray(jax.jacfwd(P.rhs, argnums=1)(t0 + 1e-3, y0))
        np.testing.assert_allclose(J, Jad, rtol=1e-12, atol=1e-12)
    if P.M is not None:
        assert np.asarray(P.M).shape == (y0.size, y0.size)
    if P.jac_sparsity is not None:
        S = np.asarray(P.jac_sparsity)
        Jad = np.asarray(jax.jacfwd(P.rhs, argnums=1)(t0 + 1e-3, y0))
        assert not np.any((Jad != 0) & (S == 0)), \
            "sparsity pattern misses a structural nonzero"
    if P.solution is not None:
        np.testing.assert_allclose(np.asarray(P.solution(t0)).ravel(),
                                   np.asarray(y0).ravel(),
                                   rtol=1e-12, atol=1e-12)
    if P.rho_jac is not None:
        rho = float(P.rho_jac(t0, y0))
        assert rho > 0
