"""Algebraic verification of every method tableau.

The strongest oracle in the reference test suite
(/root/reference/tests/test_rk.py:14-72, test_rkn.py:35-92): elementary
rooted-tree order conditions for main and embedded methods, plus
structural identities and interpolant continuity.  Backend-independent
(pure numpy), so it gates tableau transcription before any solver runs.
"""
import numpy as np
import pytest

from order_oracle import (rk_residuals, rkn_residuals, srkn_residuals,
                          augmented_embedded)

from extensisq_tpu.methods import (
    EXPLICIT_METHODS, RKN_METHODS, ESDIRK_METHODS, CKdisc,
    KC3I, KC4I, KC4Ia, Kv3I, MR6NN)

RK_LIKE = EXPLICIT_METHODS + [CKdisc] + ESDIRK_METHODS


@pytest.mark.parametrize("method", RK_LIKE, ids=lambda m: m.name)
def test_rk_order_conditions(method):
    tab = method.tableau
    tol = tab.n_stages * 1e-13
    # Full algebraic verification through order 9 — exceeds the
    # reference's own order-7 cap (test_rk.py:14-72); Pr8's 8th- and
    # Pr9's 9th-order main conditions are checked here.
    for q in range(1, min(tab.order, 9) + 1):
        r = rk_residuals(q, tab.B, tab.C, tab.A)
        assert np.max(np.abs(r)) < tol, f"main order {q}"
    A2, Bh, C2 = augmented_embedded(tab.A, tab.B, tab.C, tab.E)
    for q in range(1, min(tab.order_secondary, 9) + 1):
        r = rk_residuals(q, Bh, C2, A2)
        assert np.max(np.abs(r)) < tol, f"embedded order {q}"


@pytest.mark.parametrize("method", RK_LIKE, ids=lambda m: m.name)
def test_rk_structure(method):
    tab = method.tableau
    assert np.allclose(np.sum(tab.B), 1, rtol=1e-15)
    assert np.allclose(np.sum(tab.E), 0, atol=1e-14)
    assert np.allclose(np.sum(tab.A, axis=1), tab.C, rtol=1e-13, atol=1e-15)


@pytest.mark.parametrize("method", EXPLICIT_METHODS, ids=lambda m: m.name)
def test_rk_interpolant_continuity(method):
    tab = method.tableau
    P = tab.P
    if P is None:
        return
    s = tab.n_stages
    # C0 at the step end: sum of P rows recovers B (+0 for extra rows)
    Ps = np.sum(P, axis=1)
    Ps[:s] -= tab.B
    assert np.allclose(Ps, 0, atol=1e-12)
    # C1 at start: dy/dx(0) = K[0]
    assert np.allclose(P[:, 0] - np.eye(P.shape[0])[:, 0], 0, atol=1e-12)
    # C1 at end: dy/dx(1) = K[s] (FSAL slot)
    dP = P * (np.arange(P.shape[1]) + 1)
    dPs = dP.sum(axis=1)
    dPs[-1] -= 1
    assert np.allclose(dPs, 0, atol=2e-12)


@pytest.mark.parametrize("method", RKN_METHODS, ids=lambda m: m.name)
def test_rkn_order_conditions(method):
    tab = method.tableau
    tol = tab.n_stages * 1e-13
    if tab.velocity_independent:
        # strict-RKN (SN-tree) conditions — the complete set for
        # f = f(t, y); EXCEEDS the reference, which skips these
        # (test_rkn.py:37-39).  MR6NN mains verify to velocity order 6
        # / position order 5, its embedded pair to 4/3.
        for q in range(1, tab.order + 1):
            rv, ru = srkn_residuals(q, tab.Bp, tab.B, tab.C, tab.A)
            assert np.max(np.abs(rv)) < tol, f"velocity order {q}"
            if q < tab.order:
                assert np.max(np.abs(ru)) < tol, f"position order {q}"
        s = tab.n_stages
        E, Ep = np.asarray(tab.E, float), np.asarray(tab.Ep, float)
        A2 = np.zeros((Ep.size, Ep.size))
        A2[:s, :s] = tab.A
        A2[-1, :-1] = tab.B
        C2 = np.ones(Ep.size)
        C2[:-1] = tab.C
        Bh = Ep.copy()
        Bh[:-1] += tab.Bp
        betah = E.copy()
        betah[:-1] += tab.B
        for q in range(1, tab.order_secondary + 1):
            rv, ru = srkn_residuals(q, Bh, betah, C2, A2)
            assert np.max(np.abs(rv)) < tol, f"embedded velocity {q}"
            if q < tab.order_secondary:
                assert np.max(np.abs(ru)) < tol, f"embedded position {q}"
        return
    for q in range(1, min(tab.order, 7) + 1):
        rv, ru = rkn_residuals(q, tab.Bp, tab.B, tab.C, tab.A, tab.Ap)
        assert np.max(np.abs(rv)) < tol, f"velocity order {q}"
        if q < tab.order:
            assert np.max(np.abs(ru)) < tol, f"position order {q}"
    # embedded pair via augmented tableau
    s = tab.n_stages
    E, Ep = tab.E, tab.Ep
    Ap2 = np.zeros((Ep.size, Ep.size))
    Ap2[:s, :s] = tab.Ap
    Ap2[-1, :-1] = tab.Bp
    A2 = np.zeros_like(Ap2)
    A2[:s, :s] = tab.A
    A2[-1, :-1] = tab.B
    Bh = Ep.copy()
    Bh[:-1] += tab.Bp
    betah = E.copy()
    betah[:-1] += tab.B
    C2 = np.ones(Ep.size)
    C2[:-1] = tab.C
    # Mu5Nmb applies a 0.75 damping to E/Ep by default at solve time;
    # the raw tableau is tested here.
    for q in range(1, min(tab.order_secondary, 7) + 1):
        rv, ru = rkn_residuals(q, Bh, betah, C2, A2, Ap2)
        assert np.max(np.abs(rv)) < tol, f"embedded velocity order {q}"
        if q < tab.order_secondary:
            assert np.max(np.abs(ru)) < tol, f"embedded position order {q}"


@pytest.mark.parametrize("method", RKN_METHODS, ids=lambda m: m.name)
def test_rkn_structure(method):
    tab = method.tableau
    assert np.allclose(np.sum(tab.B), 0.5, rtol=1e-13)
    assert np.allclose(np.sum(tab.Bp), 1, rtol=1e-13)
    assert np.allclose(np.sum(tab.E), 0, atol=1e-13)
    assert np.allclose(np.sum(tab.Ep), 0, atol=1e-13)
    if tab.Ap is not None:
        assert np.allclose(np.sum(tab.Ap, axis=1), tab.C, rtol=1e-13,
                           atol=1e-15)
    assert np.allclose(np.sum(tab.A, axis=1), 0.5 * tab.C ** 2, rtol=1e-13,
                       atol=1e-15)


@pytest.mark.parametrize("method", ESDIRK_METHODS, ids=lambda m: m.name)
def test_esdirk_structure(method):
    tab = method.tableau
    # explicit first stage, constant diagonal, stiffly-accurate B
    assert tab.A[0, 0] == 0.0
    assert tab.C[0] == 0.0
    assert np.all(np.diag(tab.A)[1:] == tab.d)
    assert np.all(tab.A[-1] == tab.B)


@pytest.mark.parametrize("method", [KC3I, KC4I, KC4Ia, Kv3I],
                         ids=lambda m: m.name)
def test_esdirk_interpolant_c0_end(method):
    tab = method.tableau
    for name, P in tab.interpolants.items():
        Ps = np.sum(P, axis=1) - tab.B
        assert np.allclose(Ps, 0, atol=1e-12), name


def test_ckdisc_fallback_consistency():
    from extensisq_tpu.methods.erk import CKDISC_DATA
    d = CKDISC_DATA
    # fallback solutions are consistent RK weights (rows sum to C value)
    assert np.allclose(d["B_fallback"][0].sum(), d["C_fallback"][0])
    assert np.allclose(d["B_fallback"][1].sum(), d["C_fallback"][1])
    assert np.allclose(d["E_fallback"].sum(axis=1), 0, atol=1e-15)
