"""Step-control stability analysis (utils/sc_stability.py) pinned
against the reference's docs/"SC stability"/stab_dS_*.png figures —
the Higham & Hall coupled method+controller map, generalized to the
4-coefficient law the solvers run."""
import numpy as np
import pytest

from extensisq_tpu import (BS5, Ts5, CK5, Me4, CFMR7osc, Pr7, Pr8, Pr9)
from extensisq_tpu.utils.sc_stability import (
    boundary_points, sc_stable, sc_stability_matrix)


def test_boundary_matches_bs5_stability_region():
    zb = boundary_points(BS5, n_points=101)
    # the reference figure's frame: real tip ~ -3.99, crest ~ 3.74i
    assert abs(zb.real.min() - (-3.988)) < 0.01
    assert abs(zb.imag.max() - 3.743) < 0.01
    # closed upper-half arc: starts at the origin, ends on the real axis
    assert abs(zb[0]) < 1e-9
    assert abs(zb[-1].imag) < 0.01


def test_bs5_controllers_match_reference_figures():
    """stab_dS_BS5_{standard,Soederlind,Gustafsson}.png facts.

    The imaginary-axis hug (Re ~ 0, where the boundary is degenerate
    and the linearization marginal) is excluded, as in the figures.
    """
    zb = boundary_points(BS5, n_points=101)
    arc = zb[zb.real < -0.1]

    st_std = sc_stable(BS5, arc, "standard")
    st_s = sc_stable(BS5, arc, "S")
    st_g = sc_stable(BS5, arc, "G")

    # standard: the long mid-arc run of step-control instability
    assert (~st_std).mean() > 0.5
    # Soederlind: stable everywhere except the real-axis tip and the
    # small patch near the crest (-1.4 + 3.7j)
    un_s = arc[~st_s]
    assert len(un_s) <= 4
    assert all((z.imag < 0.3) or (abs(z - (-1.4 + 3.7j)) < 0.4)
               for z in un_s)
    # Gustafsson: stable everywhere except the real-axis tip
    un_g = arc[~st_g]
    assert len(un_g) <= 5
    assert all(z.imag < 0.5 for z in un_g)

    # the classic thrashing point: standard oscillates, PI-style laws
    # hold the step (why the presets exist at all)
    z = -3.0 + 2.5j
    assert not sc_stable(BS5, z, "standard")
    assert sc_stable(BS5, z, "S") and sc_stable(BS5, z, "G")


def test_standard_collapses_to_higham_hall():
    """kb2 = a = 0 must reduce the 4x4 map to the classic 2x2
    [[1, B], [ee, 1 + ee*A]] (two zero eigenvalues padding)."""
    z = -2.0 + 2.0j
    M = sc_stability_matrix(BS5, z, "standard")
    ev = np.sort_complex(np.linalg.eigvals(M))
    assert np.allclose(ev[:2], 0.0, atol=1e-12)
    M2 = M[:2, :2]
    ev2 = np.linalg.eigvals(M2)
    assert np.allclose(np.sort_complex(ev)[2:], np.sort_complex(ev2))


@pytest.mark.parametrize("method", [BS5, Ts5, CK5, Me4, CFMR7osc,
                                    Pr7, Pr8, Pr9])
def test_every_reference_figure_method_analyzes(method):
    """The reference ships figures for all 8 explicit pairs; the
    analyzer must handle each tableau, and the Gustafsson preset must
    be at least as SC-stable as the standard controller over the
    boundary (the reason the presets exist)."""
    zb = boundary_points(method, n_points=61)
    assert np.all(np.isfinite(zb))
    arc = zb[zb.real < -0.1]
    assert len(arc) > 10
    st_std = sc_stable(method, arc, "standard")
    st_g = sc_stable(method, arc, "G")
    assert st_g.sum() >= st_std.sum()
