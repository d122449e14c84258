"""Algebraic order-condition oracle for RK and (general) RKN tableaux.

Independent implementation of the rooted-tree theory (Butcher; Hairer,
Norsett & Wanner ch. II.2 / II.14).  Unlike the reference's hard-coded
elementary-weight tables (/root/reference/tests/order_conditions.py),
trees are *generated*:

A tree node may carry ``k`` time-leaves (elementwise multiplication by
``c``) and children attached through an Ap-edge (single integration,
order weight 1) or an A-edge (double integration, order weight 2 —
Nystrom only).  For a tree ``tau``::

    order(tau) = 1 + k + sum(order(child) + weight(edge) - 1)
    gamma(tau) = order(tau) * prod(gamma(child)          # Ap edge
                                   gamma(child)*(order(child)+1))  # A edge
    g(tau)     = c**k * prod(M_edge @ g(child)),  g(leaf) = e

Order conditions (derivative weights ``b``, position weights ``beta``)::

    b^T    g(tau) = 1 / gamma(tau)                  (order q = order(tau))
    beta^T g(tau) = 1 / ((q + 1) * gamma(tau))      (RKN position)

For classical RK only Ap-edges exist and gamma is the classical density.
The generated set includes conditions that are redundant under the
row-sum assumption sum(A[i]) = C**2/2 (asserted separately); they hold
identically for consistent tableaux, making this a strictly stronger
check than a minimal basis.
"""
from functools import lru_cache
from itertools import combinations_with_replacement

import numpy as np


@lru_cache(maxsize=None)
def _trees(order, max_edge, min_edge=1):
    """All canonical trees of a given order.

    A tree is ``(k, children)`` with ``children`` a sorted tuple of
    ``(edge_weight, subtree)``.  ``max_edge`` is 1 for RK, 2 for RKN.
    ``min_edge=2`` restricts to the special Nystrom (SN) trees of the
    velocity-independent theory: with f = f(t, y) the first-derivative
    (Ap) attachment never arises, so every edge doubly integrates.
    """
    if order < 1:
        return ()
    results = set()
    # budget to distribute over time-leaves and children
    budget = order - 1

    def attachments(remaining):
        """all sorted child-multisets consuming exactly `remaining`."""
        if remaining == 0:
            return {()}
        out = set()
        # pick number of children is implicit: recurse on first child
        for w in range(min_edge, max_edge + 1):
            for sub_order in range(1, remaining - w + 2):
                cost = sub_order + w - 1
                if cost > remaining:
                    continue
                for sub in _trees(sub_order, max_edge, min_edge):
                    for rest in attachments(remaining - cost):
                        out.add(tuple(sorted(((w, sub),) + rest)))
        return out

    for k in range(budget + 1):
        for children in attachments(budget - k):
            results.add((k, children))
    return tuple(sorted(results))


def _gamma(order, tree):
    k, children = tree
    g = float(order)
    for w, sub in children:
        sub_order = _order(sub)
        gs = _gamma(sub_order, sub)
        if w == 1:
            g *= gs
        else:
            g *= gs * (sub_order + 1)
    return g


def _order(tree):
    k, children = tree
    return 1 + k + sum(_order(sub) + w - 1 for w, sub in children)


def _g_vec(tree, c, A, Ap):
    k, children = tree
    g = np.ones_like(c) * c ** k
    for w, sub in children:
        M = Ap if w == 1 else A
        g = g * (M @ _g_vec(sub, c, A, Ap))
    return g


def rk_residuals(order, b, c, A):
    """Residuals ``b^T g(tau) - 1/gamma`` over all classical trees of
    the given order."""
    b = np.asarray(b, dtype=float)
    c = np.asarray(c, dtype=float)
    A = np.asarray(A, dtype=float)
    res = []
    for tree in _trees(order, max_edge=1):
        if _order(tree) != order:
            continue
        g = _g_vec(tree, c, A, A)
        res.append(b @ g - 1.0 / _gamma(order, tree))
    return np.array(res)


def rkn_residuals(order, b, beta, c, A, Ap):
    """(derivative, position) residual arrays over Nystrom trees.

    ``b`` = velocity weights (Bp), ``beta`` = position weights (B),
    ``A`` = h^2 matrix, ``Ap`` = velocity matrix.
    """
    b = np.asarray(b, dtype=float)
    beta = np.asarray(beta, dtype=float)
    c = np.asarray(c, dtype=float)
    A = np.asarray(A, dtype=float)
    Ap = np.asarray(Ap, dtype=float)
    res_v, res_u = [], []
    for tree in _trees(order, max_edge=2):
        if _order(tree) != order:
            continue
        g = _g_vec(tree, c, A, Ap)
        gam = _gamma(order, tree)
        res_v.append(b @ g - 1.0 / gam)
        res_u.append(beta @ g - 1.0 / ((order + 1) * gam))
    return np.array(res_v), np.array(res_u)


def srkn_residuals(order, b, beta, c, A):
    """(derivative, position) residuals for STRICT (velocity-
    independent) Nystrom methods: y'' = f(t, y) with no y' argument,
    so the tableau has no Ap and the complete condition set runs over
    the SN-trees (every edge a double integration).  Hairer, Norsett
    & Wanner II.14; the reference skips these
    (/root/reference/tests/test_rkn.py:37-39)."""
    b = np.asarray(b, dtype=float)
    beta = np.asarray(beta, dtype=float)
    c = np.asarray(c, dtype=float)
    A = np.asarray(A, dtype=float)
    res_v, res_u = [], []
    for tree in _trees(order, max_edge=2, min_edge=2):
        if _order(tree) != order:
            continue
        g = _g_vec(tree, c, A, A)
        gam = _gamma(order, tree)
        res_v.append(b @ g - 1.0 / gam)
        res_u.append(beta @ g - 1.0 / ((order + 1) * gam))
    return np.array(res_v), np.array(res_u)


def rk_order_of(b, c, A, max_order=9, tol_per_stage=1e-14):
    """Highest order p such that all conditions through p hold."""
    n = len(b)
    p = 0
    for q in range(1, max_order + 1):
        r = rk_residuals(q, b, c, A)
        if np.max(np.abs(r)) > n * tol_per_stage * 10:
            break
        p = q
    return p


def augmented_embedded(A, B, C, E):
    """Build the (s+1)-stage tableau of a non-FSAL embedded method so
    its order conditions can be tested; same construction as the
    reference test (/root/reference/tests/test_rk.py:32-39)."""
    A = np.asarray(A, dtype=float)
    B = np.asarray(B, dtype=float)
    E = np.asarray(E, dtype=float)
    s = B.size
    if E.size == s:
        return A, E + B, np.asarray(C, dtype=float)
    A2 = np.zeros((s + 1, s + 1))
    A2[:s, :s] = A
    A2[s, :s] = B
    Bh = E.copy()
    Bh[:s] += B
    C2 = np.ones(s + 1)
    C2[:s] = C
    return A2, Bh, C2
