"""Stiffness diagnosis: RKSuite nonlinear power iteration (host-side).

Reimplementation of the reference's translation of RKSuite's stiffness
machinery (/root/reference/extensisq/common.py:824-1204 and the drivers
at :370-516 / :1323-1486).  The power iteration estimates the two
dominant eigenvalues of h_avg*J and compares them with the method's
stability region: a circular arc (radius ``stbrad``, valid angle
``tanang``) for explicit RK, a rectangle (``stbre`` x ``stbim``) for
Nystrom methods.

This runs on the HOST between steps — deliberately: the reference
triggers it rarely (many failed steps, or every ``nfev_stiff_detect``
evaluations) and reports through warnings, which have no device
representation.  The on-device ensemble path skips diagnosis; the
per-state counters that drive it (jflstp/okstp/havg) are maintained by
the steppers either way.
"""
from math import sqrt
from warnings import warn
import logging

import numpy as np

# device diagnosis codes (Solution.stiffness)
STIFF_NONE = 0          # no diagnosis / not stiff
STIFF_REAL = 1          # stiff, dominant real root
STIFF_COMPLEX = 2       # stiff, dominant complex pair
OSCILLATORY = 3         # complex pair near the imaginary axis + many
                        # recent failed steps (use an oscillatory code)


def _wdot(a, b, wt):
    return float((a / wt) @ (b / wt))


def stiff_d(v, havg, x, y, f, fxy, wt, scale, vdotv):
    """z ~ havg * J @ v by one forward difference (common.py:1178-1204)."""
    temp1 = scale / sqrt(vdotv)
    z = f(x, y + temp1 * v)
    z = havg / temp1 * (z - fxy)
    return z, _wdot(z, z, wt)


def stiff_b(v1v1, v0v1, v0v0, rold):
    """Detect a strongly dominant real eigenvalue
    (common.py:1106-1137)."""
    root1 = [0.0, 0.0]
    root2 = [0.0, 0.0]
    r = v0v1 / v0v0
    rho = abs(r)
    det = v0v0 * v1v1 - v0v1 ** 2
    res = abs(det / v0v0)
    rootre = det == 0.0 or (res <= 1e-6 * v1v1
                            and abs(r - rold) <= 0.001 * rho)
    if rootre:
        root1[0] = r
    return r, rho, root1, root2, rootre


def stiff_c(alpha, beta):
    """Roots of x^2 + alpha x + beta (common.py:1140-1175)."""
    r1 = [0.0, 0.0]
    r2 = [0.0, 0.0]
    temp = alpha / 2.0
    disc = temp * temp - beta
    if disc == 0.0:
        r1[0] = r2[0] = -temp
        return r1, r2
    sqdisc = sqrt(abs(disc))
    if disc < 0.0:
        r1[0] = r2[0] = -temp
        r1[1] = sqdisc
        r2[1] = -sqdisc
    else:
        r1[0] = -temp - sqdisc if temp > 0.0 else -temp + sqdisc
        r2[0] = beta / r1[0]
    return r1, r2


def stiff_a(fun, x, y, hnow, havg, xend, maxfcn, wt, fxy, v0, cost):
    """Dominant-eigenvalue estimation; returns (stif, rootre, roots).

    Complex problems are expanded into real vectors of twice the length
    (common.py:917-924).  Also returns the number of RHS evaluations
    performed (this framework counts them like the reference does).
    """
    y = np.asarray(y)
    epsneg = np.finfo(np.asarray(y).real.dtype).epsneg
    rootre = None
    nfev = [0]

    if np.iscomplexobj(y):
        def expand(v):
            v = np.asarray(v)
            return np.concatenate((v.real, v.imag))

        def contract(v):
            half = v.size // 2
            return v[:half] + 1j * v[half:]

        def f(t, v):
            nfev[0] += 1
            return expand(fun(t, contract(v)))
        y = expand(y)
        fxy = expand(np.asarray(fxy))
        v0 = expand(np.asarray(v0))
        wt = np.concatenate((wt, wt))
    else:
        def f(t, v):
            nfev[0] += 1
            return np.asarray(fun(t, v))
        fxy = np.asarray(fxy)
        v0 = np.asarray(v0, dtype=float).copy()
        wt = np.asarray(wt)

    # large step-size variation => not stability-limited
    if abs(hnow / havg) > 5 or abs(hnow / havg) < 0.2:
        return False, rootre, None, nfev[0]
    # cheap-completion test (common.py:935-947)
    xtrfcn = cost * abs((xend - x) / havg)
    if xtrfcn <= maxfcn:
        return False, rootre, None, nfev[0]

    ynrm = sqrt(_wdot(y, y, wt))
    sqrrmc = sqrt(epsneg)
    scale = ynrm * sqrrmc
    if scale == 0.0:
        ynrm = sqrt(_wdot(v0, v0, wt))
        scale = ynrm * sqrrmc
        if scale == 0.0:
            return None, rootre, None, nfev[0]

    v0v0 = _wdot(v0, v0, wt)
    if v0v0 == 0.0:
        v0 = np.ones_like(y)
        v0v0 = _wdot(v0, v0, wt)
    v0 = v0 / sqrt(v0v0)
    v0v0 = 1.0

    rold = 0.0
    root1 = root2 = None
    rho = 0.0
    maxtry = 8
    for ntry in range(maxtry):
        v1, v1v1 = stiff_d(v0, havg, x, y, f, fxy, wt, scale, v0v0)
        LARGE = 1.0e10
        if sqrt(v1v1) > LARGE * sqrt(v0v0):
            return None, None, None, nfev[0]
        v0v1 = _wdot(v0, v1, wt)
        if ntry == 0:
            rold = v0v1 / v0v0
            if abs(rold) < epsneg ** (1 / 3):
                return False, None, None, nfev[0]
        else:
            rold, rho, root1, root2, rootre = stiff_b(v1v1, v0v1, v0v0,
                                                      rold)
            if rootre:
                break

        v2, v2v2 = stiff_d(v1, havg, x, y, f, fxy, wt, scale, v1v1)
        v0v2 = _wdot(v0, v2, wt)
        v1v2 = _wdot(v1, v2, wt)
        rold, rho, root1, root2, rootre = stiff_b(v2v2, v1v2, v1v1, rold)
        if rootre:
            break

        det1 = v0v0 * v1v1 - v0v1 ** 2
        alpha1 = (-v0v0 * v1v2 + v0v1 * v0v2) / det1
        beta1 = (v0v1 * v1v2 - v1v1 * v0v2) / det1

        v3, v3v3 = stiff_d(v2, havg, x, y, f, fxy, wt, scale, v2v2)
        v1v3 = _wdot(v1, v3, wt)
        v2v3 = _wdot(v2, v3, wt)
        rold, rho, root1, root2, rootre = stiff_b(v3v3, v2v3, v2v2, rold)
        if rootre:
            break
        det2 = v1v1 * v2v2 - v1v2 ** 2
        alpha2 = (-v1v1 * v2v3 + v1v2 * v1v3) / det2
        beta2 = (v1v2 * v2v3 - v2v2 * v1v3) / det2

        res2 = abs(v3v3 + v2v2 * alpha2 ** 2 + v1v1 * beta2 ** 2
                   + 2 * v2v3 * alpha2 + 2 * v1v3 * beta2
                   + 2 * v1v2 * alpha2 * beta2)
        if res2 <= 1e-6 * v3v3:
            r1, r2 = stiff_c(alpha1, beta1)
            root1, root2 = stiff_c(alpha2, beta2)
            rho = sqrt(root1[0] ** 2 + root1[1] ** 2)
            D1 = (root1[0] - r1[0]) ** 2 + (root1[1] - r1[1]) ** 2
            D2 = (root1[0] - r2[0]) ** 2 + (root1[1] - r2[1]) ** 2
            if sqrt(min(D1, D2)) <= 0.001 * rho:
                break

        v0 = v3 / sqrt(v3v3)
        v0v0 = 1.0
    else:
        return None, None, None, nfev[0]

    return None, rootre, (root1, root2, rho), nfev[0]


def diagnose(fun, state, t_bound, nfev_stiff_detect, n_stages,
             stbrad=None, tanang=None, stbre=None, stbim=None,
             estimate_error=None, fxy=None, lotsfl=False):
    """Assess and report stiffness after the power iteration.

    Mirrors _diagnose_stiffness (common.py:370-516 for the arc domain,
    :1323-1486 for the Nystrom rectangle).  Returns (message_or_None,
    nfev_used).  ``estimate_error`` supplies the perturbation vector v0.
    """
    y = np.asarray(state.y)
    y_old = np.asarray(state.y_old)
    tiny = np.finfo(np.asarray(y).real.dtype).tiny
    avgy = 0.5 * (np.abs(y) + np.abs(y_old))
    wt = np.maximum(avgy.real, sqrt(tiny))
    v0 = np.atleast_1d(np.asarray(estimate_error))
    h_prev = float(state.h_previous)
    havg = float(state.havg)

    stif, rootre, root, nfev = stiff_a(
        fun, float(state.t), y, h_prev, havg, t_bound,
        nfev_stiff_detect, wt, fxy, v0, n_stages)

    if root is not None:
        root1, root2, rho = root
        rootre = root1[1] == 0.0
        if root1[0] > 0.0:
            stif = False
        else:
            rho2 = sqrt(root2[0] ** 2 + root2[1] ** 2)
            if rho2 >= 0.9 * rho and root2[0] > 0.0:
                stif = False
            elif abs(root1[1]) > abs(root1[0]) * tanang:
                stif = None
            elif stbrad is not None:
                stif = rho >= 0.9 * stbrad
            else:
                # Nystrom rectangular stability domain
                stif = (abs(root1[0]) >= 0.85 * stbre
                        or abs(root1[1]) >= 0.9 * stbim)

    message = None
    if stif is None:
        if rootre is None:
            logging.info("Stiffness detection did not converge")
        elif not rootre:
            if lotsfl:
                message = (
                    "Your problem has a complex pair of dominant roots "
                    "near the imaginary axis.  There are many recently "
                    "failed steps.  You should probably change to a code "
                    "intended for oscillatory problems.")
            else:
                logging.info(
                    "The problem has a complex pair of dominant roots "
                    "near the imaginary axis.  There are not many failed "
                    "steps.")
    elif stif:
        if rootre:
            message = (
                "Your problem has a real dominant root and is diagnosed "
                "as stiff.  You should probably change to a code "
                "intended for stiff problems.")
        else:
            message = (
                "Your problem has a complex pair of dominant roots and "
                "is diagnosed as stiff.  You should probably change to "
                "a code intended for stiff problems.")
    if message is not None:
        warn(message)
    return message, nfev


# ---------------------------------------------------------------------------
# device-side diagnosis (vmap-safe, bounded; SURVEY.md 5.x / VERDICT r1 #7)
# ---------------------------------------------------------------------------

def make_device_diagnosis(fun, n_stages, nfev_stiff_detect, stbrad=None,
                          tanang=None, stbre=None, stbim=None):
    """Build an on-device stiffness check for the ``solve()`` driver.

    A faithful jnp translation of the RKSuite power iteration above
    (stiff_a/stiff_b/stiff_c + the arc/rectangle decision of
    common.py:370-516): all control flow is a single bounded
    ``lax.while_loop`` (maxtry=8, 3 RHS evals per try) with per-member
    ``done`` masking, so it is vmap-safe — an ensemble where only one
    member triggers costs one loop whose other members are masked
    no-ops.  Complex dtypes are not supported on this path (use the
    host driver).

    Returns ``check(state, v0, fxy, t_bound, accepted)`` -> ``(code,
    nfev, jflstp_reset)``: the diagnosis code (STIFF_* above), the RHS
    evaluations spent, and whether the caller must zero
    ``state.jflstp`` (the every-40-steps reset the host driver does).
    ``v0`` is the error-estimate perturbation vector, ``fxy`` the
    current derivative in the diagnosis space, ``accepted`` whether the
    last attempt advanced the step (diagnosis runs between accepted
    steps only, like the host driver).
    """
    import jax
    import jax.numpy as jnp

    maxtry = 8
    LARGE = 1.0e10
    PENDING, UNSURE, NOTSTIFF, ROOTS = 0, 1, 2, 3

    def wdot(a, b, inv_wt):
        return jnp.sum((a * inv_wt) * (b * inv_wt))

    def stiff_bj(v1v1, v0v1, v0v0, rold):
        """jnp stiff_b: (r, rho, root1, rootre)."""
        r = v0v1 / v0v0
        rho = jnp.abs(r)
        det = v0v0 * v1v1 - v0v1 ** 2
        res = jnp.abs(det / v0v0)
        rootre = (det == 0.0) | ((res <= 1e-6 * v1v1)
                                 & (jnp.abs(r - rold) <= 0.001 * rho))
        root1 = jnp.stack([jnp.where(rootre, r, 0.0), jnp.zeros(())])
        return r, rho, root1, rootre

    def stiff_cj(alpha, beta):
        """jnp stiff_c: roots of x^2 + alpha x + beta, branchless."""
        temp = alpha / 2.0
        disc = temp * temp - beta
        sqdisc = jnp.sqrt(jnp.abs(disc))
        # disc < 0: complex pair
        r1_c = jnp.stack([-temp, sqdisc])
        r2_c = jnp.stack([-temp, -sqdisc])
        # disc >= 0: real pair, stable form
        r1_r0 = jnp.where(temp > 0.0, -temp - sqdisc, -temp + sqdisc)
        safe = jnp.where(r1_r0 == 0.0, 1.0, r1_r0)
        r1_r = jnp.stack([r1_r0, jnp.zeros(())])
        r2_r = jnp.stack([beta / safe, jnp.zeros(())])
        # disc == 0: double root
        r_d = jnp.stack([-temp, jnp.zeros(())])
        r1 = jnp.where(disc == 0.0, r_d, jnp.where(disc < 0.0, r1_c, r1_r))
        r2 = jnp.where(disc == 0.0, r_d, jnp.where(disc < 0.0, r2_c, r2_r))
        return r1, r2

    def check(state, v0, fxy, t_bound, accepted):
        y = state.y
        dtype = y.dtype
        finfo = jnp.finfo(dtype)
        epsneg = jnp.asarray(finfo.epsneg, dtype)
        tiny = jnp.asarray(finfo.tiny, dtype)
        x = state.t
        hnow = state.h_previous
        havg = state.havg
        okstp = state.okstp

        # trigger logic (common.py:381-410)
        ok = accepted & (state.status <= 1)
        lots_window = (okstp % 40 == 39) & ok
        lotsfl = lots_window & (state.jflstp >= 10)
        many = max(nfev_stiff_detect // n_stages, 1)
        toomch = (okstp % many == many - 1) & ok
        trigger = toomch | lotsfl

        avgy = 0.5 * (jnp.abs(y) + jnp.abs(state.y_old))
        wt = jnp.maximum(avgy, jnp.sqrt(tiny))
        inv_wt = 1.0 / wt

        # stiff_a entry gates (common.py:928-947)
        ratio = jnp.abs(hnow / havg)
        not_limited = (ratio > 5.0) | (ratio < 0.2)
        xtrfcn = n_stages * jnp.abs((t_bound - x) / havg)
        cheap = xtrfcn <= nfev_stiff_detect

        ynrm = jnp.sqrt(wdot(y, y, inv_wt))
        sqrrmc = jnp.sqrt(epsneg)
        scale0 = ynrm * sqrrmc
        v0nrm = jnp.sqrt(wdot(v0, v0, inv_wt))
        scale = jnp.where(scale0 == 0.0, v0nrm * sqrrmc, scale0)
        no_scale = scale == 0.0

        v0v0_raw = wdot(v0, v0, inv_wt)
        v0_eff = jnp.where(v0v0_raw == 0.0, jnp.ones_like(y), v0)
        v0v0_eff = jnp.where(v0v0_raw == 0.0,
                             wdot(jnp.ones_like(y), jnp.ones_like(y),
                                  inv_wt), v0v0_raw)
        v0_unit = v0_eff / jnp.sqrt(v0v0_eff)

        active0 = trigger & ~not_limited & ~cheap & ~no_scale
        zroot = jnp.zeros(2, dtype)

        def stiff_dj(v, vdotv):
            temp1 = scale / jnp.sqrt(vdotv)
            z = fun(x, y + temp1 * v)
            z = havg / temp1 * (z - fxy)
            return z, wdot(z, z, inv_wt)

        def body(c):
            (v0c, v0v0c, rold, root1, root2, rho, result, ntry, nfev,
             active) = c
            v1, v1v1 = stiff_dj(v0c, v0v0c)
            nfev = nfev + jnp.where(active, 1, 0)
            blowup = jnp.sqrt(v1v1) > LARGE * jnp.sqrt(v0v0c)
            v0v1 = wdot(v0c, v1, inv_wt)

            first = ntry == 0
            rold_first = v0v1 / v0v0c
            early_ns = first & (jnp.abs(rold_first)
                                < epsneg ** (1.0 / 3.0))
            r_b, rho_b, root_b, re_b = stiff_bj(v1v1, v0v1, v0v0c, rold)
            hit1 = ~first & re_b
            rold = jnp.where(first, rold_first, r_b)

            v2, v2v2 = stiff_dj(v1, v1v1)
            v0v2 = wdot(v0c, v2, inv_wt)
            v1v2 = wdot(v1, v2, inv_wt)
            r_b2, rho_b2, root_b2, re_b2 = stiff_bj(v2v2, v1v2, v1v1,
                                                    rold)
            hit2 = re_b2
            rold = jnp.where(hit1, rold, r_b2)
            nfev = nfev + jnp.where(active & ~blowup & ~early_ns
                                    & ~hit1, 1, 0)

            det1 = v0v0c * v1v1 - v0v1 ** 2
            det1s = jnp.where(det1 == 0.0, 1.0, det1)
            alpha1 = (-v0v0c * v1v2 + v0v1 * v0v2) / det1s
            beta1 = (v0v1 * v1v2 - v1v1 * v0v2) / det1s

            v3, v3v3 = stiff_dj(v2, v2v2)
            v1v3 = wdot(v1, v3, inv_wt)
            v2v3 = wdot(v2, v3, inv_wt)
            r_b3, rho_b3, root_b3, re_b3 = stiff_bj(v3v3, v2v3, v2v2,
                                                    rold)
            hit3 = re_b3
            rold = jnp.where(hit1 | hit2, rold, r_b3)
            nfev = nfev + jnp.where(active & ~blowup & ~early_ns
                                    & ~hit1 & ~hit2, 1, 0)

            det2 = v1v1 * v2v2 - v1v2 ** 2
            det2s = jnp.where(det2 == 0.0, 1.0, det2)
            alpha2 = (-v1v1 * v2v3 + v1v2 * v1v3) / det2s
            beta2 = (v1v2 * v2v3 - v2v2 * v1v3) / det2s

            res2 = jnp.abs(v3v3 + v2v2 * alpha2 ** 2 + v1v1 * beta2 ** 2
                           + 2.0 * v2v3 * alpha2 + 2.0 * v1v3 * beta2
                           + 2.0 * v1v2 * alpha2 * beta2)
            quad_ok = res2 <= 1e-6 * v3v3
            r1q, r2q = stiff_cj(alpha1, beta1)
            root1q, root2q = stiff_cj(alpha2, beta2)
            rhoq = jnp.sqrt(root1q[0] ** 2 + root1q[1] ** 2)
            D1 = ((root1q[0] - r1q[0]) ** 2 + (root1q[1] - r1q[1]) ** 2)
            D2 = ((root1q[0] - r2q[0]) ** 2 + (root1q[1] - r2q[1]) ** 2)
            hitq = quad_ok & (jnp.sqrt(jnp.minimum(D1, D2))
                              <= 0.001 * rhoq)

            # resolve this try's outcome in priority order
            def pick(cond, val_new, val_old):
                return jnp.where(cond & active, val_new, val_old)

            result = pick(blowup, UNSURE, result)
            live = active & ~blowup
            result = jnp.where(live & early_ns, NOTSTIFF, result)
            live = live & ~early_ns
            got_b = hit1 | hit2 | hit3
            root1 = jnp.where(live & got_b,
                              jnp.where(hit1, root_b,
                                        jnp.where(hit2, root_b2,
                                                  root_b3)), root1)
            rho = jnp.where(live & got_b,
                            jnp.where(hit1, rho_b,
                                      jnp.where(hit2, rho_b2, rho_b3)),
                            rho)
            root2 = jnp.where(live & got_b, zroot, root2)
            result = jnp.where(live & got_b, ROOTS, result)
            live = live & ~got_b
            root1 = jnp.where(live & hitq, root1q, root1)
            root2 = jnp.where(live & hitq, root2q, root2)
            rho = jnp.where(live & hitq, rhoq, rho)
            result = jnp.where(live & hitq, ROOTS, result)
            live = live & ~hitq

            v0c = jnp.where(live, v3 / jnp.sqrt(v3v3), v0c)
            v0v0c = jnp.where(live, 1.0, v0v0c)
            ntry = ntry + 1
            active = live & (ntry < maxtry)
            return (v0c, v0v0c, rold, root1, root2, rho, result, ntry,
                    nfev, active)

        def cond(c):
            return c[-1]

        z = jnp.zeros((), dtype)
        c0 = (v0_unit, jnp.ones((), dtype), z, zroot, zroot, z,
              jnp.asarray(PENDING, jnp.int32),
              jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
              active0)
        (_, _, _, root1, root2, rho, result, _, nfev, _) = \
            jax.lax.while_loop(cond, body, c0)
        # loop exhaustion without a break => unsure (PENDING stays)

        # decision (common.py:480-516 analog; diagnose() above)
        rootre = root1[1] == 0.0
        rho2 = jnp.sqrt(root2[0] ** 2 + root2[1] ** 2)
        if stbrad is not None:
            in_domain = rho >= 0.9 * stbrad
        else:
            in_domain = ((jnp.abs(root1[0]) >= 0.85 * stbre)
                         | (jnp.abs(root1[1]) >= 0.9 * stbim))
        near_imag = jnp.abs(root1[1]) > jnp.abs(root1[0]) * tanang
        pos_real = root1[0] > 0.0
        second_pos = (rho2 >= 0.9 * rho) & (root2[0] > 0.0)

        got = result == ROOTS
        stif_false = got & (pos_real | second_pos)
        stif_unsure = got & ~stif_false & near_imag
        stif_true = got & ~stif_false & ~near_imag & in_domain

        code = jnp.where(
            stif_true & rootre, STIFF_REAL,
            jnp.where(stif_true & ~rootre, STIFF_COMPLEX,
                      jnp.where(stif_unsure & ~rootre & lotsfl,
                                OSCILLATORY, STIFF_NONE)))
        return code.astype(jnp.int32), nfev, lots_window

    return check
