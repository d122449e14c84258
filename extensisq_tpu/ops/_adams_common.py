"""Layout-generic machinery shared by the fused SWAG kernels.

Two Pallas layouts implement the same SWAG (Shampine-Gordon-Watts,
shampine.py / steppers/adams.py) logic:

* ``fused_adams``       — members on the 128-lane axis, state rows
  unrolled (n <= 8): huge ensembles of tiny systems;
* ``fused_adams_grid``  — members on sublanes, the state on the lane
  axis (n a multiple of 128): mid-size systems (method-of-lines PDEs,
  reaction networks) the row-unrolled layout cannot express.

Everything here is shape-polymorphic: the per-member quantities are
whatever tile shape the layout chose ((sub, 128) member tiles in the
first, (bm, 1) column tiles in the second), and all selection is
arithmetic blending (Mosaic rejects most selects; measured ~1.5x
faster than select_n on v5e).  ``make_tile_ops`` builds the blend/
gather helpers around the layout's zero tiles; ``make_coefficients``
builds the dsteps block-1 coefficient update (steppers/adams.py:
292-443) on top of them.
"""
import jax.numpy as jnp

from .fused_erk import _fblend, _iblend


class TileOps:
    """Blend/gather helpers over one layout's tile shapes."""

    def __init__(self, fzero, izero):
        self.fzero = fzero
        self.izero = izero

    def fb(self, c, a, b):
        return _fblend(c, a, b)

    def ib(self, c, a, b):
        return _iblend(c, a, b)

    def vsel(self, c, la, lb):
        return [self.fb(c, a, b) for a, b in zip(la, lb)]

    def visel(self, c, la, lb):
        return [self.ib(c, a, b) for a, b in zip(la, lb)]

    def vtake(self, lst, i):
        acc = self.fzero
        for r, tile in enumerate(lst):
            acc = acc + self.fb(i == r, tile, self.fzero)
        return acc

    def vitake(self, lst, i):
        acc = self.izero
        for r, tile in enumerate(lst):
            acc = acc + self.ib(i == r, tile, self.izero)
        return acc

    def vput(self, lst, i, val):
        return [self.fb(i == r, val, tile)
                for r, tile in enumerate(lst)]

    def ctake(self, vals, i):
        """gather from a list of PYTHON floats by int tile."""
        acc = self.fzero
        for r, cval in enumerate(vals):
            acc = acc + self.fb(i == r, self.fzero + cval, self.fzero)
        return acc

    @staticmethod
    def cliped(i, lo, hi):
        return jnp.clip(i, lo, hi)


def make_coefficients(km, iqq, n_iv, O):
    """Build the dsteps block-1 coefficient update over TileOps ``O``
    (steppers/adams.py:292-443 == shampine.py dsteps block 1): psi/
    alpha/beta/sig recurrences, the v/w diagonal updates with the
    iv interpolation bookkeeping, and the g quadrature weights."""
    fzero, izero = O.fzero, O.izero
    fb, ib = O.fb, O.ib
    vtake, vitake, vput = O.vtake, O.vitake, O.vput
    ctake, cliped = O.ctake, O.cliped

    def coefficients(hh, kk, nss, c_psi, c_alpha, c_beta, c_sig,
                     c_v, c_w, c_g, c_gi, c_iv, c_ivc, c_kgi,
                     c_kprev, kold_):
        kp1 = kk + 1
        km1 = kk - 1
        nsm1 = nss - 1
        recompute = (kk >= nss).astype(jnp.float32)

        psi_n = []
        for r in range(km):
            prev = c_psi[r - 1] if r > 0 else fzero
            val = fb(r == nsm1, hh * nss.astype(jnp.float32),
                     fb((r >= nss) & (r < kk), hh + prev,
                        c_psi[r]))
            psi_n.append(val)
        psi_n = [recompute * a + (1.0 - recompute) * b
                 for a, b in zip(psi_n, c_psi)]

        alpha_n = []
        for r in range(km):
            safe = fb(psi_n[r] == 0.0, fzero + 1.0, psi_n[r])
            val = fb(r == nsm1,
                     1.0 / jnp.maximum(nss.astype(jnp.float32),
                                       1.0),
                     fb((r >= nss) & (r < kk), hh / safe,
                        c_alpha[r]))
            alpha_n.append(val)
        alpha_n = [recompute * a + (1.0 - recompute) * b
                   for a, b in zip(alpha_n, c_alpha)]

        # beta: cumulative product of psi[r-1]/psi_old[r-1] over
        # r in [ns, k), 1 at r == ns-1
        beta_n = []
        run = fzero + 1.0
        for r in range(km):
            num = psi_n[r - 1] if r > 0 else fzero + 1.0
            den = c_psi[r - 1] if r > 0 else fzero + 1.0
            den = fb(den == 0.0, fzero + 1.0, den)
            ratio = fb((r >= nss) & (r < kk), num / den,
                       fzero + 1.0)
            # reset the running product at r == ns (start of range)
            run = fb(r == nss, ratio, run * ratio)
            val = fb(r == nsm1, fzero + 1.0,
                     fb((r >= nss) & (r < kk), run, c_beta[r]))
            beta_n.append(val)
        beta_n = [recompute * a + (1.0 - recompute) * b
                  for a, b in zip(beta_n, c_beta)]

        # sig[j+1] = sig_base * prod_{i=ns-1..j} (i+1) alpha[i]
        s_base = vtake(c_sig, cliped(nsm1, 0, km))
        s_base = fb(nsm1 == 0, fzero + 1.0, s_base)
        sig_n = list(c_sig)
        run = fzero + 1.0
        tail = []
        for r in range(km):
            fac = fb((r >= nsm1) & (r < kk),
                     float(r + 1) * alpha_n[r], fzero + 1.0)
            run = run * fac
            tail.append(s_base * run)
        for m in range(km + 1):
            src = tail[max(m - 1, 0)]
            cond = ((m >= nss) & (m <= kk)).astype(jnp.float32) \
                * recompute
            sig_n[m] = cond * src + (1.0 - cond) * c_sig[m]

        first_ns = nss == 1

        # ns == 1 branch
        v1 = [fb(r < kk, fzero + iqq[r], c_v[r])
              for r in range(km)]
        w1 = list(v1)
        ivc1 = izero
        kgi1 = ib(kk != 1, izero + 1, izero)
        gi1 = list(c_gi)
        if km > 1:
            gi1[0] = fb((kk != 1), w1[1], c_gi[0])

        # ns > 1 branch
        raised = kk > c_kprev
        use_iv = raised & (c_ivc != 0)
        ivc2 = ib(raised, ib(use_iv, c_ivc - 1, c_ivc), c_ivc)
        jv = ib(use_iv,
                kp1 - vitake(c_iv, cliped(c_ivc - 1, 0,
                                          n_iv - 1)),
                izero + 1)
        freshd = raised & (c_ivc == 0)
        v2 = list(c_v)
        w2 = list(c_w)
        # fresh diagonal entry at the DYNAMIC slot k-1 with value
        # iqq[k-1] (steppers/adams.py:368-371; a static km-1 here
        # writes the wrong slot whenever k < k_max)
        iqq_km1 = ctake(iqq, cliped(km1, 0, km - 1))
        v2 = [fb(freshd & (r == km1), iqq_km1, v2[r])
              for r in range(km)]
        v2_km1 = vtake(v2, cliped(km1, 0, km - 1))
        w2 = [fb(freshd & (r == km1), v2_km1, w2[r])
              for r in range(km)]
        kgi2 = ib(freshd & (kk == 2), izero + 1, c_kgi)
        gi2 = list(c_gi)
        if km > 1:
            gi2[0] = fb(freshd & (kk == 2), w2[1], gi2[0])

        # sequential diagonal update j = jv .. ns-2 over the
        # DYNAMIC rows k-1-j (steppers/adams.py:379-388)
        for j in range(km):
            active = raised & (j >= jv) & (j < nsm1)
            i_r = cliped(km1 - j, 0, km - 1)
            v2_i = vtake(v2, i_r)
            newval = v2_i - alpha_n[min(j, km - 1)] \
                * vtake(v2, cliped(i_r + 1, 0, km - 1))
            v2 = vput(v2, i_r, fb(active, newval, v2_i))
        lowlim = jnp.maximum(km1 - nsm1 + 1, 0)
        for r in range(km):
            cond = raised & (r >= lowlim) & (r <= km1 - jv)
            w2[r] = fb(cond, v2[r], w2[r])
        cond_kgi = raised & (kk == nss) & (jv < nsm1)
        kgi2 = ib(cond_kgi, nsm1, kgi2)
        for r in range(km - 1):
            gi2[r] = fb((r == cliped(nsm1 - 1, 0, km - 2))
                        & cond_kgi, v2[1], gi2[r])

        # main v update and w copy
        limit1 = kp1 - nss
        alpha_ns = vtake(alpha_n, cliped(nsm1, 0, km - 1))
        v2 = [fb(r < limit1,
                 v2[r] - alpha_ns * (v2[r + 1] if r + 1 < km
                                     else fzero), v2[r])
              for r in range(km)]
        w2 = [fb(r < limit1 + 1, v2[r], w2[r]) for r in range(km)]
        g2 = vput(list(c_g), cliped(nss, 0, km), v2[0])
        kgi2 = ib(limit1 != 1, nss, kgi2)
        for r in range(km - 1):
            gi2[r] = fb((r == cliped(nsm1, 0, km - 2))
                        & (limit1 != 1), v2[1], gi2[r])
        lower = kk < kold_
        iv2 = [ib((r == cliped(ivc2, 0, n_iv - 1)) & lower,
                  limit1 + 2, c_iv[r]) for r in range(n_iv)]
        ivc3 = ib(lower, ivc2 + 1, ivc2)

        # merge ns==1 / ns>1
        v_n = O.vsel(first_ns, v1, v2)
        w_n = O.vsel(first_ns, w1, w2)
        gi_n = O.vsel(first_ns, gi1, gi2)
        iv_n = O.visel(first_ns, c_iv, iv2)
        ivc_n = ib(first_ns, ivc1, ivc3)
        kgi_n = ib(first_ns, kgi1, kgi2)
        g_n = O.vsel(first_ns, c_g, g2)

        # g coefficients in w
        for i in range(km):
            active = (i >= nss) & (i < kk)
            limit2 = kk - i
            w_n = [fb((r < limit2) & active,
                      w_n[r] - alpha_n[min(i, km - 1)]
                      * (w_n[r + 1] if r + 1 < km else fzero),
                      w_n[r]) for r in range(km)]
            j = min(i + 1, km)
            g_n[j] = fb(active, w_n[0], g_n[j])

        def keep(ln, lo):
            return [recompute * a + (1.0 - recompute) * b
                    for a, b in zip(ln, lo)]

        rc_b = recompute != 0.0
        return (psi_n, alpha_n, beta_n,
                [recompute * a + (1.0 - recompute) * b
                 for a, b in zip(sig_n, c_sig)],
                keep(v_n, c_v), keep(w_n, c_w), keep(g_n, c_g),
                keep(gi_n, c_gi), O.visel(rc_b, iv_n, c_iv),
                ib(rc_b, ivc_n, c_ivc), ib(rc_b, kgi_n, c_kgi))

    return coefficients
