"""Branchless step-size controllers.

Implements the 4-coefficient controller law of the reference
(documented at /root/reference/extensisq/bogacki.py:67-77):

    h_new = h * g**(kb1+kb2) * (err/tol)**-b1 * (err_o/tol_o)**-b2
              * (h/h_old)**-a2

with the named presets of /root/reference/extensisq/common.py:166-185
(explicit) and :1684-1704 (implicit).  The reference's if/else ladder in
``_step_impl`` (common.py:249-287) and ``_assess_error_and_stepsize``
(common.py:2129-2166) becomes pure ``jnp.where`` selection so it
jits/vmaps.
"""
from typing import NamedTuple

import jax.numpy as jnp

from .._config import MIN_FACTOR, MAX_FACTOR, MAX_FACTOR0

_EXPLICIT_PRESETS = {
    "G": (0.7, -0.4, 0.0, 0.9),        # Gustafsson
    "S": (0.6, -0.2, 0.0, 0.9),        # Soderlind
    "standard": (1.0, 0.0, 0.0, 0.9),
}
_IMPLICIT_PRESETS = {
    "G": (2.0, -1.0, -1.0, 0.8),
    "S": (1.1, -0.7, -1.0, 0.8),
    "standard": (1.0, 0.0, 0.0, 0.8),
}


class ControllerCoeffs(NamedTuple):
    """Static controller coefficients, resolved at build time."""
    minbeta1: float
    minbeta2: float
    minalpha: float
    safety: float
    safety_sc: float
    error_exponent: float
    min_factor: float


def resolve_controller(sc_params, default, error_exponent, implicit=False,
                       min_factor=MIN_FACTOR):
    presets = _IMPLICIT_PRESETS if implicit else _EXPLICIT_PRESETS
    sc = sc_params or default
    if isinstance(sc, str):
        if sc not in presets:
            raise ValueError(
                'sc_params should be a tuple of length 4 or one of the '
                'strings "G", "S" or "standard"')
        kb1, kb2, a, g = presets[sc]
    elif isinstance(sc, tuple) and len(sc) == 4:
        kb1, kb2, a, g = sc
    else:
        raise ValueError(
            'sc_params should be a tuple of length 4 or one of the '
            'strings "G", "S" or "standard"')
    return ControllerCoeffs(
        minbeta1=kb1 * error_exponent,
        minbeta2=kb2 * error_exponent,
        minalpha=-a,
        safety=g,
        safety_sc=g ** (kb1 + kb2),
        error_exponent=error_exponent,
        min_factor=min_factor,
    )


def _second_order_factor(cc, error_norm, error_norm_old, h_ratio):
    err = jnp.maximum(error_norm, 1e-300)
    err_old = jnp.maximum(error_norm_old, 1e-300)
    hr = jnp.where(h_ratio == 0.0, 1.0, h_ratio)
    return cc.safety_sc * (err ** cc.minbeta1 * err_old ** cc.minbeta2
                           * hr ** cc.minalpha)


def reject_factor(cc, error_norm):
    """Shrink factor after a rejected step."""
    err = jnp.maximum(error_norm, 1e-300)
    return jnp.maximum(cc.min_factor, cc.safety * err ** cc.error_exponent)


def erk_accept_update(cc, tiny_err, error_norm, error_norm_old, h_ratio,
                      step_rejected, standard_sc, max_factor):
    """Factor and controller-state update on an accepted explicit step.

    Mirrors /root/reference/extensisq/common.py:249-277.
    Returns (factor, standard_sc_new, max_factor_new).
    """
    err = jnp.maximum(error_norm, 1e-300)
    factor_std = cc.safety * err ** cc.error_exponent
    factor_2nd = jnp.clip(
        _second_order_factor(cc, error_norm, error_norm_old, h_ratio),
        cc.min_factor, max_factor)

    is_tiny = error_norm < tiny_err
    factor = jnp.where(is_tiny, max_factor,
                       jnp.where(standard_sc, factor_std, factor_2nd))
    standard_sc_new = jnp.where(is_tiny, True,
                                jnp.where(standard_sc, False, standard_sc))
    factor = jnp.where(step_rejected, jnp.minimum(1.0, factor), factor)
    # reduce the initial max_factor (10) to 4 once the step is on scale
    max_factor_new = jnp.where(factor < MAX_FACTOR, MAX_FACTOR, max_factor)
    return factor, standard_sc_new, max_factor_new


def esdirk_accept_update(cc, tiny_err, error_norm, error_norm_old, h_ratio,
                         step_rejected, standard_sc, max_factor):
    """Implicit-method variant, /root/reference/extensisq/common.py:2129-2166.

    Differences from the explicit controller: the standard factor is
    capped by max_factor, ``standard_sc`` only clears once the step is on
    scale, and a rejected-then-accepted step resets to the standard
    controller.
    """
    err = jnp.maximum(error_norm, 1e-300)
    factor_std = jnp.minimum(cc.safety * err ** cc.error_exponent, max_factor)
    factor_2nd = jnp.clip(
        _second_order_factor(cc, error_norm, error_norm_old, h_ratio),
        cc.min_factor, max_factor)

    is_tiny = error_norm < tiny_err
    factor = jnp.where(is_tiny, max_factor,
                       jnp.where(standard_sc, factor_std, factor_2nd))
    on_scale = max_factor == MAX_FACTOR
    standard_sc_new = jnp.where(
        is_tiny, True,
        jnp.where(standard_sc, jnp.where(on_scale, False, standard_sc),
                  standard_sc))
    factor = jnp.where(step_rejected, jnp.minimum(1.0, factor), factor)
    standard_sc_new = jnp.where(step_rejected, True, standard_sc_new)
    max_factor_new = jnp.where(factor < MAX_FACTOR, MAX_FACTOR, max_factor)
    return factor, standard_sc_new, max_factor_new


def initial_max_factor():
    return MAX_FACTOR0
