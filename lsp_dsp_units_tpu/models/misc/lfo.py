"""LFO shape functions, phase in [0, 1) (reference: src/main/misc/lfo.cpp,
include/.../misc/lfo.h:57-141).  Pure elementwise jnp.

The reference bakes its quick_sinf/quick_logf polynomial approximations
into the emitted shapes (lfo.cpp:46-47,101-113); the default here is the
EXACT transcendental (better on TPU, ~1.6e-4 / ~76 dB from the
reference's truncation error).  Pass ``quick=True`` for bit-faithful
parity with the reference's approximations.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from lsp_dsp_units_tpu.models.misc.quickmath import quick_sinf, quick_logf

# host floats — importing this module must not initialize a JAX backend
_2PI = 2.0 * math.pi
_4PI = 4.0 * math.pi
_REV_LN100 = 0.5 / math.log(10.0)


def triangular(phase):
    return jnp.where(phase < 0.5, phase * 2.0, (1.0 - phase) * 2.0)


def sine(phase, quick: bool = False):
    s = quick_sinf if quick else jnp.sin
    return jnp.where(
        phase >= 0.5,
        0.5 + 0.5 * s((0.75 - phase) * _2PI),
        0.5 + 0.5 * s((phase - 0.25) * _2PI))


def step_sine(phase, quick: bool = False):
    s = quick_sinf if quick else jnp.sin
    hi = jnp.where(phase >= 0.75,
                   0.25 + 0.25 * s((0.875 - phase) * _4PI),
                   0.75 + 0.25 * s((0.625 - phase) * _4PI))
    lo = jnp.where(phase >= 0.25,
                   0.75 + 0.25 * s((phase - 0.375) * _4PI),
                   0.25 + 0.25 * s((phase - 0.125) * _4PI))
    return jnp.where(phase >= 0.5, hi, lo)


def cubic(phase):
    p = jnp.where(phase >= 0.5, 1.0 - phase, phase)
    return p * p * (12.0 - 16.0 * p)


def step_cubic(phase):
    p = jnp.where(phase >= 0.5, 1.0 - phase, phase) - 0.25
    return 0.5 + 32.0 * p ** 3


def parabolic(phase):
    p = phase - 0.5
    return 1.0 - 4.0 * p * p


def rev_parabolic(phase):
    p = jnp.where(phase >= 0.5, 1.0 - phase, phase)
    return 4.0 * p * p


def logarithmic(phase, quick: bool = False):
    p = jnp.where(phase >= 0.5, 1.0 - phase, phase)
    lg = quick_logf if quick else jnp.log
    return lg(1.0 + 198.0 * p) * _REV_LN100


def rev_logarithmic(phase, quick: bool = False):
    p = jnp.where(phase >= 0.5, 1.0 - phase, phase)
    lg = quick_logf if quick else jnp.log
    return 1.0 - lg(100.0 - 198.0 * p) * _REV_LN100


def sqrt(phase):
    p = phase - 0.5
    return jnp.sqrt(jnp.maximum(1.0 - 4.0 * p * p, 0.0))


def rev_sqrt(phase):
    p = jnp.where(phase >= 0.5, phase - 1.0, phase)
    return 1.0 - jnp.sqrt(jnp.maximum(1.0 - 4.0 * p * p, 0.0))


def circular(phase):
    plo = phase
    phi = phase - 1.0
    pmid = phase - 0.5
    lo = 0.5 - jnp.sqrt(jnp.maximum(0.25 - 4.0 * plo * plo, 0.0))
    hi = 0.5 - jnp.sqrt(jnp.maximum(0.25 - 4.0 * phi * phi, 0.0))
    mid = 0.5 + jnp.sqrt(jnp.maximum(0.25 - 4.0 * pmid * pmid, 0.0))
    return jnp.where(phase < 0.25, lo, jnp.where(phase > 0.75, hi, mid))


def rev_circular(phase):
    p = jnp.where(phase >= 0.5, 1.0 - phase, phase) - 0.25
    r = jnp.sqrt(jnp.maximum(0.25 - 4.0 * p * p, 0.0))
    return jnp.where(p < 0.0, r, 1.0 - r)


FUNCTIONS = {
    "triangular": triangular,
    "sine": sine,
    "step_sine": step_sine,
    "cubic": cubic,
    "step_cubic": step_cubic,
    "parabolic": parabolic,
    "rev_parabolic": rev_parabolic,
    "logarithmic": logarithmic,
    "rev_logarithmic": rev_logarithmic,
    "sqrt": sqrt,
    "rev_sqrt": rev_sqrt,
    "circular": circular,
    "rev_circular": rev_circular,
}
