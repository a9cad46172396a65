"""quickmath — fast approximate trig/log (reference:
include/.../misc/quickmath.h, header-only).

On TPU the VPU has fast transcendental hardware so production code uses
``jnp.sin``/``jnp.log`` directly; these polynomial approximations are
kept for exact behavioral parity with reference units that bake them
into their output (e.g. the LFO uses quick_sinf).  Elementwise jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

QMATH_PI_DIV_2 = jnp.pi * 0.5
QMATH_LN2 = 0.6931471805599453


def quick_sinf(x):
    """7th-order Taylor sine — precise within [-pi/2, pi/2]
    (reference quickmath.h quick_sinf)."""
    x2 = x * x
    return x * (1.0 + x2 * (-0.166666666667 + x2 * (
        0.00833333333333 + x2 * -0.000198412698413)))


def quick_cosf(x):
    return quick_sinf(QMATH_PI_DIV_2 - x)


def quick_logf(x):
    """ln(x) via exponent extraction + atanh series
    (reference quick_logf)."""
    xi = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32),
                                      jnp.int32)
    e = (xi >> 23) - 127
    mant_bits = (xi & 0x007FFFFF) | 0x3F800000
    m = jax.lax.bitcast_convert_type(mant_bits, jnp.float32)
    y = (m - 1.0) / (m + 1.0)
    y2 = y * y
    atanh = y * (2.0 + y2 * (0.666666666667 + y2 * (
        0.4 + y2 * 0.285714285714)))
    return e.astype(jnp.float32) * QMATH_LN2 + atanh


def quick_log2f(x):
    return quick_logf(x) * (1.0 / QMATH_LN2)


def quick_expf(x):
    """exp via 2**k * exp(frac) polynomial."""
    k = jnp.floor(x / QMATH_LN2)
    r = x - k * QMATH_LN2
    p = 1.0 + r * (1.0 + r * (0.5 + r * (0.166666666667
                                         + r * 0.0416666666667)))
    return jnp.exp2(k) * p
