"""Saturation / sigmoid curves (reference: src/main/misc/sigmoid.cpp,
include/.../misc/sigmoid.h:54-131).

Pure elementwise jnp functions — VPU-friendly, usable inside jit/vmap and
Pallas kernels alike.
"""

from __future__ import annotations

import jax.numpy as jnp


def hard_clip(x):
    return jnp.clip(x, -1.0, 1.0)


def quadratic(x):
    neg = jnp.where(x > -2.0, x * (1.0 + 0.25 * x), -1.0)
    pos = jnp.where(x < 2.0, x * (1.0 - 0.25 * x), 1.0)
    return jnp.where(x < 0.0, neg, pos)


def sine(x):
    return jnp.where(x < -jnp.pi / 2, -1.0,
                     jnp.where(x > jnp.pi / 2, 1.0, jnp.sin(x)))


def logistic(x):
    return 1.0 - 2.0 / (1.0 + jnp.exp(2.0 * x))


def arctangent(x):
    return (2.0 / jnp.pi) * jnp.arctan((jnp.pi / 2) * x)


def hyperbolic_tangent(x):
    t = jnp.exp(2.0 * jnp.clip(x, -7.0, 7.0))
    return (t - 1.0) / (t + 1.0)


def hyperbolic(x):
    return x / (1.0 + jnp.abs(x))


def guidermannian(x):
    t = jnp.exp((jnp.pi / 2) * jnp.clip(x, -7.0, 7.0))
    return (4.0 / jnp.pi) * jnp.arctan((t - 1.0) / (t + 1.0))


def error(x):
    """Abramowitz-Stegun erf approximation (reference sigmoid.cpp error).

    NOTE: the exponential uses the scaled argument nx while the rational
    t uses raw x — so this is NOT erf(nx) to A&S accuracy (~1.5e-2 off
    at x=1).  That mismatch is the reference's own (sigmoid.cpp:100-110
    does exactly this); parity wins over the formula.
    """
    nx = (jnp.sqrt(jnp.pi) / 2.0) * x
    ex = jnp.exp(-nx * nx)
    t_pos = 1.0 / (1.0 + 0.3275911 * x)
    t_neg = 1.0 / (1.0 - 0.3275911 * x)
    poly = lambda t: t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.where(x >= 0.0, 1.0 - poly(t_pos) * ex, -1.0 + poly(t_neg) * ex)


def smoothstep(x):
    t = jnp.clip(x * jnp.sqrt(0.5), -1.0, 1.0)
    s = 0.5 * (t + 1.0)
    return 2.0 * s * s * (3.0 - 2.0 * s) - 1.0


def smootherstep(x):
    t = jnp.clip(0.5 * (2.0 / jnp.sqrt(jnp.pi)) * x, -1.0, 1.0)
    s = 0.5 * (t + 1.0)
    return 2.0 * s ** 3 * (10.0 + s * (-15.0 + 6.0 * s)) - 1.0


def circle(x):
    return x / jnp.sqrt(1.0 + x * x)


FUNCTIONS = {
    "hard_clip": hard_clip,
    "quadratic": quadratic,
    "sine": sine,
    "logistic": logistic,
    "arctangent": arctangent,
    "hyperbolic_tangent": hyperbolic_tangent,
    "hyperbolic": hyperbolic,
    "guidermannian": guidermannian,
    "error": error,
    "smoothstep": smoothstep,
    "smootherstep": smootherstep,
    "circle": circle,
}
