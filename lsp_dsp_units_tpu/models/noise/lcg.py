"""LCG noise generator with uniform/exponential/triangular/gaussian
distributions (reference: src/main/noise/LCG.cpp, LCG.h:32-38).

Two paths: the exact reference-parity path over
:class:`...util.randomizer.Randomizer` (host), and a bulk device path over
``jax.random`` (counter-based, splittable — the idiomatic TPU PRNG).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.util.randomizer import (
    Randomizer, RandomFunction, RAND_LAMBDA, RAND_T)


class LCGDistribution(enum.Enum):
    UNIFORM = "uniform"
    EXPONENTIAL = "exponential"
    TRIANGULAR = "triangular"
    GAUSSIAN = "gaussian"


class LCG:
    def __init__(self, distribution: LCGDistribution =
                 LCGDistribution.UNIFORM, amplitude: float = 1.0,
                 offset: float = 0.0, seed: int | None = None):
        self.distribution = distribution
        self.amplitude = float(amplitude)
        self.offset = float(offset)
        self.rand = Randomizer(seed)

    def process(self, count: int) -> np.ndarray:
        """(reference LCG::process_single semantics over a block)"""
        a, o = self.amplitude, self.offset
        d = self.distribution
        if d == LCGDistribution.EXPONENTIAL:
            # the reference draws sign THEN magnitude PER SAMPLE
            # (LCG.cpp:64-72), so the Randomizer stream interleaves
            # sign0,mag0,sign1,mag1,... — draw 2*count linear values
            # and apply the RND_EXP transform to the odd positions
            from lsp_dsp_units_tpu.models.util.randomizer import \
                RAND_LAMBDA
            u = self.rand.random(RandomFunction.LINEAR, 2 * count)
            sign = np.where(u[0::2] >= 0.5, 1.0, -1.0)
            mag = (np.exp(RAND_LAMBDA * u[1::2]) - 1.0) \
                / (np.exp(RAND_LAMBDA) - 1.0)
            return sign * a * mag + o
        if d == LCGDistribution.TRIANGULAR:
            # the -0.5 sits OUTSIDE the amplitude scaling (asymmetric,
            # non-zero-mean) — reproducing the reference verbatim
            # (LCG.cpp:76); parity wins over symmetry
            return 2.0 * a * self.rand.random(RandomFunction.TRIANGLE,
                                              count) - 0.5 + o
        if d == LCGDistribution.GAUSSIAN:
            return a * self.rand.random(RandomFunction.GAUSSIAN, count) + o
        return 2.0 * a * (self.rand.random(RandomFunction.LINEAR, count)
                          - 0.5) + o


def lcg_device(key: jax.Array, shape,
               distribution: LCGDistribution = LCGDistribution.UNIFORM,
               amplitude: float = 1.0, offset: float = 0.0) -> jax.Array:
    """Bulk device-side noise with the same distribution shapes, using
    jax.random (not bit-exact with the reference LCG — use :class:`LCG`
    for parity)."""
    if distribution == LCGDistribution.EXPONENTIAL:
        k1, k2 = jax.random.split(key)
        sign = jnp.where(jax.random.uniform(k1, shape) >= 0.5, 1.0, -1.0)
        rv = jax.random.uniform(k2, shape)
        mag = (jnp.exp(RAND_LAMBDA * rv) - 1.0) / (np.exp(RAND_LAMBDA)
                                                   - 1.0)
        return sign * amplitude * mag + offset
    if distribution == LCGDistribution.TRIANGULAR:
        rv = jax.random.uniform(key, shape)
        tri = jnp.where(rv <= 0.5,
                        jnp.sqrt(2.0) * RAND_T * jnp.sqrt(rv),
                        2.0 * RAND_T - jnp.sqrt(4.0 - 2.0 * (1.0 + rv))
                        * RAND_T)
        return 2.0 * amplitude * tri - 0.5 + offset  # verbatim LCG.cpp:76
    if distribution == LCGDistribution.GAUSSIAN:
        return amplitude * jax.random.normal(key, shape) + offset
    return 2.0 * amplitude * (jax.random.uniform(key, shape) - 0.5) \
        + offset
