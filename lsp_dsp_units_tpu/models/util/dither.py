"""Dither — TPDF dither at N bits (reference: src/main/util/Dither.cpp,
which draws from the table-seeded Randomizer).

Two paths: bulk on-device TPDF via jax.random (two uniforms summed), and
the host parity path via the exact Randomizer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.util.randomizer import (
    Randomizer, RandomFunction)


class Dither:
    def __init__(self, bits: int = 16, seed: int | None = None):
        self.set_bits(bits)
        self.rand = Randomizer(seed)

    def set_bits(self, bits: int) -> None:
        self.bits = int(bits)
        # one LSB at the given bit depth (reference Dither::set_bits)
        self.delta = 1.0 / float(1 << (self.bits - 1)) if bits > 0 else 0.0

    def process(self, x: np.ndarray) -> np.ndarray:
        """Host path: exact reference-style randomizer noise."""
        if self.bits <= 0:
            return np.asarray(x).copy()
        n = np.asarray(x).size
        r1 = self.rand.random(RandomFunction.LINEAR, n)
        r2 = self.rand.random(RandomFunction.LINEAR, n)
        tpdf = (r1 + r2 - 1.0).reshape(np.asarray(x).shape)
        return np.asarray(x) + tpdf.astype(np.float32) * (self.delta * 0.5)


def dither_device(key: jax.Array, x: jax.Array, bits: int) -> jax.Array:
    """Device path: TPDF dither with jax.random."""
    if bits <= 0:
        return x
    delta = 1.0 / float(1 << (bits - 1))
    k1, k2 = jax.random.split(key)
    tpdf = (jax.random.uniform(k1, x.shape)
            + jax.random.uniform(k2, x.shape) - 1.0)
    return x + tpdf * (delta * 0.5)
