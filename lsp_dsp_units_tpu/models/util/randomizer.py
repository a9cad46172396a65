"""Randomizer — table-seeded PRNG, exact re-derivation of the reference's
4-stream generator (reference: src/main/util/Randomizer.cpp).

The reference rotates through 4 independent generators
``r' = mul1*r + ((mul2*r) >> 16) + add`` (uint32), sample i coming from
stream i % 4 — so a block of N samples is 4 independent streams of N/4
sequential steps, vectorized here across streams with numpy uint32 math.
Bulk on-device noise should prefer :func:`jax.random` (counter-based,
splittable); this class exists for reference parity (dither, tests).
"""

from __future__ import annotations

import enum
import time

import numpy as np

RAND_RANGE = 2.32830643654e-10  # 1 / 2^32 (reference Randomizer.cpp:26)
RAND_LAMBDA = np.e * np.sqrt(2.0)
RAND_T = 0.5

_MUL1 = np.array([
    0x43ca16c1, 0x451222f3, 0x465e0183, 0x47f27263,
    0x4212ffe9, 0x4433f6ad, 0x40f31425, 0x412318bb,
    0x48f39cbf, 0x49b18a45, 0x4d341bbf, 0x4e93a169,
    0x4bacd5e5, 0x4c55e139, 0x4f11db4d, 0x4a901f8b], np.uint32)
_MUL2 = np.array([
    0x4c37c68f, 0x4d59b853, 0x4ef1d1e9, 0x4fe16c01,
    0x40fc2271, 0x44e335c1, 0x450fc1bb, 0x48cc3d07,
    0x493737a9, 0x4182e63f, 0x42198197, 0x43fc5611,
    0x4ac116eb, 0x4b0faf0d, 0x46777db9, 0x4730a64d], np.uint32)
_ADDERS = np.array([
    0x000551ff, 0x000633f5, 0x00011fcf, 0x00021b81,
    0x00075af1, 0x00080be5, 0x000330a7, 0x00040d0b,
    0x000c2521, 0x000dd113, 0x0009eea5, 0x000ae007,
    0x00092df5, 0x000b42bd, 0x000e1b15, 0x000f054d], np.uint32)


class RandomFunction(enum.Enum):
    LINEAR = "linear"
    EXP = "exp"
    TRIANGLE = "triangle"
    GAUSSIAN = "gaussian"


class Randomizer:
    def __init__(self, seed: int | None = None):
        self.mul1 = np.zeros(4, np.uint32)
        self.mul2 = np.zeros(4, np.uint32)
        self.add = np.zeros(4, np.uint32)
        self.last = np.zeros(4, np.uint32)
        self.buf_id = 0
        self.init(seed)

    def init(self, seed: int | None = None) -> None:
        """Seed the 4 streams (reference Randomizer::init)."""
        if seed is None:
            seed = int(time.time_ns() & 0xFFFFFFFF)
        seed = np.uint32(seed)
        for i in range(4):
            if i > 0:
                reseed = np.uint32(
                    (int(seed) << (i * 8) | int(seed) >> ((4 - i) * 8))
                    & 0xFFFFFFFF)
            else:
                reseed = seed
            self.add[i] = _ADDERS[int(reseed) & 0x0F]
            self.mul1[i] = _MUL1[(int(reseed) >> 4) & 0x0F]
            self.mul2[i] = _MUL2[(int(reseed) >> 8) & 0x0F]
            self.last[i] = np.uint32(int(reseed) ^ (int(seed) >> 4))
        self.buf_id = 0

    def _step(self, idx) -> np.ndarray:
        """Advance streams ``idx`` (array of stream ids) one step each."""
        r = self.last[idx]
        # all-uint32 wrapping arithmetic, matching the reference exactly:
        # (mul2*last) wraps to 32 bits BEFORE the >> 16
        with np.errstate(over="ignore"):
            nxt = (self.mul1[idx] * r
                   + ((self.mul2[idx] * r) >> np.uint32(16))
                   + self.add[idx])
        self.last[idx] = nxt
        return nxt

    def generate_linear(self, count: int = 1) -> np.ndarray:
        """Uniform [0,1) values, exact stream-rotation order."""
        out = np.zeros(count, np.float64)
        ids = (self.buf_id + np.arange(count)) & 3
        for s in range(4):
            mask = ids == s
            n = int(mask.sum())
            if n == 0:
                continue
            vals = np.zeros(n, np.uint32)
            for j in range(n):
                vals[j] = self._step(np.array([s]))[0]
            out[mask] = vals.astype(np.float64) * RAND_RANGE
        self.buf_id = (self.buf_id + count) & 3
        return out

    def random(self, func: RandomFunction = RandomFunction.LINEAR,
               count: int = 1) -> np.ndarray:
        if func == RandomFunction.GAUSSIAN:
            # the reference draws (rv, rv2) PER SAMPLE
            # (Randomizer.cpp:132-138), so the two Box-Muller inputs
            # interleave in the underlying linear stream
            draws = self.generate_linear(2 * count)
            rv, rv2 = draws[0::2], draws[1::2]
            return np.sqrt(-2.0 * np.log(np.maximum(rv, 1e-30))) \
                * np.cos(2.0 * np.pi * rv2)
        rv = self.generate_linear(count)
        if func == RandomFunction.EXP:
            return (np.exp(RAND_LAMBDA * rv) - 1.0) / (np.exp(RAND_LAMBDA)
                                                       - 1.0)
        if func == RandomFunction.TRIANGLE:
            return np.where(
                rv <= 0.5,
                np.sqrt(2.0) * RAND_T * np.sqrt(rv),
                2.0 * RAND_T - np.sqrt(4.0 - 2.0 * (1.0 + rv)) * RAND_T)
        return rv
