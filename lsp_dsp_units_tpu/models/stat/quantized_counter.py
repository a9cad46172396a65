"""QuantizedCounter — histogram of signal values
(reference: src/main/stat/QuantizedCounter.cpp): N levels between
min/max plus below/above/NaN buckets.

A bincount over quantized indices — one fused pass on device.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class QuantizedCounterState(NamedTuple):
    counts: Array   # [levels] int32
    below: Array    # [] int32
    above: Array    # [] int32
    nans: Array     # [] int32
    total: Array    # [] int32


class QuantizedCounter:
    def __init__(self, minimum: float = -1.0, maximum: float = 1.0,
                 levels: int = 256):
        self.minimum = float(minimum)
        self.maximum = float(maximum)
        self.levels = int(levels)
        self.step = (self.maximum - self.minimum) / self.levels

    def init_state(self) -> QuantizedCounterState:
        z = lambda: jnp.int32(0)
        return QuantizedCounterState(
            counts=jnp.zeros(self.levels, jnp.int32),
            below=z(), above=z(), nans=z(), total=z())

    def process(self, state: QuantizedCounterState, x: Array,
                ) -> QuantizedCounterState:
        x = x.reshape(-1)
        isnan = jnp.isnan(x)
        below = jnp.logical_and(~isnan, x < self.minimum)
        above = jnp.logical_and(~isnan, x >= self.maximum)
        inside = ~(isnan | below | above)
        idx = jnp.clip(((x - self.minimum) / self.step).astype(jnp.int32),
                       0, self.levels - 1)
        add = jnp.zeros(self.levels, jnp.int32).at[idx].add(
            inside.astype(jnp.int32))
        return QuantizedCounterState(
            counts=state.counts + add,
            below=state.below + jnp.sum(below, dtype=jnp.int32),
            above=state.above + jnp.sum(above, dtype=jnp.int32),
            nans=state.nans + jnp.sum(isnan, dtype=jnp.int32),
            total=state.total + jnp.int32(x.size))
