"""QuantizedCounter — SLIDING-WINDOW histogram of signal values
(reference: src/main/stat/QuantizedCounter.cpp): N levels between
min/max plus below/above/NaN buckets, counting only the last ``period``
samples (the reference keeps a history ring and evicts values older
than nPeriod from the counters — evict_values, :228-240).

TPU shape: instead of per-sample inc/dec over a ring, each call
bincounts the incoming block AND bincounts the evicted span of the
history ring — two fused device passes regardless of block size.

Bucket edges follow the reference's C truncation-toward-zero
(inc_counters, :203-207): ``index = int((x - min) * rstep)`` truncates
values in ``(min - step, min)`` to index 0, so that whole band counts
at level 0, NOT in the below bucket; only ``index < 0`` (i.e.
``x <= min - step``) goes below.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class QuantizedCounterState(NamedTuple):
    counts: Array   # [levels] int32
    below: Array    # [] int32
    above: Array    # [] int32
    nans: Array     # [] int32
    total: Array    # [] int32 samples currently in the window
    history: Array  # [capacity] float32 ring of the windowed samples
    head: Array     # [] int32 ring write position
    count: Array    # [] int32 valid samples in the ring


class QuantizedCounter:
    def __init__(self, minimum: float = -1.0, maximum: float = 1.0,
                 levels: int = 256, period: int = 0,
                 capacity: int = 0):
        """``period`` = sliding window length in samples (0 = infinite:
        counts accumulate forever and no history is kept, the round-1
        behavior).  ``capacity`` sizes the history ring (defaults to
        the period)."""
        self.minimum = float(minimum)
        self.maximum = float(maximum)
        self.levels = int(levels)
        self.step = (self.maximum - self.minimum) / self.levels
        self.period = int(period)
        self.capacity = int(capacity) if capacity else self.period

    def init_state(self) -> QuantizedCounterState:
        z = lambda: jnp.int32(0)
        return QuantizedCounterState(
            counts=jnp.zeros(self.levels, jnp.int32),
            below=z(), above=z(), nans=z(), total=z(),
            history=jnp.zeros(max(self.capacity, 1), jnp.float32),
            head=z(), count=z())

    def _bucketize(self, x: Array):
        """(level index [N], below, above, nan masks) with the
        reference's C truncation (see module docstring)."""
        isnan = jnp.isnan(x)
        safe = jnp.where(isnan, self.minimum, x)
        raw = (safe - self.minimum) / self.step
        idx = raw.astype(jnp.int32)          # trunc toward zero, like C
        below = jnp.logical_and(~isnan, raw <= -1.0)
        above = jnp.logical_and(~isnan, idx >= self.levels)
        inside = ~(isnan | below | above)
        return jnp.clip(idx, 0, self.levels - 1), below, above, isnan, \
            inside

    def _tally(self, x: Array, sign: int):
        idx, below, above, isnan, inside = self._bucketize(x)
        add = jnp.zeros(self.levels, jnp.int32).at[idx].add(
            jnp.where(inside, jnp.int32(sign), 0))
        return (add, sign * jnp.sum(below, dtype=jnp.int32),
                sign * jnp.sum(above, dtype=jnp.int32),
                sign * jnp.sum(isnan, dtype=jnp.int32))

    def _evict(self, counts, below, above, nans, history, head, count,
               keep):
        """Bincount-decrement the oldest ``count - keep`` ring samples
        (masked static-shape pass) and return the updated tallies."""
        cap = history.shape[0]
        excess = jnp.maximum(count - keep, 0)
        start = (head - count) % cap            # oldest sample position
        offs = (start + jnp.arange(cap)) % cap
        mask = jnp.arange(cap) < excess
        ev = jnp.where(mask, history[offs], jnp.nan)
        sub, eb, ea, _ = self._tally(ev, -1)
        # non-evicted lanes are NaN padding (invisible to counts/
        # below/above); true NaN evictions count from the ring itself
        en = -jnp.sum(mask & jnp.isnan(history[offs]), dtype=jnp.int32)
        return (counts + sub, below + eb, above + ea, nans + en,
                count - excess)

    def process(self, state: QuantizedCounterState, x: Array,
                ) -> QuantizedCounterState:
        x = x.reshape(-1)
        n = x.size

        if self.period <= 0:
            add, b, a, nn = self._tally(x, +1)
            return state._replace(
                counts=state.counts + add, below=state.below + b,
                above=state.above + a, nans=state.nans + nn,
                total=state.total + jnp.int32(n))

        cap = self.capacity
        # samples beyond the ring capacity would be evicted within this
        # very call — only the last min(n, cap) ever enter the window
        tail_x = x[-cap:] if n > cap else x
        tn = tail_x.size

        # 1. evict ring samples the new write will overwrite
        counts, below, above, nans, count = self._evict(
            state.counts, state.below, state.above, state.nans,
            state.history, state.head, state.count, cap - tn)

        # 2. tally + write the incoming samples
        add, b, a, nn = self._tally(tail_x, +1)
        counts, below, above, nans = (counts + add, below + b,
                                      above + a, nans + nn)
        head = (state.head + tn) % cap
        pos = (head - tn + jnp.arange(tn)) % cap
        history = state.history.at[pos].set(tail_x)
        count = count + tn

        # 3. evict everything beyond the window period
        counts, below, above, nans, count = self._evict(
            counts, below, above, nans, history, head, count,
            self.period)

        return QuantizedCounterState(
            counts=counts, below=below, above=above, nans=nans,
            total=count, history=history, head=head, count=count)
