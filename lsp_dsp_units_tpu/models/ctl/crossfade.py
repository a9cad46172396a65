"""Crossfade — linear fade between two sources over N samples
(reference: src/main/ctl/Crossfade.cpp).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class CrossfadeState(NamedTuple):
    counter: Array   # [] int32 remaining fade samples
    gain: Array      # [] current fade-in gain


class Crossfade:
    def __init__(self, sample_rate: int = 48000, time_s: float = 0.005):
        self.samples = max(1, int(sample_rate * time_s))
        self.delta = 1.0 / self.samples

    def init_state(self) -> CrossfadeState:
        # reference construct() starts with fGain = 1.0 (Crossfade.cpp:44)
        # so a never-toggled crossfade passes the NEW (fade-in) source;
        # reset() is what zeroes it
        return CrossfadeState(counter=jnp.int32(0), gain=jnp.float32(1.0))

    def reset(self, state: CrossfadeState) -> CrossfadeState:
        """(reference Crossfade::reset, Crossfade.cpp:61-64)"""
        return CrossfadeState(counter=jnp.int32(0), gain=jnp.float32(0.0))

    def toggle(self, state: CrossfadeState) -> CrossfadeState:
        """Restart the fade (reference Crossfade::toggle) — only when not
        already active."""
        active = state.counter > 0
        return CrossfadeState(
            counter=jnp.where(active, state.counter,
                              jnp.int32(self.samples)),
            gain=jnp.where(active, state.gain, jnp.float32(0.0)))

    def process(self, state: CrossfadeState, fade_out: Optional[Array],
                fade_in: Optional[Array], count: int,
                ) -> Tuple[CrossfadeState, Array]:
        """Mix fade_out -> fade_in across the running fade window
        (reference Crossfade.cpp:96-220)."""
        n = jnp.arange(count, dtype=jnp.float32)
        g = jnp.clip(state.gain + self.delta * n, 0.0, 1.0)
        active = n < state.counter.astype(jnp.float32)
        g_eff = jnp.where(active, g, jnp.where(state.gain + self.delta
                                               * state.counter > 0.0,
                                               1.0, 0.0))
        if fade_in is None and fade_out is None:
            out = jnp.zeros(count, jnp.float32)
        elif fade_out is None:
            out = fade_in * g_eff
        elif fade_in is None:
            out = fade_out * (1.0 - g_eff)
        else:
            out = fade_out * (1.0 - g_eff) + fade_in * g_eff
        used = jnp.minimum(state.counter, count)
        return CrossfadeState(
            counter=state.counter - used,
            gain=state.gain + self.delta * used.astype(jnp.float32)), out

    def active(self, state: CrossfadeState) -> Array:
        return state.counter > 0
