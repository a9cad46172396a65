"""Bypass — click-free dry/wet crossfade switch
(reference: src/main/ctl/Bypass.cpp:106-208).

State: current ramp gain in [0,1] (0 = wet/on-path, 1 = dry/bypassed, the
reference's convention) and the per-sample delta.  The linear ramp is
closed-form over a block: gain[n] = clip(g0 + delta*(n+1), 0, 1).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class BypassState(NamedTuple):
    gain: Array     # [...] current dry mix gain
    delta: Array    # [...] per-sample ramp increment (+ towards dry)


class Bypass:
    def __init__(self, sample_rate: int = 48000, time_ms: float = 5.0):
        self.sample_rate = int(sample_rate)
        length = max(1.0, time_ms * 0.001 * sample_rate)
        self.step = 1.0 / length

    def init_state(self, batch_shape: Tuple[int, ...] = (),
                   bypassed: bool = False) -> BypassState:
        g = 1.0 if bypassed else 0.0
        return BypassState(gain=jnp.full(batch_shape, g, jnp.float32),
                           delta=jnp.zeros(batch_shape, jnp.float32))

    def set_bypass(self, state: BypassState, bypass) -> BypassState:
        """Switch target (reference Bypass::set_bypass): ramps toward dry
        when True, toward wet when False."""
        d = jnp.where(jnp.asarray(bypass), self.step, -self.step)
        return state._replace(delta=jnp.broadcast_to(
            d, state.delta.shape).astype(jnp.float32))

    def process(self, state: BypassState, dry: Array, wet: Array,
                ) -> Tuple[BypassState, Array]:
        """Mix dry/wet across the block with the running ramp
        (reference Bypass.cpp:106-208): out = dry + (wet-dry)*(1-gain)."""
        t = dry.shape[-1]
        # the reference emits with the CURRENT gain and increments
        # afterwards (Bypass.cpp process: use fGain, then
        # fGain += fDelta), so sample 0 still carries the pre-ramp gain
        n = jnp.arange(t, dtype=jnp.float32)
        g = jnp.clip(state.gain[..., None] + state.delta[..., None] * n,
                     0.0, 1.0)
        out = wet + (dry - wet) * g
        new_gain = jnp.clip(state.gain + state.delta * t, 0.0, 1.0)
        return state._replace(gain=new_gain), out

    def is_bypassed(self, state: BypassState) -> Array:
        return state.gain >= 1.0
