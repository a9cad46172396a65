"""SurgeProtector — mutes output on sudden gain surges
(reference: src/main/dynamics/SurgeProtector.cpp).

On/off state machine with transition ramp (sqrt-shaped) and a shutdown
timeout: the gate turns ON when the level exceeds on_threshold, ramps
the gain up over transition samples, and turns OFF after the level has
stayed below off_threshold for shutdown samples.  Pure per-sample scan.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class SurgeProtectorState(NamedTuple):
    on: Array               # [...] bool
    shutdown_time: Array    # [...] int32
    transition_time: Array  # [...] int32


class SurgeProtector:
    def __init__(self, on_threshold: float = 1e-3,
                 off_threshold: float = 1e-4,
                 transition_samples: int = 256,
                 shutdown_samples: int = 48000):
        self.on_threshold = float(on_threshold)
        self.off_threshold = float(off_threshold)
        self.transition_max = int(transition_samples)
        self.shutdown_max = int(shutdown_samples)

    def init_state(self, batch_shape: Tuple[int, ...] = (),
                   ) -> SurgeProtectorState:
        return SurgeProtectorState(
            on=jnp.zeros(batch_shape, bool),
            shutdown_time=jnp.zeros(batch_shape, jnp.int32),
            transition_time=jnp.zeros(batch_shape, jnp.int32))

    def process(self, state: SurgeProtectorState, x: Array,
                ) -> Tuple[SurgeProtectorState, Array]:
        """x: detector level [..., T] -> (state', gain [..., T])."""
        tmax = self.transition_max

        def step(s: SurgeProtectorState, xt):
            # on-state shutdown countdown
            sd = jnp.where(s.on,
                           jnp.where(xt >= self.off_threshold, 0,
                                     s.shutdown_time + 1),
                           s.shutdown_time)
            turn_off = jnp.logical_and(s.on, sd >= self.shutdown_max)
            turn_on = jnp.logical_and(~s.on, xt >= self.on_threshold)
            on = jnp.where(turn_off, False, jnp.where(turn_on, True, s.on))
            sd = jnp.where(turn_on, 0, sd)
            # transition ramp (sqrt shape up, linear down)
            tt = s.transition_time
            gain_on = jnp.where(
                tt < tmax, jnp.sqrt(tt.astype(jnp.float32) / tmax), 1.0)
            tt_next_on = jnp.minimum(tt + 1, tmax)
            gain_off = jnp.where(
                tt > 0, jnp.sqrt(tt.astype(jnp.float32) / tmax), 0.0)
            tt_next_off = jnp.maximum(tt - 1, 0)
            gain = jnp.where(on, gain_on, gain_off)
            tt = jnp.where(on, tt_next_on, tt_next_off)
            return SurgeProtectorState(on, sd, tt), gain

        xs = jnp.moveaxis(jnp.abs(x), -1, 0)
        state, gains = jax.lax.scan(step, state, xs)
        return state, jnp.moveaxis(gains, 0, -1)
