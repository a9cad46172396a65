"""Trigger — signal edge trigger with single/manual/repeat modes and
hysteresis (reference: src/main/util/Trigger.cpp,
include/.../util/Trigger.h trg_mode_t/trg_type_t/trg_locks_t).

The per-sample edge detection is host-friendly control logic, but the
heavy part (finding edges over a block) is vectorized: process() scans a
whole block on device and returns the per-sample trigger state.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class TriggerMode(enum.Enum):
    SINGLE = "single"
    MANUAL = "manual"
    REPEAT = "repeat"


class TriggerType(enum.Enum):
    NONE = "none"
    SIMPLE_RISING_EDGE = "simple_rising"
    SIMPLE_FALLING_EDGE = "simple_falling"
    ADVANCED_RISING_EDGE = "advanced_rising"
    ADVANCED_FALLING_EDGE = "advanced_falling"


WAITING, ARMED, FIRED = 0, 1, 2


class TriggerState(NamedTuple):
    prev: Array     # [] previous sample
    state: Array    # [] int32 trg_state


class Trigger:
    def __init__(self, ttype: TriggerType = TriggerType.SIMPLE_RISING_EDGE,
                 mode: TriggerMode = TriggerMode.REPEAT,
                 threshold: float = 0.0, hysteresis: float = 0.0):
        self.ttype = ttype
        self.mode = mode
        self.threshold = float(threshold)
        self.hysteresis = abs(float(hysteresis))
        # locks for single/manual modes (host-side control state)
        self.single_lock = False
        self.manual_allow = False
        self.manual_lock = False

    def init_state(self) -> TriggerState:
        return TriggerState(prev=jnp.float32(0.0),
                            state=jnp.int32(WAITING))

    # -- control (reference trg_locks_t handling) --------------------------
    def reset_single_trigger(self) -> None:
        self.single_lock = False

    def activate_manual_trigger(self) -> None:
        self.manual_allow = True

    def _blocked(self) -> bool:
        if self.mode == TriggerMode.SINGLE and self.single_lock:
            return True
        if self.mode == TriggerMode.MANUAL:
            if not self.manual_allow or self.manual_lock:
                return True
        return False

    def process(self, state: TriggerState, x: Array,
                ) -> Tuple[TriggerState, Array]:
        """x [T] -> per-sample trigger state (0 wait / 1 armed / 2 fired)."""
        if self.ttype == TriggerType.NONE or self._blocked():
            return state._replace(prev=x[-1]), \
                jnp.full(x.shape, WAITING, jnp.int32)

        th = self.threshold
        hy = self.hysteresis
        rising = self.ttype in (TriggerType.SIMPLE_RISING_EDGE,
                                TriggerType.ADVANCED_RISING_EDGE)
        advanced = self.ttype in (TriggerType.ADVANCED_RISING_EDGE,
                                  TriggerType.ADVANCED_FALLING_EDGE)

        def step(carry, xt):
            prev, st = carry
            diff = xt - prev
            if rising:
                moving = diff > 0.0
                crossed = jnp.logical_and(prev < th, xt >= th)
                rearm_level = xt <= th - hy
            else:
                moving = diff < 0.0
                crossed = jnp.logical_and(prev > th, xt <= th)
                rearm_level = xt >= th + hy
            if advanced:
                armed = jnp.logical_or(st == ARMED, rearm_level)
                fire = jnp.logical_and(armed, crossed)
            else:
                armed = moving
                fire = jnp.logical_and(armed, crossed)
            new_st = jnp.where(fire, FIRED,
                               jnp.where(armed, ARMED, WAITING))
            return (xt, new_st.astype(jnp.int32)), new_st.astype(jnp.int32)

        (prev, st), states = jax.lax.scan(step, (state.prev, state.state),
                                          x)
        # one-shot modes lock PER SAMPLE, not per block: only the first
        # fire in the block is emitted, everything after it reads as
        # WAITING — exactly what the reference's in-loop lock check
        # produces (Trigger.cpp process loop)
        if self.mode in (TriggerMode.SINGLE, TriggerMode.MANUAL):
            fired = states == FIRED
            any_fired = jnp.any(fired)
            first = jnp.argmax(fired)
            idx = jnp.arange(states.shape[0])
            states = jnp.where(jnp.logical_and(any_fired, idx > first),
                               WAITING, states)
            st = jnp.where(any_fired, jnp.int32(WAITING), st)
            if bool(any_fired):
                if self.mode == TriggerMode.SINGLE:
                    self.single_lock = True
                else:
                    self.manual_allow = False
        out_state = TriggerState(prev=prev, state=st)
        return out_state, states
