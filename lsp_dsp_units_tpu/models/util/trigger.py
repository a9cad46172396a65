"""Trigger — signal edge trigger with single/manual/repeat modes and
hysteresis (reference: src/main/util/Trigger.cpp,
include/.../util/Trigger.h trg_mode_t/trg_type_t/trg_locks_t).

Exact reference semantics (Trigger.cpp:80-215, parity:
tests/test_reference_oracle_wave3.py):

- SIMPLE_RISING fires on EVERY sample with positive slope at/above the
  threshold once the hold time elapsed — not just the crossing sample
  (Trigger.cpp:104-119); SIMPLE_FALLING mirrors it.
- ADVANCED types use a window [threshold - hysteresis, threshold +
  hysteresis]: arm on the upward crossing of the lower bound (while
  still below the center), fire on the upward crossing of the upper
  bound, disarm when the signal returns below the lower bound
  (Trigger.cpp:138-177).  The ARMED state is visible in the output.
- NONE fires unconditionally every ``hold_samples`` samples.
- A fire resets the hold counter; the counter advances every sample.
- SINGLE mode latches after one fire until reset_single_trigger();
  MANUAL fires once per activate_manual_trigger().

The per-sample machine runs as a ``lax.scan`` (channels would batch via
vmap); the one-shot locks are carried IN the scan so post-fire samples
inside the same block read WAITING, exactly like the reference's
in-loop lock checks.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class TriggerMode(enum.Enum):
    SINGLE = 0
    MANUAL = 1
    REPEAT = 2


class TriggerType(enum.Enum):
    NONE = 0
    SIMPLE_RISING_EDGE = 1
    SIMPLE_FALLING_EDGE = 2
    ADVANCED_RISING_EDGE = 3
    ADVANCED_FALLING_EDGE = 4


WAITING, ARMED, FIRED = 0, 1, 2


class TriggerState(NamedTuple):
    prev: Array      # [] previous sample (fPrevious)
    state: Array     # [] int32 trg_state (persists ARMED for advanced)
    hold_cnt: Array  # [] int32 nTriggerHoldCounter
    disarm: Array    # [] bool bDisarm (advanced types)
    locked: Array    # [] bool single/manual lock (blocks firing)


class Trigger:
    def __init__(self, ttype: TriggerType = TriggerType.SIMPLE_RISING_EDGE,
                 mode: TriggerMode = TriggerMode.REPEAT,
                 threshold: float = 0.0, hysteresis: float = 0.0,
                 hold_samples: int = 0):
        self.ttype = ttype
        self.mode = mode
        self.threshold = float(threshold)
        self.hysteresis = abs(float(hysteresis))
        self.hold = int(hold_samples)
        # host mirrors of the lock state (reference trg_locks_t)
        self.single_lock = False
        self.manual_allow = False
        self.manual_lock = False

    def init_state(self) -> TriggerState:
        return TriggerState(prev=jnp.float32(0.0),
                            state=jnp.int32(WAITING),
                            hold_cnt=jnp.int32(0),
                            disarm=jnp.asarray(False),
                            locked=jnp.asarray(self._host_locked()))

    # -- control (reference trg_locks_t handling) --------------------------
    def reset_single_trigger(self) -> None:
        self.single_lock = False

    def activate_manual_trigger(self) -> None:
        self.manual_allow = True
        self.manual_lock = False

    def _host_locked(self) -> bool:
        if self.mode == TriggerMode.SINGLE:
            return self.single_lock
        if self.mode == TriggerMode.MANUAL:
            return (not self.manual_allow) or self.manual_lock
        return False

    def process(self, state: TriggerState, x: Array,
                ) -> Tuple[TriggerState, Array]:
        """x [T] -> per-sample trigger state (0 wait / 1 armed / 2 fired)
        (reference Trigger::single_sample_processor streamed)."""
        th = self.threshold
        lower = th - self.hysteresis
        upper = th + self.hysteresis
        hold = self.hold
        one_shot = self.mode in (TriggerMode.SINGLE, TriggerMode.MANUAL)
        ttype = self.ttype
        # the lock may have been changed host-side since the last block
        state = state._replace(locked=jnp.asarray(self._host_locked()))

        def step(carry, xt):
            prev, st, cnt, disarm, locked = carry
            diff = xt - prev
            hold_ok = cnt >= hold

            if ttype == TriggerType.NONE:
                fire = hold_ok
                new_st = jnp.where(fire, FIRED, WAITING)
                new_disarm = disarm
            elif ttype in (TriggerType.SIMPLE_RISING_EDGE,
                           TriggerType.SIMPLE_FALLING_EDGE):
                if ttype == TriggerType.SIMPLE_RISING_EDGE:
                    fire = (diff > 0.0) & (xt >= th) & hold_ok
                else:
                    fire = (diff < 0.0) & (xt <= th) & hold_ok
                # the reference's else-branch demotes ARMED to WAITING:
                # simple types never expose ARMED (Trigger.cpp:104-135)
                new_st = jnp.where(fire, FIRED, WAITING)
                new_disarm = disarm
            else:
                rising = ttype == TriggerType.ADVANCED_RISING_EDGE
                st1 = jnp.where(disarm, WAITING, st)
                if rising:
                    arm = ((diff > 0.0) & (xt >= lower) & (prev < lower)
                           & (xt < th) & hold_ok)
                    firec = ((diff > 0.0) & (xt >= upper) & (prev < upper))
                    out_of_band = xt < lower
                else:
                    arm = ((diff < 0.0) & (xt <= upper) & (prev > upper)
                           & (xt > th) & hold_ok)
                    firec = ((diff < 0.0) & (xt <= lower) & (prev > lower))
                    out_of_band = xt > upper
                st2 = jnp.where(arm, ARMED, st1)
                fire = (st2 == ARMED) & firec
                new_st = jnp.where(fire, FIRED, st2)
                new_disarm = fire | out_of_band

            # a held lock is an EARLY RETURN in the reference: the state
            # reads WAITING and prev/hold/disarm all freeze
            # (Trigger.cpp:82-98)
            fire = fire & ~locked
            out_st = jnp.where(locked, WAITING, new_st)
            new_locked = locked | (fire if one_shot else False)
            new_cnt = jnp.where(fire, 0, cnt) + 1
            keep = lambda new, old: jnp.where(locked, old, new)
            # enTriggerState itself IS written to WAITING before the
            # early return, so the carried state is out_st
            return (keep(xt, prev), out_st.astype(jnp.int32),
                    keep(new_cnt, cnt).astype(jnp.int32),
                    keep(new_disarm, disarm), new_locked), \
                out_st.astype(jnp.int32)

        carry, states = jax.lax.scan(
            step, (state.prev, state.state, state.hold_cnt,
                   state.disarm, state.locked), x)
        prev, st, cnt, disarm, locked = carry
        if one_shot and bool(locked):
            if self.mode == TriggerMode.SINGLE:
                self.single_lock = True
            else:
                self.manual_allow = False
                self.manual_lock = True
        return TriggerState(prev=prev, state=st, hold_cnt=cnt,
                            disarm=disarm, locked=locked), states
