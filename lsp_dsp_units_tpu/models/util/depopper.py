"""Depopper — pop suppressor: fade-in/out state machine on RMS level
thresholds (reference: src/main/util/Depopper.cpp — states
CLOSED/FADE/OPENED/WAIT, Depopper.h).

TPU decomposition of the retroactive fade-out: the forward per-sample
state machine (a scan) yields the raw gate/fade-in gain and the fall
events; the reference then writes a fade-out BACKWARD into its lookahead
gain buffer (apply_fadeout) — here that becomes a reverse-scan
"distance to next fall event", and the emitted gain (delayed by the
fade-out length, like the reference's lookahead) is
``raw_gain * fade_out_shape(distance)``.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops.sliding import sliding_sum

Array = jax.Array


class DepopperMode(enum.Enum):
    LINEAR = "linear"
    CUBIC = "cubic"
    SINE = "sine"
    GAUSSIAN = "gaussian"
    PARABOLIC = "parabolic"


def _shape(mode: DepopperMode, t: Array) -> Array:
    """Fade shape over t in [0,1] (reference Depopper::crossfade)."""
    t = jnp.clip(t, 0.0, 1.0)
    if mode == DepopperMode.LINEAR:
        return t
    if mode == DepopperMode.CUBIC:
        return t * t * (3.0 - 2.0 * t)
    if mode == DepopperMode.SINE:
        return jnp.sin(0.5 * jnp.pi * t)
    if mode == DepopperMode.GAUSSIAN:
        return 1.0 - jnp.exp(-4.0 * t * t)
    return t * (2.0 - t)   # parabolic


CLOSED, FADE, OPENED, WAIT = 0, 1, 2, 3


class DepopperState(NamedTuple):
    st: Array        # [] int32 state machine
    counter: Array   # [] int32 fade-in counter
    delay: Array     # [] int32 crossing delay
    rms_win: Array   # [R] squared-sample window
    pending: Array   # [F] delayed gain (fade-out lookahead)


class Depopper:
    def __init__(self, sample_rate: int = 48000,
                 fade_in_mode: DepopperMode = DepopperMode.LINEAR,
                 fade_in_thresh: float = 0.01, fade_in_ms: float = 50.0,
                 fade_out_mode: DepopperMode = DepopperMode.LINEAR,
                 fade_out_thresh: float = 0.005, fade_out_ms: float = 20.0,
                 fade_in_delay_ms: float = 10.0, rms_ms: float = 10.0):
        self.sample_rate = int(sample_rate)
        self.fade_in_mode = fade_in_mode
        self.fade_out_mode = fade_out_mode
        self.fade_in_thresh = float(fade_in_thresh)
        self.fade_out_thresh = float(fade_out_thresh)
        self.fade_in_n = max(1, int(sample_rate * fade_in_ms / 1000.0))
        self.fade_out_n = max(1, int(sample_rate * fade_out_ms / 1000.0))
        self.delay_n = max(1, int(sample_rate * fade_in_delay_ms / 1000.0))
        self.rms_n = max(1, int(sample_rate * rms_ms / 1000.0))

    def latency(self) -> int:
        return self.fade_out_n

    def init_state(self) -> DepopperState:
        return DepopperState(
            st=jnp.int32(CLOSED), counter=jnp.int32(0),
            delay=jnp.int32(0),
            rms_win=jnp.zeros(self.rms_n, jnp.float32),
            pending=jnp.zeros(self.fade_out_n, jnp.float32))

    def process(self, state: DepopperState, x: Array,
                ) -> Tuple[DepopperState, Array, Array]:
        """x [T] -> (state', gain [T] delayed by fade_out samples, env)."""
        t = x.shape[-1]
        # sliding RMS (reference calc_rms)
        sq = x * x
        frame = jnp.concatenate([state.rms_win, sq])
        win = sliding_sum(frame, self.rms_n, t)
        env = jnp.sqrt(jnp.maximum(win / self.rms_n, 0.0))

        fin = jnp.float32(self.fade_in_n)

        def step(carry, e):
            st, cnt, dly = carry
            is_closed = st == CLOSED
            is_fade = st == FADE
            is_open = st == OPENED
            is_wait = st == WAIT

            above_in = e >= self.fade_in_thresh
            below_out = e < self.fade_out_thresh

            # CLOSED -> FADE on threshold (reference ST_CLOSED branch)
            open_now = jnp.logical_and(is_closed, above_in)
            # FADE: counter advances; fall event if below_out persists
            dly2 = jnp.where(jnp.logical_and(is_fade, below_out),
                             dly - 1, jnp.int32(self.delay_n))
            fade_fall = jnp.logical_and(is_fade,
                                        jnp.logical_and(below_out,
                                                        dly2 <= 0))
            fade_done = jnp.logical_and(is_fade, cnt >= self.fade_in_n)
            # OPENED: fall immediately on below_out
            open_fall = jnp.logical_and(is_open, below_out)
            # WAIT: countdown to CLOSED
            wait_done = jnp.logical_and(is_wait, dly - 1 <= 0)

            fall = jnp.logical_or(fade_fall, open_fall)
            new_st = jnp.where(
                open_now, FADE,
                jnp.where(fall, WAIT,
                          jnp.where(fade_done, OPENED,
                                    jnp.where(wait_done, CLOSED, st))))
            new_cnt = jnp.where(open_now, 1,
                                jnp.where(is_fade, cnt + 1, cnt))
            new_dly = jnp.where(fall, jnp.int32(self.fade_out_n),
                                jnp.where(is_wait, dly - 1, dly2))

            # the sample that (re-)opens the gate starts the ramp at 0 —
            # cnt may still hold the previous cycle's terminal value
            eff_cnt = jnp.where(open_now, 0, cnt)
            raw = jnp.where(
                jnp.logical_or(is_fade, open_now),
                _shape(self.fade_in_mode,
                       eff_cnt.astype(jnp.float32) / fin),
                jnp.where(is_open, 1.0, 0.0))
            return (new_st.astype(jnp.int32), new_cnt, new_dly), \
                (raw, fall)

        (st, cnt, dly), (raw, falls) = jax.lax.scan(
            step, (state.st, state.counter, state.delay), env)

        # distance to the NEXT fall event (reverse cumulative)
        big = jnp.int32(2 * self.fade_out_n + t)
        idx = jnp.arange(t)
        fall_pos = jnp.where(falls, idx, big)
        next_fall = jax.lax.cummin(fall_pos[::-1])[::-1]
        dist = (next_fall - idx).astype(jnp.float32)
        fo = _shape(self.fade_out_mode,
                    jnp.clip(dist / self.fade_out_n, 0.0, 1.0))
        gain = raw * fo

        # emit with fade_out lookahead delay; a fall near the block start
        # must fade out the PENDING gains too (they were computed before
        # this fall was known): pending index j sits dist = first_fall +
        # (fade_out_n - j) samples before the fall
        fon = self.fade_out_n
        if fon and t:
            first_fall = next_fall[0].astype(jnp.float32)
            dist_p = first_fall + (fon - jnp.arange(fon,
                                                    dtype=jnp.float32))
            fo_p = _shape(self.fade_out_mode,
                          jnp.clip(dist_p / fon, 0.0, 1.0))
            pending = state.pending * fo_p
        else:
            pending = state.pending
        full = jnp.concatenate([pending, gain])
        out = full[:t]
        new_pending = full[t:]
        new_state = DepopperState(
            st=st, counter=cnt, delay=dly,
            rms_win=frame[-self.rms_n:],
            pending=new_pending)
        return new_state, out, env
