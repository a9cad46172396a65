"""Depopper — pop suppressor: fade-in/out state machine on RMS level
thresholds (reference: src/main/util/Depopper.cpp — states
CLOSED/FADE/OPENED/WAIT, Depopper.h).

Exact reference semantics (parity: tests/test_reference_oracle_wave3.py):

- env = sliding RMS over ``rms_ms`` INCLUDING the current sample
  (Depopper::calc_rms, Depopper.cpp:528-548).
- Forward state machine (Depopper.cpp:550-640): CLOSED opens on
  env >= fade-in threshold and ramps the fade-in crossfade; a fall-off
  (env < fade-out threshold for ``fade_in_delay`` consecutive samples in
  FADE, or immediately in OPENED) triggers a RETROACTIVE fade-out patch
  written backward into the lookahead gain buffer (apply_fadeout,
  Depopper.cpp:503-526), then WAIT (-> CLOSED after ``fade_out_delay``).
- The patch multiplies the previous ``L = min(counter, fade_out_n)``
  gains by the TAIL of the descending fade-out curve
  (``crossfade(fade_out, n_out + rms_n - d)`` at distance d from the
  fall), zeroes the ``rms_n`` samples right before the fall (the RMS
  detection lag), and zeroes the fall sample itself.
- The emitted gain is delayed by ``lookcount = fade_out_n + rms_n``
  samples (the reference's ``dsp::copy(gain, &gbuf[-nLookCount], ...)``).

TPU decomposition: the per-sample machine is a ``lax.scan`` emitting raw
gains + fall events with their patch length; the retroactive patch
becomes a reverse-cummin "distance to next fall" vector pass.  With
several falls inside one patch window the reference multiplies ALL of
their patches; this pass applies the NEAREST fall's patch only —
identical whenever falls are at least ``fade_out_n + rms_n`` samples
apart (NOTE reference-verbatim divergence, pathological-input only).
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
    LINEAR = 0
    CUBIC = 1
    SINE = 2
    GAUSSIAN = 3
    PARABOLIC = 4


def _crossfade(mode: DepopperMode, n: int, is_in: bool, x: Array) -> Array:
    """reference Depopper::crossfade over the calc_fade polynomials
    (Depopper.cpp:386-501): x in samples, 0 below 0, 1 at/after n."""
    k = 1.0 / n if n > 0 else 0.0
    xf = x.astype(jnp.float32)
    if mode == DepopperMode.LINEAR:
        g = k * xf if is_in else 1.0 - k * xf
    elif mode == DepopperMode.CUBIC:
        g = (3.0 * k * k) * xf * xf + (-2.0 * k ** 3) * xf * xf * xf
        if not is_in:
            g = 1.0 - g
    elif mode == DepopperMode.SINE:
        ph = (np.pi * 0.5 * k) * xf + (0.0 if is_in else np.pi / 2)
        s = jnp.sin(ph)
        g = s * s
    elif mode == DepopperMode.GAUSSIAN:
        f0 = float(np.exp(-16.0))
        u = (4.0 * k) * xf + (-4.0 if is_in else 0.0)
        g = jnp.exp(-u * u) * (1.0 / (1.0 - f0)) - f0
    else:  # PARABOLIC
        if is_in:
            g = (k * xf) ** 2
        else:
            g = 1.0 + (-2.0 * k) * xf + (k * xf) ** 2
    return jnp.where(x < 0, 0.0, jnp.where(x >= n, 1.0, g))


CLOSED, FADE, OPENED, WAIT = 0, 1, 2, 3


class DepopperState(NamedTuple):
    st: Array        # [] int32 state machine
    counter: Array   # [] int32 samples since gate opened (capped)
    delay: Array     # [] int32 fall-off / wait countdown
    rms_win: Array   # [R] squared-sample window
    pending: Array   # [lookcount] delayed raw gain


class Depopper:
    def __init__(self, sample_rate: int = 48000,
                 fade_in_mode: DepopperMode = DepopperMode.LINEAR,
                 fade_in_thresh: float = 0.01, fade_in_ms: float = 50.0,
                 fade_out_mode: DepopperMode = DepopperMode.LINEAR,
                 fade_out_thresh: float = 0.005, fade_out_ms: float = 20.0,
                 fade_in_delay_ms: float = 10.0,
                 fade_out_delay_ms: float = 0.0, rms_ms: float = 10.0):
        self.sample_rate = int(sample_rate)
        self.fade_in_mode = fade_in_mode
        self.fade_out_mode = fade_out_mode
        self.fade_in_thresh = float(fade_in_thresh)
        self.fade_out_thresh = float(fade_out_thresh)
        ms = lambda v: int(np.float32(v) * np.float32(0.001)
                           * np.float32(sample_rate))
        self.fade_in_n = ms(fade_in_ms)
        self.fade_out_n = ms(fade_out_ms)
        self.in_delay_n = ms(fade_in_delay_ms)
        self.out_delay_n = ms(fade_out_delay_ms)
        self.rms_n = max(1, ms(rms_ms))
        self.lookcount = self.fade_out_n + self.rms_n

    def latency(self) -> int:
        return self.lookcount

    def init_state(self) -> DepopperState:
        return DepopperState(
            st=jnp.int32(CLOSED), counter=jnp.int32(0),
            delay=jnp.int32(0),
            rms_win=jnp.zeros(self.rms_n, jnp.float32),
            pending=jnp.zeros(self.lookcount, jnp.float32))

    def process(self, state: DepopperState, x: Array,
                ) -> Tuple[DepopperState, Array, Array]:
        """x [T] -> (state', gain [T] delayed by lookcount, env [T])."""
        t = x.shape[-1]
        # sliding RMS including the current sample (reference calc_rms)
        sq = x * x
        frame = jnp.concatenate([state.rms_win, sq])
        win = sliding_sum(frame, self.rms_n, t)
        env = jnp.sqrt(jnp.maximum(win, 0.0) / self.rms_n)

        n_in = self.fade_in_n
        n_out = self.fade_out_n

        def step(carry, e):
            st, cnt, dly = carry
            is_closed = st == CLOSED
            is_fade = st == FADE
            is_open = st == OPENED
            is_wait = st == WAIT

            above_in = e >= self.fade_in_thresh
            below_out = e < self.fade_out_thresh

            # CLOSED -> FADE (Depopper.cpp ST_CLOSED branch)
            open_now = jnp.logical_and(is_closed, above_in)
            # OPENED: counter caps at fade_out_n (ST_OPENED increment)
            cnt1 = jnp.where(is_open & (cnt < n_out), cnt + 1, cnt)
            cnt1 = jnp.where(open_now, 1, cnt1)       # nCounter=0; ++ emit
            cnt1 = jnp.where(is_fade, cnt + 1, cnt1)  # crossfade(nCounter++)

            # FADE fall-off: consecutive below-threshold countdown seeded
            # with the FADE-IN delay (ST_FADE branch)
            dly_f = jnp.where(below_out, dly - 1, jnp.int32(self.in_delay_n))
            fade_fall = is_fade & below_out & (dly_f <= 0)
            # completion is only checked when NOT below the fall-off
            # threshold (reference ST_FADE else-branch)
            fade_done = is_fade & ~below_out & (cnt1 >= n_in)
            open_fall = is_open & below_out
            fall = fade_fall | open_fall
            wait_done = is_wait & (dly - 1 <= 0)

            new_st = jnp.where(
                open_now, FADE,
                jnp.where(fall, WAIT,
                          jnp.where(fade_done, OPENED,
                                    jnp.where(wait_done, CLOSED, st))))
            # WAIT countdown: fade-out delay after an OPENED fall; the
            # already-expired fade-in countdown after a FADE fall
            new_dly = jnp.where(
                open_fall, jnp.int32(self.out_delay_n),
                jnp.where(is_fade, dly_f,
                          jnp.where(open_now, jnp.int32(self.in_delay_n),
                                    jnp.where(is_wait, dly - 1, dly))))
            # patch length at a fall (apply_fadeout's `samples` cap)
            patch_l = jnp.where(fall, jnp.minimum(cnt1, n_out), 0)

            raw = jnp.where(
                is_fade | open_now,
                _crossfade(self.fade_in_mode, n_in, True,
                           jnp.where(open_now, 0, cnt)),
                jnp.where(is_open, 1.0, 0.0))
            return (new_st.astype(jnp.int32), cnt1.astype(jnp.int32),
                    new_dly.astype(jnp.int32)), (raw, fall, patch_l)

        (st, cnt, dly), (raw, falls, patch_ls) = jax.lax.scan(
            step, (state.st, state.counter, state.delay), env)

        # nearest next fall + its patch length (reverse cummin pairs)
        big = jnp.int32(t + 2 * self.lookcount + 2)
        idx = jnp.arange(t, dtype=jnp.int32)
        fall_pos = jnp.where(falls, idx, big).astype(jnp.int32)
        # carry (pos, L) of the nearest later fall
        def rstep(carry, inp):
            pos, lcur = carry
            p, l = inp
            take = p < pos
            return (jnp.where(take, p, pos), jnp.where(take, l, lcur)), \
                (jnp.where(take, p, pos), jnp.where(take, l, lcur))
        (_, _), (next_fall, next_l) = jax.lax.scan(
            rstep, (big, jnp.int32(0)),
            (fall_pos[::-1], patch_ls[::-1].astype(jnp.int32)))
        next_fall = next_fall[::-1]
        next_l = next_l[::-1]

        def patch_mult(d, l):
            """multiplier at distance d (= fall_idx - pos) from the fall
            with patch length l: 0 for d <= rms_n, the fade-out curve
            tail for rms_n < d <= rms_n + l, 1 beyond."""
            xf = n_out + self.rms_n - d
            m = _crossfade(self.fade_out_mode, n_out, False, xf)
            m = jnp.where(d <= self.rms_n, 0.0, m)
            return jnp.where(d > self.rms_n + l, 1.0, m)

        gain = raw * patch_mult(next_fall - idx, next_l)

        # a fall near the block start also patches the PENDING gains
        lc = self.lookcount
        if lc and t:
            # only the first in-block fall can reach back into pending
            # (patch extent <= lookcount; falls behind the previous
            # block's falls were patched when they were seen)
            first = next_fall[0]
            lfirst = next_l[0]
            p_idx = jnp.arange(lc)
            d_p = first + (lc - p_idx)
            pending = state.pending * patch_mult(d_p, lfirst)
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
