"""AutoGain and SimpleAutoGain — loudness-driven gain riders
(reference: src/main/dynamics/AutoGain.cpp, SimpleAutoGain.cpp).

AutoGain follows the reference exactly: per-sample state machine with
short/long timing loops (dB/s grow/fall factors), surge up/down flags,
an internal soft compressor curve (cubic blend between x1 and x2,
calc_compressor / eval_curve, AutoGain.cpp:169-207) and output gain
limiting.  The recurrence is state-dependent -> ``lax.scan``, vectorized
over channels.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

GAIN_AMP_M_72_DB = 10.0 ** (-72.0 / 20.0)
GAIN_AMP_P_6_DB = 10.0 ** (6.0 / 20.0)


def _calc_compressor(x1: float, x2: float, y2: float):
    """(reference AutoGain::calc_compressor)"""
    dy = y2 - x1
    dx = x2 - x1
    dx1 = 1.0 / dx
    dx2 = dx1 * dx1
    return {k: float(v) for k, v in dict(
        x1=x1, x2=x2, t=y2, d=x1, c=1.0,
        b=3.0 * dy * dx2 - 2.0 * dx1,
        a=(1.0 - 2.0 * dy * dx1) * dx2).items()}


def _eval_curve(c, x):
    v = x - c["x1"]
    # NOTE: ((a*v + b)*v + c*v) + d is quadratic, not the cubic the
    # coefficients were derived for (it does not interpolate (x2, y2)) —
    # but this reproduces the reference verbatim (AutoGain.cpp:205 uses
    # exactly this expression), so behavior parity wins over the formula.
    mid = ((c["a"] * v + c["b"]) * v + c["c"] * v) + c["d"]
    return jnp.where(x >= c["x2"], c["t"], jnp.where(x <= c["x1"], x, mid))


def _eval_gain(c, x):
    return _eval_curve(c, x) / jnp.maximum(x, 1e-18)


class AutoGainState(NamedTuple):
    gain: Array       # [...] current gain
    out_gain: Array   # [...] limiting gain
    surge_up: Array   # [...] bool
    surge_down: Array


class AutoGain:
    def __init__(self, sample_rate: int = 48000,
                 silence: float = GAIN_AMP_M_72_DB,
                 deviation: float = GAIN_AMP_P_6_DB,
                 short_grow_db_s: float = 20.0, short_fall_db_s: float = 40.0,
                 long_grow_db_s: float = 2.0, long_fall_db_s: float = 2.0,
                 max_gain: float = 10.0, use_max_gain: bool = False,
                 quick_amplifier: bool = False):
        self.sample_rate = int(sample_rate)
        self.silence = float(silence)
        self.deviation = float(deviation)
        ksr = (np.log(10.0) / 20.0) / sample_rate
        self.short_kgrow = float(np.exp(short_grow_db_s * ksr))
        self.short_kfall = float(np.exp(-short_fall_db_s * ksr))
        self.long_kgrow = float(np.exp(long_grow_db_s * ksr))
        self.long_kfall = float(np.exp(-long_fall_db_s * ksr))
        qd = np.sqrt(self.deviation)
        self.short_comp = _calc_compressor(1.0 / self.deviation,
                                           self.deviation, 1.0)
        self.out_comp = _calc_compressor(qd, self.deviation * qd,
                                         self.deviation)
        self.max_gain = float(max_gain)
        self.use_max_gain = bool(use_max_gain)
        self.quick_amp = bool(quick_amplifier)

    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> AutoGainState:
        return AutoGainState(
            gain=jnp.ones(batch_shape, jnp.float32),
            out_gain=jnp.ones(batch_shape, jnp.float32),
            surge_up=jnp.zeros(batch_shape, bool),
            surge_down=jnp.zeros(batch_shape, bool))

    def process(self, state: AutoGainState, l_long: Array, l_short: Array,
                l_exp: Array) -> Tuple[AutoGainState, Array]:
        """(state, long loudness, short loudness, expected loudness)
        [..., T] -> (state', vca gain) — reference AutoGain::process."""
        dev = self.deviation

        def step(s: AutoGainState, inp):
            sl, ss, le = inp
            nl = sl * s.gain
            ns = ss * s.gain
            # surge flag resets (reference process_sample)
            up = jnp.where(jnp.logical_and(s.surge_up, ~s.surge_down),
                           ns > le * dev, False)
            if self.quick_amp:
                down = jnp.where(jnp.logical_and(s.surge_down,
                                                 ~s.surge_up),
                                 ns * dev <= le, False)
            else:
                down = jnp.zeros_like(s.surge_down)
            red = _eval_gain(self.short_comp, ns / jnp.maximum(le, 1e-18))
            up = jnp.logical_or(up, red * dev < 1.0)
            if self.quick_amp:
                down = jnp.logical_or(down,
                                      jnp.logical_and(~up,
                                                      ns * dev <= le))
            gain = jnp.where(
                up, s.gain * self.short_kfall,
                jnp.where(down, s.gain * self.short_kgrow,
                          jnp.where(nl > le, s.gain * self.long_kfall,
                                    jnp.where(nl < le,
                                              s.gain * self.long_kgrow,
                                              s.gain))))
            red2 = _eval_gain(self.out_comp,
                              (ss * gain) / jnp.maximum(le, 1e-18))
            gain = gain * red2
            # silence: keep previous gain (reference early-return)
            silent = ss <= self.silence
            gain = jnp.where(silent, s.gain, gain)
            up = jnp.where(silent, s.surge_up, up)
            down = jnp.where(silent, s.surge_down, down)
            # gain limiting (reference apply_gain_limiting,
            # AutoGain.cpp:213-221).  NOTE reference-verbatim: with
            # F_MAX_GAIN the out_gain snaps straight back to 1.0 the
            # moment gain dips under max_gain — the smooth kgrow ramp
            # runs only with the cap DISABLED (recovery after
            # set_max_gain(off)), exactly as upstream.
            if self.use_max_gain:
                out_gain = jnp.where(gain >= self.max_gain,
                                     self.max_gain / gain, 1.0)
            else:
                out_gain = jnp.minimum(s.out_gain * self.long_kgrow, 1.0)
            vca = gain * out_gain
            return AutoGainState(gain, out_gain, up, down), vca

        xs = (jnp.moveaxis(l_long, -1, 0), jnp.moveaxis(l_short, -1, 0),
              jnp.moveaxis(jnp.broadcast_to(l_exp, l_long.shape), -1, 0))
        state, vca = jax.lax.scan(step, state, xs)
        return state, jnp.moveaxis(vca, 0, -1)


class SimpleAutoGainState(NamedTuple):
    gain: Array


class SimpleAutoGain:
    """Gain rider toward a target level with grow/fall speeds
    (reference SimpleAutoGain.cpp)."""

    def __init__(self, sample_rate: int = 48000, silence: float =
                 GAIN_AMP_M_72_DB, deviation: float = 1.0,
                 grow_db_s: float = 20.0, fall_db_s: float = 20.0,
                 min_gain: float = 0.001, max_gain: float = 1000.0):
        self.sample_rate = int(sample_rate)
        self.silence = float(silence)
        self.deviation = max(float(deviation), 1.0)
        ksr = (np.log(10.0) / 20.0) / sample_rate
        self.kgrow = float(np.exp(grow_db_s * ksr))
        self.kfall = float(np.exp(-fall_db_s * ksr))
        self.min_gain = float(min_gain)
        self.max_gain = float(max_gain)

    def init_state(self, batch_shape: Tuple[int, ...] = (),
                   ) -> SimpleAutoGainState:
        return SimpleAutoGainState(gain=jnp.ones(batch_shape, jnp.float32))

    def process(self, state: SimpleAutoGainState, level: Array,
                target: Array) -> Tuple[SimpleAutoGainState, Array]:
        def step(g, inp):
            lv, tg = inp
            nl = lv * g
            grow = nl * self.deviation < tg
            fall = nl > tg * self.deviation
            ng = jnp.where(lv <= self.silence, g,
                           jnp.where(grow, g * self.kgrow,
                                     jnp.where(fall, g * self.kfall, g)))
            ng = jnp.clip(ng, self.min_gain, self.max_gain)
            return ng, ng

        xs = (jnp.moveaxis(level, -1, 0),
              jnp.moveaxis(jnp.broadcast_to(target, level.shape), -1, 0))
        g, gains = jax.lax.scan(step, state.gain, xs)
        return SimpleAutoGainState(gain=g), jnp.moveaxis(gains, 0, -1)
