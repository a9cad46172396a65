"""PeakMeter (peak + hold + release decay) and Panometer (pan position)
(reference: src/main/meters/PeakMeter.cpp, Panometer.cpp).
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops.sliding import sliding_sum

Array = jax.Array


class PeakMeterState(NamedTuple):
    peak: Array      # [...]
    counter: Array   # [...] int32 hold countdown


class PeakMeter:
    """Peak detector with hold and exponential release
    (reference PeakMeter.cpp:101-150 update/process semantics)."""

    def __init__(self, sample_rate: int = 48000, hold_ms: float = 500.0,
                 release_ms: float = 1000.0):
        self.sample_rate = int(sample_rate)
        self.hold = max(0, int(sample_rate * hold_ms / 1000.0))
        rel_samples = max(sample_rate * release_ms / 1000.0, 1.0)
        self.tau = float(np.exp(np.log(1.0 - np.sqrt(0.5)) / rel_samples))

    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> PeakMeterState:
        return PeakMeterState(peak=jnp.zeros(batch_shape, jnp.float32),
                              counter=jnp.zeros(batch_shape, jnp.int32))

    def process(self, state: PeakMeterState, x: Array,
                ) -> Tuple[PeakMeterState, Array]:
        """x [..., T] -> per-sample held peak [..., T]."""

        def step(s: PeakMeterState, xt):
            # reference PeakMeter.cpp:130-149: the release branch decays
            # UNCONDITIONALLY (peak *= tau, no clamp at the current
            # sample); the input only re-latches via the rising branch
            # on a subsequent sample once the decayed peak falls to it
            a = jnp.abs(xt)
            rising = a >= s.peak
            holding = s.counter > 0
            new_peak = jnp.where(rising, a,
                                 jnp.where(holding, s.peak,
                                           s.peak * self.tau))
            new_cnt = jnp.where(rising, self.hold,
                                jnp.maximum(s.counter - 1, 0))
            return PeakMeterState(new_peak, new_cnt), new_peak

        xs = jnp.moveaxis(x, -1, 0)
        state, ys = jax.lax.scan(step, state, xs)
        return state, jnp.moveaxis(ys, 0, -1)


class PanLaw(enum.Enum):
    LINEAR = "linear"
    EQUAL_POWER = "equal_power"


class PanometerState(NamedTuple):
    win_a: Array    # [N] squared-sample windows
    win_b: Array


class Panometer:
    """Pan position estimate between two channels over a sliding window
    (reference Panometer.cpp:131-186): pan = sr/(sl+sr) with sl/sr the
    windowed energies (sqrt'ed for the LINEAR pan law)."""

    def __init__(self, period: int, law: PanLaw = PanLaw.LINEAR,
                 default: float = 0.5):
        self.period = int(period)
        self.law = law
        self.default = float(default)

    def init_state(self) -> PanometerState:
        return PanometerState(
            win_a=jnp.zeros(self.period, jnp.float32),
            win_b=jnp.zeros(self.period, jnp.float32))

    def process(self, state: PanometerState, a: Array, b: Array,
                ) -> Tuple[PanometerState, Array]:
        n = self.period
        t = a.shape[-1]
        fa = jnp.concatenate([state.win_a, a * a], axis=-1)
        fb = jnp.concatenate([state.win_b, b * b], axis=-1)
        va = sliding_sum(fa, n, t) / n
        vb = sliding_sum(fb, n, t) / n
        if self.law == PanLaw.LINEAR:
            sl = jnp.sqrt(jnp.abs(va))
            sr = jnp.sqrt(jnp.abs(vb))
            eps = 1e-18
        else:
            sl, sr = jnp.abs(va), jnp.abs(vb)
            eps = 1e-36
        den = sl + sr
        pan = jnp.where(den > eps, sr / jnp.maximum(den, eps),
                        self.default)
        return PanometerState(win_a=fa[-n:], win_b=fb[-n:]), pan
