"""Oscillator — band-limited function generator with a 32-bit phase
accumulator (reference: src/main/util/Oscillator.cpp,
include/.../util/Oscillator.h ``phacc_t``).

TPU shape: the phase accumulator is CLOSED FORM over a block
(``phase[n] = phase0 + n * step mod 2^32`` — uint32 wrapemulated), so a
whole block of any waveform is one elementwise pass; band-limited
variants render the naive wave at an oversampled rate and decimate
through the Oversampler's anti-alias filter (the reference couples to
its Oversampler the same way).
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.util.oversampler import Oversampler

Array = jax.Array

_PHASE_SCALE = 1.0 / 4294967296.0   # 2^-32


class FunctionGenerator(enum.Enum):
    SINE = "sine"
    COSINE = "cosine"
    SQUARED_SINE = "squared_sine"
    SQUARED_COSINE = "squared_cosine"
    RECTANGULAR = "rectangular"
    SAWTOOTH = "sawtooth"
    TRAPEZOID = "trapezoid"
    PULSETRAIN = "pulsetrain"
    PARABOLIC = "parabolic"
    BL_RECTANGULAR = "bl_rectangular"
    BL_SAWTOOTH = "bl_sawtooth"
    BL_TRAPEZOID = "bl_trapezoid"
    BL_PULSETRAIN = "bl_pulsetrain"
    BL_PARABOLIC = "bl_parabolic"


class OscillatorState(NamedTuple):
    phase: Array    # [] uint32 phase accumulator
    ovs: object     # oversampler state (BL modes)


def _wave(p: Array, kind: FunctionGenerator, duty: float, width: float,
          raise_ratio: float, fall_ratio: float) -> Array:
    """Evaluate the naive waveform at normalized phase p in [0,1)."""
    tau = 2.0 * jnp.pi
    if kind in (FunctionGenerator.SINE,):
        return jnp.sin(tau * p)
    if kind == FunctionGenerator.COSINE:
        return jnp.cos(tau * p)
    if kind == FunctionGenerator.SQUARED_SINE:
        s = jnp.sin(tau * p)
        return s * jnp.abs(s)     # sign-preserving square (reference)
    if kind == FunctionGenerator.SQUARED_COSINE:
        s = jnp.cos(tau * p)
        return s * jnp.abs(s)
    if kind in (FunctionGenerator.RECTANGULAR,
                FunctionGenerator.BL_RECTANGULAR):
        return jnp.where(p < duty, 1.0, -1.0)
    if kind in (FunctionGenerator.SAWTOOTH, FunctionGenerator.BL_SAWTOOTH):
        w = max(width, 1e-6)
        up = p / w
        dn = (1.0 - p) / max(1.0 - w, 1e-6)
        return jnp.where(p < w, up, dn) * 2.0 - 1.0
    if kind in (FunctionGenerator.TRAPEZOID, FunctionGenerator.BL_TRAPEZOID):
        r = max(raise_ratio * 0.5, 1e-6)
        f = max(fall_ratio * 0.5, 1e-6)
        # piecewise over half-periods: ramp up r, flat, ramp down f ...
        h = jnp.where(p < 0.5, p * 2.0, (p - 0.5) * 2.0)
        sgn = jnp.where(p < 0.5, 1.0, -1.0)
        up = h / r
        dn = (1.0 - h) / f
        mag = jnp.clip(jnp.minimum(up, dn), 0.0, 1.0)
        return sgn * mag
    if kind in (FunctionGenerator.PULSETRAIN,
                FunctionGenerator.BL_PULSETRAIN):
        pos = p < (duty * 0.5)
        neg = jnp.logical_and(p >= 0.5, p < 0.5 + duty * 0.5)
        return jnp.where(pos, 1.0, jnp.where(neg, -1.0, 0.0))
    if kind in (FunctionGenerator.PARABOLIC, FunctionGenerator.BL_PARABOLIC):
        w = max(width, 1e-6)
        t = jnp.clip(p / w, 0.0, 1.0)
        return jnp.where(p < w, 4.0 * t * (1.0 - t), 0.0) * 2.0 - 1.0
    return jnp.zeros_like(p)


class Oscillator:
    def __init__(self, sample_rate: int = 48000,
                 function: FunctionGenerator = FunctionGenerator.SINE,
                 frequency: float = 440.0, amplitude: float = 1.0,
                 dc_offset: float = 0.0, initial_phase: float = 0.0,
                 duty_ratio: float = 0.5, width: float = 0.5,
                 raise_ratio: float = 0.25, fall_ratio: float = 0.25,
                 oversampling: int = 8):
        self.sample_rate = int(sample_rate)
        self.function = function
        self.frequency = float(frequency)
        self.amplitude = float(amplitude)
        self.dc_offset = float(dc_offset)
        self.duty_ratio = float(duty_ratio)
        self.width = float(width)
        self.raise_ratio = float(raise_ratio)
        self.fall_ratio = float(fall_ratio)
        self.band_limited = function.value.startswith("bl_")
        self.ratio = oversampling if self.band_limited else 1
        self.ovs = Oversampler(sample_rate, ratio=self.ratio,
                               quality="16bit", filtering=True) \
            if self.band_limited else None
        self.initial_phase = float(initial_phase)
        # 32-bit phase step (reference phacc_t semantics)
        rate = self.sample_rate * self.ratio
        self.step = np.uint32(round(self.frequency / rate * 4294967296.0)
                              % 4294967296)

    def init_state(self) -> OscillatorState:
        ph = np.uint32(round((self.initial_phase / (2.0 * np.pi))
                             * 4294967296.0) % 4294967296)
        return OscillatorState(
            phase=jnp.uint32(ph),
            ovs=self.ovs.init_state() if self.ovs is not None else ())

    def process(self, state: OscillatorState, count: int,
                ) -> Tuple[OscillatorState, Array]:
        """Generate ``count`` samples (closed-form phase accumulator)."""
        n_hi = count * self.ratio
        idx = jnp.arange(n_hi, dtype=jnp.uint32)
        phases = state.phase + idx * jnp.uint32(self.step)
        p = phases.astype(jnp.float32) * _PHASE_SCALE
        y = _wave(p, self.function, self.duty_ratio, self.width,
                  self.raise_ratio, self.fall_ratio)
        new_phase = state.phase + jnp.uint32(n_hi) * jnp.uint32(self.step)
        if self.ovs is not None:
            ovs_state, y = self.ovs.downsample(state.ovs, y)
        else:
            ovs_state = state.ovs
        y = y * self.amplitude + self.dc_offset
        return OscillatorState(phase=new_phase, ovs=ovs_state), y

    def process_add(self, state, x):
        state, y = self.process(state, x.shape[-1])
        return state, x + y

    def process_mul(self, state, x):
        state, y = self.process(state, x.shape[-1])
        return state, x * y
