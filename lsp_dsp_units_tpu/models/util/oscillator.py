"""Oscillator — band-limited function generator with a 32-bit phase
accumulator (reference: src/main/util/Oscillator.cpp,
include/.../util/Oscillator.h ``phacc_t``).

Exact reference semantics (parity: tests/test_reference_oracle_wave3.py):
control words are computed exactly like ``update_settings``
(Oscillator.cpp:151-357 — duty/width/points words on the 2^32 scale,
float32 coefficient math, truncating conversions), and each waveform is
the vectorized form of ``do_process``'s integer-comparison ladder
(Oscillator.cpp:359-700).  Band-limited variants synthesize the naive
wave at the oversampled rate with the INTEGER-DIVIDED control word and a
mode-specific peak attenuation multiplying the whole wave+DC, then
decimate through the Oversampler's AA filter — the reference's own BL
mechanics.

TPU shape: the phase accumulator is CLOSED FORM over a block
(``phase[n] = phase0 + n * step mod 2^32`` in uint32), so a whole block
of any waveform is one elementwise pass.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.util.oversampler import Oversampler

Array = jax.Array

_TWO32 = 4294967296.0
_ACC2PHASE = np.float32(2.0 * np.pi / _TWO32)


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


class DCReference(enum.Enum):
    WAVEDC = "wavedc"   # DC offset rides on the wave's own DC (default)
    ZERO = "zero"       # wave re-centered to zero mean first


class OscillatorState(NamedTuple):
    phase: Array    # [] uint32 phase accumulator
    ovs: object     # oversampler state (BL modes)


def _word(x: float) -> np.uint32:
    """Truncating float -> phacc_t conversion (C++ assignment)."""
    return np.uint32(np.uint64(max(0.0, min(float(x), _TWO32 - 1.0))))


class Oscillator:
    def __init__(self, sample_rate: int = 48000,
                 function: FunctionGenerator = FunctionGenerator.SINE,
                 frequency: float = 440.0, amplitude: float = 1.0,
                 dc_offset: float = 0.0, initial_phase: float = 0.0,
                 dc_reference: DCReference = DCReference.WAVEDC,
                 duty_ratio: float = 0.5, width: float = 1.0,
                 raise_ratio: float = 0.25, fall_ratio: float = 0.25,
                 pos_width_ratio: float = 0.0,
                 neg_width_ratio: float = 0.0,
                 parabolic_width: float = 0.0,
                 invert: bool = False,
                 oversampling: int = 8, quality: str = "16bit"):
        self.sample_rate = int(sample_rate)
        self.function = function
        self.frequency = float(frequency)
        self.amplitude = np.float32(amplitude)
        self.dc_offset = np.float32(dc_offset)
        self.dc_reference = dc_reference
        self.duty_ratio = np.float32(duty_ratio)
        self.width = np.float32(width)
        self.raise_ratio = np.float32(raise_ratio)
        self.fall_ratio = np.float32(fall_ratio)
        self.pos_width_ratio = np.float32(pos_width_ratio)
        self.neg_width_ratio = np.float32(neg_width_ratio)
        self.parabolic_width = np.float32(parabolic_width)
        self.invert = bool(invert)
        self.band_limited = function.value.startswith("bl_")
        self.ratio = int(oversampling) if self.band_limited else 1
        self.ovs = Oversampler(sample_rate, ratio=self.ratio,
                               quality=quality, filtering=True) \
            if self.band_limited else None
        self.initial_phase = float(initial_phase)

        # control words (update_settings, Oscillator.cpp:151-357):
        # double math, truncating stores
        self.freq_word = _word(_TWO32 * self.frequency / self.sample_rate)
        # BL synthesis runs at the oversampled rate with the INTEGER-
        # DIVIDED word (nFreqCtrlWord / nOversampling)
        self.step = np.uint32(int(self.freq_word) // self.ratio)
        self._configure()

    # -- per-function word/coefficient setup --------------------------------
    def _configure(self) -> None:
        f32 = np.float32
        a = self.amplitude
        fn = self.function
        self.ref_dc = self.dc_offset
        self.peak_atten = f32(1.0)
        two32 = f32(_TWO32)

        if fn in (FunctionGenerator.SQUARED_SINE,
                  FunctionGenerator.SQUARED_COSINE):
            self.sq_amp = f32(-a if self.invert else a)
            wave_dc = f32(0.5) * self.sq_amp
            if self.dc_reference == DCReference.ZERO:
                self.ref_dc = self.dc_offset - wave_dc
        elif fn in (FunctionGenerator.RECTANGULAR,
                    FunctionGenerator.BL_RECTANGULAR):
            self.duty_word = np.uint32(0xffffffff) \
                if self.duty_ratio == 1.0 \
                else _word(self.duty_ratio * two32)
            wave_dc = a * (f32(2.0) * self.duty_ratio - f32(1.0))
            if self.dc_reference == DCReference.ZERO:
                self.ref_dc = self.dc_offset - wave_dc
            self.peak_atten = f32(0.6)
        elif fn in (FunctionGenerator.SAWTOOTH,
                    FunctionGenerator.BL_SAWTOOTH):
            w = np.uint32(0xffffffff) if self.width == 1.0 \
                else _word(self.width * two32)
            self.width_word = w
            self.saw_c = (f32(2.0) * a / f32(w),
                          f32(-a),
                          (f32(-2.0) * a) / (two32 - f32(w)),
                          a * (two32 + f32(w)) / (two32 - f32(w)))
            if self.width > 0.60:
                self.peak_atten = f32(0.64) / f32(0.4) - self.width
            elif self.width < 0.40:
                self.peak_atten = self.width + f32(0.6)
        elif fn in (FunctionGenerator.TRAPEZOID,
                    FunctionGenerator.BL_TRAPEZOID):
            half = f32(0.5) * two32
            p0 = _word(self.raise_ratio * half)
            p1 = _word((f32(1.0) - self.fall_ratio) * half)
            p2 = np.uint32(0xffffffff) if self.fall_ratio >= 1.0 \
                else _word((f32(1.0) + self.fall_ratio) * half)
            p3 = _word((f32(2.0) - self.raise_ratio) * half) \
                if self.raise_ratio > 0.0 else np.uint32(0xffffffff)
            self.trap_p = (p0, p1, p2, p3)
            self.trap_c = (a / f32(p0),
                           f32(-2.0) * a / (f32(p2) - f32(p1)),
                           a / self.fall_ratio,
                           f32(-2.0) * a / self.raise_ratio)
            # sTrapezoid.fBLPeakAtten (Oscillator.cpp:273-277)
            mn = min(float(self.raise_ratio), float(self.fall_ratio))
            self.peak_atten = f32(mn + 0.6) if mn < 0.4 else f32(1.0)
        elif fn in (FunctionGenerator.PULSETRAIN,
                    FunctionGenerator.BL_PULSETRAIN):
            half = f32(0.5) * two32
            t0 = _word(self.pos_width_ratio * half)
            t1 = _word(half)
            t2 = np.uint32(0xffffffff) if self.neg_width_ratio == 1.0 \
                else _word((f32(1.0) + self.neg_width_ratio) * half)
            self.pulse_p = (t0, t1, t2)
            wave_dc = f32(0.5) * a * (self.pos_width_ratio
                                      - self.neg_width_ratio)
            if self.dc_reference == DCReference.ZERO:
                self.ref_dc = self.dc_offset - wave_dc
            mx = max(float(self.pos_width_ratio),
                     float(self.neg_width_ratio))
            self.peak_atten = f32(0.6) if mx > 0.5 \
                else f32(1.0 / np.sqrt(2.0))
        elif fn in (FunctionGenerator.PARABOLIC,
                    FunctionGenerator.BL_PARABOLIC):
            self.par_amp = f32(-a if self.invert else a)
            w = np.uint32(0xffffffff) if self.parabolic_width == 1.0 \
                else _word(self.parabolic_width * two32)
            self.par_word = w
            wave_dc = f32(2.0) * self.par_amp * self.parabolic_width \
                / f32(3.0)
            if self.dc_reference == DCReference.ZERO:
                self.ref_dc = self.dc_offset - wave_dc

    # -- waveform evaluation (do_process ladder) -----------------------------
    def _wave(self, acc: Array) -> Array:
        """acc: uint32 phase words -> samples INCLUDING the referenced
        DC (reference do_process, Oscillator.cpp:359-700)."""
        fn = self.function
        a = self.amplitude
        dc = self.ref_dc
        ph = acc.astype(jnp.float32) * _ACC2PHASE
        if fn == FunctionGenerator.SINE:
            return a * jnp.sin(ph) + dc
        if fn == FunctionGenerator.COSINE:
            return a * jnp.cos(ph) + dc
        if fn == FunctionGenerator.SQUARED_SINE:
            x = jnp.sin(jnp.float32(0.5) * ph)
            return self.sq_amp * x * x + dc
        if fn == FunctionGenerator.SQUARED_COSINE:
            x = jnp.cos(jnp.float32(0.5) * ph)
            return self.sq_amp * x * x + dc
        if fn in (FunctionGenerator.RECTANGULAR,
                  FunctionGenerator.BL_RECTANGULAR):
            return jnp.where(acc < self.duty_word, a, -a) + dc
        if fn in (FunctionGenerator.SAWTOOTH,
                  FunctionGenerator.BL_SAWTOOTH):
            c0, c1, c2, c3 = self.saw_c
            af = acc.astype(jnp.float32)
            return jnp.where(acc < self.width_word,
                             c0 * af + c1, c2 * af + c3) + dc
        if fn in (FunctionGenerator.TRAPEZOID,
                  FunctionGenerator.BL_TRAPEZOID):
            p0, p1, p2, p3 = self.trap_p
            c0, c1, c2, c3 = self.trap_c
            af = acc.astype(jnp.float32)
            y = jnp.where(acc < p0, c0 * af,
                          jnp.where(acc <= p1, a,
                                    jnp.where(acc < p2, c1 * af + c2,
                                              jnp.where(acc <= p3, -a,
                                                        c0 * af + c3))))
            return y + dc
        if fn in (FunctionGenerator.PULSETRAIN,
                  FunctionGenerator.BL_PULSETRAIN):
            t0, t1, t2 = self.pulse_p
            return jnp.where(
                acc <= t0, a,
                jnp.where(jnp.logical_and(acc >= t1, acc <= t2), -a,
                          jnp.float32(0.0))) + dc
        # PARABOLIC / BL_PARABOLIC
        af = acc.astype(jnp.float32)
        x = (jnp.float32(2.0) / jnp.float32(self.par_word)) * af - 1.0
        return jnp.where(acc < self.par_word,
                         self.par_amp * (1.0 - x * x),
                         jnp.float32(0.0)) + dc

    def init_state(self) -> OscillatorState:
        # nInitPhaseWord (update_settings, Oscillator.cpp:164-166)
        phi = self.initial_phase
        phi = phi - 2.0 * np.pi * np.floor(phi * 0.5 / np.pi)
        ph = _word(_TWO32 * 0.5 / np.pi * phi)
        return OscillatorState(
            phase=jnp.uint32(ph),
            ovs=self.ovs.init_state() if self.ovs is not None else ())

    def process(self, state: OscillatorState, count: int,
                ) -> Tuple[OscillatorState, Array]:
        """Generate ``count`` samples (closed-form phase accumulator)."""
        n_hi = count * self.ratio
        idx = jnp.arange(n_hi, dtype=jnp.uint32)
        phases = state.phase + idx * self.step
        y = self._wave(phases)
        new_phase = state.phase + jnp.uint32(n_hi) * self.step
        if self.ovs is not None:
            # BL: peak attenuation scales the WHOLE wave incl. the DC
            # (reference FG_BL_* synthesis, e.g. Oscillator.cpp:489)...
            if self.function == FunctionGenerator.BL_PULSETRAIN:
                # ...except BL_PULSETRAIN's zero-level segments, which
                # emit the un-attenuated DC (NOTE reference-verbatim,
                # Oscillator.cpp BL_PULSETRAIN: `0.0f + fReferencedDC`
                # without fBLPeakAtten)
                t0, t1, t2 = self.pulse_p
                active = jnp.logical_or(
                    phases <= t0,
                    jnp.logical_and(phases >= t1, phases <= t2))
                y = jnp.where(active, y * self.peak_atten, y)
            else:
                y = y * self.peak_atten
            ovs_state, y = self.ovs.downsample(state.ovs, y)
        else:
            ovs_state = state.ovs
        return OscillatorState(phase=new_phase, ovs=ovs_state), y

    def process_add(self, state, x):
        state, y = self.process(state, x.shape[-1])
        return state, x + y

    def process_mul(self, state, x):
        state, y = self.process(state, x.shape[-1])
        return state, x * y
