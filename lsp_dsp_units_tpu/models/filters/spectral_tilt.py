"""SpectralTilt — arbitrary-slope spectral tilt filter
(reference: src/main/filters/SpectralTilt.cpp).

A cascade of exponentially spaced one-pole/one-zero bilinear sections
between a lower and upper frequency approximates a ``w^a`` magnitude
slope; pairs of sections combine into biquads, digitized with the general
bilinear transform and normalized at a selectable frequency.
"""

from __future__ import annotations

import enum
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import biquad as biquad_ops

DB_PER_OCTAVE_FALLOFF = 0.16609640419483184814453125  # ln10/(20 ln2)
DB_PER_DECADE_FALLOFF = 0.05
DFL_LOWER_FREQUENCY = 0.1
DFL_UPPER_FREQUENCY = 20000.0
MAX_ORDER = 128


def _libm_powf():
    """The C library's float32 powf — the reference's exponential
    pole/zero ladder is an f32 powf + f32 multiply chain whose ulps
    matter (the per-biquad self-normalization amplifies near-DC
    coefficient ulps to ~0.1 dB plateau shifts), and numpy's float32
    power rounds differently from libm's.  Falls back to numpy where
    libm isn't loadable."""
    import ctypes
    import ctypes.util
    try:
        name = ctypes.util.find_library("m") or "libm.so.6"
        libm = ctypes.CDLL(name)
        libm.powf.restype = ctypes.c_float
        libm.powf.argtypes = [ctypes.c_float, ctypes.c_float]
        return lambda x, y: np.float32(libm.powf(float(x), float(y)))
    except (OSError, AttributeError):
        return lambda x, y: np.power(np.float32(x), np.float32(y),
                                     dtype=np.float32)


_POWF = _libm_powf()


class SlopeUnit(enum.Enum):
    NONE = "none"
    NEPER_PER_NEPER = "neper_per_neper"
    DB_PER_OCTAVE = "db_per_octave"
    DB_PER_DECADE = "db_per_decade"


class TiltNorm(enum.Enum):
    NONE = "none"
    AT_DC = "at_dc"
    AT_20_HZ = "at_20_hz"
    AT_1_KHZ = "at_1_khz"
    AT_20_KHZ = "at_20_khz"
    AT_NYQUIST = "at_nyquist"
    AUTO = "auto"


def _digital_gain(bq: np.ndarray, freq: float, sr: int) -> float:
    """|H| of one biquad at freq (reference digital_biquad_gain)."""
    w = 2.0 * np.pi * freq / sr
    z = np.exp(-1j * w)
    num = bq[0] + bq[1] * z + bq[2] * z * z
    den = 1.0 - bq[3] * z - bq[4] * z * z
    return float(np.abs(num / den))


class SpectralTilt:
    def __init__(self, sample_rate: int = 48000, order: int = 16,
                 slope: float = -0.5,
                 slope_unit: SlopeUnit = SlopeUnit.NEPER_PER_NEPER,
                 lower_freq: float = DFL_LOWER_FREQUENCY,
                 upper_freq: float = DFL_UPPER_FREQUENCY,
                 norm: TiltNorm = TiltNorm.AUTO):
        self.sample_rate = int(sample_rate)
        self.order = int(order)
        self.slope = float(slope)
        self.slope_unit = slope_unit
        self.lower_freq = float(lower_freq)
        self.upper_freq = float(upper_freq)
        self.norm = norm
        self._coeffs = None

    # -- design (reference SpectralTilt::update_settings) ------------------
    def build(self) -> np.ndarray:
        order = self.order + (self.order % 2)
        order = min(order, MAX_ORDER)
        sr = self.sample_rate

        if self.slope_unit == SlopeUnit.DB_PER_OCTAVE:
            slope_nn = self.slope * DB_PER_OCTAVE_FALLOFF
        elif self.slope_unit == SlopeUnit.DB_PER_DECADE:
            slope_nn = self.slope * DB_PER_DECADE_FALLOFF
        else:
            slope_nn = self.slope
        self.slope_nepnep = slope_nn

        lo, hi = self.lower_freq, self.upper_freq
        if lo >= 0.5 * sr:
            lo = DFL_LOWER_FREQUENCY
        if hi >= 0.5 * sr:
            hi = DFL_UPPER_FREQUENCY
        if lo >= hi:
            lo, hi = DFL_LOWER_FREQUENCY, DFL_UPPER_FREQUENCY

        if self.slope_unit == SlopeUnit.NONE or slope_nn == 0.0:
            self._coeffs = np.zeros((0, 5))
            return self._coeffs

        # NOTE reference-verbatim: the pole/zero ladder is computed in
        # FLOAT32 exactly as SpectralTilt.cpp:267-283 (f32 pow and f32
        # multiply chains).  This matters: the lowest sections sit near
        # DC where f32 coefficient rounding shifts each biquad's
        # normalization-frequency gain by up to ~1%, and the
        # reference's per-biquad self-normalization BAKES that shift
        # into the response (measured 0.07 dB plateau offset / 30 dB
        # time-domain SNR vs an f64 ladder on the noise-generator
        # config: order 32, 10 Hz..0.9*Nyquist).
        f32 = np.float32
        slope_nn = f32(slope_nn)
        l_angf = f32(2.0 * np.pi * lo)
        u_angf = f32(2.0 * np.pi * hi)
        r = _POWF(f32(u_angf / l_angf), f32(1.0 / (order - 1)))
        c = f32(1.0 / np.tan(0.5 / sr))   # bilinear_coefficient(1, sr)
        neg_zero = f32(l_angf * _POWF(r, f32(-slope_nn)))
        neg_pole = l_angf

        out = []
        for n in range(0, order, 2):
            z0, p0 = neg_zero, neg_pole
            neg_zero = f32(neg_zero * r)
            neg_pole = f32(neg_pole * r)
            z1, p1 = neg_zero, neg_pole
            neg_zero = f32(neg_zero * r)
            neg_pole = f32(neg_pole * r)
            # combine two (s + z)/(s + p) bilinears into one biquad
            # (f32 products, SpectralTilt.cpp:286-292)
            t = np.array([f32(z0 * z1), f32(z0 + z1), f32(1.0)],
                         np.float64)
            b = np.array([f32(p0 * p1), f32(p0 + p1), f32(1.0)],
                         np.float64)
            # general bilinear transform with coefficient c — f64
            # internals, outputs rounded to f32 (dsp stub bt_one /
            # bilinear_transform_x1 convention shared with Filter.cpp)
            cd = float(c)
            T = np.array([t[0] + t[1] * cd + t[2] * cd * cd,
                          2.0 * t[0] - 2.0 * t[2] * cd * cd,
                          t[0] - t[1] * cd + t[2] * cd * cd])
            B = np.array([b[0] + b[1] * cd + b[2] * cd * cd,
                          2.0 * b[0] - 2.0 * b[2] * cd * cd,
                          b[0] - b[1] * cd + b[2] * cd * cd])
            bq = np.array([T[0] / B[0], T[1] / B[0], T[2] / B[0],
                           -B[1] / B[0], -B[2] / B[0]]).astype(
                               np.float32)
            bq = self._normalize(bq)
            out.append(bq)
        self._coeffs = np.stack(out).astype(np.float64)
        return self._coeffs

    def _normalize(self, bq: np.ndarray) -> np.ndarray:
        sr = self.sample_rate
        norm = self.norm
        if norm == TiltNorm.NONE:
            return bq
        if norm == TiltNorm.AUTO:
            if self.slope_nepnep <= 0:
                f = 20.0 if 0.5 * sr > 20.0 else 0.0
            else:
                f = 20000.0 if 0.5 * sr > 20000.0 else 0.5 * sr
        else:
            f = {TiltNorm.AT_DC: 0.0, TiltNorm.AT_20_HZ: 20.0,
                 TiltNorm.AT_1_KHZ: 1000.0, TiltNorm.AT_20_KHZ: 20000.0,
                 TiltNorm.AT_NYQUIST: 0.5 * sr}[norm]
        # the reference evaluates the gain in double on the f32-rounded
        # digital biquad, rounds it to f32, and scales in f32
        # (SpectralTilt.cpp:180-259)
        g = np.float32(1.0) / np.float32(_digital_gain(
            np.asarray(bq, np.float64), f, sr))
        out = np.asarray(bq, np.float32).copy()
        out[0:3] = (out[0:3] * g).astype(np.float32)
        return out

    # -- execution ----------------------------------------------------------
    def coefficients(self) -> jax.Array:
        if self._coeffs is None:
            self.build()
        return jnp.asarray(self._coeffs, jnp.float32)

    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> jax.Array:
        if self._coeffs is None:
            self.build()
        return biquad_ops.init_state(self._coeffs.shape[0], batch_shape)

    def process(self, state, x):
        c = self.coefficients()
        if c.shape[0] == 0:
            return state, x
        # long cascades of near-unit poles bias the f32 associative scan
        # (measured +8 dB tilt error at 16 stages); the sequential scan
        # keeps the response exact to ~1e-4
        y, state = biquad_ops.biquad_cascade_seq(c, state, x)
        return state, y
