"""SyncChirpProcessor — synchronized (Farina) exponential sine sweep
measurement (reference: src/main/util/SyncChirpProcessor.cpp):
generates the sweep, deconvolves a recorded response into the linear
impulse response plus harmonic-distortion responses, and computes energy
decay curves.

Math (Farina 2000, as in the reference): sweep
``x(t) = sin(K (e^{t/L} - 1))`` with ``K = w1 L``,
``L = T / ln(w2/w1)``; the inverse filter is the time-reversed sweep
with -6 dB/oct amplitude compensation so that ``x * inv = delta``.
Harmonic order k's response appears at ``-L ln(k)`` seconds before the
linear peak.  The deconvolution is one batched FFT convolution (device);
sweep synthesis and analysis bookkeeping are host float64.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops.cplx import cmul
from lsp_dsp_units_tpu.models.sampling.sample import Sample


class SyncChirpProcessor:
    def __init__(self, sample_rate: int = 48000, duration_s: float = 2.0,
                 f_start: float = 20.0, f_end: float = 20000.0,
                 amplitude: float = 0.5, fade_in_s: float = 0.02,
                 fade_out_s: float = 0.02):
        self.sample_rate = int(sample_rate)
        self.duration = float(duration_s)
        self.f_start = float(f_start)
        self.f_end = float(f_end)
        self.amplitude = float(amplitude)
        self.n = int(sample_rate * duration_s)
        self.L = duration_s / np.log(f_end / f_start)
        self._fade_in = int(sample_rate * fade_in_s)
        self._fade_out = int(sample_rate * fade_out_s)
        self._sweep: Optional[np.ndarray] = None
        self._inverse: Optional[np.ndarray] = None

    # -- synthesis ----------------------------------------------------------
    def sweep(self) -> np.ndarray:
        if self._sweep is None:
            t = np.arange(self.n, dtype=np.float64) / self.sample_rate
            w1 = 2.0 * np.pi * self.f_start
            phase = w1 * self.L * (np.exp(t / self.L) - 1.0)
            x = np.sin(phase)
            # edge fades to bound spectral splatter
            if self._fade_in:
                x[: self._fade_in] *= np.linspace(0, 1, self._fade_in)
            if self._fade_out:
                x[-self._fade_out:] *= np.linspace(1, 0, self._fade_out)
            self._sweep = (self.amplitude * x).astype(np.float32)
        return self._sweep

    def inverse_filter(self) -> np.ndarray:
        """Time-reversed sweep with exponential amplitude compensation
        (-6 dB/oct), normalized so sweep * inverse ~= unit impulse."""
        if self._inverse is None:
            sw = self.sweep().astype(np.float64) / self.amplitude
            t = np.arange(self.n, dtype=np.float64) / self.sample_rate
            comp = np.exp(-t / self.L)
            inv = sw[::-1] * comp
            # normalize: peak of conv(sweep, inv) == 1
            ref = np.fft.irfft(
                np.fft.rfft(sw, 2 * self.n)
                * np.fft.rfft(inv, 2 * self.n), 2 * self.n)
            inv /= np.abs(ref).max()
            self._inverse = inv.astype(np.float32)
        return self._inverse

    def chirp_sample(self) -> Sample:
        s = Sample(1, self.n, self.sample_rate)
        s.data[0] = self.sweep()
        return s

    # -- analysis -----------------------------------------------------------
    def deconvolve(self, response: np.ndarray) -> np.ndarray:
        """Full deconvolved response: linear IR begins at index
        ``self.n - 1``; harmonic k's IR is centered ``harmonic_offset(k)``
        samples earlier (reference convolution of the recorded signal
        with the inverse filter)."""
        response = np.asarray(response, np.float32)
        inv = self.inverse_filter()
        n = response.size + inv.size
        nfft = 1
        while nfft < n:
            nfft <<= 1
        X = jnp.fft.rfft(jnp.asarray(response), nfft)
        I = jnp.fft.rfft(jnp.asarray(inv), nfft)
        out = jnp.fft.irfft(cmul(X, I), nfft)
        return np.asarray(out)[: n] / self.amplitude

    def linear_ir(self, response: np.ndarray,
                  length: Optional[int] = None) -> np.ndarray:
        """Extract the linear impulse response."""
        full = self.deconvolve(response)
        start = self.n - 1
        length = length or (full.size - start)
        return full[start: start + length]

    def harmonic_offset(self, k: int) -> int:
        """Samples BEFORE the linear IR where harmonic k's IR sits
        (Farina: dt = L ln k)."""
        return int(round(self.L * np.log(k) * self.sample_rate))

    def nonlinear_ir(self, response: np.ndarray, k: int,
                     length: int) -> np.ndarray:
        full = self.deconvolve(response)
        center = self.n - 1 - self.harmonic_offset(k)
        start = max(0, center - length // 2)
        return full[start: start + length]

    @staticmethod
    def energy_decay(ir: np.ndarray) -> np.ndarray:
        """Schroeder backward-integrated energy decay curve in dB."""
        e = np.asarray(ir, np.float64) ** 2
        edc = np.cumsum(e[::-1])[::-1]
        edc /= max(edc[0], 1e-30)
        return 10.0 * np.log10(np.maximum(edc, 1e-30))

    @staticmethod
    def rt60(edc_db: np.ndarray, sample_rate: int,
             lo_db: float = -5.0, hi_db: float = -35.0) -> float:
        """RT60 from a linear fit of the EDC between lo_db and hi_db
        (T30 extrapolated), like the reference's decay-line analysis."""
        idx = np.where((edc_db <= lo_db) & (edc_db >= hi_db))[0]
        if idx.size < 2:
            return 0.0
        t = idx / sample_rate
        a, b = np.polyfit(t, edc_db[idx], 1)
        if a >= 0:
            return 0.0
        return float(-60.0 / a)

    # -- persistence (reference save/load via Sample) -----------------------
    def save_ir(self, path: str, ir: np.ndarray) -> None:
        s = Sample(1, len(ir), self.sample_rate)
        s.data[0] = np.asarray(ir, np.float32)
        s.save(path)

    def load_ir(self, path: str) -> np.ndarray:
        return Sample.load(path).data[0]
