"""Analytic linear-phase crossover magnitude curves
(reference: src/main/misc/fft_crossover.cpp).

``hipass``/``lopass`` give a -6*2^k dB/oct magnitude around f0 with the
crossover point at -6 dB (0.5 gain); slopes shallower than -3 dB/oct take a
flattening special case.  ``*_fft`` variants fill per-FFT-bin gain arrays
for a given rank, mirroring hipass_fft_set/lopass_fft_set
(fft_crossover.cpp:194-358) but on the rfft one-sided layout used by the
TPU spectral engines.
"""

from __future__ import annotations

import numpy as np

XOVER_LEVEL = 0.5                                   # ~ -6 dB
SLOPE_SCALE = (0.05 * np.log(10.0)) / np.log(2.0)
SLOPE_SCALE_M6DBO = (-0.3 * np.log(10.0)) / np.log(2.0)


def hipass(f, f0: float, slope: float):
    """High-pass magnitude at frequency f (Hz), slope in dB/oct (negative).
    Reference fft_crossover.cpp:36-56."""
    f = np.asarray(f, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        if slope > -3.0:
            g = np.exp(SLOPE_SCALE_M6DBO * np.log(f0 / f)) * XOVER_LEVEL
            return np.where(f <= f0, XOVER_LEVEL,
                            np.where(f >= 2.0 * f0, 1.0, g))
        k = slope * SLOPE_SCALE
        hi = 1.0 - np.exp(k * np.log(f / f0)) * XOVER_LEVEL
        lo = np.exp(k * np.log(f0 / f)) * XOVER_LEVEL
        return np.where(f >= f0, hi, lo)


def lopass(f, f0: float, slope: float):
    """Low-pass magnitude (reference fft_crossover.cpp:58-78)."""
    f = np.asarray(f, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        if slope > -3.0:
            g = np.exp(SLOPE_SCALE_M6DBO * np.log(f / f0)) * XOVER_LEVEL
            return np.where(f >= f0, XOVER_LEVEL,
                            np.where(f <= 0.5 * f0, 1.0, g))
        k = slope * SLOPE_SCALE
        lo = np.exp(k * np.log(f / f0)) * XOVER_LEVEL
        hi = 1.0 - np.exp(k * np.log(f0 / f)) * XOVER_LEVEL
        return np.where(f >= f0, lo, hi)


def hipass_set(freqs, f0: float, slope: float) -> np.ndarray:
    return hipass(freqs, f0, slope)


def lopass_set(freqs, f0: float, slope: float) -> np.ndarray:
    return lopass(freqs, f0, slope)


def hipass_apply(gain, freqs, f0: float, slope: float) -> np.ndarray:
    return gain * hipass(freqs, f0, slope)


def lopass_apply(gain, freqs, f0: float, slope: float) -> np.ndarray:
    return gain * lopass(freqs, f0, slope)


def rfft_freqs(rank: int, sample_rate: float) -> np.ndarray:
    """One-sided rfft bin frequencies for FFT size 2**rank."""
    n = 1 << rank
    return np.arange(n // 2 + 1) * (sample_rate / n)


def hipass_fft_set(f0: float, slope: float, sample_rate: float,
                   rank: int) -> np.ndarray:
    """Per-rfft-bin high-pass gains; DC bin forced to 0
    (reference hipass_fft_set, fft_crossover.cpp:194-241)."""
    g = hipass(rfft_freqs(rank, sample_rate), f0, slope)
    g[0] = 0.0
    return g


def lopass_fft_set(f0: float, slope: float, sample_rate: float,
                   rank: int) -> np.ndarray:
    """Per-rfft-bin low-pass gains; DC bin passes
    (reference lopass_fft_set)."""
    g = lopass(rfft_freqs(rank, sample_rate), f0, slope)
    g[0] = 1.0
    return g


def hipass_fft_apply(gain: np.ndarray, f0: float, slope: float,
                     sample_rate: float, rank: int) -> np.ndarray:
    return gain * hipass_fft_set(f0, slope, sample_rate, rank)


def lopass_fft_apply(gain: np.ndarray, f0: float, slope: float,
                     sample_rate: float, rank: int) -> np.ndarray:
    return gain * lopass_fft_set(f0, slope, sample_rate, rank)
