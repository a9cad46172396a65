"""LatencyDetector — round-trip latency estimation via chirp
cross-correlation (reference: src/main/util/LatencyDetector.cpp).

The reference emits an allpass chirp FIR (quadratic phase) and matched-
filters the recorded response; the correlation peak position gives the
round-trip latency.  Mechanics here: the chirp is synthesized as the
inverse rfft of a unit-magnitude quadratic-phase spectrum (the same
construction, LatencyDetector chirp_t alpha/beta terms); the input/output
state machines (OP_BYPASS/FADEOUT/PAUSE/EMIT/FADEIN, IP_*) run on the
host at block granularity; the matched filter is one batched FFT
correlation on device.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops.cplx import cmul, rfft_sc, irfft_sc, sc_mul
from lsp_dsp_units_tpu.utils.units import next_pow2


class LDState(enum.Enum):
    BYPASS = "bypass"
    EMIT = "emit"        # playing the chirp
    CAPTURE = "capture"  # listening for the response
    DONE = "done"


def make_chirp(n: int, delay_ratio: float = 0.5) -> np.ndarray:
    """Allpass chirp of length n: |H|=1 with quadratic phase; the group
    delay sweeps across the buffer (reference chirp_t fAlpha/fBeta)."""
    nfft = next_pow2(2 * n)
    f = np.arange(nfft // 2 + 1)
    w = f / (nfft / 2.0)                       # 0..1
    # group delay tau(w) = delay_ratio*n + (1-delay_ratio)*n * w
    # phase = -2pi/nfft * integral of tau -> quadratic in w
    a = delay_ratio * n
    b = (1.0 - delay_ratio) * n
    phase = -2.0 * np.pi * (a * f + 0.5 * b * f * w) / nfft
    spec = np.exp(1j * phase)
    x = np.fft.irfft(spec, nfft)[: int(2 * n)]
    # normalize energy
    x /= np.sqrt(np.sum(x * x))
    return x.astype(np.float32)


class LatencyDetector:
    def __init__(self, sample_rate: int = 48000, duration_s: float = 0.15,
                 delay_ratio: float = 0.5, max_latency_s: float = 1.0,
                 peak_threshold: float = 0.5, abs_threshold: float = 1e-3):
        self.sample_rate = int(sample_rate)
        self.n = int(sample_rate * duration_s)
        self.chirp = make_chirp(self.n, delay_ratio)
        self.max_latency = int(sample_rate * max_latency_s)
        self.peak_threshold = float(peak_threshold)
        self.abs_threshold = float(abs_threshold)
        self.state = LDState.BYPASS
        self._emit_pos = 0
        self._captured: list[np.ndarray] = []
        self._cap_count = 0
        self.latency: Optional[int] = None

    # -- control (reference start_capture/latency_detected) ----------------
    def start_capture(self) -> None:
        self.state = LDState.EMIT
        self._emit_pos = 0
        self._captured = []
        self._cap_count = 0
        self.latency = None

    def latency_detected(self) -> bool:
        return self.latency is not None

    def get_latency(self) -> int:
        return -1 if self.latency is None else self.latency

    # -- processing ----------------------------------------------------------
    def process_out(self, count: int) -> np.ndarray:
        """Samples to PLAY this block (chirp while emitting, else zeros —
        a full implementation would pass dry signal through; the latency
        measurement path mutes, like the reference's PAUSE/EMIT states)."""
        out = np.zeros(count, np.float32)
        if self.state == LDState.EMIT:
            take = min(count, self.chirp.size - self._emit_pos)
            out[:take] = self.chirp[self._emit_pos:self._emit_pos + take]
            self._emit_pos += take
            if self._emit_pos >= self.chirp.size:
                self.state = LDState.CAPTURE
        return out

    def process_in(self, x: np.ndarray) -> None:
        """Feed the RECORDED signal; detection fires once enough has been
        captured (chirp length + max latency)."""
        if self.state not in (LDState.EMIT, LDState.CAPTURE):
            return
        self._captured.append(np.asarray(x, np.float32))
        self._cap_count += x.size
        need = self.chirp.size + self.max_latency
        if self._cap_count >= need:
            self._detect()

    def process(self, x: np.ndarray) -> np.ndarray:
        """Combined step (reference LatencyDetector::process): feed the
        captured input, return the probe output of the same length."""
        self.process_in(x)
        return self.process_out(len(x))

    def _detect(self) -> None:
        rec = np.concatenate(self._captured)
        n = rec.size
        nfft = next_pow2(n + self.chirp.size)
        xs = rfft_sc(jnp.asarray(rec), nfft)
        cs = rfft_sc(jnp.asarray(self.chirp[::-1].copy()), nfft)
        corr = irfft_sc(sc_mul(xs, cs), nfft)
        corr = np.asarray(corr)[: n]
        peak = int(np.argmax(np.abs(corr)))
        peak_val = abs(corr[peak])
        rms = float(np.sqrt(np.mean(corr * corr))) + 1e-12
        if peak_val < self.abs_threshold or \
                peak_val < self.peak_threshold * rms * 8.0:
            self.state = LDState.DONE
            self.latency = None
            return
        # correlation peak sits at latency + (chirp_len - 1)
        lat = peak - (self.chirp.size - 1)
        self.latency = max(0, lat)
        self.state = LDState.DONE
