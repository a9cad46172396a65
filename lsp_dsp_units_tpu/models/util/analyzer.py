"""Analyzer — multi-channel FFT spectrum analyzer with exponential
amplitude averaging (reference: src/main/util/Analyzer.cpp).

The reference staggers one channel's FFT per sub-step to amortize CPU
cost (Analyzer.cpp:258-260); on TPU all channels' FFTs batch into one
call per analysis period, and the per-frame EMA runs as a tiny scan.
Amplitudes are compensated by a spectral envelope (reverse noise color,
Analyzer.cpp reconfigure) and scaled by shift/fft_size.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.misc import windows as win
from lsp_dsp_units_tpu.models.misc import envelope as env
from lsp_dsp_units_tpu.ops.cplx import rfft_sc

Array = jax.Array

SPEC_FREQ_CENTER = 100.0    # reference LSP_DSP_UNITS_SPEC_FREQ_CENTER
#                             (const.h:32 — 100 Hz, not 1 kHz)


class AnalyzerState(NamedTuple):
    buffer: Array    # [C, N] rolling signal window
    amp: Array       # [C, F] averaged magnitudes (live EMA)
    data: Array      # [C, F] strobe copy read by get_spectrum
    #                  (reference vData, synced at each period start
    #                  BEFORE that period's FFT mixes — Analyzer.cpp
    #                  process: nCounter==0 strobe)


class Analyzer:
    def __init__(self, sample_rate: int = 48000, channels: int = 2,
                 rank: int = 12, rate: float = 20.0,
                 reactivity_s: float = 0.2,
                 window: win.Window = win.Window.HANN,
                 envelope_kind: env.Envelope = env.Envelope.PINK,
                 shift: float = 1.0):
        self.sample_rate = int(sample_rate)
        self.channels = int(channels)
        self.rank = int(rank)
        self.n = 1 << self.rank
        self.f = self.n // 2 + 1
        self.rate = float(rate)
        self.period = max(1, int(sample_rate / rate))
        # reference Analyzer.cpp:287
        self.tau = float(1.0 - np.exp(np.log(1.0 - np.sqrt(0.5))
                                      / (rate * reactivity_s)))
        self._window = jnp.asarray(win.window(self.n, window), jnp.float32)
        e = env.reverse_noise_lin(0.0, sample_rate * 0.5,
                                  SPEC_FREQ_CENTER, self.f, envelope_kind)
        self._envelope = jnp.asarray(e * (shift / self.n), jnp.float32)

    def init_state(self) -> AnalyzerState:
        z = lambda: jnp.zeros((self.channels, self.f), jnp.float32)
        return AnalyzerState(
            buffer=jnp.zeros((self.channels, self.n), jnp.float32),
            amp=z(), data=z())

    def process(self, state: AnalyzerState, x: Array) -> AnalyzerState:
        """x: [C, T], T a multiple of the analysis period."""
        t = x.shape[-1]
        p = self.period
        if t % p != 0:
            raise ValueError(
                f"input length {t} must be a multiple of the analysis "
                f"period ({p} samples = sample_rate/rate); use "
                f"utils.blocks.BlockStream for arbitrary chunk sizes")
        m = t // p
        full = jnp.concatenate([state.buffer, x], axis=-1)
        # analysis frames END at each period START (reference: the FFT
        # fires when nCounter hits the channel slot at the top of the
        # period, over the buffer committed so far — all channels'
        # staggered windows compensate back to the same time point)
        starts = state.buffer.shape[-1] + jnp.arange(m) * p - self.n
        idx = starts[:, None] + jnp.arange(self.n)[None, :]
        frames = full[:, idx]                       # [C, M, N]
        mr, mi = rfft_sc(frames * self._window, axis=-1)
        mags = jnp.sqrt(mr * mr + mi * mi)

        def step(amp, new):
            # the strobe copy precedes the mix, so `data` lags by one
            # frame (reference nCounter==0: copy vAmp->vData, then FFT)
            return amp * (1.0 - self.tau) + new * self.tau, amp

        amp, datas = jax.lax.scan(step, state.amp,
                                  jnp.moveaxis(mags, 1, 0))
        data = datas[-1] if m > 0 else state.data
        return AnalyzerState(buffer=full[:, -self.n:], amp=amp, data=data)

    def get_spectrum(self, state: AnalyzerState, channel: int) -> Array:
        """Envelope-compensated averaged magnitude [F] as of the LAST
        period strobe (reference Analyzer::get_spectrum over vData)."""
        return state.data[channel] * self._envelope

    def frequencies(self) -> np.ndarray:
        return np.fft.rfftfreq(self.n, 1.0 / self.sample_rate)

    def read_frequencies(self, start: float, stop: float,
                         count: int) -> np.ndarray:
        """Log-spaced display frequencies (reference
        Analyzer::read_frequencies)."""
        return np.geomspace(max(start, 1e-3), stop, count)
