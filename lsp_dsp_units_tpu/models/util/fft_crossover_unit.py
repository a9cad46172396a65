"""FFTCrossover — linear-phase multiband splitter over ONE shared FFT
(reference: src/main/util/FFTCrossover.cpp over a SpectralSplitter).

Per-band FFT-bin magnitude masks are built exactly like the reference's
``update_band`` (FFTCrossover.cpp:456-483): ``hipass_fft_set`` /
``lopass_fft_apply`` analytic slopes (complementary around each split,
misc/fft_crossover.cpp:194-358), capped by the flatten level
(``dsp::limit1``), scaled by the band gain.  The masks fan out of one
shared forward FFT inside a :class:`SpectralSplitter` — the reference's
own architecture — so band outputs match the genuine unit sample-for-
sample (tests/test_reference_oracle_wave3.py: >= 90 dB).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.misc import fft_crossover as fxo
from lsp_dsp_units_tpu.ops.cplx import crmul
from lsp_dsp_units_tpu.models.util.spectral import (SpectralSplitter,
                                                    SplitterState)

Array = jax.Array


class FFTCrossoverBand(NamedTuple):
    enabled: bool
    lo_freq: Optional[float]    # high-pass split (None = from DC)
    hi_freq: Optional[float]    # low-pass split (None = to Nyquist)
    slope: float                # dB/oct (negative)
    flatten: float              # passband cap in dB (reference: linear
    #                             fFlatten; 0 dB = no capping)
    gain: float


class FFTCrossover:
    """Static config: rank + bands; masks precomputed on the host."""

    def __init__(self, sample_rate: int = 48000, rank: int = 12,
                 bands: Optional[List[FFTCrossoverBand]] = None,
                 chunk_rank: Optional[int] = None):
        self.sample_rate = int(sample_rate)
        self.rank = int(rank)
        self.bands = bands or []
        self.splitter = SpectralSplitter(rank, max(len(self.bands), 1),
                                         chunk_rank)
        masks = []
        for b in self.bands:
            # reference update_band (FFTCrossover.cpp:456-483)
            if b.lo_freq is not None:
                m = fxo.hipass_fft_set(b.lo_freq, b.slope, sample_rate,
                                       self.rank)
                if b.hi_freq is not None:
                    m = fxo.lopass_fft_apply(m, b.hi_freq, b.slope,
                                             sample_rate, self.rank)
                m = np.clip(m, 0.0, 10.0 ** (b.flatten / 20.0)) * b.gain
            elif b.hi_freq is not None:
                m = fxo.lopass_fft_set(b.hi_freq, b.slope, sample_rate,
                                       self.rank)
                m = np.clip(m, 0.0, 10.0 ** (b.flatten / 20.0)) * b.gain
            else:
                m = np.full((1 << self.rank) // 2 + 1,
                            10.0 ** (b.flatten / 20.0) * b.gain)
            if not b.enabled:
                m = m * 0.0
            masks.append(m)
        if masks:
            self.masks = jnp.asarray(np.stack(masks), jnp.float32)
        else:
            self.masks = jnp.zeros((0, (1 << self.rank) // 2 + 1),
                                   jnp.float32)

    @property
    def num_bands(self) -> int:
        return self.masks.shape[0]

    def latency(self) -> int:
        return self.splitter.latency()

    @property
    def block(self) -> int:
        return self.splitter.block

    def init_state(self, batch_shape: Tuple[int, ...] = (),
                   ) -> SplitterState:
        st = SpectralSplitter(self.rank, max(self.num_bands, 1),
                              self.splitter.chunk_rank).init_state(
                                  batch_shape)
        return st

    def process(self, state: SplitterState, x: Array,
                ) -> Tuple[SplitterState, Array]:
        """x [..., T] -> band signals [B, ..., T] (sum ~= linear-phase
        allpass within mask accuracy).

        One forward FFT for ALL bands: the masked spectrum fans out to B
        inverse FFTs + per-band overlap-add, exactly like the reference
        sharing a SpectralSplitter (FFTCrossover::process)."""
        b = self.num_bands
        if b == 0:
            return state, jnp.zeros((0,) + x.shape, x.dtype)
        # split-complex band masks: per-bin REAL gains multiply re/im
        # directly — no complex arithmetic on the device path, and the
        # splitter's FFTs ride the packed Pallas kernel on TPU
        fns_sc = [(lambda sc, _m=self.masks[i]: (sc[0] * _m,
                                                 sc[1] * _m))
                  for i in range(self.num_bands)]
        state, y = self.splitter.process(state, x, fns_sc=fns_sc)
        # splitter output is [..., H, T] -> [B, ..., T]
        y = jnp.moveaxis(y, -2, 0)
        return state, y.astype(x.dtype)

    def band_mask(self, band: int) -> np.ndarray:
        """Per-bin gains of a band (reference band_t vFFT)."""
        return np.asarray(self.masks[band])
