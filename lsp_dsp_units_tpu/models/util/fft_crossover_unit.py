"""FFTCrossover — linear-phase crossover via per-band FFT magnitude masks
(reference: src/main/util/FFTCrossover.cpp).

Per-band masks are built from the analytic ``hipass``/``lopass`` slopes
with flatten (misc.fft_crossover, reference misc/fft_crossover.cpp) and
applied inside ONE shared spectral pass — a single forward FFT fans out
into B masked inverse FFTs (reference uses a shared SpectralSplitter;
here the splitter batches all band masks as one [B, F] multiply).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.misc import fft_crossover as fxo
from lsp_dsp_units_tpu.ops.cplx import crmul
from lsp_dsp_units_tpu.models.util.spectral import SpectralProcessor, \
    SpectralState

Array = jax.Array


class FFTCrossoverBand(NamedTuple):
    enabled: bool
    lo_freq: Optional[float]    # high-pass split (None = from DC)
    hi_freq: Optional[float]    # low-pass split (None = to Nyquist)
    slope: float                # dB/oct (negative)
    flatten: float              # in dB — shallow-slope special handled
    gain: float


class FFTCrossover:
    """Static config: rank + bands; masks precomputed on the host."""

    def __init__(self, sample_rate: int = 48000, rank: int = 12,
                 bands: Optional[List[FFTCrossoverBand]] = None):
        self.sample_rate = int(sample_rate)
        self.proc = SpectralProcessor(rank)
        self.rank = rank
        self.bands = bands or []
        f = np.fft.rfftfreq(self.proc.frame, 1.0 / sample_rate)
        masks = []
        for b in self.bands:
            m = np.ones_like(f)
            if b.lo_freq is not None:
                m = m * fxo.hipass(np.maximum(f, 1e-3), b.lo_freq, b.slope)
            if b.hi_freq is not None:
                m = m * fxo.lopass(np.maximum(f, 1e-3), b.hi_freq, b.slope)
            m *= b.gain
            if not b.enabled:
                m *= 0.0
            masks.append(m)
        if masks:
            self.masks = jnp.asarray(np.stack(masks), jnp.float32)
        else:
            self.masks = jnp.zeros((0, f.size), jnp.float32)

    @property
    def num_bands(self) -> int:
        return self.masks.shape[0]

    def latency(self) -> int:
        return self.proc.latency()

    @property
    def block(self) -> int:
        return self.proc.block

    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> SpectralState:
        """ONE shared analysis history; per-band ([B] leading) synthesis
        tails — the forward FFT is computed once and fanned out."""
        b = self.num_bands
        h = self.proc.hop
        z = lambda shape: jnp.zeros(shape + (h,), jnp.float32)
        return SpectralState(hist=z(batch_shape),
                             tail=z((b,) + batch_shape),
                             pending=z((b,) + batch_shape))

    def process(self, state: SpectralState, x: Array,
                ) -> Tuple[SpectralState, Array]:
        """x [..., T] -> band signals [B, ..., T] (sum ~= linear-phase
        allpass within mask accuracy).

        One forward FFT for ALL bands (the reference shares a
        SpectralSplitter the same way, FFTCrossover.cpp): the masked
        spectrum fans out to B inverse FFTs + per-band overlap-add."""
        b = self.num_bands
        p = self.proc
        frames, hops, m = p._frames_from_hist(state.hist, x)
        spec = jnp.fft.rfft(frames * p._win, axis=-1)     # [..., M, F]
        masks = self.masks.reshape((b,) + (1,) * x.ndim
                                   + (self.masks.shape[-1],))
        spec_b = crmul(spec[None], masks)                 # [B, ..., M, F]
        y = jnp.fft.irfft(spec_b, p.frame, axis=-1) * p._win
        h = p.hop
        heads = y[..., :h]
        tails = y[..., h:]
        prev_t = jnp.concatenate(
            [state.tail[..., None, :], tails[..., :-1, :]], axis=-2)
        computed = heads + prev_t
        emitted = jnp.concatenate(
            [state.pending[..., None, :], computed[..., :-1, :]], axis=-2)
        out = emitted.reshape((b,) + x.shape).astype(x.dtype)
        return SpectralState(hist=hops[..., -1, :],
                             tail=tails[..., -1, :],
                             pending=computed[..., -1, :]), out

    def band_mask(self, band: int) -> np.ndarray:
        """Per-bin gains of a band (reference band_t vFFT)."""
        return np.asarray(self.masks[band])
