"""Crossover — IIR Linkwitz-Riley tree crossover, slopes LR2..LR32
(reference: src/main/util/Crossover.cpp, include/.../util/Crossover.h).

Topology (reference header diagram): band 0 = LPF0 -> APF1 -> APF2 ...;
band i = HPF(i-1) -> LPF(i) -> APF(i+1)...; the APFs phase-compensate so
the band sum is allpass.  Filter selection per slope
(Crossover.cpp:167-196): LR2 uses RLC lopass/hipass slope 2 with the HPF
gain NEGATED; higher slopes use the LRX family at slope-1.

Instead of per-band callbacks over a shared scratch buffer, process()
returns all band signals stacked on a leading axis — bands run as one
batched cascade (padded to a common stage count), so B bands cost one
kernel invocation, not B.
"""

from __future__ import annotations

import enum
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import biquad as biquad_ops
from lsp_dsp_units_tpu.models.filters.design import (
    FilterParams, FilterType, design_filter, digital_freq_response)

Array = jax.Array


class CrossMode(enum.Enum):
    BT = "bt"
    MT = "mt"


class CrossoverSlope(enum.Enum):
    """Values mirror the reference enum (Crossover.h crossover_slope_t):
    the LRX filter slope is derived as ``value - 1``
    (Crossover.cpp select_slope), so the numbering is part of the
    design contract."""
    OFF = 0
    LR2 = 1
    LR4 = 2
    LR8 = 3
    LR12 = 4
    LR16 = 5
    LR20 = 6
    LR24 = 7
    LR28 = 8
    LR32 = 9


def _filter_type(kind: str, mode: CrossMode,
                 slope: CrossoverSlope) -> FilterType:
    bt = mode == CrossMode.BT
    if slope == CrossoverSlope.LR2:
        table = {"lpf": (FilterType.BT_RLC_LOPASS, FilterType.MT_RLC_LOPASS),
                 "hpf": (FilterType.BT_RLC_HIPASS, FilterType.MT_RLC_HIPASS),
                 "apf": (FilterType.BT_RLC_ALLPASS,
                         FilterType.MT_RLC_ALLPASS)}
    else:
        table = {"lpf": (FilterType.BT_LRX_LOPASS, FilterType.MT_LRX_LOPASS),
                 "hpf": (FilterType.BT_LRX_HIPASS, FilterType.MT_LRX_HIPASS),
                 "apf": (FilterType.BT_LRX_ALLPASS,
                         FilterType.MT_LRX_ALLPASS)}
    return table[kind][0 if bt else 1]


def _filter_slope(kind: str, slope: CrossoverSlope) -> int:
    if slope == CrossoverSlope.LR2:
        return 1 if kind == "apf" else 2
    return slope.value - 1


class CrossoverState(NamedTuple):
    bands: Array     # [B, ..., K, 2] per-band cascade states


class Crossover:
    """Static config: sorted split frequencies + slopes; band gains."""

    def __init__(self, sample_rate: int = 48000,
                 splits: Optional[List[Tuple[float, CrossoverSlope]]] = None,
                 mode: CrossMode = CrossMode.BT,
                 band_gains: Optional[List[float]] = None):
        self.sample_rate = int(sample_rate)
        self.mode = mode
        splits = sorted(
            [s for s in (splits or []) if s[1] != CrossoverSlope.OFF],
            key=lambda s: s[0])
        self.splits = splits
        self.num_bands = len(splits) + 1
        self.band_gains = band_gains or [1.0] * self.num_bands
        self._build()

    def _build(self) -> None:
        """Design per-band cascades (reference Crossover::reconfigure,
        Crossover.cpp:326-449)."""
        n = len(self.splits)
        band_biquads: List[np.ndarray] = []
        for b in range(self.num_bands):
            chains = []
            # The reference topology is a SERIAL split tree
            # (Crossover.h:43-59 diagram; reconfigure at
            # Crossover.cpp:353-421): band b's signal passes through the
            # HPFs of ALL splits below it (0..b-1), not just its own —
            # their stopband phase is part of the band's contract and
            # makes the band sum exactly allpass-complementary.  Each
            # LR2 HPF negates its gain (Crossover.cpp:409-411); only the
            # LAST split's HPF carries the top band's gain.
            for j in range(b):
                freq, slope = self.splits[j]
                gain = self.band_gains[b] if (b == n and j == n - 1) \
                    else 1.0
                if slope == CrossoverSlope.LR2:
                    gain = -gain
                p = FilterParams(
                    ftype=_filter_type("hpf", self.mode, slope),
                    freq=freq, freq2=freq, gain=gain,
                    slope=_filter_slope("hpf", slope), quality=0.0)
                chains.append(design_filter(p, self.sample_rate).biquads)
            if b < n:
                # LPF of split b (carries this band's gain)
                freq, slope = self.splits[b]
                p = FilterParams(
                    ftype=_filter_type("lpf", self.mode, slope),
                    freq=freq, freq2=freq, gain=self.band_gains[b],
                    slope=_filter_slope("lpf", slope), quality=0.0)
                chains.append(design_filter(p, self.sample_rate).biquads)
                # APFs of all higher splits
                for j in range(b + 1, n):
                    freq_j, slope_j = self.splits[j]
                    p = FilterParams(
                        ftype=_filter_type("apf", self.mode, slope_j),
                        freq=freq_j, freq2=freq_j, gain=1.0,
                        slope=_filter_slope("apf", slope_j), quality=0.0)
                    chains.append(design_filter(p,
                                                self.sample_rate).biquads)
            if chains:
                band_biquads.append(np.concatenate(chains, 0))
            else:
                # no splits touch this band (e.g. a crossover with zero
                # active splits): the band gain still applies — encode it
                # as a gain-scaled identity stage
                band_biquads.append(np.array(
                    [[self.band_gains[b], 0.0, 0.0, 0.0, 0.0]]))

        # pad all bands to a common stage count with identity biquads so
        # they run as ONE batched cascade
        kmax = max(max(bb.shape[0] for bb in band_biquads), 1)
        ident = np.array([1.0, 0.0, 0.0, 0.0, 0.0])
        stacked = np.stack([
            np.concatenate([bb, np.tile(ident, (kmax - bb.shape[0], 1))], 0)
            for bb in band_biquads])
        self._band_biquads = band_biquads
        self._coeffs = jnp.asarray(stacked, jnp.float32)  # [B, K, 5]

    @property
    def stages(self) -> int:
        return self._coeffs.shape[1]

    def init_state(self, batch_shape: Tuple[int, ...] = (),
                   ) -> CrossoverState:
        b = self.num_bands
        return CrossoverState(bands=biquad_ops.init_state(
            self.stages, (b,) + batch_shape))

    def process(self, state: CrossoverState, x: Array,
                ) -> Tuple[CrossoverState, Array]:
        """x [..., T] -> band outputs [B, ..., T]."""
        xb = jnp.broadcast_to(x, (self.num_bands,) + x.shape)
        coeffs = self._coeffs.reshape(
            (self.num_bands,) + (1,) * (x.ndim - 1)
            + self._coeffs.shape[1:])
        y, st = biquad_ops.biquad_cascade(coeffs, state.bands, xb)
        return CrossoverState(bands=st), y

    def freq_chart(self, band: int, freqs: np.ndarray) -> np.ndarray:
        """Complex response of one band (reference Crossover.cpp:498-545)."""
        return digital_freq_response(self._band_biquads[band], freqs,
                                     self.sample_rate)
