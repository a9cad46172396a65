"""Oversampler — polyphase 2/3/4/6/8x up/down sampling with optional
anti-alias filtering and a user processing function at the high rate
(reference: src/main/util/Oversampler.cpp, include/.../util/Oversampler.h).

The reference's ``IOversamplerCallback`` becomes a function-valued
transform: :meth:`Oversampler.process` takes ``fn(hi_rate_block) ->
hi_rate_block`` (any traced JAX function), mirroring
``Oversampler::process(dst, src, n, callback)`` (Oversampler.cpp:527-570).
The optional filter is the reference's 30-pole BWC low-pass at
min(20 kHz, 0.42*sr_hi) cutoff (Oversampler.cpp:108-126).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import biquad as biquad_ops
from lsp_dsp_units_tpu.ops import resample
from lsp_dsp_units_tpu.models.filters.design import (
    FilterParams, FilterType, design_filter)

Array = jax.Array


class OversamplerState(NamedTuple):
    up_hist: Array    # [..., 2*lobes] input history for upsampling
    flt: Array        # [..., K, 2] anti-alias filter state (may be [...,0,2])


class Oversampler:
    """Static config: ratio in {1,2,3,4,6,8}, quality tier, filtering."""

    def __init__(self, sample_rate: int = 48000, ratio: int = 2,
                 quality: str = "x2", filtering: bool = True):
        assert ratio == 1 or ratio in resample.oversample_rates(), ratio
        self.sample_rate = int(sample_rate)
        self.ratio = int(ratio)
        self.quality = quality
        self.lobes = resample.QUALITY_LOBES[quality]
        self.filtering = bool(filtering) and self.ratio > 1
        if self.filtering:
            # reference Oversampler::set_sample_rate (Oversampler.cpp:
            # 108-127): BWC low-pass, 30 poles, cutoff min(20k, 0.42 *
            # base sample rate), quality 0.1, designed at the high rate
            fp = FilterParams(
                ftype=FilterType.BT_BWC_LOPASS, slope=30,
                freq=min(0.42 * self.sample_rate, 20000.0), gain=1.0,
                quality=0.1)
            d = design_filter(fp, self.sample_rate * self.ratio)
            self._flt_coeffs = jnp.asarray(d.biquads, jnp.float32)
        else:
            self._flt_coeffs = jnp.zeros((0, 5), jnp.float32)

    def latency(self) -> int:
        """Input-rate latency (reference Oversampler.cpp:955-1010)."""
        return self.lobes if self.ratio > 1 else 0

    @property
    def filter_coeffs(self) -> Array:
        return self._flt_coeffs

    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> OversamplerState:
        return OversamplerState(
            up_hist=resample.upsample_history(self.lobes, batch_shape),
            flt=biquad_ops.init_state(self._flt_coeffs.shape[0],
                                      batch_shape))

    def upsample(self, state: OversamplerState, x: Array,
                 ) -> Tuple[OversamplerState, Array]:
        if self.ratio == 1:
            return state, x
        hist, y = resample.upsample(state.up_hist, x, self.ratio,
                                    self.lobes)
        return state._replace(up_hist=hist), y

    def downsample(self, state: OversamplerState, x: Array,
                   ) -> Tuple[OversamplerState, Array]:
        if self.ratio == 1:
            return state, x
        if self.filtering:
            y, flt = biquad_ops.biquad_cascade(self._flt_coeffs, state.flt,
                                               x)
            state = state._replace(flt=flt)
            x = y
        return state, resample.downsample(x, self.ratio)

    def process(self, state: OversamplerState, x: Array,
                fn: Optional[Callable[[Array], Array]] = None,
                ) -> Tuple[OversamplerState, Array]:
        """Upsample -> fn at high rate -> (filter) -> downsample
        (reference Oversampler.cpp:527-570)."""
        state, hi = self.upsample(state, x)
        if fn is not None:
            hi = fn(hi)
        return self.downsample(state, hi)
