"""ButterworthFilter — classic N-order Butterworth LP/HP as second-order
sections (reference: src/main/filters/ButterworthFilter.cpp).

Pre-warped bilinear transform of the analog Butterworth pole positions,
normalized so the passband edge gain matches; executed on the shared
biquad cascade kernel.
"""

from __future__ import annotations

import enum
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import biquad as biquad_ops


class BWFilterType(enum.Enum):
    LOWPASS = "lowpass"
    HIGHPASS = "highpass"
    NONE = "none"


def design_butterworth(order: int, cutoff: float, sample_rate: int,
                       ftype: BWFilterType) -> np.ndarray:
    """[K, 5] biquads (reference ButterworthFilter::update_settings)."""
    if ftype == BWFilterType.NONE:
        return np.zeros((0, 5))
    # reference clamps (ButterworthFilter.cpp:115-119): order capped at
    # MAX_ORDER=128 and forced EVEN (odd orders round up); cutoff
    # limited to [10, sr/2 - 10] Hz — unclamped, cutoff 0 is 0/0 = NaN
    # and cutoff >= Nyquist puts poles outside the unit circle
    order = int(np.clip(order, 1, 128))
    order = order if order % 2 == 0 else order + 1
    cutoff = float(np.clip(cutoff, 10.0, 0.5 * sample_rate - 10.0))
    ang = 2.0 * np.pi * cutoff
    bin_c = ang / np.tan(0.5 * ang / sample_rate)
    bin_c_sq = bin_c * bin_c
    n_biquads = 1 + (order - 1) // 2
    out = np.zeros((n_biquads, 5))
    for k in range(n_biquads):
        pole_ang = 0.5 * np.pi * (2.0 * k + order + 1.0) / order
        pre = ang * np.cos(pole_ang)
        pim = ang * np.sin(pole_ang)
        scale = 1.0 / (bin_c_sq - 2.0 * bin_c * pre + pre * pre
                       + pim * pim)
        dre = scale * (bin_c_sq - pre * pre - pim * pim)
        dim = 2.0 * scale * bin_c * pim
        sqabs = dre * dre + dim * dim
        a1 = 2.0 * dre           # negated-sign convention
        a2 = -sqabs
        if ftype == BWFilterType.HIGHPASS:
            b0, b1, b2 = 1.0, -2.0, 1.0
            gain = (1.0 + a1 - a2) / (1.0 - b1 + b2)
        else:
            b0, b1, b2 = 1.0, 2.0, 1.0
            gain = (1.0 - a1 - a2) / (1.0 + b1 + b2)
        out[k] = [b0 * gain, b1 * gain, b2 * gain, a1, a2]
    return out


class ButterworthFilter:
    def __init__(self, sample_rate: int = 48000, order: int = 2,
                 cutoff: float = 1000.0,
                 ftype: BWFilterType = BWFilterType.LOWPASS):
        self.sample_rate = int(sample_rate)
        self.order = int(order)
        self.cutoff = float(cutoff)
        self.ftype = ftype
        self._coeffs = jnp.asarray(
            design_butterworth(order, cutoff, sample_rate, ftype),
            jnp.float32)

    def coefficients(self) -> jax.Array:
        return self._coeffs

    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> jax.Array:
        return biquad_ops.init_state(self._coeffs.shape[0], batch_shape)

    def process(self, state, x):
        if self._coeffs.shape[0] == 0:
            return state, x
        y, state = biquad_ops.biquad_cascade(self._coeffs, state, x)
        return state, y
