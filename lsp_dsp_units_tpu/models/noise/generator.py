"""NoiseGenerator — facade over MLS/LCG/Velvet cores with color filters
(reference: src/main/noise/Generator.cpp; enums ng_generator_t,
ng_color_t in Generator.h).

Colors white/pink/red(brown)/blue/violet/arbitrary dB-per-octave are a
SpectralTilt filter over the core noise (the reference couples the same
way), executed on the biquad cascade kernel.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.noise.mls import MLS
from lsp_dsp_units_tpu.models.noise.lcg import LCG, LCGDistribution
from lsp_dsp_units_tpu.models.noise.velvet import Velvet, VelvetType
from lsp_dsp_units_tpu.models.filters.spectral_tilt import (
    SpectralTilt, SlopeUnit, TiltNorm)


class NoiseCore(enum.Enum):
    MLS = "mls"
    LCG = "lcg"
    VELVET = "velvet"


class NoiseColor(enum.Enum):
    WHITE = "white"
    PINK = "pink"          # -3 dB/oct
    RED = "red"            # -6 dB/oct (brown / brownian)
    BLUE = "blue"          # +3 dB/oct
    VIOLET = "violet"      # +6 dB/oct
    ARBITRARY = "arbitrary"


BROWN = NoiseColor.RED
BROWNIAN = NoiseColor.RED

# neper-per-neper slopes (reference Generator.cpp update_settings):
# pink f^-0.5 (-3 dB POWER/oct), red f^-1, blue f^+0.5, violet f^+1
_SLOPES = {NoiseColor.PINK: -0.5, NoiseColor.RED: -1.0,
           NoiseColor.BLUE: 0.5, NoiseColor.VIOLET: 1.0}


class NoiseGenerator:
    def __init__(self, sample_rate: int = 48000,
                 core: NoiseCore = NoiseCore.LCG,
                 color: NoiseColor = NoiseColor.WHITE,
                 slope_db_oct: float = 0.0, coloring_order: int = 32,
                 amplitude: float = 1.0, offset: float = 0.0,
                 mls_bits: int = 23, mls_seed: int = 0,
                 lcg_seed: Optional[int] = None,
                 lcg_distribution: LCGDistribution = LCGDistribution.UNIFORM,
                 velvet_type: VelvetType = VelvetType.OVN,
                 velvet_window: float = 10.0):
        self.sample_rate = int(sample_rate)
        self.core = core
        self.color = color
        self.amplitude = float(amplitude)
        self.offset = float(offset)
        self.mls = MLS(n_bits=mls_bits, state=mls_seed)
        self.lcg = LCG(lcg_distribution, seed=lcg_seed)
        from lsp_dsp_units_tpu.models.noise.velvet import VelvetCore
        self.velvet = Velvet(velvet_type, core=VelvetCore.LCG,
                             window_width=velvet_window,
                             seed=lcg_seed)
        if color == NoiseColor.WHITE:
            self.tilt = None
        else:
            if color == NoiseColor.ARBITRARY:
                slope, unit = slope_db_oct, SlopeUnit.DB_PER_OCTAVE
            else:
                slope, unit = _SLOPES[color], SlopeUnit.NEPER_PER_NEPER
            # reference Generator.cpp:105,339-341: STLT_NORM_AUTO
            # (normalize at 20 Hz for falling slopes, 20 kHz for
            # rising) over [10 Hz, 0.9 * Nyquist] — no 20 kHz cap
            self.tilt = SpectralTilt(
                sample_rate, order=coloring_order, slope=slope,
                slope_unit=unit, lower_freq=10.0,
                upper_freq=0.9 * 0.5 * sample_rate,
                norm=TiltNorm.AUTO)
            self.tilt.build()

    def init_state(self):
        return self.tilt.init_state() if self.tilt is not None else ()

    def process(self, state, count: int):
        """Generate ``count`` colored-noise samples -> (state', y)."""
        if self.core == NoiseCore.MLS:
            raw = self.mls.process(count)
        elif self.core == NoiseCore.VELVET:
            raw = self.velvet.generate(count)
        else:
            raw = self.lcg.process(count).astype(np.float32)
        # amplitude/offset are pushed into the core generators BEFORE
        # coloring (reference update_settings, Generator.cpp:265-283) —
        # a DC offset is therefore shaped by the tilt's DC response
        y = jnp.asarray(raw, jnp.float32) * self.amplitude + self.offset
        if self.tilt is not None:
            state, y = self.tilt.process(state, y)
        return state, y
