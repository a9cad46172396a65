"""Velvet noise family OVN/OVNA/ARN/TRN with optional 'crush'
(reference: src/main/noise/Velvet.cpp; per the DAFx2019 Werner taxonomy
the reference header cites).

Sparse-impulse generation is host-side numpy (the spike-placement
recurrence is data-dependent but trivially cheap at ~sr/width spikes/s);
bulk buffers move to device as arrays.
"""

from __future__ import annotations

import enum

import numpy as np

from lsp_dsp_units_tpu.models.util.randomizer import (
    Randomizer, RandomFunction)
from lsp_dsp_units_tpu.models.noise.mls import MLS


class VelvetType(enum.Enum):
    OVN = "ovn"       # original velvet noise
    OVNA = "ovna"     # OVN variant (window-aligned jitter)
    ARN = "arn"       # additive random noise
    TRN = "trn"       # totally random noise


class VelvetCore(enum.Enum):
    LCG = "lcg"
    MLS = "mls"


class Velvet:
    # default core is MLS like the reference's standalone Velvet
    # (Velvet.cpp:50); NoiseGenerator overrides to LCG, matching its
    # own defaults (Generator.cpp:60)
    def __init__(self, vtype: VelvetType = VelvetType.OVN,
                 core: VelvetCore = VelvetCore.MLS,
                 window_width: float = 10.0, arn_delta: float = 0.5,
                 crush: bool = False, crush_prob: float = 0.5,
                 amplitude: float = 1.0, offset: float = 0.0,
                 seed: int | None = None):
        self.vtype = vtype
        self.core = core
        self.window_width = float(window_width)
        self.arn_delta = float(arn_delta)
        self.crush = bool(crush)
        self.crush_prob = float(crush_prob)
        self.amplitude = float(amplitude)
        self.offset = float(offset)
        self.rand = Randomizer(seed)
        self.mls = MLS(n_bits=23)

    def _rv(self) -> float:
        return float(self.rand.random(RandomFunction.LINEAR, 1)[0])

    def _spike(self) -> float:
        if self.core == VelvetCore.MLS:
            return 1.0 if self.mls.progress() else -1.0
        return 2.0 * round(self._rv()) - 1.0

    def _crushed_spike(self) -> float:
        return 1.0 if self._rv() > self.crush_prob else -1.0

    def generate(self, count: int) -> np.ndarray:
        """(reference Velvet::do_process)"""
        dst = np.zeros(count, np.float32)
        w = self.window_width
        if self.vtype == VelvetType.OVN:
            scan = 0
            k = w - 1.0
            while True:
                idx = int(scan * w + self._rv() * k)
                if idx >= count:
                    break
                dst[idx] = (self._crushed_spike() if self.crush
                            else self._spike())
                scan += 1
        elif self.vtype == VelvetType.OVNA:
            scan = 0
            while True:
                idx = int(scan * w + self._rv() * w)
                if idx >= count:
                    break
                dst[idx] = (self._crushed_spike() if self.crush
                            else self._spike())
                scan += 1
        elif self.vtype == VelvetType.ARN:
            k = 2.0 * self.arn_delta * (w - 1.0)
            b = (1.0 - self.arn_delta) * (w - 1.0)
            # reference accumulates into a size_t, truncating the
            # fractional part on EVERY step (Velvet.cpp:210-218
            # `size_t idx; idx += 1.0f + b + k*rv`), not just at
            # indexing — keeping fractional carry drifts the spike
            # positions within a few windows
            pos = 0
            while True:
                pos = int(pos + 1.0 + b + k * self._rv())
                if pos >= count:
                    break
                dst[pos] = (self._crushed_spike() if self.crush
                            else self._spike())
        elif self.vtype == VelvetType.TRN:
            k = w / (w - 1.0)
            for i in range(count):
                dst[i] = round(k * (self._rv() - 0.5))
            if self.crush:
                for i in range(count):
                    mult = 1.0 if self._rv() > self.crush_prob else -1.0
                    dst[i] = mult * abs(dst[i])
        return dst * self.amplitude + self.offset
