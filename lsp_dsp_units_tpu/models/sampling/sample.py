"""Sample — in-memory multi-channel audio buffer
(reference: src/main/sampling/Sample.cpp).

Covers the reference surface: init/resize/stretch/insert/append, gain,
fades, reverse, normalize, WAV load/save, and Lanczos resampling to a
new rate (reference Sample.cpp:1021-1207 — here the direct windowed-sinc
resampler from ops.resample).  Host numpy storage ([channels, length]);
content moves to device as arrays when processors consume it.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import numpy as np

from lsp_dsp_units_tpu.ops import resample as rs
from lsp_dsp_units_tpu.utils import wavio
from lsp_dsp_units_tpu.models.misc import fade as fade_ops


class SampleNormalize(enum.Enum):
    NONE = "none"
    ABOVE = "above"       # only amplify if below target
    BELOW = "below"       # only attenuate if above target
    ALWAYS = "always"


class Sample:
    def __init__(self, channels: int = 0, length: int = 0,
                 sample_rate: int = 48000):
        self.data = np.zeros((channels, length), np.float32)
        self.sample_rate = int(sample_rate)

    # -- construction -------------------------------------------------------
    @classmethod
    def load(cls, path: str) -> "Sample":
        data, sr = wavio.read_wav(path)
        s = cls(0, 0, sr)
        s.data = np.asarray(data, np.float32)
        return s

    def save(self, path: str) -> None:
        wavio.write_wav(path, self.data, self.sample_rate)

    @property
    def channels(self) -> int:
        return self.data.shape[0]

    @property
    def length(self) -> int:
        return self.data.shape[1]

    def init(self, channels: int, length: int) -> "Sample":
        self.data = np.zeros((channels, length), np.float32)
        return self

    def resize(self, length: int) -> "Sample":
        c, n = self.data.shape
        if length <= n:
            self.data = self.data[:, :length].copy()
        else:
            self.data = np.concatenate(
                [self.data, np.zeros((c, length - n), np.float32)], axis=1)
        return self

    def append(self, other: np.ndarray) -> "Sample":
        other = np.atleast_2d(np.asarray(other, np.float32))
        self.data = np.concatenate([self.data, other], axis=1)
        return self

    def insert(self, pos: int, samples: int) -> "Sample":
        c = self.channels
        z = np.zeros((c, samples), np.float32)
        self.data = np.concatenate(
            [self.data[:, :pos], z, self.data[:, pos:]], axis=1)
        return self

    def cut(self, pos: int, samples: int) -> "Sample":
        self.data = np.concatenate(
            [self.data[:, :pos], self.data[:, pos + samples:]], axis=1)
        return self

    def stretch(self, new_length: int, start: int = 0,
                end: Optional[int] = None) -> "Sample":
        """Stretch the region [start, end) to a new length by Lanczos
        resampling it (reference Sample::stretch semantics)."""
        end = self.length if end is None else end
        region = self.data[:, start:end]
        n = region.shape[1]
        if n == 0 or new_length == n:
            return self
        stretched = np.stack([
            rs.resample_fractional(region[c], n, new_length)
            for c in range(self.channels)])
        stretched = stretched[:, :new_length].astype(np.float32)
        if stretched.shape[1] < new_length:
            stretched = np.pad(stretched,
                               ((0, 0), (0, new_length
                                         - stretched.shape[1])))
        self.data = np.concatenate(
            [self.data[:, :start], stretched, self.data[:, end:]], axis=1)
        return self

    # -- edits ---------------------------------------------------------------
    def apply_gain(self, gain: float, pos: int = 0,
                   count: Optional[int] = None) -> "Sample":
        count = self.length - pos if count is None else count
        self.data[:, pos:pos + count] *= np.float32(gain)
        return self

    def reverse(self, channel: Optional[int] = None) -> "Sample":
        if channel is None:
            self.data = self.data[:, ::-1].copy()
        else:
            self.data[channel] = self.data[channel][::-1]
        return self

    def fade_in(self, length: int) -> "Sample":
        import jax.numpy as jnp
        self.data = np.asarray(
            fade_ops.fade_in(jnp.asarray(self.data), length))
        return self

    def fade_out(self, length: int) -> "Sample":
        import jax.numpy as jnp
        self.data = np.asarray(
            fade_ops.fade_out(jnp.asarray(self.data), length))
        return self

    def normalize(self, gain: float,
                  mode: SampleNormalize = SampleNormalize.ALWAYS,
                  ) -> "Sample":
        peak = float(np.abs(self.data).max()) if self.data.size else 0.0
        if peak <= 0.0:
            return self
        k = gain / peak
        if mode == SampleNormalize.NONE:
            return self
        if mode == SampleNormalize.ABOVE and k < 1.0:
            return self
        if mode == SampleNormalize.BELOW and k > 1.0:
            return self
        self.data *= np.float32(k)
        return self

    # -- resampling (reference Sample.cpp:1021-1207) -------------------------
    def resample(self, new_rate: int) -> "Sample":
        if new_rate == self.sample_rate:
            return self
        out = np.stack([
            rs.resample_fractional(self.data[c], self.sample_rate,
                                   new_rate)
            for c in range(self.channels)]) if self.channels else \
            np.zeros((0, 0))
        self.data = out.astype(np.float32)
        self.sample_rate = int(new_rate)
        return self
