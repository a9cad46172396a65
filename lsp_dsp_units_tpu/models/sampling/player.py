"""SamplePlayer — polyphonic sample playback
(reference: src/main/sampling/SamplePlayer.cpp, helpers/playback.cpp,
helpers/batch.cpp, Playback.h, PlaySettings.h).

Playback items carry {sample id, channel, volume, position, loop mode,
crossfade}; mixing a block is a batched gather over the sample bank —
the reference's per-playback batch scheduling (helpers/batch.cpp)
becomes one vectorized segment computation per playback per block.
Host orchestrates (play/cancel lists); the mix itself is numpy (device
path available by moving the gather into jnp for large polyphony).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from lsp_dsp_units_tpu.models.sampling.sample import Sample


class LoopMode(enum.Enum):
    NONE = "none"
    DIRECT = "direct"           # wrap to loop start
    REVERSE = "reverse"         # ping-pong
class XFadeType(enum.Enum):
    LINEAR = "linear"
    CONST_POWER = "const_power"


@dataclass
class PlaySettings:
    """(reference PlaySettings.h parameter bag)"""
    sample_id: int = 0
    channel: int = 0
    volume: float = 1.0
    delay: int = 0
    start: int = 0
    loop_start: int = -1
    loop_end: int = -1
    loop_mode: LoopMode = LoopMode.NONE
    xfade_type: XFadeType = XFadeType.LINEAR
    xfade_length: int = 0
    reverse: bool = False


@dataclass
class Playback:
    """Handle over a live playback (reference Playback.h)."""
    settings: PlaySettings
    position: float = 0.0
    delay_left: int = 0
    direction: int = 1
    active: bool = True
    serial: int = 0

    def cancel(self, fadeout: int = 0) -> None:
        self.active = False


class SamplePlayer:
    def __init__(self, max_samples: int = 64, max_playbacks: int = 64):
        self.samples: Dict[int, Sample] = {}
        self.max_playbacks = int(max_playbacks)
        self.playbacks: List[Playback] = []
        self._serial = 0
        self.gain = 1.0

    # -- bank management (reference SamplePlayer bind/unbind) --------------
    def bind(self, sample_id: int, sample: Sample) -> None:
        self.samples[sample_id] = sample

    def unbind(self, sample_id: int) -> Optional[Sample]:
        return self.samples.pop(sample_id, None)

    def set_gain(self, gain: float) -> None:
        self.gain = float(gain)

    # -- playback control (reference SamplePlayer::play, :368-412) ---------
    def play(self, settings: PlaySettings) -> Optional[Playback]:
        if settings.sample_id not in self.samples:
            return None
        if len(self.playbacks) >= self.max_playbacks:
            # steal the oldest playback (reference reuses the inactive
            # list / oldest item)
            self.playbacks.pop(0)
        self._serial += 1
        pb = Playback(settings=settings,
                      position=float(settings.start),
                      delay_left=int(settings.delay),
                      direction=-1 if settings.reverse else 1,
                      serial=self._serial)
        self.playbacks.append(pb)
        return pb

    def stop(self) -> int:
        n = len(self.playbacks)
        self.playbacks.clear()
        return n

    # -- mixing (reference SamplePlayer::process, :305-366) -----------------
    def process(self, count: int) -> np.ndarray:
        """Mix ``count`` output samples of all active playbacks (mono)."""
        out = np.zeros(count, np.float32)
        still_active: List[Playback] = []
        for pb in self.playbacks:
            if not pb.active:
                continue
            smp = self.samples.get(pb.settings.sample_id)
            if smp is None or smp.length == 0:
                continue
            ch = min(pb.settings.channel, smp.channels - 1)
            data = smp.data[ch]
            s = pb.settings
            n0 = 0
            # initial delay
            if pb.delay_left > 0:
                d = min(pb.delay_left, count)
                pb.delay_left -= d
                n0 = d
            remaining = count - n0
            if remaining <= 0:
                still_active.append(pb)
                continue
            idx = pb.position + np.arange(remaining) * pb.direction
            loop_on = (s.loop_mode != LoopMode.NONE and s.loop_start >= 0
                       and s.loop_end > s.loop_start)
            if loop_on:
                ls, le = s.loop_start, s.loop_end
                ln = le - ls
                rel = idx - ls
                if s.loop_mode == LoopMode.DIRECT:
                    idx = np.where(idx >= le, ls + np.mod(rel, ln), idx)
                else:  # ping-pong
                    m = np.mod(rel, 2 * ln)
                    idx = np.where(idx >= le,
                                   np.where(m < ln, ls + m,
                                            le - 1 - (m - ln)), idx)
            valid = (idx >= 0) & (idx < data.size)
            g = np.asarray(data[np.clip(idx.astype(np.int64), 0,
                                        data.size - 1)])
            out[n0:] += np.where(valid, g, 0.0) * (s.volume * self.gain)
            pb.position = float(idx[-1] + pb.direction) if remaining else \
                pb.position
            if loop_on or (0 <= pb.position < data.size):
                still_active.append(pb)
            else:
                pb.active = False
        self.playbacks = still_active
        return out
