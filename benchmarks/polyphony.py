"""SamplePlayer polyphony scale benchmark (round-3 verdict #9): 256
concurrent playbacks mixed down on the host — the plugin-sampler
serving shape (reference SamplePlayer.cpp:305-366 batch mixing).

Measured on this 4-core host (numbers in NUMERICS.md):
  round-3 code  :  78 M voice-samples/s  ( 6.3x realtime @ 256 voices)
  + slice fast path in _mix_batch: 191 M voice-samples/s (15.5x)
The remaining cost is host Python per voice-batch-block (~5 us); the
mix arithmetic itself is <10% of it.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from lsp_dsp_units_tpu.models.sampling.player import (
    SamplePlayer, PlaySettings, LoopMode)
from lsp_dsp_units_tpu.models.sampling.sample import Sample


def build_player(voices: int = 256, sr: int = 48000) -> SamplePlayer:
    rng = np.random.default_rng(0)
    s = Sample(1, sr, sr)
    s.data = rng.normal(size=(1, sr)).astype(np.float32) * 0.25
    player = SamplePlayer(max_samples=4, max_playbacks=voices)
    player.bind(0, s)
    for v in range(voices):
        player.play(PlaySettings(
            sample_id=0, channel=0, volume=0.1, delay=v * 7 % 4800,
            loop_mode=LoopMode.DIRECT if v % 2 else LoopMode.NONE,
            loop_start=1000, loop_end=40000))
    return player


def measure(voices: int = 256, block: int = 1024, n_blocks: int = 200,
            sr: int = 48000):
    player = build_player(voices, sr)
    player.process(block)                      # warm-up
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        player.process(block)
    el = time.perf_counter() - t0
    rate = n_blocks * block / el
    return {
        "voices": voices,
        "out_samples_per_sec": round(rate, 1),
        "x_realtime": round(rate / sr, 2),
        "voice_samples_per_sec": round(rate * voices, 1),
    }


if __name__ == "__main__":
    import json
    for v in (64, 256):
        print(json.dumps(measure(voices=v)))
