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


def measure_device(voices: int = 1024, block: int = 1024,
                   scan_k: int = 64, sr: int = 48000,
                   mode: str = "gather"):
    """Device mixdown rate (models/sampling/device_mix.py): one gather
    + one routing matmul per block, scan_k blocks per dispatch so the
    tunnel round trip amortizes (round-4 verdict ask #9: a device path
    >= 3x the host number at 1k voices)."""
    import jax
    import jax.numpy as jnp

    from lsp_dsp_units_tpu.models.sampling.device_mix import (
        build_bank, build_bank_padded, build_voices, mix_block,
        mix_block_dma)

    rng = np.random.default_rng(0)
    data = rng.normal(size=sr).astype(np.float32) * 0.25
    bank, bank_len = build_bank([data])
    bank_p, _, pad = build_bank_padded([data], block)
    specs = [dict(sample_id=0, channel=0, volume=0.1,
                  delay=(v * 7) % 4800, loop=(v % 2 == 0),
                  loop_start=1000, loop_end=40000)
             for v in range(voices)]
    voices_t, st0 = build_voices(specs, 1, [sr])

    def run(st, k0):
        def body(carry, _):
            s, acc = carry
            if mode == "dma":
                s, y = mix_block_dma(bank_p, bank_len, pad, voices_t,
                                     s, block)
            else:
                s, y = mix_block(bank, bank_len, voices_t, s, block)
            return (s, acc + jnp.sum(y)), None
        (s, acc), _ = jax.lax.scan(body, (st, jnp.float32(0.0)), None,
                                   length=scan_k)
        return s, acc

    g = jax.jit(run)
    st, acc = g(st0, 0)
    np.asarray(acc)                    # compile + surface errors
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        st, acc = g(st, 0)
        np.asarray(acc)
        el = time.perf_counter() - t0
        best = max(best, scan_k * block / el)
    return {
        "voices": voices,
        "mode": mode,
        "backend": jax.default_backend(),
        "out_samples_per_sec": round(best, 1),
        "x_realtime": round(best / sr, 2),
        "voice_samples_per_sec": round(best * voices, 1),
    }


if __name__ == "__main__":
    import json
    import sys
    if "--device" in sys.argv:
        for v in (1024, 4096):
            for mode in ("gather", "dma"):
                print(json.dumps(measure_device(voices=v, mode=mode)),
                      flush=True)
    else:
        for v in (64, 256):
            print(json.dumps(measure(voices=v)))
