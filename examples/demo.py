"""Canonical embedding demo (the reference's mtest pattern,
src/test/mtest/demo.cpp:35-105): load WAV -> configure unit -> stream
process() in blocks -> save WAV.

Usage: python examples/demo.py in.wav out.wav \
    [filter|chain|loudness|sampler|stretch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")   # demo runs anywhere
import jax.numpy as jnp

from lsp_dsp_units_tpu.models.filters import Filter, FilterParams, FilterType
from lsp_dsp_units_tpu.models.meters import ILUFSMeter, Weighting
from lsp_dsp_units_tpu.pipeline import FilterConvChain
from lsp_dsp_units_tpu.utils.wavio import read_wav, write_wav
from lsp_dsp_units_tpu.utils.blocks import BlockStream
from lsp_dsp_units_tpu.utils.units import gain_to_db


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "filter"
    x, sr = read_wav(src)
    print(f"{src}: {x.shape[0]} ch, {x.shape[1]} samples @ {sr} Hz")

    if mode == "filter":
        # the reference demo config: BWC hi-shelf +6 dB @ 1 kHz slope 2
        flt = Filter(sr, FilterParams(ftype=FilterType.BT_BWC_HISHELF,
                                      slope=2, freq=1000.0, gain=2.0))
        proc = jax.jit(lambda st, xb: flt.process(st, xb))
        bs = BlockStream(lambda st, xb: proc(st, jnp.asarray(xb)),
                         flt.init_state((x.shape[0],)), 4096,
                         (x.shape[0],))
        # push() output is delayed one block; the aligned signal is
        # [block : block + n] of push+flush (the leading zeros are the
        # BlockStream latency, the flush tail completes the last block)
        full = np.concatenate([bs.push(x), bs.flush()], axis=-1)
        y = full[:, 4096: 4096 + x.shape[1]]
    elif mode == "chain":
        chain = FilterConvChain(sr, channels=x.shape[0], rank=12,
                                ir_seconds=0.5)
        params = chain.build()
        state = chain.init_state(params)
        step = jax.jit(chain.step)
        t = (x.shape[1] // chain.block) * chain.block
        state, y = step(params, state, jnp.asarray(x[:, :t]))
        y = np.asarray(y)
    elif mode == "loudness":
        meter = ILUFSMeter(sr, channels=x.shape[0], weighting=Weighting.K)
        st = meter.init_state()
        t = (x.shape[1] // meter.block) * meter.block
        st, out = meter.process(st, jnp.asarray(x[:, :t]))
        lufs = gain_to_db(float(np.asarray(
            meter.loudness_lufs_gain(st))))
        print(f"integrated loudness: {lufs:.2f} LUFS")
        y = np.asarray(out)[None]
    elif mode == "sampler":
        # loop the middle half of the input ping-pong with crossfades
        # and render 2x the original length (SamplePlayer batch model)
        from lsp_dsp_units_tpu.models.sampling import (
            Sample, SamplePlayer, PlaySettings, LoopMode, XFadeType)
        bank = SamplePlayer()
        bank.bind(0, Sample.load(src))
        n = x.shape[1]
        pb = bank.play(PlaySettings(
            sample_id=0, loop_start=n // 4, loop_end=3 * n // 4,
            loop_mode=LoopMode.DIRECT_HALF_PP,
            xfade_length=min(n // 8, sr // 50),
            xfade_type=XFadeType.LINEAR))
        y = bank.process(2 * n)
        pb.stop()
        y = np.concatenate([y, bank.process(n)])[None, :]
    elif mode == "stretch":
        # pitch-preserving 1.5x time stretch (Sample.stretch)
        from lsp_dsp_units_tpu.models.sampling import (Sample,
                                                       SampleCrossfade)
        s = Sample.load(src)
        s.stretch(int(s.length * 1.5),
                  fade_type=SampleCrossfade.LINEAR)
        y = s.data
    else:
        raise SystemExit(f"unknown mode {mode}")

    write_wav(dst, y, sr)
    print(f"wrote {dst}: peak {np.abs(y).max():.4f}")


if __name__ == "__main__":
    main()
