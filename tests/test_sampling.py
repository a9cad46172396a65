"""Sample editing ops — chunked crossfade time-stretch (reference
src/main/sampling/Sample.cpp:399-640 + utest/sampling/sample.cpp)."""

import numpy as np
import pytest

from lsp_dsp_units_tpu.models.sampling import (Sample, SampleCrossfade,
                                               SampleNormalize)

SR = 48000


def _sine(freq, n, amp=0.5):
    t = np.arange(n) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _dominant_freq(x):
    X = np.abs(np.fft.rfft(np.asarray(x, np.float64)))
    return np.fft.rfftfreq(x.size, 1.0 / SR)[int(np.argmax(X))]


def test_stretch_linear_preserves_dc():
    """Linear crossfade weights sum to 1 in every overlap, so a DC
    signal must pass through the multi-chunk stretch unchanged."""
    s = Sample(1, 1000, SR)
    s.data[:] = 1.0
    s.stretch(1700, chunk_size=256, fade_type=SampleCrossfade.LINEAR,
              fade_size=0.5)
    assert s.length == 1700
    y = s.data[0]
    np.testing.assert_allclose(y[1:-1], 1.0, atol=1e-5)


def test_stretch_preserves_pitch_resample_shifts_it():
    """The crossfade stretch is pitch-preserving; the resampling stretch
    shifts pitch by the stretch ratio (the distinguishing semantics of
    reference Sample::stretch vs Sample::resample)."""
    n = 24000
    x = _sine(440.0, n)
    s = Sample(1, n, SR)
    s.data[0] = x
    s.stretch(2 * n, chunk_size=2048,
              fade_type=SampleCrossfade.CONST_POWER, fade_size=0.5)
    assert s.length == 2 * n
    assert abs(_dominant_freq(s.data[0]) - 440.0) < 6.0

    s2 = Sample(1, n, SR)
    s2.data[0] = x
    s2.stretch_resample(2 * n)
    assert abs(_dominant_freq(s2.data[0]) - 220.0) < 6.0


def test_stretch_region_bookkeeping():
    """Stretching [start, end) only rewrites that region; surrounding
    samples are bit-identical and total length adjusts."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5000)).astype(np.float32)
    s = Sample(2, 5000, SR)
    s.data[:] = x
    s.stretch(1500, chunk_size=300, fade_type=SampleCrossfade.LINEAR,
              fade_size=0.4, start=1000, end=2000)
    assert s.length == 5000 - 1000 + 1500
    np.testing.assert_array_equal(s.data[:, :1000], x[:, :1000])
    np.testing.assert_array_equal(s.data[:, 1000 + 1500:], x[:, 2000:])
    assert np.isfinite(s.data).all()


def test_stretch_shrink():
    s = Sample(1, 4000, SR)
    s.data[0] = _sine(440.0, 4000)
    s.stretch(2500, chunk_size=512,
              fade_type=SampleCrossfade.CONST_POWER, fade_size=0.5)
    assert s.length == 2500
    assert np.isfinite(s.data).all()
    assert abs(_dominant_freq(s.data[0]) - 440.0) < 25.0


def test_stretch_single_crossfade_path():
    """new_length + fade <= 2*chunk takes the two-chunk path
    (Sample.cpp:486-521): ends must match the source boundaries."""
    x = np.arange(1000, dtype=np.float32)
    s = Sample(1, 1000, SR)
    s.data[0] = x
    s.stretch(600, chunk_size=500, fade_type=SampleCrossfade.LINEAR,
              fade_size=0.2)
    assert s.length == 600
    y = s.data[0]
    assert y[0] == 0.0                       # starts at src start
    assert abs(y[-1] - 999.0) < 1e-3         # ends at src end
    assert np.isfinite(y).all()


def test_stretch_degenerate_one_sample_region():
    s = Sample(1, 10, SR)
    s.data[0] = np.arange(10, dtype=np.float32)
    s.stretch(5, start=3, end=4)
    assert s.length == 14
    np.testing.assert_array_equal(s.data[0, 3:8], 3.0)  # held boundary
    np.testing.assert_array_equal(s.data[0, 8:], [4, 5, 6, 7, 8, 9])


def test_stretch_auto_chunk_and_noop():
    s = Sample(1, 2000, SR)
    s.data[0] = _sine(997.0, 2000)
    before = s.data.copy()
    s.stretch(2000)                          # same length -> no-op
    np.testing.assert_array_equal(s.data, before)
    s.stretch(3000)                          # auto chunk size
    assert s.length == 3000
    assert np.isfinite(s.data).all()


def test_stretch_bad_range():
    s = Sample(1, 100, SR)
    with pytest.raises(ValueError):
        s.stretch(50, start=80, end=40)
    with pytest.raises(ValueError):
        s.stretch(50, start=0, end=200)


def test_stretch_const_power_keeps_noise_power():
    """Const-power crossfades keep uncorrelated-noise power roughly
    flat through the overlaps (the reason the mode exists)."""
    rng = np.random.default_rng(3)
    n = 20000
    s = Sample(1, n, SR)
    s.data[0] = rng.standard_normal(n).astype(np.float32)
    s.stretch(2 * n, chunk_size=1024,
              fade_type=SampleCrossfade.CONST_POWER, fade_size=0.5)
    y = s.data[0]
    # windowed RMS across the stretched signal stays near 1
    w = 2048
    rms = np.sqrt(np.convolve(y.astype(np.float64) ** 2,
                              np.ones(w) / w, mode="valid"))
    assert 0.75 < rms.min() and rms.max() < 1.25


def test_prepend_set_channels_save_range(tmp_path):
    s = Sample(1, 100, SR)
    s.data[0] = np.arange(100, dtype=np.float32)
    s.prepend(10)
    assert s.length == 110 and s.data[0, 10] == 0.0 and s.data[0, 11] == 1.0
    s.set_channels(3)
    assert s.channels == 3 and np.all(s.data[1:] == 0.0)
    s.set_channels(2)
    assert s.channels == 2
    p = str(tmp_path / "r.wav")
    n = s.save_range(p, 10, 50)
    assert n == 50
    s2 = Sample.load(p)
    assert s2.length == 50 and s2.channels == 2
    np.testing.assert_allclose(s2.data[0], np.arange(50), atol=2e-4)


# -- SamplePlayer batch machine (reference helpers/playback.cpp) ----------

def _player_with_ramp(n=100):
    from lsp_dsp_units_tpu.models.sampling import Sample, SamplePlayer
    bank = SamplePlayer()
    s = Sample(1, n, SR)
    s.data[0] = np.arange(n, dtype=np.float32)
    bank.bind(0, s)
    return bank


def test_player_direct_loop_exact():
    """DIRECT loop without crossfade repeats [ls, le) verbatim."""
    from lsp_dsp_units_tpu.models.sampling import PlaySettings, LoopMode
    bank = _player_with_ramp()
    bank.play(PlaySettings(sample_id=0, loop_start=10, loop_end=20,
                           loop_mode=LoopMode.DIRECT))
    out = bank.process(50)
    np.testing.assert_array_equal(out[:10], np.arange(10))        # head
    for k in range(4):
        np.testing.assert_array_equal(out[10 + 10 * k: 20 + 10 * k],
                                      np.arange(10, 20))          # loops


def test_player_pingpong_loop():
    """HALF_PP alternates direction: fwd, back, fwd..."""
    from lsp_dsp_units_tpu.models.sampling import PlaySettings, LoopMode
    bank = _player_with_ramp()
    bank.play(PlaySettings(sample_id=0, loop_start=10, loop_end=20,
                           loop_mode=LoopMode.DIRECT_HALF_PP))
    out = bank.process(40)
    np.testing.assert_array_equal(out[10:20], np.arange(10, 20))   # fwd
    np.testing.assert_array_equal(out[20:30], np.arange(19, 9, -1))  # back
    np.testing.assert_array_equal(out[30:40], np.arange(10, 20))   # fwd


def test_player_reverse_loop():
    """REVERSE loop always plays end -> start."""
    from lsp_dsp_units_tpu.models.sampling import PlaySettings, LoopMode
    bank = _player_with_ramp()
    bank.play(PlaySettings(sample_id=0, loop_start=10, loop_end=20,
                           loop_mode=LoopMode.REVERSE))
    out = bank.process(40)
    np.testing.assert_array_equal(out[20:30], np.arange(19, 9, -1))
    np.testing.assert_array_equal(out[30:40], np.arange(19, 9, -1))


def test_player_loop_crossfade_continuity():
    """With xfade, the loop seam blends: linear fades sum to the DC
    value on constant input (playback.cpp:436-454)."""
    from lsp_dsp_units_tpu.models.sampling import (Sample, SamplePlayer,
                                                   PlaySettings, LoopMode,
                                                   XFadeType)
    bank = SamplePlayer()
    s = Sample(1, 100, SR)
    s.data[0] = 1.0
    bank.bind(0, s)
    bank.play(PlaySettings(sample_id=0, loop_start=10, loop_end=40,
                           loop_mode=LoopMode.DIRECT, xfade_length=8,
                           xfade_type=XFadeType.LINEAR))
    out = bank.process(200)
    # steady state: everything (past the first sample) stays at 1.0
    np.testing.assert_allclose(out[1:], 1.0, atol=1e-6)


def test_player_stop_plays_tail():
    """stop() leaves the loop and plays through to the sample end."""
    from lsp_dsp_units_tpu.models.sampling import PlaySettings, LoopMode
    bank = _player_with_ramp()
    pb = bank.play(PlaySettings(sample_id=0, loop_start=10, loop_end=20,
                                loop_mode=LoopMode.DIRECT))
    out1 = bank.process(15)                 # inside the first loop pass
    pb.stop()
    out2 = bank.process(120)
    full = np.concatenate([out1, out2])
    # after the current loop batch completes (t=20), the tail follows
    np.testing.assert_array_equal(full[20:100], np.arange(20, 100))
    np.testing.assert_array_equal(full[100:], 0.0)   # sample exhausted
    assert not pb.active


def test_player_full_pp_leaves_after_reverse():
    """FULL_PP (direct) may leave the loop only after a reversed pass."""
    from lsp_dsp_units_tpu.models.sampling import PlaySettings, LoopMode
    bank = _player_with_ramp()
    pb = bank.play(PlaySettings(sample_id=0, loop_start=10, loop_end=20,
                                loop_mode=LoopMode.DIRECT_FULL_PP))
    bank.process(12)        # inside first (forward) loop pass
    pb.stop()
    out = bank.process(60)  # must finish fwd pass AND a reverse pass
    full_t = 12 + np.arange(60)
    # reverse pass occupies t in [20, 30): values 19..10
    rev = out[(full_t >= 20) & (full_t < 30)]
    np.testing.assert_array_equal(rev, np.arange(19, 9, -1))
    # tail [le, len) starts at t=30
    tail = out[(full_t >= 30) & (full_t < 40)]
    np.testing.assert_array_equal(tail, np.arange(20, 30))


def test_player_cancel_fadeout():
    from lsp_dsp_units_tpu.models.sampling import (Sample, SamplePlayer,
                                                   PlaySettings)
    bank = SamplePlayer()
    s = Sample(1, 1000, SR)
    s.data[0] = 1.0
    bank.bind(0, s)
    pb = bank.play(PlaySettings(sample_id=0))
    bank.process(100)
    pb.cancel(fadeout=50)
    out = bank.process(100)
    assert abs(out[0] - 1.0) < 0.03
    assert out[49] < 0.05 and np.all(out[50:] == 0.0)
    assert np.all(np.diff(out[:50]) <= 1e-6)   # monotone fade
    assert not pb.active


def test_player_reverse_playback_no_loop():
    from lsp_dsp_units_tpu.models.sampling import PlaySettings
    bank = _player_with_ramp()
    bank.play(PlaySettings(sample_id=0, start=30, reverse=True))
    out = bank.process(40)
    np.testing.assert_array_equal(out[:30], np.arange(29, -1, -1))
    np.testing.assert_array_equal(out[30:], 0.0)


def test_player_reverse_stop_during_head_plays_reverse_tail():
    """Reverse playback stopped during the HEAD batch: the tail continues
    DOWNWARD from loop_end to 0 (reference playback.cpp:193-201 bReverse
    branch), not forward from loop_start."""
    from lsp_dsp_units_tpu.models.sampling import PlaySettings, LoopMode
    bank = _player_with_ramp()
    pb = bank.play(PlaySettings(sample_id=0, start=40, reverse=True,
                                loop_start=10, loop_end=20,
                                loop_mode=LoopMode.DIRECT))
    bank.process(5)          # inside the head (descending 39, 38, ...)
    pb.stop()
    out = bank.process(60)
    full = np.concatenate([np.arange(39, 34, -1), out])
    # head continues down to loop_end (t in [0, 20): values 39..20),
    # then the tail descends from loop_end to 0 (values 19..0)
    np.testing.assert_array_equal(full[:20], np.arange(39, 19, -1))
    np.testing.assert_array_equal(full[20:40], np.arange(19, -1, -1))
    np.testing.assert_array_equal(full[40:], 0.0)
    assert not pb.active


def _utest_sample():
    """The reference utest's 2-channel test sample
    (utest/sampling/sample.cpp:36-51): 440 Hz sine + linear ramp."""
    s = Sample(2, SR, SR)
    w = 2.0 * np.pi * 440.0 / SR
    i = np.arange(SR)
    s.data[0] = (0.5 * np.sin(w * i)).astype(np.float32)
    s.data[1] = (i / (SR - 1)).astype(np.float32)
    return s


@pytest.mark.parametrize("fade", [SampleCrossfade.LINEAR,
                                  SampleCrossfade.CONST_POWER])
def test_stretch_reference_utest_length_contract(fade):
    """Port of the reference stretch utest's validation and length
    assertions (utest/sampling/sample.cpp:92-215): stretched length is
    always old_length + new_region - old_region, including the
    degenerate 0/1-sample regions, single-crossfade, short-region,
    widening, shortening, cutoff and auto-chunk cases."""
    s = _utest_sample()

    # invalid regions are rejected
    for start, end in ((SR // 2, SR // 2 - 1024),
                       (SR + 1, SR + 1024),
                       (0, SR + 1024)):
        ss = Sample(2, SR, SR)
        ss.data = s.data.copy()
        with pytest.raises(ValueError):
            ss.stretch(256, 1024, fade, 0.5, start, end)

    cases = [   # (new_len, chunk, fade_size, start, end)
        (256, 1024, 0.5, SR // 2, SR // 2),          # 0-sample region
        (256, 1024, 0.5, SR // 2 + 72, SR // 2 + 73),  # 1-sample region
        (3072, 2048, 0.25, SR // 2, SR // 2 + 8192),   # single crossfade
        (1630, 2048, 0.25, SR // 2, SR // 2 + 64),     # short region
        (1630, 2048, 1.0, SR // 2, SR // 2 + 64),      # full-fade short
        (16200, 1024, 0.25, SR // 2, SR // 2 + 4000),  # widening
        (4200, 1024, 0.25, SR // 2, SR // 2 + 16000),  # shortening
        (0, 1024, 0.25, SR // 2, SR // 2 + 16000),     # cutoff
        (6200, 1024, 1.0, SR // 2, SR // 2 + 2),       # tiny region
        (16300, 0, 0.25, SR // 2, SR // 2 + 2048),     # auto chunk size
    ]
    for new_len, chunk, fsz, start, end in cases:
        ss = Sample(2, SR, SR)
        ss.data = s.data.copy()
        ss.stretch(new_len, chunk, fade, fsz, start, end)
        assert ss.length == SR + new_len - (end - start), (
            new_len, chunk, fsz, start, end)
        # untouched prefix is bit-exact; output stays finite and bounded
        np.testing.assert_array_equal(ss.data[:, :start],
                                      s.data[:, :start])
        assert np.all(np.isfinite(ss.data))
        assert float(np.abs(ss.data).max()) < 1.6


def test_polyphony_256_voices_throughput():
    """256 concurrent playbacks mix faster than realtime with headroom
    (the plugin-sampler serving shape; benchmarks/polyphony.py measured
    15.5x realtime on this 4-core host — assert a conservative 3x so
    loaded CI hosts don't flake, and catch order-of-magnitude host-
    scheduling regressions)."""
    from benchmarks.polyphony import measure
    r = measure(voices=256, block=1024, n_blocks=50)
    assert r["x_realtime"] >= 3.0, r


def test_multiformat_roundtrip_or_gated():
    """FLAC round-trip through the optional soundfile path (skipped
    when the package is absent — the WAV path stays dependency-free;
    reference Sample.cpp:753-830 reads everything libsndfile does)."""
    import os
    import tempfile
    from lsp_dsp_units_tpu.utils import wavio

    rng = np.random.default_rng(5)
    x = (rng.normal(size=(2, 4800)) * 0.25).astype(np.float32)
    if not wavio.have_soundfile():
        with pytest.raises(RuntimeError, match="soundfile"):
            wavio.read_audio("missing.flac")
        pytest.skip("optional soundfile package not installed")
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.flac")
        wavio.write_audio(p, x, 48000)
        y, sr = wavio.read_audio(p)
        assert sr == 48000
        np.testing.assert_allclose(y, x, atol=1e-4)


def test_device_mix_matches_host_player():
    """The device mixdown (models/sampling/device_mix.py) is
    sample-exact against the host SamplePlayer on its supported scope:
    DIRECT-loop and one-shot voices, delays, gains, channel routing,
    no crossfade (reference SamplePlayer.cpp:305-366 batch mixing)."""
    from lsp_dsp_units_tpu.models.sampling.device_mix import (
        build_bank, build_voices, mix_block)
    from lsp_dsp_units_tpu.models.sampling.player import (
        SamplePlayer, PlaySettings, LoopMode)

    rng = np.random.default_rng(11)
    sr = 48000
    n0, n1 = 3000, 2200
    s0 = Sample(1, sr, n0)
    s0.data = rng.normal(size=(1, n0)).astype(np.float32) * 0.25
    s1 = Sample(1, sr, n1)
    s1.data = rng.normal(size=(1, n1)).astype(np.float32) * 0.25

    # host player mixes MONO (reference SamplePlayer::process): route
    # every device voice to channel 0 and compare mono streams
    channels = 1
    specs = []
    for v in range(24):
        sid = v % 2
        loop = v % 3 == 0
        specs.append(dict(
            sample_id=sid, channel=0,
            volume=0.05 + 0.01 * v, delay=(v * 37) % 900,
            loop=loop, loop_start=250, loop_end=1800))

    player = SamplePlayer(max_samples=2, max_playbacks=64)
    player.bind(0, s0)
    player.bind(1, s1)
    for s in specs:
        player.play(PlaySettings(
            sample_id=s["sample_id"], channel=s["channel"],
            volume=s["volume"], delay=s["delay"],
            loop_mode=(LoopMode.DIRECT if s["loop"] else LoopMode.NONE),
            loop_start=s["loop_start"], loop_end=s["loop_end"],
            xfade_length=0))

    bank, bank_len = build_bank([s0.data[0], s1.data[0]])
    voices, st = build_voices(specs, channels, [n0, n1])

    block = 512
    host = np.zeros(block * 8, np.float32)
    dev = np.zeros((1, block * 8), np.float32)
    for b in range(8):
        h = player.process(block)
        host[b * block:(b + 1) * block] = np.asarray(h)
        st, y = mix_block(bank, bank_len, voices, st, block)
        dev[:, b * block:(b + 1) * block] = np.asarray(y)
    np.testing.assert_allclose(dev[0], host, atol=2e-6)


def test_device_mix_dma_matches_gather():
    """The DMA fast path (ops.slicedma batched_slice: aligned row DMA
    + two dynamic rolls per voice) is bit-exact vs the gather-based
    mix_block across delays, loop wraps and one-shot ends (TPU
    measured 1.8 G voice-samples/s at 1024 voices vs the gather's
    131 M — NUMERICS.md round 5)."""
    from lsp_dsp_units_tpu.models.sampling.device_mix import (
        build_bank, build_bank_padded, build_voices, mix_block,
        mix_block_dma)

    rng = np.random.default_rng(7)
    d0 = rng.normal(size=40000).astype(np.float32) * 0.25
    d1 = rng.normal(size=30000).astype(np.float32) * 0.25
    block = 512
    specs = [dict(sample_id=v % 2, channel=v % 3,
                  volume=0.05 + 0.01 * v, delay=(v * 211) % 3000,
                  loop=(v % 3 == 0), loop_start=500, loop_end=20000)
             for v in range(16)]
    bank, L = build_bank([d0, d1])
    bank_p, L2, pad = build_bank_padded([d0, d1], block)
    assert L == L2
    voices, st_a = build_voices(specs, 3, [40000, 30000])
    st_b = st_a
    for b in range(60):
        st_a, ya = mix_block(bank, L, voices, st_a, block)
        st_b, yb = mix_block_dma(bank_p, L, pad, voices, st_b, block,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
    np.testing.assert_array_equal(np.asarray(st_a.pos),
                                  np.asarray(st_b.pos))
