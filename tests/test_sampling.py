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
