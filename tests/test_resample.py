"""Resampling / oversampler tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsp_dsp_units_tpu.ops import resample
from lsp_dsp_units_tpu.models.util.oversampler import Oversampler
from lsp_dsp_units_tpu.utils.units import snr_db

SR = 48000


@pytest.mark.parametrize("ratio", [2, 3, 4, 6, 8])
def test_upsample_passes_original_samples(ratio):
    """Phase 0 of the Lanczos kernel is an identity tap: y[i*R] equals
    x[i - lobes] (the kernel latency)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=256).astype(np.float32)
    lobes = 3
    hist = resample.upsample_history(lobes)
    hist, y = resample.upsample(hist, jnp.asarray(x), ratio, lobes)
    y = np.asarray(y)
    assert y.shape == (256 * ratio,)
    # y[(i + lobes)*R... y aligned: output sample (i)*R corresponds to
    # input x[i - lobes]
    got = y[lobes * ratio::ratio]
    np.testing.assert_allclose(got, x[: got.size], rtol=1e-5, atol=1e-6)


def test_upsample_sine_spectrum_clean():
    """Upsampling a sine must keep images suppressed (16bit quality)."""
    t = np.arange(4096)
    x = np.sin(2 * np.pi * 1000.0 * t / SR).astype(np.float32)
    lobes = resample.QUALITY_LOBES["16bit"]
    hist = resample.upsample_history(lobes)
    _, y = resample.upsample(hist, jnp.asarray(x), 4, lobes)
    y = np.asarray(y)[lobes * 4:]
    spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
    f_axis = np.fft.rfftfreq(y.size, 1.0 / (4 * SR))
    fund = spec[np.argmin(np.abs(f_axis - 1000.0))]
    # image would appear at 4*SR/2 - 1000 and SR-1000 etc.
    for img in (SR - 1000.0, SR + 1000.0, 2 * SR - 1000.0):
        i = np.argmin(np.abs(f_axis - img))
        assert spec[i] < fund * 10 ** (-60 / 20.0), img


def test_downsample_decimates():
    x = jnp.arange(32, dtype=jnp.float32)
    y = resample.downsample(x, 4)
    np.testing.assert_array_equal(np.asarray(y), np.arange(0, 32, 4))


@pytest.mark.parametrize("ratio", [2, 4])
def test_oversampler_roundtrip_identity(ratio):
    """up -> down with no callback ~= delayed identity."""
    ovs = Oversampler(SR, ratio=ratio, quality="16bit", filtering=False)
    rng = np.random.default_rng(1)
    x = np.zeros(2048, np.float32)
    x[100:1948] = rng.normal(size=1848).astype(np.float32)
    # band-limit the test signal to make the roundtrip near-exact
    from lsp_dsp_units_tpu.models.util.convolver import convolve_oneshot
    lp = np.sinc(np.arange(-64, 65) * 0.4) * 0.4 * np.hamming(129)
    x = np.asarray(convolve_oneshot(jnp.asarray(x), jnp.asarray(
        lp.astype(np.float32))))
    st = ovs.init_state()
    st, y = ovs.process(st, jnp.asarray(x))
    y = np.asarray(y)
    lat = ovs.latency()
    assert snr_db(y[lat:1500], x[:1500 - lat]) > 50.0


def test_oversampler_latency_contract():
    """Latency values match the reference table
    (Oversampler.cpp:955-1010), and the MEASURED group delay of an
    impulse through up->down equals the reported latency for every
    (quality, ratio) pair — so chain alignment against the reference is
    sample-exact."""
    expect = {"x2": 2, "x3": 3, "x4": 4, "12bit": 4, "16bit": 10,
              "24bit": 62}
    for q, lat in expect.items():
        for ratio in (2, 3, 4, 6, 8):
            ovs = Oversampler(SR, ratio=ratio, quality=q, filtering=False)
            assert ovs.latency() == lat, (q, ratio)
            st = ovs.init_state(())
            x = np.zeros(256, np.float32)
            x[100] = 1.0
            st, y = ovs.process(st, jnp.asarray(x))
            d = int(np.argmax(np.abs(np.asarray(y)))) - 100
            assert d == lat, (q, ratio, d, lat)


def test_oversampler_callback_runs_at_high_rate():
    ovs = Oversampler(SR, ratio=2, quality="x3", filtering=False)
    seen = {}

    def cb(hi):
        seen["shape"] = hi.shape
        return hi * 0.5

    st = ovs.init_state()
    x = jnp.ones(128, jnp.float32)
    st, y = ovs.process(st, x, cb)
    assert seen["shape"] == (256,)
    assert y.shape == (128,)


def test_fractional_resample_sine():
    """48k -> 44.1k of a sine keeps frequency and amplitude."""
    t = np.arange(48000)
    x = np.sin(2 * np.pi * 997.0 * t / 48000.0)
    y = resample.resample_fractional(x, 48000, 44100)
    assert abs(y.size - 44100) < 50
    mid = y[2000:-2000]
    spec = np.abs(np.fft.rfft(mid * np.hanning(mid.size)))
    f = np.fft.rfftfreq(mid.size, 1 / 44100.0)
    peak_f = f[int(np.argmax(spec))]
    assert abs(peak_f - 997.0) < 2.0
    assert abs(np.max(np.abs(mid)) - 1.0) < 0.01
