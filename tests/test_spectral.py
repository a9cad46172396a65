"""Spectral engines and crossovers: COLA identity, band splitting."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsp_dsp_units_tpu.models.util.spectral import (
    SpectralProcessor, MultiSpectralProcessor, SpectralSplitter)
from lsp_dsp_units_tpu.models.util.crossover import (
    Crossover, CrossoverSlope, CrossMode)
from lsp_dsp_units_tpu.models.util.fft_crossover_unit import (
    FFTCrossover, FFTCrossoverBand)
from lsp_dsp_units_tpu.utils.units import snr_db, gain_to_db
from lsp_dsp_units_tpu.models.filters.design import digital_freq_response

SR = 48000


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    return (0.4 * np.sin(2 * np.pi * 330 * t)
            + 0.2 * rng.standard_normal(n)).astype(np.float32)


def test_spectral_processor_identity():
    """No-op hook: output == input delayed by the reported latency."""
    sp = SpectralProcessor(rank=9)
    st = sp.init_state()
    x = _sig(sp.block * 16)
    st, y = sp.process(st, jnp.asarray(x))
    y = np.asarray(y)
    lat = sp.latency()
    assert snr_db(y[lat:], x[:x.size - lat]) > 90.0


def test_spectral_processor_latency_impulse():
    sp = SpectralProcessor(rank=8)
    st = sp.init_state()
    x = np.zeros(sp.block * 12, np.float32)
    x[0] = 1.0
    st, y = sp.process(st, jnp.asarray(x))
    assert int(np.argmax(np.abs(np.asarray(y)))) == sp.latency()


def test_spectral_processor_gain_hook():
    """A -6 dB spectral gain hook scales the output by 0.5."""
    sp = SpectralProcessor(rank=9)
    st = sp.init_state()
    x = _sig(sp.block * 8)
    st, y = sp.process(st, jnp.asarray(x), lambda s: s * 0.5)
    lat = sp.latency()
    assert snr_db(np.asarray(y)[lat:], 0.5 * x[:x.size - lat]) > 90.0


def test_multi_spectral_processor_mix():
    """Hook can mix across channels: swap two channels spectrally."""
    mp = MultiSpectralProcessor(channels=2, rank=8)
    st = mp.init_state()
    a, b = _sig(mp.block * 8, 1), _sig(mp.block * 8, 2)
    x = np.stack([a, b])

    def swap(spec):
        return spec[::-1]

    st, y = mp.process(st, jnp.asarray(x), swap)
    lat = mp.latency()
    y = np.asarray(y)
    assert snr_db(y[0][lat:], b[:b.size - lat]) > 90.0
    assert snr_db(y[1][lat:], a[:a.size - lat]) > 90.0


@pytest.mark.parametrize("chunk_rank", [None, 7])
def test_spectral_splitter_identity_sum(chunk_rank):
    """Two complementary handlers must sum back to a delayed identity."""
    sp = SpectralSplitter(rank=9, handlers=2, chunk_rank=chunk_rank)
    st = sp.init_state()
    x = _sig(sp.block * 16)
    lo = lambda s: s * 0.25
    hi = lambda s: s * 0.75
    st, y = sp.process(st, jnp.asarray(x), [lo, hi])
    y = np.asarray(y)
    total = y.sum(axis=-2)
    lat = sp.latency()
    assert snr_db(total[lat:], x[:x.size - lat]) > 80.0


def test_iir_crossover_bands():
    """LR4 2-way crossover: band isolation + allpass sum."""
    xo = Crossover(SR, splits=[(1000.0, CrossoverSlope.LR4)])
    st = xo.init_state()
    x = _sig(SR // 2)
    st, bands = xo.process(st, jnp.asarray(x))
    bands = np.asarray(bands)
    assert bands.shape == (2, x.size)
    # allpass-complementary: |sum| flat
    freqs = np.geomspace(50, 20000, 128)
    h = (xo.freq_chart(0, freqs) + xo.freq_chart(1, freqs))
    np.testing.assert_allclose(np.abs(h), 1.0, atol=2e-2)
    # band 0 kills 8 kHz, band 1 kills 100 Hz
    assert gain_to_db(np.abs(xo.freq_chart(0, np.array([8000.0]))))[0] < -70
    assert gain_to_db(np.abs(xo.freq_chart(1, np.array([100.0]))))[0] < -70


def test_iir_crossover_three_way_sum():
    xo = Crossover(SR, splits=[(300.0, CrossoverSlope.LR4),
                               (3000.0, CrossoverSlope.LR8)])
    st = xo.init_state()
    x = _sig(SR // 2)
    st, bands = xo.process(st, jnp.asarray(x))
    bands = np.asarray(bands)
    assert bands.shape == (3, x.size)
    freqs = np.geomspace(40, 20000, 128)
    h = sum(xo.freq_chart(b, freqs) for b in range(3))
    np.testing.assert_allclose(np.abs(h), 1.0, atol=3e-2)


def test_fft_crossover_split():
    bands = [
        FFTCrossoverBand(True, None, 500.0, -48.0, 0.0, 1.0),
        FFTCrossoverBand(True, 500.0, 5000.0, -48.0, 0.0, 1.0),
        FFTCrossoverBand(True, 5000.0, None, -48.0, 0.0, 1.0),
    ]
    xo = FFTCrossover(SR, rank=10, bands=bands)
    st = xo.init_state()
    x = _sig(xo.block * 16)
    st, y = xo.process(st, jnp.asarray(x))
    y = np.asarray(y)
    assert y.shape == (3, x.size)
    # low band: a 330 Hz tone passes; 8 kHz content rejected
    w = np.hanning(x.size)
    lo_spec = np.abs(np.fft.rfft(y[0] * w))
    hi_spec = np.abs(np.fft.rfft(y[2] * w))
    f = np.fft.rfftfreq(x.size, 1 / SR)
    i330 = int(np.argmin(np.abs(f - 330)))
    assert lo_spec[i330] > 10 * hi_spec[i330]
    # sum of bands == delayed input: complementary masks + COLA engine
    total = y.sum(0)
    lat = xo.latency()
    assert snr_db(total[lat:], x[:x.size - lat]) > 100.0


def test_fft_crossover_passband_ripple():
    """Measured per-band transfer functions must match the analytic
    hipass/lopass curves: passband ripple < 0.5 dB, and the -6 dB
    crossover points land on the split frequencies (reference
    misc/fft_crossover.cpp crossover-level contract)."""
    from lsp_dsp_units_tpu.models.util.fft_crossover_unit import (
        FFTCrossover, FFTCrossoverBand)

    bands = [
        FFTCrossoverBand(True, None, 500.0, -48.0, 0.0, 1.0),
        FFTCrossoverBand(True, 500.0, 4000.0, -48.0, 0.0, 1.0),
        FFTCrossoverBand(True, 4000.0, None, -48.0, 0.0, 1.0),
    ]
    xo = FFTCrossover(SR, rank=11, bands=bands)
    # measure the band impulse responses through the streaming engine
    t = xo.block * 12
    x = np.zeros(t, np.float32)
    x[0] = 1.0
    st = xo.init_state()
    st, y = xo.process(st, jnp.asarray(x))
    y = np.asarray(y)                      # [3, T]
    h = np.fft.rfft(y, axis=-1)
    f = np.fft.rfftfreq(t, 1.0 / SR)
    mag_db = 20 * np.log10(np.maximum(np.abs(h), 1e-12))

    # passbands: an octave inside the splits
    pb = [(f > 20) & (f < 250), (f > 1000) & (f < 2000), (f > 8000) &
          (f < 20000)]
    for b, m in enumerate(pb):
        ripple = mag_db[b][m]
        assert ripple.max() < 0.5 and ripple.min() > -0.5, (
            b, ripple.min(), ripple.max())
    # -6 dB at each split, both adjacent bands
    for b, f0 in ((0, 500.0), (1, 500.0), (1, 4000.0), (2, 4000.0)):
        i = int(np.argmin(np.abs(f - f0)))
        assert abs(mag_db[b][i] + 6.02) < 0.3, (b, f0, mag_db[b][i])


def test_split_complex_hook_matches_complex_hook():
    """The fn_sc split-complex hook path (the TPU-tunnel form — complex
    arithmetic is unimplemented there) produces identical output to the
    complex-hook path for the same spectral transform."""
    from lsp_dsp_units_tpu.models.util.spectral import SpectralProcessor

    rng = np.random.default_rng(4)
    sp = SpectralProcessor(rank=9)
    x = jnp.asarray(rng.standard_normal((3, sp.hop * 4))
                    .astype(np.float32) * 0.3)

    gains = jnp.asarray(np.linspace(1.0, 0.2, sp.frame // 2 + 1)
                        .astype(np.float32))
    st_a = sp.init_state((3,))
    st_b = sp.init_state((3,))
    st_a, ya = sp.process(st_a, x, fn=lambda s: s * gains)
    st_b, yb = sp.process(st_b, x,
                          fn_sc=lambda sc: (sc[0] * gains,
                                            sc[1] * gains))
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
    np.testing.assert_array_equal(np.asarray(st_a.tail),
                                  np.asarray(st_b.tail))
