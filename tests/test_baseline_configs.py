"""End-to-end tests for the BASELINE measurement configs 2-5
(BASELINE.md; config 1 is covered in test_e2e_chain.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lsp_dsp_units_tpu.utils.units import snr_db, gain_to_db

SR = 48000


def _stereo(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    return np.stack([
        0.4 * np.sin(2 * np.pi * 330 * t) + 0.05 * rng.standard_normal(n),
        0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n),
    ]).astype(np.float32)


def test_config2_eq_plus_oversampler():
    """8-band IIR equalizer + 2x/4x oversampler on stereo 48 kHz
    (BASELINE config 2)."""
    from lsp_dsp_units_tpu.models.filters import Equalizer, EqMode
    from lsp_dsp_units_tpu.models.util import Oversampler
    from lsp_dsp_units_tpu.pipeline import default_eq_params
    from lsp_dsp_units_tpu.ops import biquad

    eq = Equalizer(SR, filters=8, mode=EqMode.IIR)
    for i, p in enumerate(default_eq_params(SR)):
        eq.set_params(i, p)
    params = eq.build()

    # golden is the float64 DESIGN (what the fused default path
    # implements), not the f32-rounded coefficient copy
    coeffs64 = np.concatenate([d.biquads for d in eq._active_designs()], 0)

    # aligned input: the default fused block path must hold the ≥95 dB
    # north star (BASELINE.md; measured ~138 dB)
    x = _stereo(24576)
    st = eq.init_state(params, (2,))
    st, y_eq = eq.process(params, st, jnp.asarray(x))
    golden = np.stack([biquad.np_biquad_cascade_f64(coeffs64, x[c])
                       for c in range(2)])
    assert snr_db(np.asarray(y_eq), golden) > 95.0

    # non-block-multiple input: fused head + sequential tail still beats
    # the plain f32 sequential chain (~60 dB)
    x = _stereo(SR // 2)
    st = eq.init_state(params, (2,))
    st, y_eq = eq.process(params, st, jnp.asarray(x))
    golden = np.stack([biquad.np_biquad_cascade_f64(coeffs64, x[c])
                       for c in range(2)])
    assert snr_db(np.asarray(y_eq), golden) > 80.0

    for ratio in (2, 4):
        ovs = Oversampler(SR, ratio=ratio, quality="x3", filtering=True)
        ost = ovs.init_state((2,))
        # distortion callback at the high rate (the reference's
        # IOversamplerCallback pattern)
        ost, y = ovs.process(ost, y_eq, lambda hi: jnp.tanh(hi))
        y = np.asarray(y)
        assert y.shape == x.shape
        assert np.isfinite(y).all()
        assert np.abs(y).max() <= 1.001  # tanh saturates


def test_config3_convolver_plus_fft_crossover():
    """Partitioned-FFT convolver with a 1 s IR + 4-band FFT crossover
    (BASELINE config 3)."""
    from lsp_dsp_units_tpu.models.util.convolver import Convolver
    from lsp_dsp_units_tpu.models.util.fft_crossover_unit import (
        FFTCrossover, FFTCrossoverBand)
    from lsp_dsp_units_tpu.ops import fftconv

    rng = np.random.default_rng(1)
    ir = (rng.standard_normal(SR) *
          np.exp(-4.0 * np.arange(SR) / SR)).astype(np.float32)
    ir[0] = 1.0
    conv = Convolver(ir, rank=12)
    x = _stereo(conv.block * 4)[0]
    st = conv.init_state()
    st, y = conv.process(st, jnp.asarray(x))
    golden = fftconv.np_convolve_golden(x, ir)
    assert snr_db(np.asarray(y), golden) > 90.0

    bands = [
        FFTCrossoverBand(True, None, 250.0, -48.0, 0.0, 1.0),
        FFTCrossoverBand(True, 250.0, 1500.0, -48.0, 0.0, 1.0),
        FFTCrossoverBand(True, 1500.0, 6000.0, -48.0, 0.0, 1.0),
        FFTCrossoverBand(True, 6000.0, None, -48.0, 0.0, 1.0),
    ]
    xo = FFTCrossover(SR, rank=11, bands=bands)
    xst = xo.init_state()
    t = (np.asarray(y).shape[-1] // xo.block) * xo.block
    xst, yb = xo.process(xst, jnp.asarray(np.asarray(y)[:t]))
    yb = np.asarray(yb)
    assert yb.shape == (4, t)
    # band sum reconstructs the delayed convolver output: the analytic
    # hipass/lopass masks are complementary (sum == 1 to ~1e-6) and the
    # COLA spectral engine is exact, so reconstruction is >100 dB
    lat = xo.latency()
    total = yb.sum(0)
    assert snr_db(total[lat:], np.asarray(y)[: t - lat]) > 100.0


def test_config4_dynamics_chain_64ch():
    """Sidechain compressor + limiter + gate with envelope followers on
    64-channel buffers (BASELINE config 4)."""
    from lsp_dsp_units_tpu.models.util.sidechain import (Sidechain,
                                                         SidechainMode)
    from lsp_dsp_units_tpu.models.dynamics import Compressor, Gate
    from lsp_dsp_units_tpu.models.dynamics.limiter import Limiter

    rng = np.random.default_rng(2)
    x = (rng.standard_normal((64, 4096)) *
         np.linspace(0.1, 1.5, 4096)).astype(np.float32)

    sc = Sidechain(SR, SidechainMode.RMS, reactivity_ms=5.0)
    comp = Compressor(SR, attack_thresh=0.3, release_thresh=0.15,
                      attack_ms=5.0, release_ms=50.0, ratio=4.0,
                      knee=0.7071)
    gate = Gate(SR, threshold=0.05, zone=0.5, reduction=0.05,
                attack_ms=1.0, release_ms=20.0)
    lim = Limiter(SR, threshold=0.8, lookahead_ms=2.0)

    cp, gp, lp = comp.build(), gate.build(), lim.build()
    sst = sc.init_state((64,))
    cst = comp.init_state((64,))
    gst = gate.init_state((64,))
    lst = lim.init_state((64,))

    @jax.jit
    def step(sst, cst, gst, lst, x):
        sst, level = sc.process(sst, x)
        cst, cgain, _ = comp.process(cp, cst, level)
        gst, ggain, _ = gate.process(gp, gst, level)
        y = x * cgain * ggain
        lst, lgain = lim.process(lp, lst, jnp.abs(y))
        la = lim.latency()
        y_delayed = jnp.concatenate(
            [jnp.zeros((64, la), jnp.float32), y[:, :-la]], axis=1)
        return sst, cst, gst, lst, y_delayed * lgain

    sst, cst, gst, lst, y = step(sst, cst, gst, lst, jnp.asarray(x))
    y = np.asarray(y)
    assert y.shape == (64, 4096)
    assert np.isfinite(y).all()
    assert np.abs(y).max() <= 0.8 * 1.002   # limiter ceiling holds
    # compressor actually reduced loud content
    assert np.abs(y[:, 2048:]).max() < np.abs(x[:, 2048:]).max()


def test_config5_metering_spectral_sharded():
    """BS.1770-5 integrated loudness + true peak + spectral processor
    over channel-sharded multi-channel streams (BASELINE config 5)."""
    from lsp_dsp_units_tpu.models.meters import (ILUFSMeter, TruePeakMeter,
                                                 Weighting)
    from lsp_dsp_units_tpu.models.util.spectral import SpectralProcessor
    from lsp_dsp_units_tpu.parallel import mesh as pmesh

    channels = 8
    t = np.arange(SR)
    x = np.stack([0.25 * np.sin(2 * np.pi * (440 + 10 * c) * t / SR)
                  for c in range(channels)]).astype(np.float32)

    mesh = pmesh.make_mesh(chan=8, time=1)
    xs = jax.device_put(jnp.asarray(x), pmesh.chan_sharding(mesh))

    # spectral processor (shared hook) on the sharded array
    sp = SpectralProcessor(rank=10)
    sst = sp.init_state((channels,))
    tt = (SR // sp.block) * sp.block
    sst, y = sp.process(sst, xs[:, :tt], lambda s: s * 0.5)
    assert np.isfinite(np.asarray(y)).all()

    # loudness + true peak on the processed stream
    meter = ILUFSMeter(SR, channels=channels, weighting=Weighting.K)
    mst = meter.init_state()
    tm = (tt // meter.block) * meter.block
    mst, _ = meter.process(mst, jnp.asarray(np.asarray(y)[:, :tm]))
    lufs = gain_to_db(float(np.asarray(meter.loudness_lufs_gain(mst))))
    # 8 equal-power sines at amp .125 (after 0.5 gain):
    # per-channel ms = .125^2/2, summed over 8 channels -> ~ -16.1 dB
    expect = gain_to_db(np.sqrt(channels * (0.125 ** 2) / 2.0))
    assert abs(lufs - expect) < 1.0

    tp = TruePeakMeter(SR)
    tst = tp.init_state((channels,))
    tst, peak = tp.process_max(tst, jnp.asarray(np.asarray(y)))
    assert np.abs(np.asarray(peak) - 0.125).max() < 0.01
