"""Meter tests — analytic oracles: known-loudness sine inputs
(BS.1770: a 997 Hz sine at amplitude A has loudness ~20*log10(A_rms)
under K-weighting ~ 0 dB at 1 kHz), true-peak of inter-sample peaks."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsp_dsp_units_tpu.models.meters import (
    LoudnessMeter, ILUFSMeter, TruePeakMeter, Correlometer, PeakMeter,
    Panometer, Weighting)
from lsp_dsp_units_tpu.models.misc import broadcast as bs
from lsp_dsp_units_tpu.utils.units import gain_to_db

SR = 48000


def _sine(freq, n, amp=1.0, phase=0.0):
    return (amp * np.sin(2 * np.pi * freq * np.arange(n) / SR + phase)
            ).astype(np.float32)


def test_loudness_meter_sine():
    """K-weighted loudness of a 997 Hz full-scale sine ~= RMS (K-weight
    is ~0 dB at 1 kHz)."""
    m = LoudnessMeter(SR, channels=1, period_ms=400.0,
                      weighting=Weighting.K)
    st = m.init_state()
    x = _sine(997.0, SR)[None]
    st, loud = m.process(st, jnp.asarray(x))
    # steady state after the window fills
    val = float(np.asarray(loud)[-1])
    # K-weighting shelf adds ~+0.69 dB at 1 kHz (the -0.691 dB LUFS
    # shift exists precisely to cancel it, broadcast.h:96-107)
    expect = 1.0 / np.sqrt(2.0)
    assert abs(gain_to_db(val) - (gain_to_db(expect) + 0.691)) < 0.35


def test_loudness_meter_lfe_excluded():
    m = LoudnessMeter(SR, channels=2, period_ms=100.0,
                      weighting=Weighting.NONE,
                      designations=[bs.Channel.CENTER, bs.Channel.LFE1])
    st = m.init_state()
    x = np.stack([np.zeros(SR // 4, np.float32), _sine(100.0, SR // 4)])
    st, loud = m.process(st, jnp.asarray(x))
    assert float(np.asarray(loud)[-1]) < 1e-6  # LFE weight 0


def test_ilufs_meter_constant_sine():
    """Integrated loudness of a steady 997 Hz sine == its momentary
    loudness; silence is gated out and does not drag the value down."""
    m = ILUFSMeter(SR, channels=1, weighting=Weighting.K)
    st = m.init_state()
    x = _sine(997.0, 2 * SR, amp=0.5)[None]
    t = (x.shape[1] // m.block) * m.block
    st, out = m.process(st, jnp.asarray(x[:, :t]))
    v_sine = float(np.asarray(m.loudness_lufs_gain(st)))
    lufs_sine = gain_to_db(v_sine)
    # expected: 20*log10(0.5/sqrt(2)) — the -0.691 dB shift cancels the
    # K-shelf gain at ~1 kHz, so a 997 Hz sine reads its plain RMS dB
    assert abs(lufs_sine - gain_to_db(0.5 / np.sqrt(2))) < 0.35

    # append 2 s of silence: integrated loudness barely moves — the
    # silence itself is gated out; only the few fading transition blocks
    # (above the relative gate) may pull it down slightly
    sil = np.zeros((1, t), np.float32)
    st, _ = m.process(st, jnp.asarray(sil))
    lufs_after = gain_to_db(float(np.asarray(m.loudness_lufs_gain(st))))
    assert abs(lufs_after - lufs_sine) < 0.5


def test_true_peak_intersample():
    """A sine at fs/4 with 45-degree phase has sample peaks ~0.707 but a
    true peak of ~1.0 — the oversampled meter must see it."""
    n = 4096
    x = _sine(SR / 4, n, amp=1.0, phase=np.pi / 4)
    assert np.abs(x).max() < 0.8
    m = TruePeakMeter(SR)
    st = m.init_state()
    st, tp = m.process_max(st, jnp.asarray(x))
    assert float(tp) > 0.97


def test_correlometer():
    m = Correlometer(window=1024)
    st = m.init_state()
    a = _sine(440.0, 4096)
    st, c = m.process(st, jnp.asarray(a), jnp.asarray(a))
    assert abs(float(np.asarray(c)[-1]) - 1.0) < 1e-4
    st = m.init_state()
    st, c = m.process(st, jnp.asarray(a), jnp.asarray(-a))
    assert abs(float(np.asarray(c)[-1]) + 1.0) < 1e-4
    # uncorrelated noise -> near zero
    rng = np.random.default_rng(0)
    st = m.init_state()
    st, c = m.process(st, jnp.asarray(rng.standard_normal(
        4096).astype(np.float32)),
        jnp.asarray(rng.standard_normal(4096).astype(np.float32)))
    assert abs(float(np.asarray(c)[-1])) < 0.2


def test_peak_meter_hold_and_release():
    m = PeakMeter(SR, hold_ms=10.0, release_ms=5.0)
    st = m.init_state()
    x = np.zeros(4800, np.float32)
    x[0] = 1.0
    st, y = m.process(st, jnp.asarray(x))
    y = np.asarray(y)
    hold_n = int(SR * 0.010)
    assert np.all(y[:hold_n] >= 0.999)      # held
    assert y[-1] < 0.1                      # released


def test_panometer():
    m = Panometer(period=512)
    st = m.init_state()
    a = _sine(440.0, 4096)
    b = np.zeros(4096, np.float32)
    st, pan = m.process(st, jnp.asarray(a), jnp.asarray(b))
    assert float(np.asarray(pan)[-1]) < 0.01    # all left
    st = m.init_state()
    st, pan = m.process(st, jnp.asarray(a), jnp.asarray(a))
    assert abs(float(np.asarray(pan)[-1]) - 0.5) < 0.01  # centered
