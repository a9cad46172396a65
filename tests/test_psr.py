"""PSR (peak to short-term loudness ratio) parity, composed from
TruePeakMeter + LoudnessMeter exactly as the reference's mtest does
(test/mtest/meters/psr.cpp:95-131): per-channel true peak -> max across
channels; short-term K-weighted loudness with L/R designations scaled
by DBFS_TO_LUFS_SHIFT_GAIN; psr = peak / lufs where lufs >= -60 dB
else 0."""
import numpy as np
import jax.numpy as jnp

from lsp_dsp_units_tpu.models.meters.true_peak import TruePeakMeter
from lsp_dsp_units_tpu.models.meters.loudness import LoudnessMeter
from lsp_dsp_units_tpu.models.misc import broadcast as bs

SR = 48000


def _psr_trace(x: np.ndarray) -> np.ndarray:
    """x: [2, T] stereo -> per-sample PSR gain trace [T]."""
    tpm = TruePeakMeter(SR)
    lm = LoudnessMeter(SR, channels=2,
                       period_ms=bs.LUFS_SHORT_TERM_PERIOD,
                       designations=[bs.Channel.LEFT, bs.Channel.RIGHT])
    tp_st = tpm.init_state((2,))
    lm_st = lm.init_state()
    tp_st, peak = tpm.process(tp_st, jnp.asarray(x))
    peak = np.asarray(jnp.max(peak, axis=0))           # pmax2 across L/R
    lm_st, loud = lm.process(lm_st, jnp.asarray(x))
    lufs = np.asarray(loud) * bs.DBFS_TO_LUFS_SHIFT_GAIN
    return np.where(lufs >= 10.0 ** (-60.0 / 20.0), peak / np.maximum(lufs, 1e-20), 0.0)


def test_psr_sine_anchor():
    # stereo 997 Hz sine at -6 dBFS: the K-weighting gain at 997 Hz is
    # +0.691 dB, which is exactly what DBFS_TO_LUFS_SHIFT cancels (the
    # shift exists so a 997 Hz sine reads the same LUFS as dBFS), so
    # short-term loudness == amplitude and the PSR trace peaks at 1.0
    # (0 dB) once the 3 s window is full.  The trace itself oscillates
    # with the per-sample true-peak envelope, so assert on the tail max.
    t = np.arange(SR * 4) / SR
    a = 0.5
    x = np.stack([a * np.sin(2 * np.pi * 997.0 * t)] * 2).astype(np.float32)
    psr = _psr_trace(x)
    peak_psr = float(np.max(psr[-SR:]))
    assert abs(20 * np.log10(peak_psr)) < 0.1, peak_psr


def test_psr_crest_factor_orders():
    # an impulsive signal (sparse clicks over quiet noise) must show a
    # much higher PSR than the steady sine: that ordering is the whole
    # point of the meter (reference psr.cpp saves exactly this contrast)
    rng = np.random.default_rng(3)
    quiet = (rng.standard_normal((2, SR * 4)) * 0.02).astype(np.float32)
    clicks = quiet.copy()
    clicks[:, ::4800] = 0.9
    psr_clicks = float(np.max(_psr_trace(clicks)[-SR:]))
    t = np.arange(SR * 4) / SR
    sine = np.stack([0.5 * np.sin(2 * np.pi * 997.0 * t)] * 2
                    ).astype(np.float32)
    psr_sine = float(np.max(_psr_trace(sine)[-SR:]))
    assert psr_clicks > 4.0 * psr_sine, (psr_clicks, psr_sine)


def test_psr_silence_is_zero():
    x = np.zeros((2, SR), np.float32)
    psr = _psr_trace(x)
    assert np.all(psr == 0.0)
