"""BS.1770-5 / EBU R128 normative anchor tests for the loudness meters
(reference ILUFSMeter.cpp / LoudnessMeter.cpp; the anchors below are the
standard's own calibration sentences and the EBU Tech 3341 gating
cases)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsp_dsp_units_tpu.models.meters import (ILUFSMeter, LoudnessMeter,
                                             TruePeakMeter, Weighting)
from lsp_dsp_units_tpu.models.misc import broadcast as bs
from lsp_dsp_units_tpu.utils.units import (gain_to_db,
                                            gain_to_lufs)

SR = 48000


def _sine(amp, n, freq=997.0):
    t = np.arange(n) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _integrated(x, designations=None):
    ch = x.shape[0]
    m = ILUFSMeter(SR, channels=ch, weighting=Weighting.K,
                   designations=designations)
    st = m.init_state()
    t = (x.shape[1] // m.block) * m.block
    st, _ = m.process(st, jnp.asarray(x[:, :t]))
    return float(gain_to_db(np.asarray(m.loudness_lufs_gain(st))))


def test_bs1770_normative_sine_anchor():
    """BS.1770-5: a 0 dBFS 997 Hz sine on L, C, or R reads -3.01 LKFS."""
    x = _sine(1.0, 10 * SR)[None, :]
    assert abs(_integrated(x) - (-3.01)) < 0.1
    # -20 dB lower amplitude -> -23.01 LKFS (the R128 target anchor)
    x = _sine(0.1, 10 * SR)[None, :]
    assert abs(_integrated(x) - (-23.01)) < 0.1


def test_bs1770_surround_weighting_and_lfe_exclusion():
    """Surround channels weigh +1.5 dB; LFE contributes nothing
    (BS.1770 channel weights, reference broadcast.cpp:32-53)."""
    x = _sine(0.1, 10 * SR)[None, :]
    ls = _integrated(x, designations=[bs.Channel.LEFT_SURROUND])
    assert abs(ls - (-23.01 + 1.5)) < 0.15

    # LFE-only content is excluded entirely
    two = np.concatenate([np.zeros_like(x), x])
    lfe = _integrated(two, designations=[bs.Channel.CENTER,
                                         bs.Channel.LFE1])
    # center is silent, LFE excluded -> gated loudness is 'silence'
    assert lfe < -60.0


def test_ebu_absolute_gating():
    """Tech 3341 style: near-silence around a loud section must not drag
    the integrated value down (absolute -70 LUFS gate)."""
    loud = _sine(0.1, 10 * SR)
    quiet = _sine(1e-5, 10 * SR)        # ~ -103 LUFS, below the gate
    x = np.concatenate([quiet, loud, quiet])[None, :]
    assert abs(_integrated(x) - (-23.01)) < 0.2


def test_ebu_relative_gating():
    """Blocks more than 10 LU below the ungated mean are excluded
    (relative gate): -23 interleaved with -43 content reads ~-23."""
    loud = _sine(0.1, 5 * SR)
    soft = _sine(0.01, 5 * SR)          # -43 LUFS, > 10 LU below
    x = np.concatenate([loud, soft, loud, soft])[None, :]
    li = _integrated(x)
    assert abs(li - (-23.01)) < 0.45    # gating keeps the loud anchor


def test_momentary_vs_integrated_consistency():
    """On a stationary signal, sliding loudness equals integrated."""
    x = _sine(0.1, 4 * SR)[None, :]
    lm = LoudnessMeter(SR, channels=1, period_ms=400.0,
                       weighting=Weighting.K)
    st = lm.init_state()
    st, out = lm.process(st, jnp.asarray(x))
    # steady state after the first window; LoudnessMeter returns the
    # raw weighted gain (the LUFS shift lives in ILUFSMeter)
    mid = np.asarray(out)[SR:]
    db = gain_to_lufs(np.maximum(mid, 1e-12))
    assert abs(np.median(db) - (-23.01)) < 0.2


def test_true_peak_sine_anchor():
    """True peak of an inter-sample-peaking signal exceeds the sample
    peak (BS.1770 annex 2 oversampled measurement)."""
    # ~SR/4 tone so samples straddle the crest (inter-sample peak)
    t = np.arange(SR) / SR
    x = (0.5 * np.sin(2 * np.pi * 11993.5 * t)).astype(np.float32)[None]
    tp = TruePeakMeter(SR)
    st = tp.init_state((1,))
    st, peak = tp.process_max(st, jnp.asarray(x))
    sample_peak = float(np.abs(x).max())
    peak_v = float(np.asarray(peak).reshape(-1)[0])
    assert peak_v >= sample_peak - 1e-3
    assert peak_v < 0.52


def test_ebu_tech3341_case5_style_mixed_levels():
    """Tech 3341 case-5 shape: 20 s at -26, 20.1 s at -20, 20 s at -26
    (mono sine).  Both level segments survive the -10 LU relative gate,
    so the integrated loudness is the duration-weighted POWER mean:
    10*log10((40*10^-2.6 + 20.1*10^-2.0) / 60.1) ~= -23.0 LUFS
    (analytic, tolerance +-0.1 LU like the EBU minimum requirement)."""
    # a mono 997 Hz sine measuring exactly L LUFS needs amplitude
    # a = 10^((L + 0.691 - k997_db)/20) * sqrt(2); using the meter's
    # own K-weighting gain at 997 Hz keeps the anchor analytic
    # calibrate once: the integrated loudness of a unit 997 Hz sine
    # (the meter's own K-weighted response), then scale segments to hit
    # their target LUFS analytically
    base = _integrated(_sine(1.0, SR * 4)[None])

    def seg(lufs, seconds):
        amp = 10.0 ** ((lufs - base) / 20.0)
        return (_sine(1.0, int(SR * seconds)) * amp).astype(np.float32)

    x = np.concatenate([seg(-26.0, 20.0), seg(-20.0, 20.1),
                        seg(-26.0, 20.0)])[None]
    got = _integrated(x)
    expect = 10.0 * np.log10(
        (40.0 * 10.0 ** -2.6 + 20.1 * 10.0 ** -2.0) / 60.1)
    assert abs(got - expect) < 0.1, (got, expect)
