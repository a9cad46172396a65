"""Filter design tests: analytic transfer-function invariants per family
(reference behaviors cited from src/main/filters/Filter.cpp).
"""

import numpy as np
import pytest

from lsp_dsp_units_tpu.models.filters import (
    FilterParams, FilterType, design_filter, digital_freq_response,
    freq_chart)
from lsp_dsp_units_tpu.utils.units import gain_to_db

SR = 48000


def _mag_db(biquads, f, sr=SR):
    return gain_to_db(np.abs(digital_freq_response(biquads, np.array([f]),
                                                   sr)))[0]


def test_k_weighted_matches_bs1770_at_48k():
    """At 48 kHz the adapted K-weighting must reproduce the ITU-R BS.1770-4
    published coefficients (quoted in reference Filter.cpp:2103-2111)."""
    d = design_filter(FilterParams(ftype=FilterType.K_WEIGHTED), 48000)
    shelf, hp = d.biquads
    np.testing.assert_allclose(
        shelf, [1.53512485958697, -2.69169618940638, 1.19839281085285,
                1.69065929318241, -0.73248077421585], rtol=2e-5)
    np.testing.assert_allclose(
        hp, [1.0, -2.0, 1.0, 1.99004745483398, -0.99007225036621],
        rtol=2e-5)


def test_a_weighting_curve():
    """A-weighting magnitudes vs IEC 61672 table values (±0.6 dB)."""
    d = design_filter(FilterParams(ftype=FilterType.A_WEIGHTED), SR)
    assert abs(_mag_db(d.biquads, 1000.0)) < 0.05
    expected = {100.0: -19.1, 500.0: -3.2, 2000.0: 1.2, 8000.0: -1.1}
    for f, db in expected.items():
        assert abs(_mag_db(d.biquads, f) - db) < 0.6, f


def test_bwc_hishelf_shape():
    """BASELINE config-1 filter: BWC hi-shelf +6 dB @ 1 kHz slope 2
    (reference Filter.cpp:1183-1219)."""
    p = FilterParams(ftype=FilterType.BT_BWC_HISHELF, slope=2,
                     freq=1000.0, gain=2.0, quality=0.0)
    d = design_filter(p, SR)
    assert d.biquads.shape == (2, 5)
    assert abs(_mag_db(d.biquads, 20.0)) < 0.1          # flat below
    assert abs(_mag_db(d.biquads, 16000.0) - 6.02) < 0.35  # +6 dB above
    assert abs(_mag_db(d.biquads, 1000.0) - 3.01) < 0.2    # half gain at f0


def test_lr4_crossover_sums_flat():
    """LR4 lo-pass + hi-pass at the same frequency: each -6.02 dB at f0,
    and (since LR is allpass-complementary) |LP+HP| = 1 at f0."""
    lo = design_filter(FilterParams(ftype=FilterType.BT_LRX_LOPASS, slope=1,
                                    freq=2000.0, gain=1.0), SR)
    hi = design_filter(FilterParams(ftype=FilterType.BT_LRX_HIPASS, slope=1,
                                    freq=2000.0, gain=1.0), SR)
    assert abs(_mag_db(lo.biquads, 2000.0) + 6.02) < 0.1
    assert abs(_mag_db(hi.biquads, 2000.0) + 6.02) < 0.1
    freqs = np.geomspace(50.0, 18000.0, 64)
    h = (digital_freq_response(lo.biquads, freqs, SR)
         + digital_freq_response(hi.biquads, freqs, SR))
    np.testing.assert_allclose(np.abs(h), 1.0, atol=5e-3)


def test_butterworth_lopass_monotone():
    p = FilterParams(ftype=FilterType.BT_BWC_LOPASS, slope=4, freq=1000.0,
                     gain=1.0)
    d = design_filter(p, SR)
    # -3 dB at cutoff for a Butterworth
    assert abs(_mag_db(d.biquads, 1000.0) + 3.01) < 0.15
    # ~ -24 dB/oct slope: one octave above ~ -24 dB
    assert _mag_db(d.biquads, 2000.0) < -20.0
    assert abs(_mag_db(d.biquads, 100.0)) < 0.05


def test_apo_peaking_gain_at_f0():
    p = FilterParams(ftype=FilterType.DR_APO_PEAKING, freq=3000.0,
                     gain=4.0, quality=1.0)
    d = design_filter(p, SR)
    assert abs(_mag_db(d.biquads, 3000.0) - gain_to_db(4.0)) < 0.01
    assert abs(_mag_db(d.biquads, 100.0)) < 0.1


def test_apo_notch_kills_f0():
    p = FilterParams(ftype=FilterType.DR_APO_NOTCH, freq=5000.0, gain=1.0,
                     quality=2.0)
    d = design_filter(p, SR)
    assert _mag_db(d.biquads, 5000.0) < -50.0
    assert abs(_mag_db(d.biquads, 500.0)) < 0.2


def test_rlc_bell_matched_vs_bilinear_lowfreq():
    """MT and BT variants should agree well below Nyquist."""
    for ft_bt, ft_mt in [(FilterType.BT_RLC_BELL, FilterType.MT_RLC_BELL)]:
        p = FilterParams(ftype=ft_bt, slope=2, freq=500.0, gain=2.0,
                         quality=1.0)
        d_bt = design_filter(p, SR)
        d_mt = design_filter(FilterParams(ftype=ft_mt, slope=2, freq=500.0,
                                          gain=2.0, quality=1.0), SR)
        for f in (100.0, 500.0, 1500.0):
            assert abs(_mag_db(d_bt.biquads, f)
                       - _mag_db(d_mt.biquads, f)) < 0.2, f


def test_freq_chart_matches_digital_response_bilinear():
    """Analog freq chart (prewarped) must equal the digital response for
    bilinear-designed filters (the transform is exact on the chart)."""
    p = FilterParams(ftype=FilterType.BT_BWC_HISHELF, slope=2, freq=1000.0,
                     gain=2.0)
    d = design_filter(p, SR)
    freqs = np.geomspace(20.0, 20000.0, 128)
    h1 = freq_chart(d, freqs)
    h2 = digital_freq_response(d.biquads, freqs, SR)
    np.testing.assert_allclose(np.abs(h1), np.abs(h2), rtol=1e-6)


def test_amplifier_and_allpass():
    d = design_filter(FilterParams(ftype=FilterType.BT_AMPLIFIER, gain=0.5),
                      SR)
    freqs = np.array([100.0, 1000.0, 10000.0])
    np.testing.assert_allclose(
        np.abs(digital_freq_response(d.biquads, freqs, SR)), 0.5, rtol=1e-6)

    d = design_filter(FilterParams(ftype=FilterType.BT_RLC_ALLPASS, slope=2,
                                   freq=1000.0, gain=1.0), SR)
    np.testing.assert_allclose(
        np.abs(digital_freq_response(d.biquads, freqs, SR)), 1.0, rtol=1e-5)


@pytest.mark.parametrize("ftype", [
    FilterType.BT_RLC_LOPASS, FilterType.BT_RLC_HIPASS,
    FilterType.BT_RLC_LOSHELF, FilterType.BT_RLC_HISHELF,
    FilterType.BT_RLC_BELL, FilterType.BT_RLC_RESONANCE,
    FilterType.BT_RLC_NOTCH, FilterType.BT_RLC_ALLPASS,
    FilterType.BT_RLC_ALLPASS2, FilterType.BT_RLC_LADDERPASS,
    FilterType.BT_RLC_LADDERREJ, FilterType.BT_RLC_BANDPASS,
    FilterType.BT_RLC_ENVELOPE,
    FilterType.BT_BWC_LOPASS, FilterType.BT_BWC_HIPASS,
    FilterType.BT_BWC_LOSHELF, FilterType.BT_BWC_HISHELF,
    FilterType.BT_BWC_BELL, FilterType.BT_BWC_LADDERPASS,
    FilterType.BT_BWC_LADDERREJ, FilterType.BT_BWC_BANDPASS,
    FilterType.BT_BWC_ALLPASS,
    FilterType.BT_LRX_LOPASS, FilterType.BT_LRX_HIPASS,
    FilterType.BT_LRX_LOSHELF, FilterType.BT_LRX_HISHELF,
    FilterType.BT_LRX_BELL, FilterType.BT_LRX_LADDERPASS,
    FilterType.BT_LRX_LADDERREJ, FilterType.BT_LRX_BANDPASS,
    FilterType.BT_LRX_ALLPASS,
    FilterType.DR_APO_LOPASS, FilterType.DR_APO_HIPASS,
    FilterType.DR_APO_BANDPASS, FilterType.DR_APO_NOTCH,
    FilterType.DR_APO_ALLPASS, FilterType.DR_APO_ALLPASS2,
    FilterType.DR_APO_PEAKING, FilterType.DR_APO_LOSHELF,
    FilterType.DR_APO_HISHELF, FilterType.DR_APO_LADDERPASS,
    FilterType.DR_APO_LADDERREJ,
    FilterType.A_WEIGHTED, FilterType.B_WEIGHTED, FilterType.C_WEIGHTED,
    FilterType.D_WEIGHTED, FilterType.K_WEIGHTED,
])
def test_all_types_design_and_stable(ftype):
    """Every supported type designs without error, yields stable biquads
    (poles strictly inside the unit circle), and a finite response."""
    p = FilterParams(ftype=ftype, slope=3, freq=1000.0, freq2=4000.0,
                     gain=2.0, quality=0.7)
    d = design_filter(p, SR)
    assert d.biquads.shape[0] >= 1
    for b0, b1, b2, a1, a2 in d.biquads:
        # poles of z^2 - a1 z - a2
        poles = np.roots([1.0, -a1, -a2])
        assert np.all(np.abs(poles) < 1.0 + 1e-9), (ftype, poles)
    freqs = np.geomspace(10.0, 23000.0, 64)
    h = digital_freq_response(d.biquads, freqs, SR)
    assert np.all(np.isfinite(h))

    # matched-Z twins design too
    name = ftype.value
    if name.startswith("bt_"):
        mt = FilterType("mt" + name[2:])
        d2 = design_filter(FilterParams(ftype=mt, slope=3, freq=1000.0,
                                        freq2=4000.0, gain=2.0, quality=0.7),
                           SR)
        assert np.all(np.isfinite(d2.biquads))


def test_bwc_lopass_matches_scipy_butterworth():
    """BT_BWC_LOPASS slope-s == 2s-order Butterworth: magnitude must
    match scipy.signal.butter within 0.1 dB across the band."""
    from scipy import signal as sps
    # slope == Butterworth order; EVEN orders are textbook-exact
    # (odd-order BWC uses the reference's own cascade arrangement)
    for slope, fc in ((2, 1000.0), (4, 4000.0), (6, 500.0)):
        d = design_filter(FilterParams(ftype=FilterType.BT_BWC_LOPASS,
                                       freq=fc, slope=slope), SR)
        freqs = np.geomspace(40.0, 20000.0, 120)
        h_ours = np.abs(digital_freq_response(np.asarray(d.biquads),
                                              freqs, SR))
        b, a = sps.butter(slope, fc, btype="low", fs=SR)
        _, h_ref = sps.freqz(b, a, worN=freqs, fs=SR)
        db_err = 20 * np.log10(np.maximum(h_ours, 1e-9)) \
            - 20 * np.log10(np.maximum(np.abs(h_ref), 1e-9))
        # ignore the deep stopband (numerical noise floor differs)
        mask = 20 * np.log10(np.maximum(np.abs(h_ref), 1e-12)) > -80
        assert np.abs(db_err[mask]).max() < 0.1, (slope, fc)


def test_bwc_hipass_matches_scipy_butterworth():
    from scipy import signal as sps
    d = design_filter(FilterParams(ftype=FilterType.BT_BWC_HIPASS,
                                   freq=250.0, slope=6), SR)
    freqs = np.geomspace(40.0, 20000.0, 120)
    h_ours = np.abs(digital_freq_response(np.asarray(d.biquads), freqs, SR))
    b, a = sps.butter(6, 250.0, btype="high", fs=SR)
    _, h_ref = sps.freqz(b, a, worN=freqs, fs=SR)
    mask = 20 * np.log10(np.maximum(np.abs(h_ref), 1e-12)) > -80
    db_err = 20 * np.log10(np.maximum(h_ours[mask], 1e-9)) \
        - 20 * np.log10(np.abs(h_ref[mask]))
    assert np.abs(db_err).max() < 0.1


def test_apo_biquads_match_cookbook():
    """DR_APO_* == Audio-EQ-Cookbook formulas (independent rederivation
    here against the textbook expressions)."""
    f0, q, gain = 1200.0, 1.3, 2.5
    w0 = 2 * np.pi * f0 / SR
    alpha = np.sin(w0) / (2 * q)
    A = np.sqrt(gain)

    # peaking EQ (cookbook)
    b = np.array([1 + alpha * A, -2 * np.cos(w0), 1 - alpha * A])
    a = np.array([1 + alpha / A, -2 * np.cos(w0), 1 - alpha / A])
    d = design_filter(FilterParams(ftype=FilterType.DR_APO_PEAKING,
                                   freq=f0, gain=gain, quality=q), SR)
    freqs = np.geomspace(100.0, 20000.0, 60)
    h_ours = np.abs(digital_freq_response(np.asarray(d.biquads), freqs, SR))
    from scipy import signal as sps
    _, h_ref = sps.freqz(b / a[0], a / a[0], worN=freqs, fs=SR)
    np.testing.assert_allclose(h_ours, np.abs(h_ref), rtol=1e-4)

    # low-pass (cookbook, Q)
    b = np.array([(1 - np.cos(w0)) / 2, 1 - np.cos(w0),
                  (1 - np.cos(w0)) / 2])
    a = np.array([1 + alpha, -2 * np.cos(w0), 1 - alpha])
    d = design_filter(FilterParams(ftype=FilterType.DR_APO_LOPASS,
                                   freq=f0, quality=q), SR)
    h_ours = np.abs(digital_freq_response(np.asarray(d.biquads), freqs, SR))
    _, h_ref = sps.freqz(b / a[0], a / a[0], worN=freqs, fs=SR)
    np.testing.assert_allclose(h_ours, np.abs(h_ref), rtol=1e-4)


def test_filter_process_broadcasts_unbatched_state():
    """init_state() with no batch shape must work for [C, T] input (the
    zero state broadcasts); mismatched non-broadcastable state raises a
    clear error instead of a kernel-shape failure."""
    import jax.numpy as jnp
    from lsp_dsp_units_tpu.models.filters import Filter, FilterParams

    f = Filter(48000, FilterParams(ftype=FilterType.BT_BWC_HISHELF,
                                   freq=1000.0, gain=2.0, slope=2))
    x = jnp.zeros((2, 256)).at[:, 0].set(1.0)

    st_b, y_b = f.process(f.init_state((2,)), x)
    st_u, y_u = f.process(f.init_state(), x)
    np.testing.assert_array_equal(np.asarray(y_b), np.asarray(y_u))
    assert st_u.shape == st_b.shape

    import pytest
    with pytest.raises(ValueError, match="batch shape"):
        f.process(f.init_state((3,)), x)


def test_bwc_ladder_shape_anchors():
    """LADDERPASS boosts the [freq, freq2] band by `gain` and is unity
    at both extremes; LADDERREJ is the inverse (band at unity, extremes
    at gain).  Before round 2 the first shelf cascade's numerator and
    denominator were swapped (Filter.cpp:1247-1248), inverting the
    response into a +-18 dB full-range shelf."""
    from lsp_dsp_units_tpu.models.filters import Filter
    for ft, mid_db, edge_db in (
            (FilterType.BT_BWC_LADDERPASS, 12.0, 0.0),
            (FilterType.BT_BWC_LADDERREJ, 0.0, 12.0),
            (FilterType.BT_LRX_LADDERPASS, 12.0, 0.0)):
        flt = Filter(SR, FilterParams(ftype=ft, slope=2, freq=1000.0,
                                      freq2=4000.0, gain=4.0,
                                      quality=0.0))
        f = np.array([20.0, 2000.0, 20000.0])
        mag_db = 20 * np.log10(np.abs(flt.freq_chart(f)))
        assert abs(mag_db[0] - edge_db) < 0.6, (ft, mag_db)
        assert abs(mag_db[2] - edge_db) < 0.6, (ft, mag_db)
        assert abs(mag_db[1] - mid_db) < 1.5, (ft, mag_db)
