"""SyncChirpProcessor breadth tests (VERDICT r1 item 9): synchronized
parameter optimisation, synthesis methods, noise/RT post-processing,
Hammerstein identification, persistence.  Reference:
src/main/util/SyncChirpProcessor.cpp."""

import numpy as np
import pytest

from lsp_dsp_units_tpu.models.util.sync_chirp import (
    SyncChirpProcessor, ChirpMethod, FadeMethod, RTCalc)

SR = 48000


# ---------------------------------------------------------------------------
# synchronized parameter optimisation (update_settings, :1996-2090)


def test_duration_rounds_up_to_sync_multiple():
    scp = SyncChirpProcessor(SR, duration_s=0.5, f_start=20.0,
                             f_end=20000.0)
    assert scp.order == 1000
    assert scp.f_start == 20.0
    min_dur = np.log(1000) / 20.0
    # smallest multiple of min_dur strictly above the request
    assert scp.duration == pytest.approx(2 * min_dur)
    assert scp.duration > 0.5
    assert scp.gamma == pytest.approx(2 / 20.0)
    assert scp.delta == pytest.approx(scp.beta * scp.gamma)


def test_final_frequency_forced_to_harmonic():
    scp = SyncChirpProcessor(SR, duration_s=1.0, f_start=23.0,
                             f_end=20000.0)
    assert scp.order == int(20000.0 / 23.0)
    assert scp.f_start == pytest.approx(20000.0 / scp.order)
    assert scp.f_end == 20000.0


def test_final_frequency_clamped_to_nyquist():
    scp = SyncChirpProcessor(8000, duration_s=0.5, f_start=20.0,
                             f_end=20000.0)
    assert scp.f_end <= 4000.0


def test_setters_reconfigure():
    scp = SyncChirpProcessor(SR, duration_s=0.5)
    n0 = scp.n
    scp.set_chirp_duration(1.5)
    scp.update_settings()
    assert scp.n > n0
    scp.set_chirp_amplitude(0.25)
    scp.update_settings()
    assert scp.amplitude == 0.25
    assert np.abs(scp.sweep()).max() <= 0.25 + 1e-6


def test_fade_clamped_to_duration_fraction():
    scp = SyncChirpProcessor(SR, duration_s=0.4, f_start=100.0,
                             f_end=8000.0, fade_in_s=10.0,
                             fade_out_s=10.0)
    assert scp._fade_in <= int(0.3 * scp.duration * SR) + 1
    assert scp._fade_out <= int(0.3 * scp.duration * SR) + 1


# ---------------------------------------------------------------------------
# synthesis methods


def test_bandlimited_methods_match_in_band():
    """CHIRP_BANDLIMITED / BANDLIMITED synthesis should closely track
    SIMPLE in the passband (the AA filter only shapes the top octave)."""
    kw = dict(duration_s=0.2, f_start=100.0, f_end=4000.0,
              amplitude=1.0)
    simple = SyncChirpProcessor(SR, method=ChirpMethod.SIMPLE, **kw)
    blim = SyncChirpProcessor(SR, method=ChirpMethod.CHIRP_BANDLIMITED,
                              **kw)
    s0, s1 = simple.sweep(), blim.sweep()
    assert s0.shape == s1.shape
    # the AA filter delays the band-limited chirp by its group delay;
    # compare the magnitude SPECTRA in the passband instead
    S0 = np.abs(np.fft.rfft(s0.astype(np.float64)))
    S1 = np.abs(np.fft.rfft(s1.astype(np.float64)))
    fr = np.fft.rfftfreq(len(s0), 1 / SR)
    band = (fr > 300) & (fr < 3000)
    ratio_db = 20 * np.log10(
        np.median(S1[band]) / np.median(S0[band]))
    assert abs(ratio_db) < 1.0, ratio_db

    full = SyncChirpProcessor(SR, method=ChirpMethod.BANDLIMITED, **kw)
    assert full.inverse_filter().shape == simple.inverse_filter().shape


def test_fade_none():
    scp = SyncChirpProcessor(SR, duration_s=0.2, f_start=100.0,
                             f_end=4000.0, fade_method=FadeMethod.NONE,
                             amplitude=1.0)
    sw = scp.sweep()
    # no fade: first sample of a sine starting at phase 0 is 0 but the
    # second is already nonzero at full scale
    assert np.abs(sw[:16]).max() > 0.001


# ---------------------------------------------------------------------------
# post-processing: noise profile, integration limit, RT modes


def _decay_ir(rt60, noise_db=-80.0, seconds=1.5, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    ir = np.exp(-6.91 * t / rt60) * rng.standard_normal(t.size)
    ir += 10 ** (noise_db / 20.0) * rng.standard_normal(t.size)
    return ir.astype(np.float32)


def test_profile_background_noise():
    scp = SyncChirpProcessor(SR, duration_s=0.2)
    x = np.zeros(SR, np.float32)
    x[: SR // 2] = 10 ** (-60.0 / 20.0)
    lvl = scp.profile_background_noise(x, head=0, count=SR // 2)
    # ceil() of the dB peak (reference :845): -60 dB input floats up
    # to -59 when log10(1e-3) lands a hair above -3
    assert -60.0 <= lvl <= -59.0
    assert scp.noise_value == pytest.approx(10 ** (lvl / 20.0))


def test_integration_limit_tracks_noise_floor():
    scp = SyncChirpProcessor(SR, duration_s=0.2)
    ir = _decay_ir(0.3, noise_db=-60.0)
    scp.profile_background_noise(ir, head=int(1.2 * SR),
                                 count=int(0.2 * SR))
    lim = scp.calibrate_backwards_integration_limit(
        ir, head=0, window_size=512, tolerance=3.0)
    # decay reaches -60 dB at ~0.3 s; limit must sit between there and
    # well before the end
    assert int(0.2 * SR) < lim < int(1.0 * SR), lim


@pytest.mark.parametrize("mode", list(RTCalc))
def test_rt_modes_recover_rt60(mode):
    scp = SyncChirpProcessor(SR, duration_s=0.2)
    rt_true = 0.4
    ir = _decay_ir(rt_true, noise_db=-100.0)
    scp.profile_background_noise(ir, head=int(1.3 * SR))
    res = scp.calculate_reverberation_time(ir, head=0, rt_calc=mode)
    assert res.rt_seconds == pytest.approx(rt_true, rel=0.15), mode
    assert res.correlation < -0.9     # strongly negative = clean decay
    assert res.low_noise


def test_rt_insufficient_data():
    scp = SyncChirpProcessor(SR, duration_s=0.2)
    res = scp.calculate_reverberation_time(
        np.ones(2, np.float32), rt_calc=RTCalc.T_30)
    assert res.rt_seconds == 0.0


# ---------------------------------------------------------------------------
# Hammerstein identification (the synchronized-sweep payoff)


def _measure_polynomial(scp, coeffs):
    """Pass the sweep through y = sum_m coeffs[m-1] * x^m."""
    x = scp.sweep().astype(np.float64)
    y = np.zeros_like(x)
    for m, a in enumerate(coeffs, start=1):
        y += a * x ** m
    return y.astype(np.float32)


def test_hammerstein_identifies_memoryless_polynomial():
    """y = x + 0.2 x^2 + 0.1 x^3 measured with the synchronized sweep:
    the identified kernels must be (scaled) unit impulses at the window
    center with the polynomial's coefficients."""
    scp = SyncChirpProcessor(SR, duration_s=1.0, f_start=20.0,
                             f_end=20000.0, amplitude=0.8,
                             fade_in_s=0.05, fade_out_s=0.005)
    coeffs = [1.0, 0.2, 0.1]
    resp = _measure_polynomial(scp, coeffs)
    order = 3
    win_rank = 12
    kernels = scp.hammerstein_kernels(resp, order, win_rank=win_rank)
    win = 1 << win_rank
    center = win // 2
    for m, a in enumerate(coeffs, start=1):
        k = kernels[m - 1]
        pk = int(np.argmax(np.abs(k)))
        assert abs(pk - center) <= 2, (m, pk)
        # peak amplitude ~ coefficient (DC-blocked impulse loses a
        # little mass; generous 20% tolerance)
        assert np.abs(k[pk]) == pytest.approx(a, rel=0.2), (m, k[pk])


def test_hammerstein_even_odd_separation():
    """A pure cubic (odd) nonlinearity must produce (near) zero 2nd
    kernel and vice versa."""
    scp = SyncChirpProcessor(SR, duration_s=1.0, f_start=20.0,
                             f_end=20000.0, amplitude=0.8,
                             fade_in_s=0.05, fade_out_s=0.005)
    resp = _measure_polynomial(scp, [1.0, 0.0, 0.3])
    kernels = scp.hammerstein_kernels(resp, 3, win_rank=12)
    peak1 = np.abs(kernels[0]).max()
    peak2 = np.abs(kernels[1]).max()
    peak3 = np.abs(kernels[2]).max()
    assert peak2 < 0.05 * peak1, (peak1, peak2)
    assert peak3 > 0.2          # cubic branch present


def test_coefficients_matrix_structure():
    """Chebyshev/binomial matrix parity checks
    (fillCoefficientsMatrices :321-420): upper triangular, zero where
    m+n odd, diagonal = alpha^c 2^{1-m} (+- or complex)."""
    scp = SyncChirpProcessor(SR, duration_s=0.2, amplitude=0.5)
    C = scp.coefficients_matrix(4)
    # lower part zero
    for r in range(4):
        for c in range(r):
            assert C[r, c] == 0.0
    # parity zeros: (m+n) odd
    assert C[0, 1] == 0.0        # n=1, m=2
    assert C[1, 2] == 0.0
    # diagonal magnitudes |C[c,c]| = alpha^c * 2^{1-m} * C(m, 0)
    for c in range(4):
        m = c + 1
        expect = 0.5 ** c * 2.0 ** (1 - m)
        assert np.abs(C[c, c]) == pytest.approx(expect)


def test_window_higher_order_row_zero_is_linear():
    """Row m=1 of the windowed responses is the linear IR's spectrum:
    for an identity system it must be (near) flat in-band."""
    scp = SyncChirpProcessor(SR, duration_s=0.5, f_start=20.0,
                             f_end=20000.0, amplitude=1.0,
                             fade_in_s=0.02, fade_out_s=0.002)
    resp = scp.sweep()
    full = scp.deconvolve(resp)
    H = scp.window_higher_order_responses(full, 2, win_rank=12)
    win = 1 << 12
    mag = np.abs(H[0])
    freqs = np.fft.fftfreq(win, 1 / SR)
    band = (freqs > 200) & (freqs < 10000)
    assert mag[band].max() / max(mag[band].min(), 1e-12) < 2.5


# ---------------------------------------------------------------------------
# persistence


def test_profile_roundtrip(tmp_path):
    scp = SyncChirpProcessor(SR, duration_s=0.3, f_start=50.0,
                             f_end=10000.0, amplitude=0.7)
    resp = scp.sweep()
    full = scp.deconvolve(resp)
    p = str(tmp_path / "profile.npz")
    scp.save_profile(p, full)
    scp2, full2 = SyncChirpProcessor.load_profile(p)
    assert scp2.order == scp.order
    assert scp2.gamma == pytest.approx(scp.gamma)
    assert scp2.n == scp.n
    np.testing.assert_allclose(full2, full.astype(np.float32),
                               atol=1e-6)


def test_profile_roundtrip_truncating_ratio(tmp_path):
    # f2/f1 ratios whose float division lands just below the integer
    # harmonic used to reload as order-1 (int() truncation), shifting
    # every harmonic window thousands of samples; the profile now
    # stores and restores the exact derived parameters
    scp = SyncChirpProcessor(SR, duration_s=1.0, f_start=41.0,
                             f_end=20000.0)
    resp = scp.sweep()
    full = scp.deconvolve(resp)
    p = str(tmp_path / "profile.npz")
    scp.save_profile(p, full)
    scp2, _ = SyncChirpProcessor.load_profile(p)
    assert scp2.order == scp.order
    assert scp2.n == scp.n
    assert scp2.gamma == scp.gamma
    assert scp2.harmonic_offset(2) == scp.harmonic_offset(2)


def test_profile_roundtrip_restores_fades_and_oversampling(tmp_path):
    scp = SyncChirpProcessor(SR, duration_s=0.3, f_start=50.0,
                             f_end=10000.0,
                             method=ChirpMethod.CHIRP_BANDLIMITED,
                             fade_in_s=0.05, fade_out_s=0.01,
                             oversampling=2)
    full = scp.deconvolve(scp.sweep())
    p = str(tmp_path / "profile.npz")
    scp.save_profile(p, full)
    scp2, _ = SyncChirpProcessor.load_profile(p)
    assert scp2.oversampling == 2
    assert scp2._fade_in == scp._fade_in
    assert scp2._fade_out == scp._fade_out
    assert scp2.method is ChirpMethod.CHIRP_BANDLIMITED
    # the resynthesized sweep (and therefore the measured deconvolution
    # anchor) must match the one the profile was measured with
    np.testing.assert_allclose(scp2.sweep(), scp.sweep(), atol=1e-7)
    assert scp2.deconv_origin == scp.deconv_origin


def test_save_linear_convolution_window(tmp_path):
    scp = SyncChirpProcessor(SR, duration_s=0.2)
    ir = np.zeros(1000, np.float32)
    ir[100] = 1.0
    p = str(tmp_path / "lin.wav")
    scp.save_linear_convolution(p, ir, head=50, count=200)
    back = scp.load_ir(p)
    assert back.size == 200
    assert np.argmax(np.abs(back)) == 50
