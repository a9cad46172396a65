"""Parity vs the COMPILED genuine noise Generator facade
(noise/Generator.cpp, oracle wave 4): core selection (MLS/LCG/Velvet)
and every ng_color_t color filter (white/pink/red/blue/violet/
arbitrary dB-per-octave via SpectralTilt) driven on identical seeds."""

import ctypes

import numpy as np
import pytest

import tests.ref_oracle as ro

pytestmark = pytest.mark.skipif(not ro.available(),
                                reason="reference sources not present")

SR = 48000
N = 8192


def _f32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def genuine(core=1, color=0, order=32, slope=0.0, slope_unit=0,
            mls_nbits=23, mls_seed=0, lcg_seed=42, lcg_dist=0,
            velvet_type=0, velvet_window_s=0.01, velvet_delta=0.5,
            amplitude=1.0, offset=0.0, n=N, block=0):
    lib = ro._lib()
    dst = np.zeros(n, np.float32)
    rc = lib.ref_noise_generator(
        core, color, order, slope, slope_unit, mls_nbits, mls_seed,
        lcg_seed, lcg_dist, velvet_type, velvet_window_s, velvet_delta,
        0, 0.5, amplitude, offset, SR, _f32(dst), n, block)
    assert rc == 0
    return dst


def ours(core="lcg", color="white", order=32, slope_db_oct=0.0,
         lcg_seed=42, mls_bits=23, mls_seed=0, amplitude=1.0,
         offset=0.0, n=N):
    from lsp_dsp_units_tpu.models.noise.generator import (
        NoiseGenerator, NoiseCore, NoiseColor)
    g = NoiseGenerator(sample_rate=SR, core=NoiseCore(core),
                       color=NoiseColor(color), slope_db_oct=slope_db_oct,
                       coloring_order=order, amplitude=amplitude,
                       offset=offset, mls_bits=mls_bits,
                       mls_seed=mls_seed, lcg_seed=lcg_seed)
    st = g.init_state()
    _, y = g.process(st, n)
    return np.asarray(y)


def snr_db(ref, out):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(out, np.float64) - ref
    return 10.0 * np.log10(max((ref ** 2).sum(), 1e-30)
                           / max((err ** 2).sum(), 1e-30))


def _ref_floor_db(coeffs, x, y_genuine):
    """SNR of the GENUINE output vs the float64 golden of the same
    cascade: the reference's own f32 arithmetic noise floor (it runs
    f32 biquads per sample; deep falling tilts with 10 Hz poles sit at
    ~33 dB from the f64 ideal — measured, see NUMERICS.md).  Matching
    the genuine any closer than this floor is impossible without
    replicating its rounding error-for-error (the capstone argument,
    test_reference_oracle_chain.py)."""
    from scipy.signal import lfilter
    g = np.asarray(x, np.float64)
    for row in np.asarray(coeffs, np.float64):
        g = lfilter([row[0], row[1], row[2]],
                    [1.0, -row[3], -row[4]], g)
    return snr_db(g, y_genuine)


def test_white_lcg_matches():
    # our LCG computes the uniform transform in f64 and rounds once;
    # the genuine computes in f32 — sub-ulp differences only (the
    # established tolerance class of test_reference_oracle_misc)
    g = genuine(core=1, color=0, lcg_seed=42)
    o = ours(core="lcg", color="white", lcg_seed=42)
    np.testing.assert_allclose(o, g, rtol=1e-5, atol=1e-6)


def test_white_mls_bit_exact():
    g = genuine(core=0, color=0, mls_nbits=16, mls_seed=0x5ad)
    o = ours(core="mls", color="white", mls_bits=16, mls_seed=0x5ad)
    np.testing.assert_array_equal(g, o)


def _tilt_coeffs(color, slope_db_oct=0.0, order=32):
    from lsp_dsp_units_tpu.models.noise.generator import (
        NoiseGenerator, NoiseCore, NoiseColor)
    g = NoiseGenerator(sample_rate=SR, core=NoiseCore.LCG,
                       color=NoiseColor(color),
                       slope_db_oct=slope_db_oct,
                       coloring_order=order)
    return np.asarray(g.tilt._coeffs)


def _white(lcg_seed):
    return ours(core="lcg", color="white", lcg_seed=lcg_seed)


def test_amplitude_offset_applied_before_color():
    g = genuine(core=1, color=1, lcg_seed=7, amplitude=0.25, offset=0.1)
    o = ours(core="lcg", color="pink", lcg_seed=7, amplitude=0.25,
             offset=0.1)
    c = _tilt_coeffs("pink")
    w = 0.25 * _white(7) + 0.1
    floor = _ref_floor_db(c, w, g)
    assert snr_db(g, o) > min(floor - 6.0, 80.0), (snr_db(g, o), floor)


@pytest.mark.parametrize("color,cid", [
    ("pink", 1), ("red", 2), ("blue", 3), ("violet", 4)])
def test_color_filters_match_reference(color, cid):
    """Each ng_color_t vs the genuine facade.  Falling slopes (pink/
    red) with the facade's 10 Hz lower corner sit at the reference's
    OWN f32 arithmetic noise floor (~33-35 dB from the f64 golden of
    the same cascade — measured; rising slopes are >80 dB), so the
    assertion is floor-relative, the capstone pattern."""
    g = genuine(core=1, color=cid, lcg_seed=42)
    o = ours(core="lcg", color=color, lcg_seed=42)
    c = _tilt_coeffs(color)
    floor = _ref_floor_db(c, _white(42), g)
    got = snr_db(g, o)
    assert got > min(floor - 6.0, 80.0), (color, got, floor)


@pytest.mark.parametrize("slope", [-4.5, 2.25])
def test_arbitrary_db_per_octave(slope):
    # NG_COLOR_ARBITRARY with STLT_SLOPE_UNIT_DB_PER_OCTAVE
    g = genuine(core=1, color=5, slope=slope, slope_unit=1, lcg_seed=9)
    o = ours(core="lcg", color="arbitrary", slope_db_oct=slope,
             lcg_seed=9)
    c = _tilt_coeffs("arbitrary", slope_db_oct=slope)
    floor = _ref_floor_db(c, _white(9), g)
    got = snr_db(g, o)
    assert got > min(floor - 6.0, 80.0), (slope, got, floor)


def test_color_magnitude_response_matches_genuine():
    """Designed cascade magnitude vs the genuine freq chart: <0.25 dB
    everywhere in-band (the f32 design ladder + per-biquad
    self-normalization are ulp-sensitive near the 10 Hz corner; the
    remaining offset is the genuine's own f32 design rounding)."""
    import ctypes
    lib = ro._lib()
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ref_spectral_tilt_chart.argtypes = [
        ctypes.c_uint32, ctypes.c_float, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_float, ctypes.c_float,
        ctypes.c_uint32, f32p, f32p, f32p, ctypes.c_int]
    from tests.test_reference_oracle_units import digital_freq_response
    freqs = np.geomspace(10.0, 21000.0, 96).astype(np.float32)
    for color, cid, slope in [("pink", 1, -0.5), ("red", 2, -1.0),
                              ("blue", 3, 0.5), ("violet", 4, 1.0)]:
        re = np.zeros_like(freqs)
        im = np.zeros_like(freqs)
        lib.ref_spectral_tilt_chart(
            32, slope, 0, 5, 10.0, 0.9 * 0.5 * SR, SR,
            _f32(freqs), _f32(re), _f32(im), freqs.size)
        h = digital_freq_response(_tilt_coeffs(color),
                                  freqs.astype(np.float64), SR)
        d = (20 * np.log10(np.abs(re + 1j * im))
             - 20 * np.log10(np.abs(h)))
        assert np.abs(d).max() < 0.25, (color, np.abs(d).max())


def test_block_streaming_invariance():
    """The genuine facade streamed in 512-sample blocks equals one
    call; our generator is stateless-in, carried-state tilt."""
    g1 = genuine(core=1, color=2, lcg_seed=3, block=0)
    g2 = genuine(core=1, color=2, lcg_seed=3, block=512)
    np.testing.assert_array_equal(g1, g2)
