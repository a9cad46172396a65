"""Robustness sweep: extreme-but-legal parameters and inputs must
produce finite outputs, never crash (the production-hardening analog of
the reference's param clamping, e.g. Filter::limit to 0.49*sr)."""

import numpy as np
import jax.numpy as jnp
import pytest

SR = 48000


def _noise(shape, scale=0.5, seed=0):
    rng = np.random.default_rng(seed)
    return (scale * rng.standard_normal(shape)).astype(np.float32)


@pytest.mark.parametrize("freq,gain,q,slope", [
    (10.0, 1.0, 0.5, 1),          # near-DC pole
    (23900.0, 1.0, 0.5, 1),       # near Nyquist (limit clamps 0.49*sr)
    (1000.0, 1e-4, 0.5, 1),       # -80 dB gain
    (1000.0, 1e4, 0.5, 1),        # +80 dB gain
    (1000.0, 1.0, 100.0, 1),      # extreme Q
    (1000.0, 2.0, 0.5, 8),        # max slope BWC
])
def test_filter_extreme_params(freq, gain, q, slope):
    from lsp_dsp_units_tpu.models.filters import (Filter, FilterParams,
                                                  FilterType)
    for ftype in (FilterType.BT_BWC_BELL, FilterType.BT_RLC_HIPASS,
                  FilterType.MT_BWC_LOSHELF):
        flt = Filter(SR, FilterParams(ftype=ftype, freq=freq, gain=gain,
                                      quality=q, slope=slope))
        st = flt.init_state()
        st, y = flt.process(st, jnp.asarray(_noise(2048)))
        assert np.isfinite(np.asarray(y)).all(), (ftype, freq, gain)


def test_filter_freq_beyond_nyquist_is_clamped():
    """Design at f > sr/2 must not produce NaN coefficients
    (reference Filter::limit, Filter.cpp:161-167)."""
    from lsp_dsp_units_tpu.models.filters import (Filter, FilterParams,
                                                  FilterType)
    flt = Filter(SR, FilterParams(ftype=FilterType.BT_RLC_BELL,
                                  freq=40000.0, gain=2.0, quality=1.0))
    assert np.isfinite(np.asarray(flt.coefficients())).all()
    st = flt.init_state()
    st, y = flt.process(st, jnp.asarray(_noise(512)))
    assert np.isfinite(np.asarray(y)).all()


def test_dynamics_zero_timings():
    """Zero attack/release/hold are legal (instant envelopes)."""
    from lsp_dsp_units_tpu.models.dynamics import Compressor, Gate
    x = jnp.asarray(np.abs(_noise((2, 1024))))
    comp = Compressor(SR, attack_ms=0.0, release_ms=0.0, hold_ms=0.0,
                      attack_thresh=0.1, release_thresh=0.05, ratio=100.0)
    cp = comp.build()
    st = comp.init_state((2,))
    st, gain, env = comp.process(cp, st, x)
    assert np.isfinite(np.asarray(gain)).all()

    gate = Gate(SR, threshold=1e-6, zone=0.99, reduction=1e-6,
                attack_ms=0.0, release_ms=0.0)
    gp = gate.build()
    st = gate.init_state((2,))
    st, ggain, _ = gate.process(gp, st, x)
    assert np.isfinite(np.asarray(ggain)).all()


def test_limiter_extreme_threshold():
    from lsp_dsp_units_tpu.models.dynamics.limiter import Limiter
    for thresh in (1e-4, 10.0):
        lim = Limiter(SR, threshold=thresh, lookahead_ms=0.1)
        lp = lim.build()
        st = lim.init_state((2,))
        st, g = lim.process(lp, st, jnp.abs(jnp.asarray(_noise((2, 1024)))))
        g = np.asarray(g)
        assert np.isfinite(g).all() and (g > 0).all(), thresh


def test_denormal_range_input():
    """1e-30-scale input flows through filters and dynamics without
    NaN/Inf (JAX/TPU flushes denormals; no div-by-zero paths)."""
    from lsp_dsp_units_tpu.models.filters import (Filter, FilterParams,
                                                  FilterType)
    from lsp_dsp_units_tpu.models.dynamics import Compressor
    tiny = jnp.asarray(_noise(1024, scale=1e-30))
    flt = Filter(SR, FilterParams(ftype=FilterType.BT_RLC_BELL,
                                  freq=1000.0, gain=2.0, quality=1.0))
    st = flt.init_state()
    st, y = flt.process(st, tiny)
    assert np.isfinite(np.asarray(y)).all()

    comp = Compressor(SR)
    cp = comp.build()
    cst = comp.init_state()
    cst, gain, _ = comp.process(cp, cst, jnp.abs(tiny))
    assert np.isfinite(np.asarray(gain)).all()


def test_empty_inputs():
    """Zero-length blocks are no-ops, not crashes."""
    from lsp_dsp_units_tpu.models.filters import (Filter, FilterParams,
                                                  FilterType)
    from lsp_dsp_units_tpu.models.dynamics import Compressor
    empty = jnp.zeros((0,), jnp.float32)
    flt = Filter(SR, FilterParams(ftype=FilterType.BT_RLC_BELL,
                                  freq=1000.0, gain=2.0, quality=1.0))
    st = flt.init_state()
    st, y = flt.process(st, empty)
    assert y.shape == (0,)
    comp = Compressor(SR)
    cp = comp.build()
    cst = comp.init_state()
    cst, gain, env = comp.process(cp, cst, empty)
    assert gain.shape == (0,)


def test_resampler_extreme_ratios():
    from lsp_dsp_units_tpu.models.sampling import Sample
    s = Sample(1, 4800, SR)
    s.data[0] = _noise(4800)
    s.resample(8000)       # big downsample
    assert np.isfinite(s.data).all()
    s.resample(192000)     # big upsample
    assert np.isfinite(s.data).all()


def test_oversampler_silence_and_dc():
    from lsp_dsp_units_tpu.models.util import Oversampler
    for sig in (np.zeros((1, 4096), np.float32),
                np.ones((1, 4096), np.float32)):
        ovs = Oversampler(SR, ratio=8, quality="24bit", filtering=True)
        st = ovs.init_state((1,))
        st, y = ovs.process(st, jnp.asarray(sig), lambda hi: hi)
        assert np.isfinite(np.asarray(y)).all()


def test_spectral_tilt_extreme_slopes():
    from lsp_dsp_units_tpu.models.filters.spectral_tilt import (
        SpectralTilt, SlopeUnit)
    for slope in (-12.0, 12.0):
        st_f = SpectralTilt(SR, slope=slope,
                            slope_unit=SlopeUnit.DB_PER_OCTAVE)
        st_f.build()
        s = st_f.init_state()
        s, y = st_f.process(s, jnp.asarray(_noise(4096)))
        assert np.isfinite(np.asarray(y)).all(), slope


def test_empty_inputs_dyn_filters_and_sidechain_lpf():
    """The remaining sequential kernels also treat T=0 as a no-op:
    dyn_biquad_cascade (DynamicFilters assoc path) and onepole_lowpass
    (Sidechain LPF mode) used to IndexError on empty blocks."""
    from lsp_dsp_units_tpu.ops import biquad as bq
    from lsp_dsp_units_tpu.ops import dynamics as dyn
    coeffs = jnp.zeros((0, 3, 5), jnp.float32)
    st = bq.init_state(3)
    y, st2 = bq.dyn_biquad_cascade(coeffs, st, jnp.zeros((0,), jnp.float32))
    assert y.shape == (0,)
    assert np.allclose(np.asarray(st2), np.asarray(st))
    s0 = jnp.float32(0.25)
    s1, y = dyn.onepole_lowpass(s0, jnp.zeros((0,), jnp.float32), 0.5)
    assert y.shape == (0,) and float(s1) == 0.25


def test_expander_threshold_saturation():
    """Reference Expander::amplification (Expander.cpp:375-406):
    upward gain saturates at gain(threshold) because the INPUT clamps
    at threshold; downward gain is exactly 0 below threshold."""
    from lsp_dsp_units_tpu.models.dynamics.expander import (Expander,
                                                            ExpanderMode)
    up = Expander(SR, ExpanderMode.UPWARD, attack_thresh=0.01, knee=0.7,
                  ratio=4.0)
    pu = up.build()
    th = float(pu.knee.threshold)
    g = np.asarray(up.amplification(
        pu, jnp.asarray([th, 10.0 * th, 1000.0 * th], jnp.float32)))
    assert np.allclose(g[1:], g[0], rtol=1e-6)   # saturated past threshold
    assert g[0] <= 1.001e6

    dn = Expander(SR, ExpanderMode.DOWNWARD, attack_thresh=0.1, knee=0.7,
                  ratio=4.0)
    pd = dn.build()
    thd = float(pd.knee.threshold)
    g = np.asarray(dn.amplification(
        pd, jnp.asarray([0.5 * thd, 1.5 * thd], jnp.float32)))
    assert g[0] == 0.0
    assert g[1] > 0.0
