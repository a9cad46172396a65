"""Equalizer tests — latency == impulse argmax for FIR/FFT/SPM modes (the
reference's structural invariant, utest/filters/equalizer.cpp:75-81), IIR
equivalence with the raw cascade, streaming invariance."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsp_dsp_units_tpu.models.filters.equalizer import Equalizer, EqMode
from lsp_dsp_units_tpu.models.filters.design import FilterParams, FilterType
from lsp_dsp_units_tpu.ops import biquad as biquad_ops
from lsp_dsp_units_tpu.utils.units import snr_db

SR = 48000


def _setup(mode, fir_rank=8):
    eq = Equalizer(SR, filters=3, mode=mode, fir_rank=fir_rank)
    eq.set_params(0, FilterParams(ftype=FilterType.BT_BWC_HISHELF, slope=2,
                                  freq=1000.0, gain=2.0))
    eq.set_params(1, FilterParams(ftype=FilterType.BT_RLC_BELL, slope=1,
                                  freq=4000.0, gain=0.5, quality=1.0))
    return eq


def test_iir_mode_equals_cascade():
    """The default IIR path (fused block kernel) must implement the same
    cascade as the sequential scan — compared via the float64 golden,
    since the fused path is MORE accurate than the f32 scan."""
    eq = _setup(EqMode.IIR)
    p = eq.build()
    rng = np.random.default_rng(0)
    x = rng.normal(size=1024).astype(np.float32)
    st = eq.init_state(p)
    st, y = eq.process(p, st, jnp.asarray(x))
    golden = biquad_ops.np_biquad_cascade_f64(
        np.concatenate([d.biquads for d in eq._active_designs()], 0), x)
    np.testing.assert_allclose(np.asarray(y), golden, atol=2e-5)
    assert eq.latency() == 0

    # with the fused path disabled, IIR mode IS the sequential scan
    eq2 = _setup(EqMode.IIR)
    eq2.iir_block = None
    p2 = eq2.build()
    st2 = eq2.init_state(p2)
    st2, y2 = eq2.process(p2, st2, jnp.asarray(x))
    y3, _ = biquad_ops.biquad_cascade_seq(
        p2.coeffs, biquad_ops.init_state(p2.coeffs.shape[0]),
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y3), rtol=1e-6,
                               atol=1e-7)


@pytest.mark.parametrize("mode", [EqMode.FIR, EqMode.FFT, EqMode.SPM])
def test_latency_equals_impulse_argmax(mode):
    """Reference oracle: reported latency must equal the position of the
    impulse-response peak (utest/filters/equalizer.cpp:75-81)."""
    eq = _setup(mode)
    p = eq.build()
    st = eq.init_state(p)
    n = eq.fir_size
    total = 4 * n
    x = np.zeros(total, np.float32)
    x[0] = 1.0
    outs = []
    blk = eq.block
    for i in range(0, total, blk):
        st, y = eq.process(p, st, jnp.asarray(x[i:i + blk]))
        outs.append(np.asarray(y))
    y = np.concatenate(outs)
    peak = int(np.argmax(np.abs(y)))
    assert peak == eq.latency(), (peak, eq.latency(), mode)


@pytest.mark.parametrize("mode", [EqMode.FIR, EqMode.FFT])
def test_fir_magnitude_close_to_iir(mode):
    """Linear-phase modes approximate the IIR magnitude response."""
    eq = _setup(mode, fir_rank=11)
    p = eq.build()
    iir = _setup(EqMode.IIR)
    pi = iir.build()
    # measure via long noise + FFT magnitude ratio at band centers
    st = eq.init_state(p)
    n = eq.fir_size
    x = np.zeros(4 * n, np.float32)
    x[0] = 1.0
    outs = []
    for i in range(0, 4 * n, eq.block):
        st, y = eq.process(p, st, jnp.asarray(x[i:i + eq.block]))
        outs.append(np.asarray(y))
    imp = np.concatenate(outs)
    H = np.fft.rfft(imp)
    freqs = np.fft.rfftfreq(imp.size, 1.0 / SR)
    from lsp_dsp_units_tpu.models.filters.design import (
        digital_freq_response)
    H_iir = digital_freq_response(np.asarray(pi.coeffs), freqs, SR)
    for f_test in (500.0, 1000.0, 4000.0, 8000.0):
        i = int(np.argmin(np.abs(freqs - f_test)))
        db_fir = 20 * np.log10(np.abs(H[i]) + 1e-12)
        db_iir = 20 * np.log10(np.abs(H_iir[i]) + 1e-12)
        assert abs(db_fir - db_iir) < 0.7, (f_test, db_fir, db_iir)


def test_spm_streaming_invariance():
    eq = _setup(EqMode.SPM)
    p = eq.build()
    rng = np.random.default_rng(1)
    x = rng.normal(size=8 * eq.block).astype(np.float32)

    st = eq.init_state(p)
    st, y_full = eq.process(p, st, jnp.asarray(x))

    st = eq.init_state(p)
    outs = []
    for i in range(0, x.size, eq.block):
        st, y = eq.process(p, st, jnp.asarray(x[i:i + eq.block]))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(y_full),
                               rtol=1e-4, atol=1e-5)


def test_fir_xfade_no_click():
    """Crossfaded coefficient change must pass through an INTERMEDIATE
    gain frame, not hard-switch (reference EF_XFADE,
    Equalizer.cpp:486-501): steady 8 kHz sine through a hi-shelf whose
    gain drops 2.0 -> 0.25; the frame after the xfade call must sit
    strictly between the old and new steady levels."""
    eq = _setup(EqMode.FIR)
    p_old = eq.build()
    eq.set_params(0, FilterParams(ftype=FilterType.BT_BWC_HISHELF, slope=2,
                                  freq=1000.0, gain=0.25))
    p_new = eq.build()
    n = eq.fir_size
    t = np.arange(n * 12) / SR
    sine = (0.5 * np.sin(2 * np.pi * 8000.0 * t)).astype(np.float32)
    frames = sine.reshape(12, n)

    st = eq.init_state(p_old)
    rms = []
    for k in range(4):
        st, y = eq.process(p_old, st, jnp.asarray(frames[k]))
        rms.append(float(np.sqrt(np.mean(np.square(np.asarray(y))))))
    st, y = eq.process_xfade(p_old, p_new, st, jnp.asarray(frames[4]))
    rms.append(float(np.sqrt(np.mean(np.square(np.asarray(y))))))
    for k in range(5, 12):
        st, y = eq.process(p_new, st, jnp.asarray(frames[k]))
        rms.append(float(np.sqrt(np.mean(np.square(np.asarray(y))))))

    old_lvl, new_lvl = rms[3], rms[-1]
    assert old_lvl > 3.0 * new_lvl          # the change is audible
    # xfade call still emits the pre-change pending frame
    assert abs(rms[4] - old_lvl) < 0.15 * old_lvl
    # the ramp spans [N/2, 3N/2) of the computed 2N buffer, so the TWO
    # following frames descend monotonically through the transition with
    # at least one strictly-intermediate level (a hard switch would jump
    # straight to new_lvl)
    assert old_lvl * 1.05 > rms[5] > rms[6] > new_lvl
    assert new_lvl * 1.2 < rms[6] < old_lvl * 0.8, (new_lvl, rms[6], old_lvl)
    # and convergence to the new response
    assert abs(rms[-1] - rms[-2]) < 0.05 * new_lvl
    assert all(np.isfinite(v) for v in rms)


def test_freq_chart_per_filter_and_total():
    """Equalizer.freq_chart (reference Equalizer.h:197-224): the total
    chart is the product of per-filter charts; inactive slots are
    unity."""
    eq = _setup(EqMode.IIR)
    freqs = np.asarray([100.0, 1000.0, 4000.0, 12000.0])
    total = eq.freq_chart(freqs)
    prod = np.ones_like(freqs, np.complex128)
    for i in range(3):
        prod = prod * eq.freq_chart(freqs, idx=i)
    np.testing.assert_allclose(total, prod, rtol=1e-12)
    np.testing.assert_allclose(eq.freq_chart(freqs, idx=2), 1.0)  # unset
    # hi-shelf at slot 0: gain 2.0 well above 1 kHz, ~1 well below
    h0 = eq.freq_chart(np.asarray([20.0, 20000.0]), idx=0)
    assert abs(abs(h0[0]) - 1.0) < 0.1
    assert abs(abs(h0[1]) - 2.0) < 0.1


def test_iir_fused_block_mode():
    """Equalizer(iir_block=...) runs the fused whole-cascade kernel on
    aligned blocks, matching the f64 golden better than the scan, and
    streaming across calls with exact state carry."""
    from lsp_dsp_units_tpu.pipeline import default_eq_params
    from lsp_dsp_units_tpu.ops import biquad as bq

    eq = Equalizer(SR, filters=8, mode=EqMode.IIR, iir_block=1024)
    for i, p in enumerate(default_eq_params(SR)):
        eq.set_params(i, p)
    params = eq.build()
    assert params.fused is not None

    rng = np.random.default_rng(9)
    x = rng.standard_normal(4096).astype(np.float32)
    st = eq.init_state(params)
    st, y = eq.process(params, st, jnp.asarray(x))          # fused, 4 blocks
    golden = bq.np_biquad_cascade_f64(np.asarray(params.coeffs,
                                                 np.float64), x)
    # ~92 dB at block 1024 (state crosses f32 once per block; the
    # 8192-block pipeline kernel measures ~124 dB) — still well above
    # the seq scan's ~75-80 dB class for 16 stages
    assert snr_db(np.asarray(y), golden) > 85.0

    # streaming invariance across the fused/seq boundary: an unaligned
    # tail falls back to the seq scan with the SAME carried state
    st2 = eq.init_state(params)
    st2, y1 = eq.process(params, st2, jnp.asarray(x[:2048]))  # fused
    st2, y2 = eq.process(params, st2, jnp.asarray(x[2048:2048 + 500]))
    y_mix = np.concatenate([np.asarray(y1), np.asarray(y2)])
    assert snr_db(y_mix, golden[:2548]) > 80.0


def test_iir_fused_seq_remainder_basis():
    """Remainder chunks run per-sample IN the balanced basis
    (cascade_seq_fused): a long stream of block-misaligned calls never
    round-trips through t_mat/t_inv, so it holds the same accuracy
    class as the aligned path instead of random-walking."""
    from lsp_dsp_units_tpu.pipeline import default_eq_params
    from lsp_dsp_units_tpu.ops import biquad as bq
    from lsp_dsp_units_tpu.ops import biquad_block as bb

    eq = Equalizer(SR, filters=8, mode=EqMode.IIR, iir_block=256)
    for i, p in enumerate(default_eq_params(SR)):
        eq.set_params(i, p)
    params = eq.build()
    coeffs = np.asarray(params.coeffs, np.float64)

    rng = np.random.default_rng(11)
    x = rng.standard_normal(128 * 400).astype(np.float32)
    golden = bq.np_biquad_cascade_f64(coeffs, x)

    # 400 consecutive 128-sample calls: head == 0 on every call (128 <
    # iir_block 256), the pre-fix round-trip path would convert basis
    # 800 times.  The per-sample balanced f32 scan holds ~88 dB for
    # this 16-stage cascade (vs ~75-80 dB for the DF2T seq scan; the
    # aligned block path holds >=95 dB) with no drift over the stream.
    import jax
    step = jax.jit(lambda s, xb: eq.process(params, s, xb))
    st = eq.init_state(params)
    outs = []
    for i in range(0, x.size, 128):
        st, y = step(st, jnp.asarray(x[i:i + 128]))
        outs.append(np.asarray(y))
    assert snr_db(np.concatenate(outs), golden) > 85.0

    # the per-sample balanced kernel agrees with the block kernel's
    # carried state: 256 samples as one block vs as 2x128 per-sample
    st_a = bb.init_state(coeffs.shape[0])
    y_a, st_a = bb.cascade_block_fused(params.fused, st_a,
                                       jnp.asarray(x[:256]))
    st_b = bb.init_state(coeffs.shape[0])
    y_b1, st_b = bb.cascade_seq_fused(params.fused, st_b,
                                      jnp.asarray(x[:128]))
    y_b2, st_b = bb.cascade_seq_fused(params.fused, st_b,
                                      jnp.asarray(x[128:256]))
    y_b = np.concatenate([np.asarray(y_b1), np.asarray(y_b2)])
    assert snr_db(y_b, np.asarray(y_a)) > 90.0
    assert snr_db(np.asarray(st_b).ravel(),
                  np.asarray(st_a).ravel()) > 60.0
