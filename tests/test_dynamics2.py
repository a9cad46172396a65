"""Tests for DynamicProcessor, AutoGain, SimpleAutoGain, SurgeProtector,
Depopper, DynamicFilters, NoiseGenerator, Analyzer."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsp_dsp_units_tpu.utils.units import snr_db, gain_to_db

SR = 48000


def test_dynamic_processor_curve():
    from lsp_dsp_units_tpu.models.dynamics import DynamicProcessor

    dp = DynamicProcessor(SR)
    # single dot at (0.1 -> 0.05), knee 0.5: compressor-like 2:1 above
    dp.set_dot(0, 0.1, 0.05, 0.5)
    p = dp.build()
    g = np.asarray(dp.reduction(p, jnp.asarray([0.001, 0.1, 1.0],
                                               jnp.float32)))
    # below threshold: in_ratio 1 -> gain = makeup offset line
    # at threshold: out/in = 0.5
    assert abs(g[1] - 0.5) < 0.02
    # far below: gain = makeup (0.5) with pre-ratio 0 -> constant
    assert abs(g[0] - 0.5) < 0.02
    curve = np.asarray(dp.curve(p, jnp.asarray([1.0], jnp.float32)))
    assert curve[0] < 1.0  # compressing

    st = dp.init_state()
    rng = np.random.default_rng(0)
    x = np.abs(rng.standard_normal(500)).astype(np.float32)
    st, gain, env = dp.process(p, st, jnp.asarray(x))
    assert np.all(np.isfinite(np.asarray(gain)))


def test_autogain_converges():
    from lsp_dsp_units_tpu.models.dynamics import AutoGain

    ag = AutoGain(SR, long_grow_db_s=60.0, long_fall_db_s=60.0)
    st = ag.init_state()
    n = SR  # 1 second
    level = np.full(n, 0.1, np.float32)   # input loudness
    target = np.full(n, 0.4, np.float32)  # want 12 dB more
    st, vca = ag.process(st, jnp.asarray(level), jnp.asarray(level),
                         jnp.asarray(target))
    vca = np.asarray(vca)
    # should have grown towards 4x (12 dB) within a second at 60 dB/s
    assert vca[-1] > 2.0
    # ends stabilized near the 4x target (within the deviation window)
    assert vca[-1] < 4.5


def test_simple_autogain():
    from lsp_dsp_units_tpu.models.dynamics import SimpleAutoGain

    sag = SimpleAutoGain(SR, grow_db_s=120.0, fall_db_s=120.0)
    st = sag.init_state()
    level = np.full(SR // 2, 1.0, np.float32)
    st, g = sag.process(st, jnp.asarray(level),
                        jnp.asarray(np.full(SR // 2, 0.25, np.float32)))
    g = np.asarray(g)
    assert g[-1] < 0.3  # fell toward 0.25 target


def test_surge_protector():
    from lsp_dsp_units_tpu.models.dynamics import SurgeProtector

    sp = SurgeProtector(on_threshold=0.1, off_threshold=0.01,
                        transition_samples=100, shutdown_samples=200)
    st = sp.init_state()
    x = np.concatenate([np.zeros(50), np.full(300, 0.5),
                        np.zeros(400)]).astype(np.float32)
    st, gain = sp.process(st, jnp.asarray(x))
    gain = np.asarray(gain)
    assert gain[25] == 0.0              # off before signal
    assert gain[340] > 0.9              # fully on during signal
    assert gain[-1] == 0.0              # shut down after timeout


def test_depopper_gates_pops():
    from lsp_dsp_units_tpu.models.util import Depopper

    dp = Depopper(SR, fade_in_thresh=0.05, fade_out_thresh=0.02,
                  fade_in_ms=5.0, fade_out_ms=5.0, rms_ms=2.0)
    st = dp.init_state()
    x = np.concatenate([np.zeros(2000),
                        0.5 * np.sin(2 * np.pi * 440 *
                                     np.arange(6000) / SR),
                        np.zeros(4000)]).astype(np.float32)
    st, gain, env = dp.process(st, jnp.asarray(x))
    gain = np.asarray(gain)
    assert gain[:1500].max() == 0.0        # closed during silence
    assert gain[3000:7000].max() > 0.9     # opens on signal
    assert gain[-500:].max() == 0.0        # closed again


def test_dynamic_filters_match_static_at_constant_gain():
    """With a constant gain signal the dynamic filter must equal the
    statically-designed filter."""
    from lsp_dsp_units_tpu.models.filters import (DynamicFilters,
                                                  FilterParams, FilterType,
                                                  design_filter)
    from lsp_dsp_units_tpu.ops import biquad

    p = FilterParams(ftype=FilterType.BT_RLC_BELL, slope=2, freq=1000.0,
                     gain=2.0, quality=1.0)
    df = DynamicFilters(SR, 1)
    df.set_params(0, p)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(2048).astype(np.float32)
    st = df.init_state(0)
    st, y = df.process(0, st, jnp.asarray(x),
                       jnp.full(2048, 2.0, jnp.float32))

    static = design_filter(p, SR)
    golden = biquad.np_biquad_cascade_f64(static.biquads, x)
    assert snr_db(np.asarray(y), golden) > 70.0


def test_dynamic_filters_gain_modulation():
    from lsp_dsp_units_tpu.models.filters import (DynamicFilters,
                                                  FilterParams, FilterType)

    df = DynamicFilters(SR, 1)
    df.set_params(0, FilterParams(ftype=FilterType.BT_BWC_HISHELF,
                                  slope=2, freq=1000.0, gain=1.0))
    t = np.arange(8192)
    x = np.sin(2 * np.pi * 8000 * t / SR).astype(np.float32)
    # gain ramps 1 -> 4: high-frequency content should grow
    g = np.linspace(1.0, 4.0, 8192).astype(np.float32)
    st = df.init_state(0)
    st, y = df.process(0, st, jnp.asarray(x), jnp.asarray(g))
    y = np.asarray(y)
    head = np.abs(y[500:1500]).max()
    tail = np.abs(y[-1000:]).max()
    assert tail > head * 2.5


def test_noise_generator_colors():
    from lsp_dsp_units_tpu.models.noise import (NoiseGenerator, NoiseCore,
                                                NoiseColor)

    gen = NoiseGenerator(SR, NoiseCore.LCG, NoiseColor.PINK, lcg_seed=3)
    st = gen.init_state()
    st, y = gen.process(st, SR)
    y = np.asarray(y)[SR // 4:]
    spec = np.abs(np.fft.rfft(y * np.hanning(y.size))) ** 2
    f = np.fft.rfftfreq(y.size, 1 / SR)
    # pink: ~ -3 dB/oct -> power ratio between 200Hz and 3200Hz bands
    def band(f0, f1):
        m = (f >= f0) & (f < f1)
        return spec[m].mean()
    ratio_db = 10 * np.log10(band(3200, 6400) / band(200, 400))
    assert -20 < ratio_db < -7   # ~ -12 dB over 4 octaves for pink


def test_analyzer_peak_detection():
    from lsp_dsp_units_tpu.models.util import Analyzer

    an = Analyzer(SR, channels=2, rank=11, rate=50.0, reactivity_s=0.01)
    st = an.init_state()
    t = np.arange(SR // 2)
    x = np.stack([np.sin(2 * np.pi * 1000 * t / SR),
                  np.sin(2 * np.pi * 5000 * t / SR)]).astype(np.float32)
    tt = (x.shape[1] // an.period) * an.period
    st = an.process(st, jnp.asarray(x[:, :tt]))
    f = an.frequencies()
    s0 = np.asarray(an.get_spectrum(st, 0))
    s1 = np.asarray(an.get_spectrum(st, 1))
    assert abs(f[int(np.argmax(s0))] - 1000.0) < 50.0
    assert abs(f[int(np.argmax(s1))] - 5000.0) < 100.0


def test_gate_pallas_kernel_matches_scan():
    """Pallas gate envelope kernel (interpreter mode) is bit-exact vs
    the lax.scan path, including the hysteresis curve track."""
    from lsp_dsp_units_tpu.models.dynamics.gate import Gate, GateState
    from lsp_dsp_units_tpu.ops import dynamics as dyn
    from lsp_dsp_units_tpu.ops.pallas_env import gate_envelope_pallas

    gate = Gate(48000, threshold=0.2, zone=0.4, hyst_threshold=0.15,
                hyst_zone=0.5, reduction=0.1, attack_ms=2.0,
                release_ms=30.0, hold_ms=1.0)
    p = gate.build()
    rng = np.random.default_rng(5)
    x = jnp.asarray((np.abs(rng.standard_normal((3, 512)))
                     * np.linspace(0.0, 0.6, 512)).astype(np.float32))
    st = gate.init_state((3,))
    st_scan, gain_scan, env_scan = gate.process(p, st, x)

    st2 = gate.init_state((3,))
    env_st, cur, env, curves = gate_envelope_pallas(
        st2.env, st2.curve, x, p.tau_attack, p.tau_release, p.hold,
        p.knees[0].end, p.knees[1].start, interpret=True)
    np.testing.assert_allclose(np.asarray(env), np.asarray(env_scan),
                               rtol=0, atol=0)
    g0 = dyn.gate_x1_gain(p.knees[0], env)
    g1 = dyn.gate_x1_gain(p.knees[1], env)
    gain = jnp.where(curves == 0, g0, g1)
    np.testing.assert_allclose(np.asarray(gain), np.asarray(gain_scan),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(env_st.envelope),
                                  np.asarray(st_scan.env.envelope))
    np.testing.assert_array_equal(np.asarray(cur),
                                  np.asarray(st_scan.curve))


def test_depopper_streaming_matches_oneshot():
    """Chunked processing must equal one-shot: the fall's retroactive
    fade-out has to reach into the PENDING lookahead buffer when the
    fall lands near a chunk boundary (gap regression: pending used to be
    emitted at full gain, then gain slammed to zero)."""
    from lsp_dsp_units_tpu.models.util import Depopper

    x = np.concatenate([np.zeros(1000),
                        0.5 * np.sin(2 * np.pi * 440 *
                                     np.arange(5000) / SR),
                        np.zeros(4096 - 1000 - 5000 + 8192)]
                       ).astype(np.float32)[:8192]

    def run(chunks):
        dp = Depopper(SR, fade_in_thresh=0.05, fade_out_thresh=0.02,
                      fade_in_ms=5.0, fade_out_ms=20.0, rms_ms=2.0)
        st = dp.init_state()
        outs = []
        for c in chunks:
            st, g, _ = dp.process(st, jnp.asarray(c))
            outs.append(np.asarray(g))
        return np.concatenate(outs)

    one = run([x])
    small = run([x[i:i + 512] for i in range(0, x.size, 512)])
    np.testing.assert_allclose(small, one, atol=1e-6)
    # and the fade-out is actually gradual: no single-sample gain drop
    # larger than a few ramp steps anywhere
    assert np.max(-np.diff(one)) < 5.0 / (SR * 20.0 / 1000.0) + 1e-6


def test_depopper_reopen_has_no_click():
    """Re-opening after a full open/close cycle must restart the fade-in
    ramp at 0 (regression: the stale counter emitted one full-gain
    sample at every re-open)."""
    from lsp_dsp_units_tpu.models.util import Depopper

    burst = 0.5 * np.sin(2 * np.pi * 440 * np.arange(4000) / SR)
    x = np.concatenate([np.zeros(1000), burst, np.zeros(3000),
                        burst, np.zeros(2000)]).astype(np.float32)
    dp = Depopper(SR, fade_in_thresh=0.05, fade_out_thresh=0.02,
                  fade_in_ms=5.0, fade_out_ms=5.0, rms_ms=2.0)
    st = dp.init_state()
    st, gain, _ = dp.process(st, jnp.asarray(x))
    gain = np.asarray(gain)
    # no upward gain jump bigger than a few fade-in steps anywhere
    # (a stale-counter click is a 0 -> 1.0 jump)
    step = 1.0 / (SR * 5.0 / 1000.0)
    assert np.max(np.diff(gain)) < 5.0 * step + 1e-6


def test_peak_envelope_pallas_matches_scan_unrolled_and_ragged():
    """The Mosaic envelope kernel (interpreter mode) is bit-exact vs the
    lax.scan path, both on the 8-step-unrolled layout (T % 8 == 0) and
    on the row-at-a-time fallback (ragged T)."""
    from lsp_dsp_units_tpu.ops import dynamics as dyn
    from lsp_dsp_units_tpu.ops.pallas_env import peak_envelope_pallas

    rng = np.random.default_rng(11)
    for t_len in (512, 509):            # unrolled vs ragged
        x = jnp.asarray(np.abs(rng.standard_normal((5, t_len)))
                        .astype(np.float32))
        st = dyn.env_init((5,))
        # release_thresh exercises the two-rate release branch
        for rt in (None, 0.2):
            st_scan, env_scan = dyn.peak_envelope(
                st, x, 0.05, 0.01, 8, release_thresh=rt)
            st_pl, env_pl = peak_envelope_pallas(
                st, x, 0.05, 0.01, 8, release_thresh=rt, interpret=True)
            np.testing.assert_allclose(np.asarray(env_pl),
                                       np.asarray(env_scan),
                                       rtol=0, atol=0)
            np.testing.assert_array_equal(
                np.asarray(st_pl.envelope), np.asarray(st_scan.envelope))
            np.testing.assert_array_equal(
                np.asarray(st_pl.peak), np.asarray(st_scan.peak))
            np.testing.assert_array_equal(
                np.asarray(st_pl.hold), np.asarray(st_scan.hold))


def test_sliding_rms_pallas_matches_cumsum_form():
    """The Mosaic sliding-RMS kernel (interpreter mode) matches the
    cumsum-difference sidechain detector to f32 rounding, including the
    carried-window boundary and the window-state handoff across calls."""
    from lsp_dsp_units_tpu.ops.pallas_env import sliding_rms_pallas
    from lsp_dsp_units_tpu.ops.sliding import sliding_sum

    rng = np.random.default_rng(12)
    c, n = 5, 16
    win = jnp.asarray((rng.standard_normal((c, n)) ** 2)
                      .astype(np.float32))
    win_pl = win
    for t_len in (64, 128):
        x = jnp.asarray(np.abs(rng.standard_normal((c, t_len)))
                        .astype(np.float32))
        frame = jnp.concatenate([win, x * x], axis=-1)
        lvl_ref = jnp.sqrt(jnp.maximum(
            sliding_sum(frame, n, t_len) / n, 0.0))
        win = frame[..., -n:]
        win_pl, lvl_pl = sliding_rms_pallas(win_pl, x, n, 1.0,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(lvl_pl),
                                   np.asarray(lvl_ref),
                                   rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(win_pl), np.asarray(win),
                                   rtol=0, atol=1e-7)
