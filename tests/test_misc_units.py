"""Tests for sampling, oscillator, ADSR, trigger, buffers, dither,
stat, state dump, butterworth, spectral tilt, noise generators."""

import jax.numpy as jnp
import numpy as np
import pytest

SR = 48000


def test_sample_edit_roundtrip(tmp_path):
    from lsp_dsp_units_tpu.models.sampling import Sample, SampleNormalize

    s = Sample(2, 1000, SR)
    s.data[0] = np.sin(2 * np.pi * 440 * np.arange(1000) / SR)
    s.data[1] = 0.25
    s.apply_gain(0.5)
    assert abs(float(np.abs(s.data[1]).max()) - 0.125) < 1e-6
    s.normalize(1.0, SampleNormalize.ALWAYS)
    assert abs(float(np.abs(s.data).max()) - 1.0) < 1e-6
    s.reverse()
    s.fade_in(100).fade_out(100)
    assert s.data[0, 0] == 0.0
    p = str(tmp_path / "s.wav")
    s.save(p)
    s2 = Sample.load(p)
    assert s2.sample_rate == SR
    np.testing.assert_allclose(s2.data, s.data, atol=1e-6)


def test_sample_resample_sine():
    from lsp_dsp_units_tpu.models.sampling import Sample

    s = Sample(1, SR, SR)
    s.data[0] = np.sin(2 * np.pi * 1000 * np.arange(SR) / SR)
    s.resample(96000)
    assert s.sample_rate == 96000
    assert abs(s.length - 96000) < 100
    mid = s.data[0][1000:-1000]
    spec = np.abs(np.fft.rfft(mid * np.hanning(mid.size)))
    f = np.fft.rfftfreq(mid.size, 1 / 96000)
    assert abs(f[int(np.argmax(spec))] - 1000.0) < 3.0


def test_sample_player():
    from lsp_dsp_units_tpu.models.sampling import (Sample, SamplePlayer,
                                                   PlaySettings, LoopMode)

    bank = SamplePlayer()
    s = Sample(1, 100, SR)
    s.data[0] = np.arange(100, dtype=np.float32)
    bank.bind(0, s)
    pb = bank.play(PlaySettings(sample_id=0, volume=2.0, delay=10))
    assert pb is not None
    out = bank.process(50)
    np.testing.assert_allclose(out[:10], 0.0)
    np.testing.assert_allclose(out[10:], 2.0 * np.arange(40), rtol=1e-6)
    # looped playback keeps producing
    bank.stop()
    bank.play(PlaySettings(sample_id=0, loop_start=10, loop_end=20,
                           loop_mode=LoopMode.DIRECT))
    out = bank.process(200)
    assert np.abs(out[150:]).max() > 0


def test_oscillator_sine_freq():
    from lsp_dsp_units_tpu.models.util import Oscillator, FunctionGenerator

    osc = Oscillator(SR, FunctionGenerator.SINE, frequency=1000.0)
    st = osc.init_state()
    st, y = osc.process(st, 4096)
    y = np.asarray(y)
    spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
    f = np.fft.rfftfreq(y.size, 1 / SR)
    assert abs(f[int(np.argmax(spec))] - 1000.0) < 15.0
    # streaming continuity: phase continues across calls
    st2 = osc.init_state()
    st2, a = osc.process(st2, 1000)
    st2, b = osc.process(st2, 1000)
    st3 = osc.init_state()
    st3, full = osc.process(st3, 2000)
    np.testing.assert_allclose(np.concatenate([a, b]), np.asarray(full),
                               atol=1e-5)


def test_oscillator_bl_saw_cleaner_than_naive():
    from lsp_dsp_units_tpu.models.util import Oscillator, FunctionGenerator

    def alias_power(kind):
        osc = Oscillator(SR, kind, frequency=2500.0, width=0.5)
        st = osc.init_state()
        st, y = osc.process(st, 8192)
        y = np.asarray(y)[1000:]
        spec = np.abs(np.fft.rfft(y * np.hanning(y.size))) ** 2
        f = np.fft.rfftfreq(y.size, 1 / SR)
        # power at non-harmonic bins (aliases fold to non-multiples)
        harm = (np.abs((f / 2500.0) - np.round(f / 2500.0)) < 0.02)
        return spec[~harm].sum() / spec.sum()

    naive = alias_power(FunctionGenerator.SAWTOOTH)
    bl = alias_power(FunctionGenerator.BL_SAWTOOTH)
    assert bl < naive * 0.5


def test_adsr_envelope():
    from lsp_dsp_units_tpu.models.util import ADSREnvelope

    env = ADSREnvelope(attack=0.1, decay=0.3, sustain_level=0.5,
                       release=0.8)
    t = jnp.asarray(np.linspace(0, 1, 1001, dtype=np.float32))
    y = np.asarray(env.process(t))
    assert y[0] == 0.0 and y[-1] == 0.0
    assert abs(y[100] - 1.0) < 1e-3          # end of attack
    assert abs(y[500] - 0.5) < 1e-3          # sustain
    assert y.max() <= 1.0 + 1e-5


def test_trigger_rising_edge():
    from lsp_dsp_units_tpu.models.util import Trigger, TriggerType

    # SIMPLE_RISING fires on EVERY rising sample at/above the threshold
    # (reference Trigger.cpp:104-119), so each 10-step ramp yields 5
    trg = Trigger(TriggerType.SIMPLE_RISING_EDGE, threshold=0.5)
    st = trg.init_state()
    x = np.concatenate([np.linspace(0, 1, 10), np.linspace(1, 0, 10),
                        np.linspace(0, 1, 10)]).astype(np.float32)
    st, states = trg.process(st, jnp.asarray(x))
    fired = np.where(np.asarray(states) == 2)[0]
    np.testing.assert_array_equal(fired, [5, 6, 7, 8, 9,
                                          25, 26, 27, 28, 29])

    # ADVANCED_RISING fires once per hysteresis-window sweep: armed on
    # crossing threshold-hyst, fired on crossing threshold+hyst
    adv = Trigger(TriggerType.ADVANCED_RISING_EDGE, threshold=0.5,
                  hysteresis=0.2)
    st = adv.init_state()
    st, states = adv.process(st, jnp.asarray(x))
    assert int(np.sum(np.asarray(states) == 2)) == 2  # one per ramp


def test_ring_and_shift_buffers():
    from lsp_dsp_units_tpu.models.util import RingBuffer, ShiftBuffer

    rb = RingBuffer(8)
    rb.push(np.arange(5, dtype=np.float32))
    np.testing.assert_array_equal(rb.tail(3), [2, 3, 4])
    rb.push(np.arange(5, 11, dtype=np.float32))  # wraps
    np.testing.assert_array_equal(rb.tail(4), [7, 8, 9, 10])

    sb = ShiftBuffer(16)
    sb.append(np.arange(10, dtype=np.float32))
    np.testing.assert_array_equal(sb.shift(4), [0, 1, 2, 3])
    sb.append(np.arange(10, 20, dtype=np.float32))  # forces shift
    assert sb.avail == 16


def test_ring_buffer_reference_utest_sequence():
    """Exact port of the reference's RingBuffer unit test
    (src/test/utest/util/ringbuffer.cpp:28-192): offset-indexed get
    with zero reads outside the capacity, descending-offset block get
    returning the in-capacity sample count, and oversize append
    keeping the last ``size`` samples."""
    from lsp_dsp_units_tpu.models.util import RingBuffer

    rb = RingBuffer(8)
    assert rb.size == 8

    for v in (1.0, 2.0, 3.0, 4.0):
        rb.append(v)
    assert [rb.get(o) for o in range(8, -1, -1)] == [
        0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 2.0, 3.0, 4.0]

    assert rb.append(np.array([5.0, 6.0], np.float32)) == 2
    assert [rb.get(o) for o in range(8, -1, -1)] == [
        0.0, 0.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0]

    out, n = rb.get_range(9, 10)
    assert n == 8
    np.testing.assert_array_equal(
        out, [0, 0, 0, 0, 1, 2, 3, 4, 5, 6])

    assert rb.append(np.array([7.0, 8.0, 9.0, 10.0], np.float32)) == 4
    assert [rb.get(o) for o in range(8, -1, -1)] == [
        0.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]

    out, n = rb.get_range(7, 10)
    assert n == 8
    np.testing.assert_array_equal(
        out, [3, 4, 5, 6, 7, 8, 9, 10, 0, 0])

    # oversize append keeps only the last `size` samples
    big = -np.arange(1.0, 13.0, dtype=np.float32)
    assert rb.append(big) == 8
    assert [rb.get(o) for o in range(8, -1, -1)] == [
        0.0, -5.0, -6.0, -7.0, -8.0, -9.0, -10.0, -11.0, -12.0]

    out, n = rb.get_range(16, 8)
    assert n == 0
    np.testing.assert_array_equal(out, np.zeros(8))

    out, n = rb.get_range(7, 8)
    assert n == 8
    np.testing.assert_array_equal(
        out, [-5, -6, -7, -8, -9, -10, -11, -12])

    out, n = rb.get_range(12, 16)
    assert n == 8
    np.testing.assert_array_equal(
        out, [0, 0, 0, 0, 0, -5, -6, -7, -8, -9, -10, -11, -12, 0, 0, 0])

    # partial windows straddling both edges
    pieces = [rb.get_range(off, 2) for off in (8, 6, 4, 2, 0)]
    assert [n for _, n in pieces] == [1, 2, 2, 2, 1]
    np.testing.assert_array_equal(
        np.concatenate([v for v, _ in pieces]),
        [0, -5, -6, -7, -8, -9, -10, -11, -12, 0])

    # lerp_get interpolates between adjacent offsets
    assert rb.lerp_get(0.5) == pytest.approx(-11.5)


def test_raw_ring_buffer_placement_api():
    """Placement semantics of reference RawRingBuffer.cpp:83-196:
    write leaves the head in place, push advances, read is offset
    BEHIND the head, advance wraps."""
    from lsp_dsp_units_tpu.models.util import RawRingBuffer

    rb = RawRingBuffer(8)
    assert rb.size == 8 and rb.position() == 0

    # write does NOT advance; a second write overwrites the same cells
    assert rb.write(np.arange(1, 4, dtype=np.float32)) == 3
    assert rb.position() == 0
    np.testing.assert_array_equal(rb.data[:3], [1, 2, 3])
    rb.write(np.asarray([9.0, 8.0]))
    np.testing.assert_array_equal(rb.data[:3], [9, 8, 3])

    # push advances and wraps across the end
    rb.clear()
    rb.advance(6)
    assert rb.push(np.arange(4, dtype=np.float32)) == 4  # wraps 6,7->0,1
    assert rb.position() == 2
    np.testing.assert_array_equal(rb.data[6:], [0, 1])
    np.testing.assert_array_equal(rb.data[:2], [2, 3])

    # read offset counts BACK from the head
    np.testing.assert_array_equal(rb.read(4, 4), [0, 1, 2, 3])
    assert rb.read_one(1) == 3.0
    # oversize counts clamp to capacity (RawRingBuffer.cpp:85,107)
    assert rb.read(2, 100).size == 8
    assert rb.write(np.zeros(100, np.float32)) == 8

    # flip-distance helpers
    rb.reset()
    rb.advance(5)
    assert rb.head_remaining() == 3
    assert rb.tail_remaining(4) == 7   # tail at index 1
    assert rb.remaining(4) == 3
    rb.fill(2.5)
    assert float(rb.data.min()) == 2.5


def test_meter_graph():
    from lsp_dsp_units_tpu.models.util import MeterGraph, MeterMethod

    mg = MeterGraph(frames=16, period=10, method=MeterMethod.ABS_MAXIMUM)
    x = np.zeros(100, np.float32)
    x[25] = -3.0
    mg.process(x)
    frames = mg.frames(10)
    assert frames.max() == 3.0
    # SIGN_MAXIMUM keeps the signed value of the largest |x|
    sg = MeterGraph(frames=16, period=10, method=MeterMethod.SIGN_MAXIMUM)
    sg.process(x)
    assert sg.frames(10).min() == -3.0
    # PEAK holds the FIRST sample of each period (MeterGraph.cpp:90-93)
    pk = MeterGraph(frames=16, period=10, method=MeterMethod.PEAK)
    seq = np.arange(100, dtype=np.float32)
    pk.process(seq)
    np.testing.assert_array_equal(pk.frames(10), seq[::10])


def test_dither_statistics():
    from lsp_dsp_units_tpu.models.util import Dither

    d = Dither(bits=16, seed=42)
    x = np.zeros(20000, np.float32)
    y = d.process(x)
    lsb = 1.0 / (1 << 15)
    assert np.abs(y).max() <= lsb  # TPDF spans +-1 LSB/2 *2
    assert 0.1 * lsb < y.std() < lsb


def test_quantized_counter():
    import jax
    from lsp_dsp_units_tpu.models.stat import QuantizedCounter

    qc = QuantizedCounter(-1.0, 1.0, levels=4)
    st = qc.init_state()
    x = jnp.asarray([-2.0, -0.9, -0.1, 0.1, 0.9, 2.0, jnp.nan])
    st = qc.process(st, x)
    assert int(st.below) == 1 and int(st.above) == 1 and int(st.nans) == 1
    assert int(st.counts.sum()) == 4
    assert int(st.total) == 7


def test_state_dump_roundtrip(tmp_path):
    from lsp_dsp_units_tpu.utils.state import (save_state, load_state,
                                               dump_state, StateDumper)
    from lsp_dsp_units_tpu.models.filters import Filter, FilterParams, \
        FilterType

    flt = Filter(SR, FilterParams(ftype=FilterType.BT_RLC_BELL, slope=2,
                                  freq=500.0, gain=2.0, quality=1.0))
    st = flt.init_state((2,))
    st, _ = flt.process(st, jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 256)).astype(
            np.float32)))
    d = dump_state(st)
    assert len(d) == 1
    p = str(tmp_path / "st.npz")
    save_state(p, st)
    st2 = load_state(p, flt.init_state((2,)))
    np.testing.assert_array_equal(np.asarray(st), np.asarray(st2))
    sd = StateDumper()
    sd.write_tree("filter", st)
    assert "filter" in sd.text()


def test_butterworth_filter():
    from lsp_dsp_units_tpu.models.filters.butterworth import (
        ButterworthFilter, BWFilterType, design_butterworth)
    from lsp_dsp_units_tpu.models.filters.design import (
        digital_freq_response)
    from lsp_dsp_units_tpu.utils.units import gain_to_db

    bq = design_butterworth(4, 1000.0, SR, BWFilterType.LOWPASS)
    assert abs(gain_to_db(np.abs(digital_freq_response(
        bq, np.array([1000.0]), SR)))[0] + 3.01) < 0.2
    assert gain_to_db(np.abs(digital_freq_response(
        bq, np.array([4000.0]), SR)))[0] < -40
    hp = design_butterworth(4, 1000.0, SR, BWFilterType.HIGHPASS)
    assert gain_to_db(np.abs(digital_freq_response(
        hp, np.array([100.0]), SR)))[0] < -70


def test_spectral_tilt():
    from lsp_dsp_units_tpu.models.filters.spectral_tilt import (
        SpectralTilt, SlopeUnit)
    from lsp_dsp_units_tpu.models.filters.design import (
        digital_freq_response)
    from lsp_dsp_units_tpu.utils.units import gain_to_db

    tilt = SpectralTilt(SR, order=32, slope=-3.0,
                        slope_unit=SlopeUnit.DB_PER_OCTAVE,
                        lower_freq=10.0, upper_freq=20000.0)
    bq = tilt.build()
    # slope between 100 Hz and 1600 Hz: 4 octaves * -3 dB
    g1 = gain_to_db(np.abs(digital_freq_response(bq, np.array([100.0]),
                                                 SR)))[0]
    g2 = gain_to_db(np.abs(digital_freq_response(bq, np.array([1600.0]),
                                                 SR)))[0]
    assert abs((g2 - g1) - (-12.0)) < 1.0


def test_mls_properties():
    from lsp_dsp_units_tpu.models.noise import MLS

    mls = MLS(n_bits=10)
    seq = mls.full_period()
    assert seq.size == 1023
    assert set(np.unique(seq)) == {-1.0, 1.0}
    # balance property: counts differ by exactly 1
    assert abs(int((seq > 0).sum()) - int((seq < 0).sum())) == 1
    # periodicity
    more = mls.process(1023)
    np.testing.assert_array_equal(seq, more)


def test_lcg_and_velvet():
    from lsp_dsp_units_tpu.models.noise import (LCG, LCGDistribution,
                                                Velvet, VelvetType)

    lcg = LCG(LCGDistribution.UNIFORM, seed=1)
    x = lcg.process(10000)
    assert -1.01 <= x.min() and x.max() <= 1.01
    assert abs(x.mean()) < 0.05

    v = Velvet(VelvetType.OVN, window_width=10.0, seed=2)
    y = v.generate(1000)
    nz = np.nonzero(y)[0]
    assert 80 <= nz.size <= 110            # ~1 spike per 10-sample window
    assert set(np.unique(y[nz])) <= {-1.0, 1.0}


def test_randomizer_deterministic():
    from lsp_dsp_units_tpu.models.util import Randomizer

    r1 = Randomizer(seed=12345)
    r2 = Randomizer(seed=12345)
    a = r1.generate_linear(64)
    b = r2.generate_linear(64)
    np.testing.assert_array_equal(a, b)
    assert np.all((a >= 0.0) & (a < 1.0))
    assert np.unique(a).size > 60


def test_unit_conversions_reference_formulas():
    """Full units.h conversion vocabulary (units.h:34-393)."""
    from lsp_dsp_units_tpu.utils import units as u
    # gain/dB/power round trips
    assert abs(u.db_to_gain(6.0205999) - 2.0) < 1e-6
    assert abs(u.gain_to_db(u.db_to_gain(-17.3)) - (-17.3)) < 1e-9
    assert abs(u.power_to_db(u.db_to_power(12.5)) - 12.5) < 1e-9
    # LUFS anchors (EBU R128 -0.691 dB, LU 22.309)
    assert abs(u.db_to_lufs(0.0) + 0.691) < 1e-12
    assert abs(u.lufs_to_db(u.db_to_lufs(3.3)) - 3.3) < 1e-12
    assert abs(u.gain_to_lu(1.0) - 22.309) < 1e-9
    assert abs(u.lu_to_gain(u.gain_to_lu(0.42)) - 0.42) < 1e-9
    assert abs(u.lufs_to_gain(-23.0) - u.db_to_gain(-23.0 + 0.691)) < 1e-12
    # nepers
    assert abs(u.db_to_neper(1.0) - u.NEPER_PER_DB) < 1e-12
    assert abs(u.neper_to_db(u.db_to_neper(7.0)) - 7.0) < 1e-3
    assert abs(u.gain_to_neper(u.neper_to_gain(0.5)) - 0.5) < 1e-4
    assert abs(u.neper_to_lufs(u.lufs_to_neper(-14.0)) + 14.0) < 2e-3
    # musical pitch
    assert abs(u.midi_note_to_frequency(69) - 440.0) < 1e-9
    assert abs(u.midi_note_to_frequency(57) - 220.0) < 1e-9
    assert abs(float(u.frequency_to_note(440.0)) - 69.0) < 1e-9
    assert abs(float(u.frequency_to_note(466.16)) - 70.0) < 5e-3
    assert float(u.frequency_to_note(5.0)) == u.NOTE_OUT_OF_RANGE
    assert float(u.frequency_to_note(30000.0)) == u.NOTE_OUT_OF_RANGE
    assert abs(u.semitones_to_frequency_shift(12.0) - 2.0) < 1e-9
    assert abs(u.frequency_shift_to_semitones(2.0) - 12.0) < 1e-9
    # tempo: 1/4 note at 120 BPM = 2 Hz = 0.5 s
    assert abs(u.time_signature_to_frequency(0.25, 120.0) - 2.0) < 1e-12
    assert abs(u.time_signature_to_period(0.25, 120.0) - 0.5) < 1e-12
    # time / distance
    assert abs(u.seconds_to_samples(48000, 0.5) - 24000.0) < 1e-9
    assert abs(u.samples_to_millis(48000, 480) - 10.0) < 1e-9
    assert abs(u.millis_to_samples(48000, 10.0) - 480.0) < 1e-9
    assert abs(u.hz_to_samples(48000, 100.0) - 480.0) < 1e-9
    assert abs(u.samples_to_meters(48000, 340.29, 48000) - 340.29) < 1e-9
    assert abs(u.samples_to_centimeters(48000, 340.0, 480) - 340.0) < 1e-6
    # sound speed at 20 degC ~ 343.6 m/s (units.h:43-51 formula)
    v = float(u.sound_speed(20.0))
    assert 343.0 < v < 344.5
    # at 0 degC ~ 331.4
    assert 331.0 < float(u.sound_speed(0.0)) < 332.0


def test_profiling_helpers(tmp_path):
    """utils.profiling: trace context produces a capture dir; time_fn
    measures a jitted step (SURVEY §5 profile/trace analog)."""
    import jax
    import jax.numpy as jnp
    from lsp_dsp_units_tpu.utils import profiling

    f = jax.jit(lambda v: jnp.tanh(v) * 2.0)
    x = jnp.ones((8, 256), jnp.float32)
    with profiling.trace(str(tmp_path)):
        np.asarray(f(x))
    import os
    assert any(os.scandir(str(tmp_path)))   # trace artifacts written

    sec, rate = profiling.time_fn(f, x, iters=3, windows=2,
                                  samples_per_call=8 * 256)
    assert sec > 0 and rate > 0


def test_scaled_meter_graph_timebase_is_sample_count():
    """After the period-change rebuild (consumed by the first process
    call, reference ScaledMeterGraph.cpp:347-356), slow-graph frames
    complete every `period` SAMPLES regardless of the caller's block
    size, and a peak is never dropped."""
    from lsp_dsp_units_tpu.models.util.buffers import ScaledMeterGraph

    def run(chunk):
        g = ScaledMeterGraph(frames=32, period=1000, subsampling=10)
        g.process(np.zeros(10, np.float32))   # trigger the rebuild
        x = np.zeros(10000, np.float32)
        x[7777] = 1.0                     # single peak
        for i in range(0, x.size, chunk):
            g.process(x[i:i + chunk])
        return g.frames(10)

    big = run(10000)
    small = run(100)
    np.testing.assert_array_equal(big, small)
    assert big.max() == 1.0               # the peak survives both paths


def test_mls_circular_autocorrelation_reference_utest():
    """Port of the reference MLS unit test (utest/noise/MLS.cpp): the
    circular autocorrelation of one full +-1 MLS period is exactly 1 at
    lag 0 and -1/P at every other lag, for every register width."""
    from lsp_dsp_units_tpu.models.noise import MLS

    for n_bits in range(2, 15):
        mls = MLS(n_bits=n_bits)
        seq = np.asarray(mls.full_period(), np.float64)
        p = seq.size
        assert p == (1 << n_bits) - 1
        # FFT circular autocorrelation (the utest's O(P^2) loop)
        spec = np.fft.rfft(seq)
        ac = np.fft.irfft(spec * np.conj(spec), p) / p
        assert abs(ac[0] - 1.0) < 1e-6, n_bits
        assert np.abs(ac[1:] + 1.0 / p).max() < 1e-6, n_bits


def test_trigger_single_mode_fires_once_per_block():
    """One-shot locks are enforced PER SAMPLE (reference Trigger.cpp
    in-loop lock): two rising crossings in one block must yield exactly
    one FIRED sample in SINGLE mode, and one per activate() in MANUAL."""
    from lsp_dsp_units_tpu.models.util.trigger import (
        Trigger, TriggerMode, TriggerType, FIRED)

    x = jnp.asarray([0.0, 1.0, 0.0, 1.0, 0.0], jnp.float32)
    trg = Trigger(TriggerType.SIMPLE_RISING_EDGE, TriggerMode.SINGLE,
                  threshold=0.5)
    st = trg.init_state()
    st, states = trg.process(st, x)
    assert int(np.sum(np.asarray(states) == FIRED)) == 1
    # locked: nothing fires until reset
    st, states = trg.process(st, x)
    assert int(np.sum(np.asarray(states) == FIRED)) == 0
    trg.reset_single_trigger()
    st, states = trg.process(st, x)
    assert int(np.sum(np.asarray(states) == FIRED)) == 1

    man = Trigger(TriggerType.SIMPLE_RISING_EDGE, TriggerMode.MANUAL,
                  threshold=0.5)
    st = man.init_state()
    st, states = man.process(st, x)          # not activated yet
    assert int(np.sum(np.asarray(states) == FIRED)) == 0
    man.activate_manual_trigger()
    st, states = man.process(st, x)
    assert int(np.sum(np.asarray(states) == FIRED)) == 1


def test_scaled_meter_graph_frames_sampler_counts_raw_samples():
    """The frames sampler counts RAW samples at the requested period —
    it is an independent second sampler over the input, not a cascade
    of the subsampled history (reference ScaledMeterGraph::process,
    ScaledMeterGraph.cpp:351-356) — so the frame timebase is exact even
    when subsampling does not divide the period (1000/16 here)."""
    from lsp_dsp_units_tpu.models.util.buffers import ScaledMeterGraph

    g = ScaledMeterGraph(frames=64, period=1000, subsampling=16)
    g.process(np.zeros(0, np.float32))    # trigger the rebuild
    n = 40000
    x = np.zeros(n, np.float32)
    x[5] = 2.0                             # first frame carries the peak
    for i in range(0, n, 160):
        g.process(x[i:i + 160])
    # 40000 samples / period 1000 = exactly 40 streamed frames
    assert g.frames_s._fill == 0
    f = g.frames(41)
    assert f[0] == 0.0                     # 41st-last is a rebuilt frame
    assert f[1] == 2.0 and np.all(f[2:] == 0.0)


def test_sample_normalize_above_below_semantics():
    """Reference Sample.cpp:958-968: ABOVE acts only when the peak is
    ABOVE the target (attenuates), BELOW only when it is below
    (amplifies) — these were inverted before round 2."""
    from lsp_dsp_units_tpu.models.sampling.sample import (Sample,
                                                          SampleNormalize)

    def make(peak):
        s = Sample(1, 4, 48000)
        s.data[0] = np.array([0.0, peak, -peak / 2, 0.0], np.float32)
        return s

    # peak 0.5 above target 0.25 -> ABOVE attenuates to 0.25
    s = make(0.5)
    s.normalize(0.25, SampleNormalize.ABOVE)
    assert abs(float(np.abs(s.data).max()) - 0.25) < 1e-6
    # peak 0.5 below target 1.0 -> ABOVE is a no-op
    s = make(0.5)
    s.normalize(1.0, SampleNormalize.ABOVE)
    assert abs(float(np.abs(s.data).max()) - 0.5) < 1e-6
    # peak 0.5 below target 1.0 -> BELOW amplifies to 1.0
    s = make(0.5)
    s.normalize(1.0, SampleNormalize.BELOW)
    assert abs(float(np.abs(s.data).max()) - 1.0) < 1e-6
    # peak 0.5 above target 0.25 -> BELOW is a no-op
    s = make(0.5)
    s.normalize(0.25, SampleNormalize.BELOW)
    assert abs(float(np.abs(s.data).max()) - 0.5) < 1e-6


def test_mls_full_period_cache_not_poisoned_by_amplitude():
    """full_period caches RAW bits keyed on (n_bits, state): an
    amplitude-0 instance must not poison the cache for later
    instances (bits were previously decoded from the scaled output)."""
    from lsp_dsp_units_tpu.models.noise.mls import MLS
    z = MLS(n_bits=9, amplitude=0.0).full_period()
    assert np.all(z == 0.0)
    seq = MLS(n_bits=9, amplitude=1.0).full_period()
    assert set(np.unique(seq)) == {-1.0, 1.0}
    # and the true MLS balance property: ones = zeros + 1
    assert int(np.sum(seq > 0)) == int(np.sum(seq < 0)) + 1


def test_quantized_counter_sliding_window():
    """Windowed histogram parity with a brute-force recount of the
    last `period` samples, including the reference's C truncation
    bucket edges (values in (min-step, min) count at level 0, NOT
    below — QuantizedCounter.cpp inc_counters :203-207) and NaNs."""
    from lsp_dsp_units_tpu.models.stat import QuantizedCounter

    rng = np.random.default_rng(5)
    period, levels, lo, hi = 100, 8, -1.0, 1.0
    qc = QuantizedCounter(lo, hi, levels=levels, period=period)
    st = qc.init_state()
    stream = (rng.standard_normal(700) * 1.3).astype(np.float32)
    stream[::37] = np.nan
    step = (hi - lo) / levels

    fed = 0
    for chunk in (3, 50, 7, 120, 99, 1, 200, 220):
        x = stream[fed:fed + chunk]
        fed += x.size
        st = qc.process(st, jnp.asarray(x))
        win = stream[max(0, fed - period):fed]
        w = win[~np.isnan(win)]
        raw = (w - lo) / step
        idx = raw.astype(np.int32)            # C trunc toward zero
        below = int(np.sum(raw <= -1.0))
        above = int(np.sum(idx >= levels))
        inside = idx[(raw > -1.0) & (idx < levels)]
        expect = np.bincount(np.clip(inside, 0, levels - 1),
                             minlength=levels)
        np.testing.assert_array_equal(np.asarray(st.counts), expect)
        assert int(st.below) == below
        assert int(st.above) == above
        assert int(st.nans) == int(np.isnan(win).sum())
        assert int(st.total) == win.size


def test_tpdf_i16_delivery_helper():
    """utils/delivery: the shared bench/probe dither quantizes within
    +-1 LSB of round(y*32767), clips at the int16 rails, and the noise
    table is +-0.5 LSB TPDF (zero-mean, triangular)."""
    from lsp_dsp_units_tpu.utils.delivery import (tpdf_i16_table,
                                                  quantize_i16)
    table = tpdf_i16_table(2, 64, seed=3)
    tn = np.asarray(table)
    assert np.abs(tn).max() <= 0.5 / 32768.0 * 2.0 + 1e-9  # sum of two
    assert abs(float(tn.mean())) < 1e-6
    y = jnp.asarray(np.linspace(-1.5, 1.5, 64, dtype=np.float32)[None]
                    .repeat(2, 0))
    q = np.asarray(quantize_i16(y, table, jnp.uint32(5)))
    assert q.dtype == np.int16
    assert q.min() == -32768 and q.max() == 32767        # rails clip
    mid = np.asarray(y)[0, 20:44] * 32767.0
    # astype(int16) truncates toward zero after the +-0.5 LSB dither,
    # so the worst deviation from the exact value is 1.5 LSB
    assert np.all(np.abs(q[0, 20:44] - mid) <= 1.5)
