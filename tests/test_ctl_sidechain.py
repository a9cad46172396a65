"""ctl units and Sidechain modes (reference utest counterparts:
utest/util/{counter,crossfade,sidechain}.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsp_dsp_units_tpu.models.ctl import (Bypass, Counter, Toggle, Blink,
                                          Crossfade)
from lsp_dsp_units_tpu.models.util.sidechain import (Sidechain,
                                                     SidechainMode,
                                                     SidechainSource,
                                                     select_source)
from lsp_dsp_units_tpu.utils.units import snr_db

SR = 48000


def test_counter():
    c = Counter(SR, frequency=100.0)   # fires every 480 samples
    fires = 0
    for _ in range(10):
        c.submit(480)
        if c.commit():
            fires += 1
    assert fires == 10
    # partial blocks accumulate
    c2 = Counter(SR, frequency=100.0)
    c2.submit(479)
    assert not c2.commit()
    c2.submit(1)
    assert c2.commit()


def test_toggle():
    t = Toggle()
    assert not t.submit(0.0)
    t.submit(1.0)
    assert t.pending()
    assert t.commit()            # latches on
    t.submit(0.0)
    assert not t.commit()


def test_blink():
    b = Blink(SR, time_s=0.01)   # 480 samples
    assert b.process(100) == 0.0
    b.blink()
    assert b.process(100) == 1.0
    assert b.process(480) == 1.0
    assert b.process(100) == 0.0


def test_bypass_ramp():
    bp = Bypass(SR, time_ms=1.0)  # 48-sample ramp
    st = bp.init_state()
    dry = jnp.zeros(200, jnp.float32)
    wet = jnp.ones(200, jnp.float32)
    st, y = bp.process(st, dry, wet)
    np.testing.assert_allclose(np.asarray(y), 1.0)   # wet by default
    st = bp.set_bypass(st, True)
    st, y = bp.process(st, dry, wet)
    y = np.asarray(y)
    assert y[0] > 0.9 and y[-1] == 0.0               # ramped to dry
    assert np.all(np.diff(y[:48]) <= 1e-6)           # monotone ramp


def test_crossfade():
    cf = Crossfade(SR, time_s=100 / SR)  # 100-sample fade
    st = cf.init_state()
    a = jnp.ones(200, jnp.float32)        # fade out
    b = jnp.full(200, 2.0, jnp.float32)   # fade in
    st = cf.toggle(st)
    st, y = cf.process(st, a, b, 200)
    y = np.asarray(y)
    assert abs(y[0] - 1.0) < 0.05
    assert abs(y[-1] - 2.0) < 1e-5
    assert not bool(cf.active(st))


def test_sidechain_source_select():
    l = jnp.asarray([1.0, -1.0, 0.5])
    r = jnp.asarray([0.5, 0.5, -0.5])
    np.testing.assert_allclose(
        np.asarray(select_source(l, r, SidechainSource.MIDDLE)),
        [0.75, 0.25, 0.0])
    np.testing.assert_allclose(
        np.asarray(select_source(l, r, SidechainSource.SIDE)),
        [0.25, 0.75, 0.5])
    np.testing.assert_allclose(
        np.asarray(select_source(l, r, SidechainSource.AMIN)),
        [0.5, 0.5, 0.5])
    np.testing.assert_allclose(
        np.asarray(select_source(l, r, SidechainSource.AMAX)),
        [1.0, 1.0, 0.5])


def golden_rms(x, n):
    """Float64 sliding RMS over trailing window n."""
    sq = np.concatenate([np.zeros(n), np.asarray(x, np.float64) ** 2])
    out = np.empty(x.size)
    acc = 0.0
    for i in range(x.size):
        acc += sq[n + i] - sq[i]
        out[i] = np.sqrt(max(acc, 0.0) / n)
    return out


def test_sidechain_rms_golden():
    sc = Sidechain(SR, SidechainMode.RMS, reactivity_ms=5.0)
    rng = np.random.default_rng(0)
    x = np.abs(rng.standard_normal(4096)).astype(np.float32)
    st = sc.init_state()
    st, y = sc.process(st, jnp.asarray(x))
    golden = golden_rms(x, sc.reactivity)
    assert snr_db(np.asarray(y), golden) > 80.0
    # streaming continuity
    st = sc.init_state()
    outs = []
    for i in range(0, 4096, 512):
        st, y = sc.process(st, jnp.asarray(x[i:i + 512]))
        outs.append(np.asarray(y))
    assert snr_db(np.concatenate(outs), golden) > 80.0


def test_sidechain_modes_shapes():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 1024)).astype(np.float32)
    for mode in SidechainMode:
        sc = Sidechain(SR, mode, reactivity_ms=3.0)
        st = sc.init_state((4,))
        st, y = sc.process(st, jnp.asarray(x))
        assert y.shape == (4, 1024)
        assert np.all(np.asarray(y) >= 0.0), mode


def test_counter_overshoot_reload_stays_in_period():
    """Counter reload after an overshooting submit must land in
    (0, initial] — C-truncated modulo semantics (reference
    Counter.cpp:99-111), not Python floor modulo which would land in
    [initial, 2*initial) and delay the next event a full period."""
    c = Counter(SR)
    c.set_initial_value(100)
    assert c.submit(150)          # overshoot by 50 -> fires
    assert c.current == 50        # reload = 100 + (-50 % 100 truncated)
    c.commit()
    c.set_initial_value(100)      # reset
    assert c.submit(100)          # exact hit
    assert c.current == 100
    c.commit()
    c.set_initial_value(100)
    assert c.submit(250)          # overshoot past one full period
    assert c.current == 50        # left=-150, trunc-mod -> -50


def test_counter_reference_utest_sequence():
    """Exact port of the reference Counter unit test
    (src/test/utest/util/counter.cpp:28-98): the pinned quantity
    (frequency vs initial count) survives a sample-rate change."""
    c = Counter(SR)                      # default frequency 1.0
    c.set_sample_rate(SR, True)
    c.set_frequency(100.0, False)
    init = SR // 100
    freq = SR / 200.0

    assert c.sample_rate == SR
    assert c.pending() == SR
    assert c.frequency == 100.0
    assert c.initial == init
    assert not c.fired

    assert c.submit(SR)
    assert c.pending() == init
    assert c.commit()
    assert not c.fired

    c.submit(init * 2 + (init >> 1))
    assert c.fired
    assert c.pending() == init - (init >> 1)
    assert c.commit()

    c.set_initial_value(200, True)
    assert c.pending() == 200
    assert c.frequency == pytest.approx(freq, rel=1e-4)
    assert c.initial == 200
    assert not c.fired

    assert not c.submit(100)
    assert c.pending() == 100
    assert c.submit(200)
    assert c.pending() == 100
    assert c.commit()

    # initial-value mode: halving the rate keeps the count, halves
    # the frequency
    c.set_sample_rate(SR >> 1, True)
    assert c.sample_rate == SR >> 1
    assert c.pending() == 200
    assert c.frequency == pytest.approx(freq * 0.5, rel=1e-4)
    assert c.initial == 200
    assert not c.fired

    # frequency mode: restoring the rate now doubles the count
    c.preserve_frequency()
    c.set_sample_rate(SR, True)
    assert c.sample_rate == SR
    assert c.pending() == 400
    assert c.frequency == pytest.approx(freq * 0.5, rel=1e-4)
    assert c.initial == 400
    assert not c.fired


def test_crossfade_fresh_state_selects_fade_in():
    """Reference construct() starts with fGain=1.0 (Crossfade.cpp:44):
    a never-toggled crossfade must pass the NEW source, not the old."""
    from lsp_dsp_units_tpu.models.ctl.crossfade import Crossfade
    cf = Crossfade(48000, time_s=2.0)
    st = cf.init_state()
    a = jnp.ones(8, jnp.float32)
    b = jnp.full(8, 2.0, jnp.float32)
    st, out = cf.process(st, a, b, 8)
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_bypass_ramp_first_sample_pre_ramp():
    """Reference Bypass emits with the CURRENT gain, then increments
    (Bypass.cpp process) — the first output sample of a transition
    still carries the pre-ramp gain."""
    from lsp_dsp_units_tpu.models.ctl.bypass import Bypass
    bp = Bypass(48000, time_ms=1.0)         # 48-sample ramp
    st = bp.init_state()                     # starts un-bypassed
    st = bp.set_bypass(st, True)
    dry = jnp.ones(8, jnp.float32)
    wet = jnp.zeros(8, jnp.float32)
    st, out = bp.process(st, dry, wet)
    out = np.asarray(out)
    assert out[0] == 0.0, out[:3]            # still fully wet at n=0
    assert out[1] > 0.0
