"""API smoke tour: every stateful processor unit, constructed with
defaults, must process a [2, T] float32 block out of the box, and a
second same-shaped call must keep the state pytree structure and all
array shapes/dtypes unchanged (so a jitted streaming loop never
retraces).

This guards the out-of-box experience a reference user gets: the
reference's units are all usable immediately after ``construct() +
init() + update_settings()`` (e.g. src/test/mtest/demo.cpp:61-70), so
ours must be after ``Unit() + init_state()``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

SR = 48000
T = 4096
BATCH = (2,)

_rng = np.random.default_rng(42)
X = jnp.asarray((_rng.standard_normal((2, T)) * 0.25).astype(np.float32))


def _assert_finite(name, *arrays):
    for a in arrays:
        for leaf in jax.tree_util.tree_leaves(a):
            leaf = np.asarray(leaf)
            if np.issubdtype(leaf.dtype, np.floating):
                assert np.all(np.isfinite(leaf)), f"{name}: non-finite output"


def _assert_same_structure(name, s0, s1):
    t0 = jax.tree_util.tree_structure(s0)
    t1 = jax.tree_util.tree_structure(s1)
    assert t0 == t1, f"{name}: state treedef changed across calls"
    for l0, l1 in zip(jax.tree_util.tree_leaves(s0),
                      jax.tree_util.tree_leaves(s1)):
        assert jnp.shape(l0) == jnp.shape(l1), (
            f"{name}: state leaf shape drift {jnp.shape(l0)} -> "
            f"{jnp.shape(l1)} (would retrace under jit)")


def _stream2(name, state, call):
    """Run two same-shaped calls; check finiteness + structure stability."""
    out1 = call(state)
    state1, rest1 = out1[0], out1[1:]
    _assert_finite(name, state1, *rest1)
    out2 = call(state1)
    state2, rest2 = out2[0], out2[1:]
    _assert_finite(name, state2, *rest2)
    _assert_same_structure(name, state1, state2)
    for a, b in zip(rest1, rest2):
        assert jnp.shape(a) == jnp.shape(b), f"{name}: output shape drift"
    return rest1


def test_dynamics_units_smoke():
    from lsp_dsp_units_tpu.models.dynamics.compressor import Compressor
    from lsp_dsp_units_tpu.models.dynamics.expander import Expander
    from lsp_dsp_units_tpu.models.dynamics.gate import Gate
    from lsp_dsp_units_tpu.models.dynamics.limiter import Limiter
    from lsp_dsp_units_tpu.models.dynamics.dynamic_processor import (
        DynamicProcessor)
    from lsp_dsp_units_tpu.models.dynamics.surge_protector import (
        SurgeProtector)

    for cls in (Compressor, Expander, DynamicProcessor, Gate):
        u = cls(SR)
        p = u.build()
        y, g = _stream2(cls.__name__, u.init_state(BATCH),
                        lambda s: u.process(p, s, X))
        assert y.shape == X.shape and g.shape == X.shape

    u = Limiter(SR)
    p = u.build()
    (g,) = _stream2("Limiter", u.init_state(BATCH),
                    lambda s: u.process(p, s, jnp.abs(X)))
    assert g.shape == X.shape

    u = SurgeProtector()
    (y,) = _stream2("SurgeProtector", u.init_state(BATCH),
                    lambda s: u.process(s, X))
    assert y.shape == X.shape


def test_autogain_smoke():
    from lsp_dsp_units_tpu.models.dynamics.autogain import (
        AutoGain, SimpleAutoGain)
    u = AutoGain(SR)
    lvl = jnp.abs(X) + 1e-3
    (g,) = _stream2("AutoGain", u.init_state(BATCH),
                    lambda s: u.process(s, lvl, lvl, lvl))
    assert g.shape == X.shape
    su = SimpleAutoGain(SR)
    target = jnp.full_like(lvl, 0.1)
    (g,) = _stream2("SimpleAutoGain", su.init_state(BATCH),
                    lambda s: su.process(s, lvl, target))
    assert g.shape == X.shape


def test_meter_units_smoke():
    from lsp_dsp_units_tpu.models.meters.loudness import (
        ILUFSMeter, LoudnessMeter)
    from lsp_dsp_units_tpu.models.meters.true_peak import TruePeakMeter
    from lsp_dsp_units_tpu.models.meters.correlometer import Correlometer
    from lsp_dsp_units_tpu.models.meters.peak import PeakMeter, Panometer

    # loudness meters consume whole 100 ms block-quarters (4800 @ 48 kHz)
    xl = jnp.asarray((_rng.standard_normal((2, 9600)) * 0.25
                      ).astype(np.float32))
    u = LoudnessMeter(SR, channels=2)
    _stream2("LoudnessMeter", u.init_state(), lambda s: u.process(s, xl))

    u = ILUFSMeter(SR, channels=2)
    _stream2("ILUFSMeter", u.init_state(), lambda s: u.process(s, xl))

    u = TruePeakMeter(SR)
    _stream2("TruePeakMeter", u.init_state(BATCH),
             lambda s: u.process(s, X))

    u = Correlometer(window=1024)
    _stream2("Correlometer", u.init_state(()),
             lambda s: u.process(s, X[0], X[1]))

    u = PeakMeter(SR)
    _stream2("PeakMeter", u.init_state(BATCH), lambda s: u.process(s, X))

    u = Panometer(SR)
    _stream2("Panometer", u.init_state(),
             lambda s: u.process(s, X[0], X[1]))


def test_util_units_smoke():
    from lsp_dsp_units_tpu.models.util.convolver import Convolver
    from lsp_dsp_units_tpu.models.util.crossover import Crossover
    from lsp_dsp_units_tpu.models.util.delay import Delay, DynamicDelay
    from lsp_dsp_units_tpu.models.util.depopper import Depopper
    from lsp_dsp_units_tpu.models.util.oversampler import Oversampler
    from lsp_dsp_units_tpu.models.util.sidechain import Sidechain
    from lsp_dsp_units_tpu.models.util.trigger import Trigger

    ir = (_rng.standard_normal(2000) * np.exp(
        -np.arange(2000) / 400)).astype(np.float32)
    u = Convolver(ir, rank=12)
    (y,) = _stream2("Convolver", u.init_state(BATCH),
                    lambda s: u.process(s, X))
    assert y.shape == X.shape

    u = Crossover(SR)
    _stream2("Crossover", u.init_state(BATCH), lambda s: u.process(s, X))

    u = Delay(max_delay=1024)
    (y,) = _stream2("Delay", u.init_state(BATCH),
                    lambda s: u.process(s, X, 64))
    assert y.shape == X.shape

    u = DynamicDelay(max_delay=1024)
    dcurve = jnp.broadcast_to(
        jnp.linspace(0, 500, T).astype(jnp.int32), X.shape)
    fdelay = jnp.broadcast_to(jnp.linspace(0.0, 500.0, T,
                                           dtype=jnp.float32), X.shape)
    half = jnp.full_like(X, 0.5)
    (y,) = _stream2("DynamicDelay", u.init_state(BATCH),
                    lambda s: u.process(s, X, dcurve, half, fdelay))
    assert y.shape == X.shape

    u = Depopper(SR)
    out = u.process(u.init_state(), np.asarray(X[0]))
    _assert_finite("Depopper", *out[1:])

    u = Oversampler(SR, ratio=2)
    (y,) = _stream2("Oversampler", u.init_state(BATCH),
                    lambda s: u.process(s, X, lambda z: jnp.tanh(z)))
    assert y.shape == X.shape

    u = Sidechain(SR)
    (env,) = _stream2("Sidechain", u.init_state(BATCH),
                      lambda s: u.process(s, X))
    assert env.shape == X.shape

    u = Trigger()
    _stream2("Trigger", u.init_state(), lambda s: u.process(s, X[0]))


def test_spectral_units_smoke():
    from lsp_dsp_units_tpu.models.util.spectral import (
        SpectralProcessor, MultiSpectralProcessor, SpectralSplitter)
    from lsp_dsp_units_tpu.models.util.fft_crossover_unit import FFTCrossover
    from lsp_dsp_units_tpu.models.util.analyzer import Analyzer

    ident = lambda spec: spec
    u = SpectralProcessor(rank=12)
    (y,) = _stream2("SpectralProcessor", u.init_state(BATCH),
                    lambda s: u.process(s, X, ident))
    assert y.shape == X.shape

    u = MultiSpectralProcessor(rank=12, channels=2)
    _stream2("MultiSpectralProcessor", u.init_state(),
             lambda s: u.process(s, X, ident))

    u = SpectralSplitter(rank=12)
    _stream2("SpectralSplitter", u.init_state(BATCH),
             lambda s: u.process(s, X, [ident]))

    u = FFTCrossover(SR, rank=12)
    _stream2("FFTCrossover", u.init_state(BATCH),
             lambda s: u.process(s, X))

    u = Analyzer(SR, channels=2, rank=12)
    # the analyzer consumes whole analysis periods (SR/rate samples)
    xa = jnp.asarray((_rng.standard_normal((2, 2 * u.period)) * 0.25
                      ).astype(np.float32))
    s1 = u.process(u.init_state(), xa)
    s2 = u.process(s1, xa)
    _assert_same_structure("Analyzer", s1, s2)
    _assert_finite("Analyzer", u.get_spectrum(s2, 0))


def test_filter_units_smoke():
    from lsp_dsp_units_tpu.models.filters import Filter, FilterParams
    from lsp_dsp_units_tpu.models.filters.filter_bank import FilterBank
    from lsp_dsp_units_tpu.models.filters.butterworth import (
        ButterworthFilter)
    from lsp_dsp_units_tpu.models.filters.spectral_tilt import SpectralTilt
    from lsp_dsp_units_tpu.models.filters.dynamic_filters import (
        DynamicFilters)
    from lsp_dsp_units_tpu.models.filters.equalizer import Equalizer

    u = Filter(SR, FilterParams())
    _stream2("Filter", u.init_state(BATCH), lambda s: u.process(s, X))

    bank = FilterBank()
    bank.begin()
    bank.add_chain(np.asarray(Filter(SR, FilterParams()).design.biquads))
    bank.end()
    _stream2("FilterBank", bank.init_state(BATCH),
             lambda s: bank.process(s, X))

    u = ButterworthFilter(SR, order=4, cutoff=2000.0)
    _stream2("ButterworthFilter", u.init_state(BATCH),
             lambda s: u.process(s, X))

    u = SpectralTilt(SR)
    _stream2("SpectralTilt", u.init_state(BATCH),
             lambda s: u.process(s, X))

    u = DynamicFilters(SR, filters=1)
    gain = jnp.full(X.shape, 2.0, jnp.float32)
    _stream2("DynamicFilters", u.init_state(0, BATCH),
             lambda s: u.process(0, s, X, gain))

    eq = Equalizer(SR, filters=4)
    p = eq.build()
    st = eq.init_state(p, BATCH)
    st1, y = eq.process(p, st, X)
    _assert_finite("Equalizer", y)
    st2, y2 = eq.process(p, st1, X)
    _assert_same_structure("Equalizer", st1, st2)
    assert y.shape == X.shape


def test_ctl_and_misc_smoke():
    from lsp_dsp_units_tpu.models.ctl.bypass import Bypass
    from lsp_dsp_units_tpu.models.ctl.crossfade import Crossfade
    from lsp_dsp_units_tpu.models.ctl.control import Blink, Counter, Toggle
    from lsp_dsp_units_tpu.models.util.adsr import ADSREnvelope
    from lsp_dsp_units_tpu.models.util.oscillator import Oscillator
    from lsp_dsp_units_tpu.models.stat.quantized_counter import (
        QuantizedCounter)

    b = Bypass(SR)
    st = b.init_state()
    st, y = b.process(st, X, X * 0.0)
    _assert_finite("Bypass", y)

    c = Crossfade(SR)
    st = c.toggle(c.init_state())
    st, y = c.process(st, X, X * 0.5, T)
    _assert_finite("Crossfade", y)
    assert y.shape == X.shape

    Blink(SR), Counter(SR), Toggle()

    env = ADSREnvelope()
    t = jnp.linspace(0.0, 1.0, 256)
    _assert_finite("ADSREnvelope", env.process(t))

    osc = Oscillator(SR)
    st = osc.init_state()
    st, y = osc.process(st, 512)
    _assert_finite("Oscillator", y)
    assert y.shape[-1] == 512

    qc = QuantizedCounter(minimum=0.0, maximum=1.0, levels=16)
    st = qc.process(qc.init_state(), jnp.abs(X[0]))
    _assert_finite("QuantizedCounter", st)


def test_noise_units_smoke():
    from lsp_dsp_units_tpu.models.noise.generator import NoiseGenerator
    from lsp_dsp_units_tpu.models.noise.lcg import LCG
    from lsp_dsp_units_tpu.models.noise.mls import MLS
    from lsp_dsp_units_tpu.models.noise.velvet import Velvet

    g = NoiseGenerator(SR)
    st = g.init_state()
    st, y = g.process(st, T)
    _assert_finite("NoiseGenerator", y)

    _assert_finite("LCG", jnp.asarray(LCG().process(1024)))
    _assert_finite("MLS", jnp.asarray(MLS(n_bits=16).process(1024)))
    _assert_finite("Velvet", jnp.asarray(Velvet().generate(1024)))


def test_sampling_units_smoke():
    from lsp_dsp_units_tpu.models.sampling.sample import Sample
    from lsp_dsp_units_tpu.models.sampling.player import (
        SamplePlayer, PlaySettings)

    smp = Sample(2, T, SR)
    smp.data[:] = np.asarray(X)
    assert smp.length == T and smp.channels == 2
    r = smp.resample(24000)
    assert r.sample_rate == 24000
    _assert_finite("Sample.resample", jnp.asarray(r.data))

    player = SamplePlayer(max_samples=4, max_playbacks=4)
    player.bind(0, smp)
    player.play(PlaySettings(sample_id=0, channel=0, volume=1.0))
    out = player.process(1024)
    _assert_finite("SamplePlayer", out)


def test_jit_single_trace_all_device_units():
    """Every device-path unit must trace exactly once under jax.jit for a
    streaming loop of same-shaped calls — shape/dtype/weak-type drift in
    the carried state would force a silent recompile every block on TPU."""
    from lsp_dsp_units_tpu.models.dynamics.compressor import Compressor
    from lsp_dsp_units_tpu.models.dynamics.expander import Expander
    from lsp_dsp_units_tpu.models.dynamics.gate import Gate
    from lsp_dsp_units_tpu.models.dynamics.limiter import Limiter
    from lsp_dsp_units_tpu.models.dynamics.dynamic_processor import (
        DynamicProcessor)
    from lsp_dsp_units_tpu.models.dynamics.surge_protector import (
        SurgeProtector)
    from lsp_dsp_units_tpu.models.meters.loudness import (
        ILUFSMeter, LoudnessMeter)
    from lsp_dsp_units_tpu.models.meters.true_peak import TruePeakMeter
    from lsp_dsp_units_tpu.models.meters.correlometer import Correlometer
    from lsp_dsp_units_tpu.models.meters.peak import PeakMeter, Panometer
    from lsp_dsp_units_tpu.models.util.convolver import Convolver
    from lsp_dsp_units_tpu.models.util.crossover import Crossover
    from lsp_dsp_units_tpu.models.util.delay import Delay, DynamicDelay
    from lsp_dsp_units_tpu.models.util.oversampler import Oversampler
    from lsp_dsp_units_tpu.models.util.sidechain import Sidechain
    from lsp_dsp_units_tpu.models.util.trigger import Trigger
    from lsp_dsp_units_tpu.models.util.spectral import (
        SpectralProcessor, SpectralSplitter)
    from lsp_dsp_units_tpu.models.util.fft_crossover_unit import FFTCrossover
    from lsp_dsp_units_tpu.models.util.analyzer import Analyzer
    from lsp_dsp_units_tpu.models.filters import Filter, FilterParams
    from lsp_dsp_units_tpu.models.filters.butterworth import (
        ButterworthFilter)
    from lsp_dsp_units_tpu.models.filters.spectral_tilt import SpectralTilt
    from lsp_dsp_units_tpu.models.filters.equalizer import Equalizer

    ir = (_rng.standard_normal(2000) * np.exp(
        -np.arange(2000) / 400)).astype(np.float32)
    xl = jnp.asarray((_rng.standard_normal((2, 9600)) * 0.25
                      ).astype(np.float32))
    dcurve = jnp.broadcast_to(jnp.linspace(0, 500, T).astype(jnp.int32),
                              X.shape)
    fdelay = jnp.broadcast_to(
        jnp.linspace(0.0, 500.0, T, dtype=jnp.float32), X.shape)
    half = jnp.full_like(X, 0.5)
    ident = lambda spec: spec

    comp, exp_, gate, dynp = (Compressor(SR), Expander(SR), Gate(SR),
                              DynamicProcessor(SR))
    lim, surge = Limiter(SR), SurgeProtector()
    conv = Convolver(ir, rank=12)
    xover, delay = Crossover(SR), Delay(max_delay=1024)
    ddelay, ovs = DynamicDelay(max_delay=1024), Oversampler(SR, ratio=2)
    sc, trig = Sidechain(SR), Trigger()
    spp, spl = SpectralProcessor(rank=12), SpectralSplitter(rank=12)
    fxo = FFTCrossover(SR, rank=12)
    ana = Analyzer(SR, channels=2, rank=12)
    xa = jnp.asarray((_rng.standard_normal((2, 2 * ana.period)) * 0.25
                      ).astype(np.float32))
    flt = Filter(SR, FilterParams())
    bwf = ButterworthFilter(SR, order=4, cutoff=2000.0)
    tilt = SpectralTilt(SR)
    lm, ilufs = LoudnessMeter(SR, channels=2), ILUFSMeter(SR, channels=2)
    tpm, corr = TruePeakMeter(SR), Correlometer(window=1024)
    pk, pan = PeakMeter(SR), Panometer(SR)
    eq = Equalizer(SR, filters=4)
    eqp = eq.build()

    cases = {
        "Compressor": (comp.init_state(BATCH),
                       lambda s: comp.process(comp.build(), s, X)),
        "Expander": (exp_.init_state(BATCH),
                     lambda s: exp_.process(exp_.build(), s, X)),
        "Gate": (gate.init_state(BATCH),
                 lambda s: gate.process(gate.build(), s, X)),
        "DynamicProcessor": (dynp.init_state(BATCH),
                             lambda s: dynp.process(dynp.build(), s, X)),
        "Limiter": (lim.init_state(BATCH),
                    lambda s: lim.process(lim.build(), s, jnp.abs(X))),
        "SurgeProtector": (surge.init_state(BATCH),
                           lambda s: surge.process(s, X)),
        "Convolver": (conv.init_state(BATCH), lambda s: conv.process(s, X)),
        "Crossover": (xover.init_state(BATCH),
                      lambda s: xover.process(s, X)),
        "Delay": (delay.init_state(BATCH),
                  lambda s: delay.process(s, X, 64)),
        "DynamicDelay": (ddelay.init_state(BATCH),
                         lambda s: ddelay.process(s, X, dcurve, half,
                                                  fdelay)),
        "Oversampler": (ovs.init_state(BATCH),
                        lambda s: ovs.process(s, X, jnp.tanh)),
        "Sidechain": (sc.init_state(BATCH), lambda s: sc.process(s, X)),
        "Trigger": (trig.init_state(), lambda s: trig.process(s, X[0])),
        "SpectralProcessor": (spp.init_state(BATCH),
                              lambda s: spp.process(s, X, ident)),
        "SpectralSplitter": (spl.init_state(BATCH),
                             lambda s: spl.process(s, X, [ident])),
        "FFTCrossover": (fxo.init_state(BATCH), lambda s: fxo.process(s, X)),
        "Analyzer": (ana.init_state(), lambda s: (ana.process(s, xa),)),
        "Filter": (flt.init_state(BATCH), lambda s: flt.process(s, X)),
        "ButterworthFilter": (bwf.init_state(BATCH),
                              lambda s: bwf.process(s, X)),
        "SpectralTilt": (tilt.init_state(BATCH), lambda s: tilt.process(s, X)),
        "LoudnessMeter": (lm.init_state(), lambda s: lm.process(s, xl)),
        "ILUFSMeter": (ilufs.init_state(), lambda s: ilufs.process(s, xl)),
        "TruePeakMeter": (tpm.init_state(BATCH), lambda s: tpm.process(s, X)),
        "Correlometer": (corr.init_state(()),
                         lambda s: corr.process(s, X[0], X[1])),
        "PeakMeter": (pk.init_state(BATCH), lambda s: pk.process(s, X)),
        "Panometer": (pan.init_state(), lambda s: pan.process(s, X[0], X[1])),
        "Equalizer": (eq.init_state(eqp, BATCH),
                      lambda s: eq.process(eqp, s, X)),
    }

    failures = []
    for name, (state, call) in cases.items():
        traces = {"n": 0}

        def traced(s, _call=call, _traces=traces):
            _traces["n"] += 1
            return _call(s)

        jf = jax.jit(traced)
        out = jf(state)
        out = jf(out[0])
        jax.block_until_ready(out)
        if traces["n"] != 1:
            failures.append(f"{name}: traced {traces['n']}x (state drift "
                            "forces a recompile every block)")
    assert not failures, "\n".join(failures)
