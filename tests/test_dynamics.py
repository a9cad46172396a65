"""Dynamics tests — envelope followers vs a float64 golden re-derivation
of the reference recurrence (Compressor.cpp:231-256), knee curves vs
analytic slope expectations."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsp_dsp_units_tpu.ops import dynamics as dyn
from lsp_dsp_units_tpu.models.dynamics.compressor import (
    Compressor, CompressorMode)
from lsp_dsp_units_tpu.models.dynamics.expander import Expander, ExpanderMode
from lsp_dsp_units_tpu.models.dynamics.gate import Gate
from lsp_dsp_units_tpu.utils.units import snr_db, gain_to_db

SR = 48000


def golden_envelope(x, tau_a, tau_r, hold_n, release_thresh=None):
    """Float64 port of the reference envelope loop."""
    e = 0.0
    peak = 0.0
    hold = 0
    out = np.zeros_like(x, np.float64)
    for i, s in enumerate(np.asarray(x, np.float64)):
        d = s - e
        if d < 0.0:
            if hold > 0:
                hold -= 1
            else:
                if release_thresh is None:
                    t = tau_r
                else:
                    t = tau_r if e > release_thresh else tau_a
                e += t * d
                peak = e
        else:
            e += tau_a * d
            if e >= peak:
                peak = e
                hold = hold_n
        out[i] = e
    return out


def test_envelope_matches_golden():
    rng = np.random.default_rng(0)
    x = np.abs(rng.normal(size=2000)).astype(np.float32)
    ta = dyn.tau(SR, 5.0)
    tr = dyn.tau(SR, 50.0)
    golden = golden_envelope(x, ta, tr, 100, release_thresh=0.1)

    st = dyn.env_init()
    st, env = dyn.peak_envelope(st, jnp.asarray(x), ta, tr, 100,
                                release_thresh=0.1)
    assert snr_db(np.asarray(env), golden) > 100.0


def test_envelope_streaming_invariance():
    rng = np.random.default_rng(1)
    x = np.abs(rng.normal(size=1000)).astype(np.float32)
    ta, tr = dyn.tau(SR, 2.0), dyn.tau(SR, 20.0)

    st = dyn.env_init()
    st, full = dyn.peak_envelope(st, jnp.asarray(x), ta, tr, 30, 0.2)

    st = dyn.env_init()
    outs = []
    for i in range(0, 1000, 137):
        st, e = dyn.peak_envelope(st, jnp.asarray(x[i:i + 137]), ta, tr,
                                  30, 0.2)
        outs.append(np.asarray(e))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(full),
                               rtol=1e-5, atol=1e-7)


def test_compressor_downward_ratio():
    """Above threshold+knee the downward curve must follow the ratio
    slope in dB space: out_db = th_db + (in_db - th_db)/ratio."""
    comp = Compressor(SR, CompressorMode.DOWNWARD, attack_thresh=0.1,
                      knee=0.9, ratio=4.0)
    p = comp.build()
    x = jnp.asarray([0.5, 1.0], jnp.float32)  # well above knee end
    curve = np.asarray(comp.curve(p, x))
    th_db = gain_to_db(0.1)
    for xi, yi in zip(np.asarray(x), curve):
        expect_db = th_db + (gain_to_db(xi) - th_db) / 4.0
        assert abs(gain_to_db(yi) - expect_db) < 0.05
    # far below threshold: unity gain
    g = np.asarray(comp.amplification(p, jnp.asarray([0.01], jnp.float32)))
    np.testing.assert_allclose(g, 1.0, atol=1e-6)


def test_compressor_process_shapes_and_env():
    comp = Compressor(SR, attack_thresh=0.2, attack_ms=5.0, release_ms=50.0,
                      ratio=8.0, knee=0.7071)
    p = comp.build()
    rng = np.random.default_rng(2)
    x = np.abs(rng.normal(size=(3, 512))).astype(np.float32)
    st = comp.init_state((3,))
    st, gain, env = comp.process(p, st, jnp.asarray(x))
    assert gain.shape == (3, 512)
    assert np.all(np.asarray(gain) <= 1.0 + 1e-6)
    golden = golden_envelope(x[1], float(p.tau_attack),
                             float(p.tau_release), int(p.hold),
                             float(p.release_thresh))
    assert snr_db(np.asarray(env[1]), golden) > 90.0


def test_expander_modes():
    up = Expander(SR, ExpanderMode.UPWARD, attack_thresh=0.1, knee=0.9,
                  ratio=2.0)
    pu = up.build()
    # upward: unity below threshold, boost above
    g = np.asarray(up.amplification(pu, jnp.asarray([0.01, 0.5],
                                                    jnp.float32)))
    assert abs(g[0] - 1.0) < 1e-6
    assert g[1] > 1.0

    dn = Expander(SR, ExpanderMode.DOWNWARD, attack_thresh=0.1, knee=0.9,
                  ratio=2.0)
    pd = dn.build()
    g = np.asarray(dn.amplification(pd, jnp.asarray([0.5, 0.01],
                                                    jnp.float32)))
    assert abs(g[0] - 1.0) < 1e-6
    assert g[1] < 1.0
    # downward slope: out_db = th + (in-th)*ratio => gain slope (ratio-1)
    x_db = gain_to_db(0.01)
    th_db = gain_to_db(0.1)
    expect = (x_db - th_db) * (2.0 - 1.0)
    assert abs(gain_to_db(g[1]) - expect) < 0.1


def test_gate_hysteresis():
    gate = Gate(SR, threshold=0.1, zone=0.5, hyst_threshold=0.05,
                hyst_zone=0.5, reduction=0.01, attack_ms=0.01,
                release_ms=0.01)
    p = gate.build()
    # signal: quiet -> loud -> medium (between hyst and normal thresholds)
    x = np.concatenate([np.full(200, 0.001), np.full(200, 0.5),
                        np.full(200, 0.07)]).astype(np.float32)
    st = gate.init_state()
    st, gain, env = gate.process(p, st, jnp.asarray(x))
    gain = np.asarray(gain)
    assert gain[100] < 0.05          # closed at start
    assert gain[390] > 0.9           # open when loud
    # 0.07 > hyst knee start (0.025..0.05 region end=0.05): stays open
    assert gain[-1] > 0.9
    # without hysteresis (same thresholds), 0.07 < normal threshold 0.1
    # would sit inside the knee: verify hysteresis actually held it open
    g_normal = np.asarray(gate.amplification(p, jnp.asarray([0.07]),
                                             hyst=False))
    assert g_normal[0] < 0.9


def test_gate_envelope_matches_golden():
    gate = Gate(SR, threshold=0.2, zone=0.5, reduction=0.1, attack_ms=3.0,
                release_ms=30.0, hold_ms=1.0)
    p = gate.build()
    rng = np.random.default_rng(3)
    x = np.abs(rng.normal(size=1500)).astype(np.float32)
    st = gate.init_state()
    st, gain, env = gate.process(p, st, jnp.asarray(x))
    golden = golden_envelope(x, float(p.tau_attack), float(p.tau_release),
                             int(p.hold), release_thresh=None)
    assert snr_db(np.asarray(env), golden) > 90.0
