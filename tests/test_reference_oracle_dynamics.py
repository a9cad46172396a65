"""Dynamics parity vs the COMPILED reference implementation.

tests/ref_oracle compiles the genuine Compressor/Expander/Gate/Limiter
sources (with scalar stand-ins only for the lsp-dsp-lib elementwise
kernels, mirrored from the reference's own in-repo scalar evaluations);
these tests drive them against this framework's units — the real
envelope followers, knee curves, and the Limiter's iterative
peak-patching loop (Limiter.cpp:695-785), not numpy re-derivations.

Skipped cleanly when /root/reference is not present.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ref_oracle as ro  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lsp_dsp_units_tpu.models.dynamics.compressor import (  # noqa: E402
    Compressor, CompressorMode)
from lsp_dsp_units_tpu.models.dynamics.expander import (  # noqa: E402
    Expander, ExpanderMode)
from lsp_dsp_units_tpu.models.dynamics.gate import Gate  # noqa: E402
from lsp_dsp_units_tpu.models.dynamics.limiter import (  # noqa: E402
    Limiter, LimiterMode)

pytestmark = pytest.mark.skipif(
    not ro.available(), reason="/root/reference not present")

SR = 48000


def _burst_noise(n=12000, seed=7):
    """Rectified noise with level bursts — exercises attack, hold,
    release, and both knee regions."""
    rng = np.random.default_rng(seed)
    q = n // 4
    envm = np.concatenate([np.full(q, 0.05), np.full(q, 0.9),
                           np.full(q, 0.02), np.full(n - 3 * q, 0.6)])
    return (np.abs(rng.standard_normal(n)) * envm).astype(np.float32)


def _snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = ref - np.asarray(test, np.float64)
    e = float(np.mean(err ** 2))
    if e == 0.0:
        return np.inf
    return 10.0 * np.log10(float(np.mean(ref ** 2)) / e)


@pytest.mark.parametrize("mode,mid", [
    (CompressorMode.DOWNWARD, 0), (CompressorMode.UPWARD, 1),
    (CompressorMode.BOOSTING, 2)], ids=lambda v: str(getattr(v, "value", v)))
def test_compressor_process_matches_reference(mode, mid):
    x = _burst_noise()
    g_ref, e_ref = ro.compressor_process(
        mid, 0.5, 0.25, 0.001, 20.0, 100.0, 0.7071, 4.0, 5.0, SR, x)
    c = Compressor(SR, mode, attack_thresh=0.5, release_thresh=0.25,
                   boost_thresh=0.001, attack_ms=20.0, release_ms=100.0,
                   knee=0.7071, ratio=4.0, hold_ms=5.0)
    params = c.build()
    _, gain, env = c.process(params, c.init_state(), jnp.asarray(x))
    # measured parity (this session): env ~93 dB, gain 97-106 dB — the
    # envelope gap is pure f32 one-pole noise on both sides
    assert _snr_db(e_ref, env) >= 85.0
    assert _snr_db(g_ref, gain) >= 90.0


@pytest.mark.parametrize("mode,mid", [
    (CompressorMode.DOWNWARD, 0), (CompressorMode.UPWARD, 1),
    (CompressorMode.BOOSTING, 2)], ids=lambda v: str(getattr(v, "value", v)))
def test_compressor_curve_matches_reference(mode, mid):
    """Static knee curves on a log level sweep (the UI path)."""
    levels = np.geomspace(1e-4, 4.0, 512).astype(np.float32)
    curve_ref, gain_ref = ro.compressor_curve(
        mid, 0.5, 0.25, 0.001, 20.0, 100.0, 0.7071, 4.0, 5.0, SR, levels)
    c = Compressor(SR, mode, attack_thresh=0.5, release_thresh=0.25,
                   boost_thresh=0.001, attack_ms=20.0, release_ms=100.0,
                   knee=0.7071, ratio=4.0, hold_ms=5.0)
    params = c.build()
    curve = np.asarray(c.curve(params, jnp.asarray(levels)))
    assert _snr_db(curve_ref, curve) >= 100.0
    # NOTE reference-verbatim: the ARRAY form Compressor::reduction
    # (Compressor.cpp) calls compressor_x2_curve — it returns the curve
    # (x*gain), unlike the scalar reduction(float) which returns the
    # gain.  This framework's amplification() follows the scalar
    # semantics; the array quirk is pinned here, not copied.
    np.testing.assert_allclose(gain_ref, curve_ref, rtol=1e-6)


@pytest.mark.parametrize("mode,mid", [
    (ExpanderMode.DOWNWARD, 0), (ExpanderMode.UPWARD, 1)],
    ids=lambda v: str(getattr(v, "value", v)))
def test_expander_process_matches_reference(mode, mid):
    x = _burst_noise(seed=11)
    g_ref, e_ref = ro.expander_process(
        mid, 0.25, 0.125, 15.0, 80.0, 0.7071, 2.0, 3.0, SR, x)
    u = Expander(SR, mode, attack_thresh=0.25, release_thresh=0.125,
                 attack_ms=15.0, release_ms=80.0, knee=0.7071, ratio=2.0,
                 hold_ms=3.0)
    params = u.build()
    _, gain, env = u.process(params, u.init_state(), jnp.asarray(x))
    assert _snr_db(e_ref, env) >= 90.0
    assert _snr_db(g_ref, gain) >= 90.0


def test_gate_process_matches_reference():
    x = _burst_noise(seed=13)
    g_ref, e_ref = ro.gate_process(
        0.2, 0.1, 0.5, 0.5, 0.0631, 20.0, 100.0, 5.0, SR, x)
    gt = Gate(SR, threshold=0.2, zone=0.5, hyst_threshold=0.1,
              hyst_zone=0.5, reduction=0.0631, attack_ms=20.0,
              release_ms=100.0, hold_ms=5.0)
    params = gt.build()
    _, gain, env = gt.process(params, gt.init_state(), jnp.asarray(x))
    # gain 115 dB measured; env ~67 dB — divergences are one-sample
    # hold/hysteresis tie-breaks inside flat gain regions
    assert _snr_db(g_ref, gain) >= 100.0
    assert _snr_db(e_ref, env) >= 60.0


@pytest.mark.parametrize("mode", list(LimiterMode),
                         ids=lambda m: m.value)
def test_limiter_gain_trajectory_matches_reference(mode):
    """The genuine iterative peak-patching loop (Limiter.cpp:695-785)
    vs this framework's bounded-while_loop redesign: gain trajectories
    agree to >=100 dB on peaked noise in ALL 12 modes (measured
    104-139 dB this session)."""
    rng = np.random.default_rng(3)
    n = 8192
    x = np.abs((rng.standard_normal(n) * 0.7).astype(np.float32))
    x[2000] = 2.5
    x[5000] = 3.0
    mid = list(LimiterMode).index(mode)
    g_ref, lat = ro.limiter_process(mid, 0.9, 5.0, 25.0, 5.0, 1.0, SR, x,
                                    block=1024)
    lm = Limiter(SR, mode, threshold=0.9, attack_ms=5.0, release_ms=25.0,
                 lookahead_ms=5.0)
    params = lm.build()
    state = lm.init_state()
    outs = []
    for off in range(0, n, 1024):
        state, g = lm.process(params, state, jnp.asarray(x[off:off + 1024]))
        outs.append(np.asarray(g))
    g_mine = np.concatenate(outs)
    assert _snr_db(g_ref, g_mine) >= 100.0
    assert lat == lm.latency()


def test_limiter_alr_matches_reference():
    """ALR pre-stage parity (Limiter.cpp:675-693)."""
    rng = np.random.default_rng(5)
    n = 8192
    x = np.abs((rng.standard_normal(n) * 0.8).astype(np.float32))
    g_ref, _ = ro.limiter_process(0, 0.9, 5.0, 25.0, 5.0, 1.0, SR, x,
                                  block=1024, alr=True, alr_attack=5.0,
                                  alr_release=50.0, alr_knee=0.7071)
    lm = Limiter(SR, LimiterMode.HERM_THIN, threshold=0.9, attack_ms=5.0,
                 release_ms=25.0, lookahead_ms=5.0, knee=1.0, alr=True,
                 alr_attack_ms=5.0, alr_release_ms=50.0, alr_knee=0.7071)
    params = lm.build()
    state = lm.init_state()
    outs = []
    for off in range(0, n, 1024):
        state, g = lm.process(params, state, jnp.asarray(x[off:off + 1024]))
        outs.append(np.asarray(g))
    assert _snr_db(g_ref, np.concatenate(outs)) >= 80.0
