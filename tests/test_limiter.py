"""Limiter tests — brick-wall guarantee, gain smoothness, streaming
(modeled on reference utest/dynamics/limiter.cpp which drives white noise
through all modes and checks the limiting invariant)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsp_dsp_units_tpu.models.dynamics.limiter import (
    Limiter, LimiterMode)

SR = 48000


def _loud_noise(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n).astype(np.float32)
    x *= 2.0 / np.abs(x).max()
    return x


@pytest.mark.parametrize("mode", [
    LimiterMode.HERM_THIN, LimiterMode.HERM_WIDE, LimiterMode.HERM_TAIL,
    LimiterMode.HERM_DUCK, LimiterMode.EXP_THIN, LimiterMode.EXP_WIDE,
    LimiterMode.LINE_THIN, LimiterMode.LINE_WIDE,
])
def test_limiter_brick_wall(mode):
    """Applying the produced gain to the lookahead-delayed signal must
    never exceed the threshold (beyond float eps)."""
    lim = Limiter(SR, mode=mode, threshold=0.5, lookahead_ms=2.0,
                  attack_ms=2.0, release_ms=2.0)
    p = lim.build()
    st = lim.init_state()
    x = _loud_noise(4096)
    st, gain = lim.process(p, st, jnp.asarray(x))
    gain = np.asarray(gain)
    la = lim.latency()
    delayed = np.concatenate([np.zeros(la, np.float32), x])[: x.size]
    out = delayed * gain
    assert np.abs(out).max() <= 0.5 * 1.001, mode
    # gain must be (mostly) unity in quiet parts — feed quiet signal
    st2 = lim.init_state()
    st2, g2 = lim.process(p, st2, jnp.asarray(x * 0.1))
    assert np.asarray(g2).min() > 0.95


def test_limiter_batched_channels():
    lim = Limiter(SR, threshold=0.5, lookahead_ms=2.0)
    p = lim.build()
    st = lim.init_state((4,))
    x = np.stack([_loud_noise(2048, s) for s in range(4)])
    st, gain = lim.process(p, st, jnp.asarray(x))
    la = lim.latency()
    delayed = np.concatenate(
        [np.zeros((4, la), np.float32), x], axis=1)[:, : x.shape[1]]
    out = delayed * np.asarray(gain)
    assert np.abs(out).max() <= 0.5 * 1.001


def test_limiter_streaming_brick_wall():
    """State carries across calls: the limit holds at block joints."""
    lim = Limiter(SR, threshold=0.4, lookahead_ms=3.0)
    p = lim.build()
    st = lim.init_state()
    x = _loud_noise(8192, 3)
    gains = []
    for i in range(0, x.size, 512):
        st, g = lim.process(p, st, jnp.asarray(x[i:i + 512]))
        gains.append(np.asarray(g))
    gain = np.concatenate(gains)
    la = lim.latency()
    delayed = np.concatenate([np.zeros(la, np.float32), x])[: x.size]
    assert np.abs(delayed * gain).max() <= 0.4 * 1.001


def test_limiter_alr():
    lim = Limiter(SR, threshold=0.5, lookahead_ms=2.0, alr=True)
    p = lim.build()
    st = lim.init_state()
    x = _loud_noise(4096, 5)
    st, gain = lim.process(p, st, jnp.asarray(x))
    la = lim.latency()
    delayed = np.concatenate([np.zeros(la, np.float32), x])[: x.size]
    assert np.abs(delayed * np.asarray(gain)).max() <= 0.5 * 1.001
