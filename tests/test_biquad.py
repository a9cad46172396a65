"""Kernel-layer tests: biquad cascade correctness, streaming invariance.

Oracle pattern follows the reference test strategy (SURVEY.md §4): a naive
float64 golden model lives in the test/kernel module; the optimized kernel
must match within tight SNR; streaming with odd block sizes must be
bit-consistent with one-shot processing (reference
utest/util/convolver.cpp:43-53 drives odd chunk sizes for the same reason).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lsp_dsp_units_tpu.ops import biquad
from lsp_dsp_units_tpu.utils.units import snr_db


def _random_stable_biquads(rng, k, max_pole_radius=0.98):
    """Random stable biquads with poles inside the unit circle."""
    coeffs = np.zeros((k, 5))
    for i in range(k):
        r = rng.uniform(0.2, max_pole_radius)
        th = rng.uniform(0.05, np.pi - 0.05)
        # denominator 1 - 2 r cos(th) z^-1 + r^2 z^-2 -> negated a-convention
        a1 = 2.0 * r * np.cos(th)
        a2 = -r * r
        b = rng.normal(size=3) * 0.5
        coeffs[i] = [b[0], b[1], b[2], a1, a2]
    return coeffs


def test_assoc_matches_golden_f64():
    rng = np.random.default_rng(42)
    coeffs = _random_stable_biquads(rng, 4)
    x = rng.normal(size=4096).astype(np.float32)
    golden = biquad.np_biquad_cascade_f64(coeffs, x)

    c = jnp.asarray(coeffs, jnp.float32)
    st = biquad.init_state(4)
    y, _ = biquad.biquad_cascade(c, st, jnp.asarray(x))
    assert snr_db(np.asarray(y), golden) > 95.0


def test_assoc_matches_seq():
    rng = np.random.default_rng(7)
    coeffs = _random_stable_biquads(rng, 3)
    x = rng.normal(size=1024).astype(np.float32)
    c = jnp.asarray(coeffs, jnp.float32)
    y1, s1 = biquad.biquad_cascade(c, biquad.init_state(3), jnp.asarray(x))
    y2, s2 = biquad.biquad_cascade_seq(c, biquad.init_state(3),
                                       jnp.asarray(x))
    assert snr_db(np.asarray(y1), np.asarray(y2)) > 100.0
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("chunk", [31, 127, 257])
def test_streaming_invariance(chunk):
    """Chunked processing with carried state == one-shot processing."""
    rng = np.random.default_rng(3)
    coeffs = _random_stable_biquads(rng, 2)
    x = rng.normal(size=1000).astype(np.float32)
    c = jnp.asarray(coeffs, jnp.float32)

    y_full, _ = biquad.biquad_cascade(c, biquad.init_state(2),
                                      jnp.asarray(x))

    st = biquad.init_state(2)
    outs = []
    for i in range(0, len(x), chunk):
        blk = jnp.asarray(x[i:i + chunk])
        y, st = biquad.biquad_cascade(c, st, blk)
        outs.append(np.asarray(y))
    y_chunks = np.concatenate(outs)
    assert snr_db(y_chunks, np.asarray(y_full)) > 110.0


def test_batched_channels():
    """Leading channel axes broadcast; per-channel coefficients work."""
    rng = np.random.default_rng(11)
    coeffs = _random_stable_biquads(rng, 2)
    x = rng.normal(size=(8, 512)).astype(np.float32)
    c = jnp.asarray(coeffs, jnp.float32)
    st = biquad.init_state(2, (8,))
    y, st2 = biquad.biquad_cascade(c, st, jnp.asarray(x))
    assert y.shape == (8, 512)
    assert st2.shape == (8, 2, 2)
    # each row must equal the single-channel result
    y0, _ = biquad.biquad_cascade(c, biquad.init_state(2),
                                  jnp.asarray(x[3]))
    np.testing.assert_allclose(np.asarray(y[3]), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)

    # per-channel coefficients: [C, K, 5]
    cc = jnp.asarray(
        np.stack([_random_stable_biquads(rng, 2) for _ in range(8)]),
        jnp.float32)
    y2, _ = biquad.biquad_cascade(cc, st, jnp.asarray(x))
    yref, _ = biquad.biquad_cascade(cc[5], biquad.init_state(2),
                                    jnp.asarray(x[5]))
    np.testing.assert_allclose(np.asarray(y2[5]), np.asarray(yref),
                               rtol=1e-5, atol=1e-6)


def test_dyn_biquad_matches_static_when_constant():
    rng = np.random.default_rng(5)
    coeffs = _random_stable_biquads(rng, 2)
    x = rng.normal(size=256).astype(np.float32)
    c = jnp.asarray(coeffs, jnp.float32)
    dyn = jnp.broadcast_to(c, (256, 2, 5))
    y1, _ = biquad.biquad_cascade(c, biquad.init_state(2), jnp.asarray(x))
    y2, _ = biquad.dyn_biquad_cascade(dyn, biquad.init_state(2),
                                      jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-5)


def test_impulse_response_jit():
    rng = np.random.default_rng(9)
    coeffs = _random_stable_biquads(rng, 1)
    c = jnp.asarray(coeffs, jnp.float32)
    ir = biquad.impulse_response(c, 64)
    golden = biquad.np_biquad_cascade_f64(
        coeffs, np.eye(1, 64, 0, dtype=np.float32)[0])
    assert snr_db(np.asarray(ir), golden) > 95.0
    # jit-compilable
    f = jax.jit(lambda c, s, x: biquad.biquad_cascade(c, s, x))
    y, _ = f(c, biquad.init_state(1), jnp.zeros(128, jnp.float32))
    assert y.shape == (128,)


def test_dyn_biquad_seq_matches_assoc_and_golden():
    """dyn_biquad_cascade_seq: sequential per-sample-coefficient path
    equals the assoc path for well-conditioned filters and tracks the
    f64 golden recurrence closely."""
    rng = np.random.default_rng(11)
    t, k = 512, 2
    x = rng.standard_normal(t).astype(np.float32)
    # random stable time-varying coefficients around a 1 kHz bell
    from lsp_dsp_units_tpu.models.filters.design import (FilterParams,
                                                         FilterType,
                                                         design_filter)
    base = design_filter(FilterParams(ftype=FilterType.BT_RLC_BELL, slope=2,
                                      freq=1000.0, gain=2.0, quality=1.0),
                         48000).biquads  # [2, 5]
    mod = 1.0 + 0.02 * np.sin(np.linspace(0, 6.0, t))[:, None, None]
    dyn = (base[None, :, :] * mod).astype(np.float32)       # [T, K, 5]
    dyn[..., 3:] = base[None, :, 3:]  # keep poles fixed (stability)

    ja = jnp.asarray(dyn)
    y_seq, s_seq = biquad.dyn_biquad_cascade_seq(
        ja, biquad.init_state(k), jnp.asarray(x))
    y_assoc, s_assoc = biquad.dyn_biquad_cascade(
        ja, biquad.init_state(k), jnp.asarray(x))
    assert snr_db(np.asarray(y_seq), np.asarray(y_assoc)) > 90.0

    # golden: float64 sequential recurrence with the same coefficients
    yg = np.zeros(t)
    s = np.zeros((k, 2))
    for n in range(t):
        v = float(x[n])
        for i in range(k):
            b0, b1, b2, a1, a2 = (float(c) for c in dyn[n, i])
            y = b0 * v + s[i, 0]
            s[i, 0] = b1 * v + a1 * y + s[i, 1]
            s[i, 1] = b2 * v + a2 * y
            v = y
        yg[n] = v
    assert snr_db(np.asarray(y_seq), yg) > 90.0
    np.testing.assert_allclose(np.asarray(s_seq), s, atol=1e-4)

    # odd length (unroll fallback) + empty input
    y_odd, _ = biquad.dyn_biquad_cascade_seq(
        ja[:511], biquad.init_state(k), jnp.asarray(x[:511]))
    assert y_odd.shape == (511,)
    y_e, s_e = biquad.dyn_biquad_cascade_seq(
        ja[:0], biquad.init_state(k), jnp.asarray(x[:0]))
    assert y_e.shape == (0,)
