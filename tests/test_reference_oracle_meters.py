"""Meters + Crossover parity vs the COMPILED reference
(tests/ref_oracle): LoudnessMeter, ILUFSMeter (BS.1770 gated),
Correlometer, Panometer, and the IIR Linkwitz-Riley crossover tree.

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

from lsp_dsp_units_tpu.models.meters.correlometer import (  # noqa: E402
    Correlometer)
from lsp_dsp_units_tpu.models.meters.loudness import (  # noqa: E402
    ILUFSMeter, LoudnessMeter, Weighting)
from lsp_dsp_units_tpu.models.meters.peak import (  # noqa: E402
    Panometer, PanLaw)
from lsp_dsp_units_tpu.models.misc import broadcast as bs  # noqa: E402
from lsp_dsp_units_tpu.models.util.crossover import (  # noqa: E402
    Crossover, CrossoverSlope)

pytestmark = pytest.mark.skipif(
    not ro.available(), reason="/root/reference not present")

SR = 48000


def _snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = ref - np.asarray(test, np.float64)
    e = float(np.mean(err ** 2))
    if e == 0.0:
        return np.inf
    return 10.0 * np.log10(float(np.mean(ref ** 2)) / e)


def _stereo(n=48000, seed=4, scale=0.2):
    rng = np.random.default_rng(seed)
    l = (rng.standard_normal(n) * scale).astype(np.float32)
    r = (rng.standard_normal(n) * scale).astype(np.float32)
    return l, r


def test_correlometer_matches_reference():
    n = 24000
    l, r = _stereo(n)
    b = (0.6 * l + 0.4 * r).astype(np.float32)
    y_ref = ro.correlometer(4800, 4800, l, b, block=512)
    cm = Correlometer(window=4800)
    state = cm.init_state()
    outs = []
    for off in range(0, n, 512):
        state, y = cm.process(state, jnp.asarray(l[off:off + 512]),
                              jnp.asarray(b[off:off + 512]))
        outs.append(np.asarray(y))
    assert _snr_db(y_ref, np.concatenate(outs)) >= 100.0  # measured 115


@pytest.mark.parametrize("law,lid", [(PanLaw.LINEAR, 0),
                                     (PanLaw.EQUAL_POWER, 1)],
                         ids=["linear", "equal_power"])
def test_panometer_matches_reference(law, lid):
    n = 24000
    l, r = _stereo(n)
    y_ref = ro.panometer(4800, 4800, lid, 0.5, l, r, block=512)
    pm = Panometer(period=4800, law=law)
    state = pm.init_state()
    outs = []
    for off in range(0, n, 512):
        state, y = pm.process(state, jnp.asarray(l[off:off + 512]),
                              jnp.asarray(r[off:off + 512]))
        outs.append(np.asarray(y))
    assert _snr_db(y_ref, np.concatenate(outs)) >= 100.0  # measured 115+


def test_loudness_meter_matches_reference():
    """Momentary (400 ms) K-weighted loudness, stereo LEFT/RIGHT
    designations — measured 124.5 dB."""
    n = 48000
    l, r = _stereo(n)
    x = np.stack([l, r])
    y_ref = ro.loudness_meter(400.0, 5, SR, l, r, block=480)
    lm = LoudnessMeter(SR, channels=2, period_ms=400.0,
                       weighting=Weighting.K,
                       designations=[bs.Channel.LEFT, bs.Channel.RIGHT])
    state = lm.init_state()
    step = jax.jit(lm.process)
    outs = []
    for off in range(0, n, 480):
        state, y = step(state, jnp.asarray(x[:, off:off + 480]))
        outs.append(np.asarray(y))
    assert _snr_db(y_ref, np.concatenate(outs)) >= 110.0


def test_ilufs_meter_matches_reference():
    """BS.1770-gated INTEGRATED loudness vs the genuine meter.  The
    reference's process() applies the -0.691 dB DBFS->LUFS shift by
    default; this framework returns the unshifted amplitude domain.
    The integrated value agrees to <0.02 dB; the per-sample trajectory
    bound reflects block emission-boundary ripple."""
    n = 48000
    l, r = _stereo(n)
    x = np.stack([l, r])
    y_ref = ro.ilufs_meter(10.0, 5, SR, l, r, block=4800)
    im = ILUFSMeter(SR, channels=2, weighting=Weighting.K,
                    designations=[bs.Channel.LEFT, bs.Channel.RIGHT],
                    max_int_time_s=10.0)
    state = im.init_state()
    step = jax.jit(im.process)
    outs = []
    blk = im.blk_size
    nn = (n // blk) * blk
    for off in range(0, nn, blk):
        state, y = step(state, jnp.asarray(x[:, off:off + blk]))
        outs.append(np.asarray(y))
    mine = np.concatenate(outs) * bs.DBFS_TO_LUFS_SHIFT_GAIN
    assert _snr_db(y_ref[:nn], mine) >= 50.0    # measured 58 dB
    final_db = 20.0 * np.log10(mine[-1] / y_ref[nn - 1])
    assert abs(final_db) < 0.05                 # measured 0.015 dB


XOVER_CASES = [
    ([300.0, 3000.0], [CrossoverSlope.LR4, CrossoverSlope.LR12]),
    ([120.0, 1000.0, 8000.0],
     [CrossoverSlope.LR2, CrossoverSlope.LR8, CrossoverSlope.LR28]),
]


@pytest.mark.parametrize("freqs,slopes", XOVER_CASES,
                         ids=["2split", "3split"])
def test_crossover_bands_match_reference(freqs, slopes):
    """Each band of the genuine serial LR split tree
    (Crossover.cpp:353-421) vs this framework's batched cascades.
    Low bands are bounded by the reference's own f32 recurrence noise
    at low split frequencies (same mechanism as the filter tests);
    high bands match at 100+ dB."""
    n = 24000
    x, _ = _stereo(n, scale=0.3)
    y_ref = ro.crossover(np.asarray(freqs, np.float32),
                         np.asarray([s.value for s in slopes], np.uint32),
                         SR, x, block=512)
    cv = Crossover(SR, splits=list(zip(freqs, slopes)))
    state = cv.init_state()
    step = jax.jit(cv.process)
    bands = []
    for off in range(0, n, 512):
        state, y = step(state, jnp.asarray(x[off:off + 512]))
        bands.append(np.asarray(y))
    mine = np.concatenate(bands, axis=-1)
    floors = [55.0] + [60.0] * (len(freqs) - 1) + [95.0]
    for b in range(len(freqs) + 1):
        snr = _snr_db(y_ref[b], mine[b])
        assert snr >= floors[b], f"band {b}: {snr:.1f} dB < {floors[b]}"


def test_crossover_band_sum_flat():
    """The serial-tree topology makes the band sum exactly allpass-
    complementary: |sum| flat within 0.01 dB (it was -0.09 dB before
    the serial-HPF fix this topology test captured)."""
    cv = Crossover(SR, splits=[(300.0, CrossoverSlope.LR4),
                               (3000.0, CrossoverSlope.LR12)])
    imp = np.zeros(16384, np.float32)
    imp[0] = 1.0
    state = cv.init_state()
    _, bands = cv.process(state, jnp.asarray(imp))
    h = np.abs(np.fft.rfft(np.asarray(bands).sum(0)))
    freqs = np.fft.rfftfreq(16384, 1 / SR)
    sel = (freqs > 50) & (freqs < 20000)
    flat = 20.0 * np.log10(h[sel])
    assert flat.max() < 0.01 and flat.min() > -0.01
