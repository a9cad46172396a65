"""Playback golden-sequence parity with the reference utest matrix.

The reference pins the sample-player batch scheduler with expected
output sequences for every loop mode, crossfade, inside-loop start,
tail start, and cancel scenario
(src/test/utest/sampling/helpers/playback.cpp:271-695, scenario
parameters :329-640).  This file re-derives those sequences from the
scheduling rules of src/main/sampling/helpers/playback.cpp (loop pass
planning :263-405, stop/cancel gating :42-63,732-765, crossfade
timing :409-454) over our own sample values and drives the player at
several block sizes to prove streaming invariance of the plan.
"""

import numpy as np
import pytest

from lsp_dsp_units_tpu.models.sampling.player import (
    LoopMode, PlaySettings, SamplePlayer, XFadeType)
from lsp_dsp_units_tpu.models.sampling.sample import Sample

# 12 distinct values; the golden sequences are index/weight patterns,
# the values themselves are arbitrary
S = np.array([0.11, 0.23, 0.31, 0.43, 0.53, 0.61,
              0.73, 0.83, 0.91, 1.03, 1.13, 1.27], np.float32)


def _sample() -> Sample:
    s = Sample(1, S.size, 48000)
    s.data[0] = S
    return s


def fwd(a, b):
    return list(S[a:b])


def rev(a, b):
    """One reversed pass over [a, b): plays b-1 .. a."""
    return list(S[a:b][::-1])


def xf(a, b, k):
    """Crossfade mix: outgoing sample ``a`` at weight 1-k, incoming
    ``b`` at weight k (reference linear batch fades)."""
    return float(S[a]) * (1.0 - k) + float(S[b]) * k


def run_playback(settings, total, stop_at=None, cancel_pre=None,
                 cancel_at=None, step=5):
    """Play ``settings`` and render ``total`` samples in ``step``-sized
    blocks; stop/cancel like the reference harness (stop/cancel_pre are
    issued before processing, cancel_at=(time, fadeout) at the exact
    output timestamp like utest playback.cpp:656-663)."""
    player = SamplePlayer()
    player.bind(0, _sample())
    pb = player.play(settings)
    assert pb is not None
    if stop_at is not None:
        pb.stop(stop_at)
    if cancel_pre is not None:
        pb.cancel(fadeout=cancel_pre[1], delay=cancel_pre[0])
    out = []
    rendered = 0
    while rendered < total:
        n = min(step, total - rendered)
        if cancel_at is not None and rendered == cancel_at[0]:
            pb.cancel(fadeout=cancel_at[1])
        out.append(player.process(n))
        rendered += n
    return np.concatenate(out)


# -- scenario matrix (utest playback.cpp:329-640) --------------------------
# (name, settings-kwargs, stop delay, expected sequence)
HEAD4 = fwd(0, 4)
TAIL4 = fwd(8, 12)

SCENARIOS = [
    ("no_delay", {}, None, fwd(0, 12)),
    ("short_delay", {"delay": 4}, None, [0.0] * 4 + fwd(0, 12)),
    ("start_position", {"start": 4}, None, fwd(4, 12)),
    ("direct_loop_simple",
     {"loop_mode": LoopMode.DIRECT, "loop_start": 4, "loop_end": 8},
     14, HEAD4 + fwd(4, 8) * 3 + TAIL4),
    ("reverse_loop_simple",
     {"loop_mode": LoopMode.REVERSE, "loop_start": 4, "loop_end": 8},
     14, HEAD4 + rev(4, 8) * 3 + TAIL4),
    ("direct_full_pp",
     {"loop_mode": LoopMode.DIRECT_FULL_PP, "loop_start": 4, "loop_end": 8},
     14, HEAD4 + fwd(4, 8) + rev(4, 8) + fwd(4, 8) + rev(4, 8) + TAIL4),
    ("reverse_full_pp",
     {"loop_mode": LoopMode.REVERSE_FULL_PP, "loop_start": 4, "loop_end": 8},
     14, HEAD4 + rev(4, 8) + fwd(4, 8) + rev(4, 8) + fwd(4, 8) + TAIL4),
    ("direct_half_pp_v1",
     {"loop_mode": LoopMode.DIRECT_HALF_PP, "loop_start": 4, "loop_end": 8},
     14, HEAD4 + fwd(4, 8) + rev(4, 8) + fwd(4, 8) + TAIL4),
    ("direct_half_pp_v2",
     {"loop_mode": LoopMode.DIRECT_HALF_PP, "loop_start": 4, "loop_end": 8},
     18, HEAD4 + fwd(4, 8) + rev(4, 8) + fwd(4, 8) + rev(4, 8) + TAIL4),
    ("reverse_half_pp_v1",
     {"loop_mode": LoopMode.REVERSE_HALF_PP, "loop_start": 4, "loop_end": 8},
     14, HEAD4 + rev(4, 8) + fwd(4, 8) + rev(4, 8) + TAIL4),
    ("reverse_half_pp_v2",
     {"loop_mode": LoopMode.REVERSE_HALF_PP, "loop_start": 4, "loop_end": 8},
     18, HEAD4 + rev(4, 8) + fwd(4, 8) + rev(4, 8) + fwd(4, 8) + TAIL4),
    # smart ping-pong: stop(10) and stop(14) land inside loop passes 2/3
    # and both leave after the next direct pass (utest :467-489)
    ("direct_smart_pp_v1",
     {"loop_mode": LoopMode.DIRECT_SMART_PP, "loop_start": 4, "loop_end": 8},
     10, HEAD4 + fwd(4, 8) + rev(4, 8) + fwd(4, 8) + TAIL4),
    ("direct_smart_pp_v2",
     {"loop_mode": LoopMode.DIRECT_SMART_PP, "loop_start": 4, "loop_end": 8},
     14, HEAD4 + fwd(4, 8) + rev(4, 8) + fwd(4, 8) + TAIL4),
    ("direct_smart_pp_v3",
     {"loop_mode": LoopMode.DIRECT_SMART_PP, "loop_start": 4, "loop_end": 8},
     18, HEAD4 + fwd(4, 8) + rev(4, 8) + fwd(4, 8) + rev(4, 8)
     + fwd(4, 8) + TAIL4),
    ("reverse_smart_pp_v1",
     {"loop_mode": LoopMode.REVERSE_SMART_PP, "loop_start": 4, "loop_end": 8},
     14, HEAD4 + rev(4, 8) + fwd(4, 8) + rev(4, 8) + fwd(4, 8) + TAIL4),
    ("reverse_smart_pp_v2",
     {"loop_mode": LoopMode.REVERSE_SMART_PP, "loop_start": 4, "loop_end": 8},
     18, HEAD4 + rev(4, 8) + fwd(4, 8) + rev(4, 8) + fwd(4, 8) + TAIL4),
    ("reverse_smart_pp_v3",
     {"loop_mode": LoopMode.REVERSE_SMART_PP, "loop_start": 4, "loop_end": 8},
     22, HEAD4 + rev(4, 8) + fwd(4, 8) + rev(4, 8) + fwd(4, 8)
     + rev(4, 8) + fwd(4, 8) + TAIL4),
    # start position inside the loop: first pass runs from the start
    # position to the loop edge (utest :209-223)
    ("direct_inside",
     {"start": 6, "loop_mode": LoopMode.DIRECT,
      "loop_start": 2, "loop_end": 10},
     16, fwd(6, 10) + fwd(2, 10) * 2 + fwd(10, 12)),
    ("reverse_inside",
     {"start": 6, "loop_mode": LoopMode.REVERSE,
      "loop_start": 2, "loop_end": 10},
     16, rev(2, 6) + rev(2, 10) * 2 + fwd(10, 12)),
    # start position at/after the loop end: straight to the tail
    ("direct_tail",
     {"start": 8, "loop_mode": LoopMode.DIRECT,
      "loop_start": 4, "loop_end": 8},
     16, fwd(8, 12)),
    ("reverse_tail",
     {"start": 8, "loop_mode": LoopMode.REVERSE,
      "loop_start": 4, "loop_end": 8},
     16, fwd(8, 12)),
]

# crossfaded loops (utest :377-405, expected :63-88): 4-sample linear
# fades; the head extends into the loop, loop->loop and loop->tail
# overlap by the fade
XFADE_SCENARIOS = [
    ("direct_loop_xfade",
     {"loop_mode": LoopMode.DIRECT, "loop_start": 2, "loop_end": 10,
      "xfade_length": 4},
     16,
     # head->loop is sequential (no fade); loop->loop overlaps 4;
     # loop->tail is sequential again
     fwd(0, 2) + fwd(2, 6)
     + [xf(6, 2, 0.0), xf(7, 3, 0.25), xf(8, 4, 0.5), xf(9, 5, 0.75)] * 2
     + fwd(6, 10) + fwd(10, 12)),
    ("reverse_loop_xfade",
     {"loop_mode": LoopMode.REVERSE, "loop_start": 2, "loop_end": 10,
      "xfade_length": 4},
     16,
     # nothing is sequential in a reverse loop: the head crossfades
     # into loop 1, every loop pass into the next, and the tail is
     # pre-shifted by the fade (playback.cpp:444-452)
     fwd(0, 2)
     + [xf(2, 9, 0.0), xf(3, 8, 0.25), xf(4, 7, 0.5), xf(5, 6, 0.75)]
     + [xf(5, 9, 0.0), xf(4, 8, 0.25), xf(3, 7, 0.5), xf(2, 6, 0.75)] * 2
     + [xf(5, 6, 0.0), xf(4, 7, 0.25), xf(3, 8, 0.5), xf(2, 9, 0.75)]
     + fwd(10, 12)),
]


@pytest.mark.parametrize("name,kw,stop,expect",
                         SCENARIOS + XFADE_SCENARIOS,
                         ids=[s[0] for s in SCENARIOS + XFADE_SCENARIOS])
@pytest.mark.parametrize("step", [1, 3, 7, 32])
def test_playback_golden(name, kw, stop, expect, step):
    expect = np.asarray(expect, np.float32)
    total = expect.size + 8
    out = run_playback(PlaySettings(**kw), total, stop_at=stop, step=step)
    np.testing.assert_allclose(out[:expect.size], expect,
                               rtol=1e-6, atol=1e-7)
    # nothing after the tail
    np.testing.assert_allclose(out[expect.size:], 0.0, atol=1e-7)


# -- cancel scenarios (utest :586-640, expected :235-268) ------------------

def _env(seq, at, fade):
    """Apply the reference cancel fade-out: weight 1 - (t-at)/fade,
    clipped to [0, 1] (playback.cpp:560-592 apply_fade_out)."""
    out = []
    for t, v in enumerate(seq):
        k = 1.0 if t < at else max(0.0, 1.0 - (t - at) / fade)
        out.append(v * k)
    return out


CANCELS = [
    # (cancel time during streaming, expected)
    ("cancel_9", 9, _env(fwd(0, 12), 9, 4)),
    ("cancel_5", 5, _env(fwd(0, 9), 5, 4)),
    ("cancel_3", 3, _env(fwd(0, 7), 3, 4)),
]


@pytest.mark.parametrize("name,time,expect", CANCELS,
                         ids=[c[0] for c in CANCELS])
def test_playback_cancel_golden(name, time, expect):
    expect = np.asarray(expect, np.float32)
    out = run_playback(PlaySettings(), expect.size + 6,
                       cancel_at=(time, 4), step=1)
    np.testing.assert_allclose(out[:expect.size], expect,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(out[expect.size:], 0.0, atol=1e-7)


def _cancel_loop_expect():
    """Delayed start + direct loop cancelled mid-pass 2: the fade spans
    the loop remainder AND the tail the scheduler switches to
    (utest :253-268)."""
    # positions 24..27: loop pass 2 continues (S8, S9) while fading,
    # then the tail (S10, S11) keeps fading out
    return ([0.0] * 8 + fwd(0, 2) + fwd(2, 10) + fwd(2, 8)
            + [float(S[8]), float(S[9]) * 0.75,
               float(S[10]) * 0.5, float(S[11]) * 0.25])


@pytest.mark.parametrize("mode", ["stream", "pre"])
def test_playback_cancel_inside_loop(mode):
    expect = np.asarray(_cancel_loop_expect(), np.float32)
    kw = {"delay": 8, "loop_mode": LoopMode.DIRECT,
          "loop_start": 2, "loop_end": 10}
    if mode == "stream":
        out = run_playback(PlaySettings(**kw), expect.size + 6,
                           cancel_at=(24, 4), step=1)
    else:
        # cancel issued before processing with delay=24 must behave
        # identically (utest :634-639)
        out = run_playback(PlaySettings(**kw), expect.size + 6,
                           cancel_pre=(24, 4), step=1)
    np.testing.assert_allclose(out[:expect.size], expect,
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(out[expect.size:], 0.0, atol=1e-7)


def test_stop_mid_stream_matches_pre_stop():
    """stop(delay) issued before processing == stop() issued at the
    equivalent output timestamp mid-stream."""
    kw = {"loop_mode": LoopMode.DIRECT, "loop_start": 4, "loop_end": 8}
    a = run_playback(PlaySettings(**kw), 28, stop_at=14, step=7)

    player = SamplePlayer()
    player.bind(0, _sample())
    pb = player.play(PlaySettings(**kw))
    out = [player.process(14)]
    pb.stop(0)
    out.append(player.process(14))
    b = np.concatenate(out)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_player_four_voice_mix_reference_utest():
    """Port of the reference SamplePlayer unit test
    (utest/sampling/player.cpp:28-117): four 8-sample one-shots played
    with per-voice gain (i+1)*1.1 and delay (i+1)*11, processed over a
    nonzero passthrough source in 16-sample chunks; the result must be
    the analytic fmadd mix."""
    from lsp_dsp_units_tpu.models.sampling import (Sample, SamplePlayer,
                                                   PlaySettings)

    voices = np.array([
        [1, -1, 1, -1, 1, 1, -1, -1],
        [1, 2, 3, 5, 7, 11, 13, 17],
        [4, 3, 2, 1, 1, 2, 3, 4],
        [1, 2, 3, 2, 2, 3, 2, 1]], np.float32)

    sp = SamplePlayer()
    for i in range(4):
        s = Sample(1, 8, 48000)
        s.data[0] = voices[i]
        sp.bind(i, s)

    n = 0x100
    rng = np.random.default_rng(3)
    src = rng.standard_normal(n).astype(np.float32) * 0.1

    golden = src.copy()
    for i in range(4):
        d = (i + 1) * 11
        golden[d: d + 8] += voices[i] * (i + 1) * 1.1

    for i in range(4):
        pb = sp.play(PlaySettings(sample_id=i, volume=(i + 1) * 1.1,
                                  delay=(i + 1) * 11))
        assert pb is not None

    out = np.concatenate([
        sp.process(min(16, n - off), src=src[off: off + 16])
        for off in range(0, n, 16)])
    np.testing.assert_allclose(out, golden, rtol=1e-6, atol=1e-6)


def test_stop_mid_crossfade_no_click():
    """A stop() issued while a loop-restart crossfade is already
    sounding must let that batch finish instead of un-planning it
    (reference recompute only replaces batches that have not started):
    un-planning mid-fade orphaned the half-rendered crossfade and
    jumped the output by several ramp steps."""
    ramp = np.arange(64, dtype=np.float32)
    smp = Sample(1, ramp.size, 48000)
    smp.data[0] = ramp
    player = SamplePlayer()
    player.bind(0, smp)
    pb = player.play(PlaySettings(loop_start=10, loop_end=40,
                                  loop_mode=LoopMode.DIRECT,
                                  xfade_length=8))
    assert pb is not None
    out = []
    # render to t=35 (crossfade into pass 2 starts at 32), then stop
    for _ in range(7):
        out.append(player.process(5))
    pb.stop()
    for _ in range(8):
        out.append(player.process(5))
    y = np.concatenate(out)
    steps = np.abs(np.diff(y[y != 0.0]))
    # ramp data moves by ~1/sample; the mid-fade un-planning bug
    # produced a 6.5-step jump at the stop sample
    assert steps.max() < 3.0, steps.max()
