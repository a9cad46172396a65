"""Device-side batched SamplePlayer mixdown (round-4 verdict ask #9).

The host SamplePlayer (models/sampling/player.py) mixes each playback's
batches in Python — measured ~5 us of host time per voice-block at 256
voices (benchmarks/polyphony.py), which caps ~1k-voice serving.  This
module is the device shape of the same mixdown (reference
SamplePlayer.cpp:305-366 batch-mixing intent): voices live as arrays, a
block is ONE gather over a flat sample bank followed by ONE routing
matmul:

  idx[v, t]  = playhead folding (delay, span, DIRECT loop, one-shot end)
  vals[v, t] = bank_flat[sample_id[v] * L + idx] * gain[v]
  out[c, t]  = route[c, v] @ vals                 (MXU)

Scope: the serving fast path — DIRECT loop or one-shot (NONE) voices
without crossfades, mono-channel-per-voice routing; everything else
stays on the host player (the full 9-mode x crossfade semantics live
there and in helpers/playback).  Parity with the host player on the
supported scope is exact (tests/test_sampling.py::test_device_mix_*).
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class DeviceVoices(NamedTuple):
    """Static per-voice configuration (device arrays, [V] each)."""
    sample_id: Array     # int32 row in the bank
    length: Array        # int32 playable length of that sample
    gain: Array          # float32 mix gain (volume)
    loop_on: Array       # float32 1.0 = DIRECT loop, 0.0 = one-shot
    loop_start: Array    # int32
    loop_end: Array      # int32 (exclusive)
    route: Array         # [C, V] float32 output-channel routing


class DeviceMixState(NamedTuple):
    pos: Array           # [V] int32 playhead; negative while delayed


def build_bank(samples: Sequence[np.ndarray]) -> Tuple[Array, int]:
    """Stack mono sample arrays into one flat device bank.

    Returns (bank_flat [S * L], L) with rows zero-padded to the longest
    sample."""
    arrs = [np.asarray(s, np.float32).reshape(-1) for s in samples]
    max_len = max((a.shape[0] for a in arrs), default=1)
    bank = np.zeros((len(arrs), max_len), np.float32)
    for i, a in enumerate(arrs):
        bank[i, :a.shape[0]] = a
    return jnp.asarray(bank.reshape(-1)), max_len


def build_voices(specs: Sequence[dict], channels: int,
                 sample_lengths: Sequence[int]) -> Tuple[DeviceVoices,
                                                         DeviceMixState]:
    """Voice table from dicts with keys: sample_id, channel, volume,
    delay, loop (bool), loop_start, loop_end."""
    v = len(specs)
    sid = np.zeros(v, np.int32)
    length = np.zeros(v, np.int32)
    gain = np.zeros(v, np.float32)
    loop_on = np.zeros(v, np.float32)
    ls = np.zeros(v, np.int32)
    le = np.ones(v, np.int32)
    route = np.zeros((channels, v), np.float32)
    pos = np.zeros(v, np.int32)
    for i, s in enumerate(specs):
        sid[i] = s["sample_id"]
        length[i] = sample_lengths[s["sample_id"]]
        gain[i] = s.get("volume", 1.0)
        loop_on[i] = 1.0 if s.get("loop", False) else 0.0
        ls[i] = s.get("loop_start", 0)
        le[i] = min(s.get("loop_end", length[i]), length[i])
        route[s.get("channel", 0) % channels, i] = 1.0
        pos[i] = -int(s.get("delay", 0))
    return (DeviceVoices(
        sample_id=jnp.asarray(sid), length=jnp.asarray(length),
        gain=jnp.asarray(gain), loop_on=jnp.asarray(loop_on),
        loop_start=jnp.asarray(ls), loop_end=jnp.asarray(le),
        route=jnp.asarray(route)),
        DeviceMixState(pos=jnp.asarray(pos)))


def mix_block(bank_flat: Array, bank_len: int, voices: DeviceVoices,
              state: DeviceMixState, block: int
              ) -> Tuple[DeviceMixState, Array]:
    """One [C, block] mixdown step.

    Playhead semantics (matching the host player's DIRECT/NONE modes
    without crossfade): samples before position 0 are silence (delay);
    a looping voice folds positions >= loop_end back into
    [loop_start, loop_end); a one-shot voice goes silent at its
    sample length."""
    pos = state.pos
    t = jnp.arange(block, dtype=jnp.int32)
    idx = pos[:, None] + t[None, :]                        # [V, T]
    span = jnp.maximum(voices.loop_end - voices.loop_start, 1)
    over = idx - voices.loop_start[:, None]
    folded = voices.loop_start[:, None] + over % span[:, None]
    looping = (voices.loop_on[:, None] > 0.5) & \
        (idx >= voices.loop_end[:, None])
    idx_f = jnp.where(looping, folded, idx)
    audible = (idx >= 0) & (looping
                            | (idx_f < voices.length[:, None]))
    flat = (voices.sample_id[:, None] * bank_len
            + jnp.clip(idx_f, 0, bank_len - 1))
    vals = jnp.take(bank_flat, flat.reshape(-1),
                    mode="clip").reshape(idx.shape)
    vals = jnp.where(audible, vals, 0.0) * voices.gain[:, None]
    out = jnp.dot(voices.route, vals,
                  precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    # advance; keep looping playheads folded so positions never overflow
    new_pos = pos + block
    new_pos = jnp.where(
        (voices.loop_on > 0.5) & (new_pos >= voices.loop_end),
        voices.loop_start + (new_pos - voices.loop_start) % span,
        new_pos)
    return DeviceMixState(pos=new_pos), out


def build_bank_padded(samples: Sequence[np.ndarray], block: int
                      ) -> Tuple[Array, int, int]:
    """Bank for :func:`mix_block_dma`: ``block`` zeros PREPENDED so a
    delayed voice's fetch window (playhead still negative) lands in
    silence instead of needing a per-voice shift, plus
    ``block + 1024`` tail slack for ops.slicedma's aligned row DMA,
    total length padded to a multiple of 128.  Returns
    (bank_flat, L, pad)."""
    bank, bank_len = build_bank(samples)
    pad = int(block)
    tail = int(block) + 1024
    total = pad + bank.shape[0] + tail
    total += (-total) % 128
    out = jnp.zeros(total, jnp.float32)
    out = jax.lax.dynamic_update_slice(out, bank, (pad,))
    return out, bank_len, pad


def mix_block_dma(bank_pad: Array, bank_len: int, pad: int,
                  voices: DeviceVoices, state: DeviceMixState,
                  block: int, interpret=None
                  ) -> Tuple[DeviceMixState, Array]:
    """mix_block with the per-voice window read as ONE contiguous DMA
    per voice (ops.slicedma) instead of a flat gather — the XLA gather
    runs at element rate on TPU (measured 131 M voice-samples/s at 1k
    voices; the DMA form is the serving path).  Requires every looping
    voice's span >= block (single wrap per block) and pad >= block.

    Sample-exact vs :func:`mix_block` on that scope
    (tests/test_sampling.py)."""
    from lsp_dsp_units_tpu.ops.slicedma import batched_slice

    assert pad >= block
    # the single-fold select below is only exact when every looping
    # voice's span covers a whole block (the gather path's % span is
    # general); validate on concrete voice tables — a violation would
    # otherwise produce silently wrong audio
    if not isinstance(voices.loop_end, jax.core.Tracer):
        span_np = (np.asarray(voices.loop_end, np.int64)
                   - np.asarray(voices.loop_start, np.int64))
        loop_np = np.asarray(voices.loop_on) > 0.5
        assert np.all(span_np[loop_np] >= block), (
            "mix_block_dma requires loop span >= block for looping "
            "voices (single wrap per block); use mix_block")
    pos = state.pos
    n_total = bank_pad.shape[0]
    span = jnp.maximum(voices.loop_end - voices.loop_start, 1)
    base = voices.sample_id * bank_len + pad       # sample row origin
    lim = n_total - block - 1024                   # DMA window slack
    start1 = jnp.clip(base + pos, 0, lim)
    start2 = jnp.clip(base + pos - span, 0, lim)
    w1 = batched_slice(bank_pad, start1, block, interpret=interpret)
    w2 = batched_slice(bank_pad, start2, block, interpret=interpret)

    t = jnp.arange(block, dtype=jnp.int32)
    idx = pos[:, None] + t[None, :]
    looping = (voices.loop_on[:, None] > 0.5) & \
        (idx >= voices.loop_end[:, None])
    idx_f = jnp.where(looping, idx - span[:, None], idx)
    audible = (idx >= 0) & (looping
                            | (idx_f < voices.length[:, None]))
    vals = jnp.where(looping, w2, w1)
    vals = jnp.where(audible, vals, 0.0) * voices.gain[:, None]
    out = jnp.dot(voices.route, vals,
                  precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    new_pos = pos + block
    new_pos = jnp.where(
        (voices.loop_on > 0.5) & (new_pos >= voices.loop_end),
        voices.loop_start + (new_pos - voices.loop_start)
        % span,
        new_pos)
    return DeviceMixState(pos=new_pos), out
