"""Batched dynamic-slice from HBM: per-row DMA + in-kernel rolls.

``batched_slice(bank, starts, size)`` returns ``out[v] =
bank[starts[v] : starts[v] + size]`` for a batch of ARBITRARY sample
offsets.  The XLA lowering of this access pattern is a flat gather
that runs at element rate on TPU (measured: the 1024-voice sampler
mixdown gathered ~131 M voice-samples/s, barely above the HOST
player).  Here each voice costs one contiguous DMA plus two dynamic
rotates:

  1. the bank lives as [N/128, 128] rows; one async DMA fetches the
     8-row-aligned window covering the slice (tile rule: dynamic
     dim-0 offsets must be divisible by the f32 sublane tile — a
     plain 1D ``bank[pl.ds(start, size)]`` fails Mosaic's
     "tile index divisible by the tiling (1024)" check);
  2. ``pltpu.roll`` rotates the window by the residual row offset
     (sublanes) and lane offset — both shifts are traced scalars.

Used by models/sampling/device_mix.py (the polyphonic sampler reads
one contiguous window per voice per block — reference
SamplePlayer.cpp:305-366); generic for any "many dynamic windows over
one big buffer" access.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

_V_TILE = 8
_LANE = 128
_ALIGN = 1024            # 8 sublanes x 128 lanes (f32 tile)


def _kernel(starts_ref, bank_ref, out_ref, scratch, sems,
            *, v_t, tr):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    copies = []
    for v in range(v_t):
        s = starts_ref[i * v_t + v]
        rq = (s // _ALIGN) * 8
        dma = pltpu.make_async_copy(
            bank_ref.at[pl.ds(rq, tr + 8)],
            scratch.at[v],
            sems.at[v])
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()
    for v in range(v_t):
        s = starts_ref[i * v_t + v]
        l = s % _ALIGN
        r8 = l // _LANE
        c = l % _LANE
        w = scratch[v]                              # [tr + 8, 128]
        # residual row shift: rotate rows so row r8 lands on row 0
        # (the circular wrap only touches rows beyond the tr + 1 we
        # keep, since r8 <= 7)
        wr = pltpu.roll(w, (tr + 8) - r8, axis=0)
        # rows i and i+1 side by side; the +1 shift is ANOTHER roll —
        # Mosaic refuses to concat operands with mismatched sublane
        # offsets ("result/input offset mismatch on non-concat dim")
        wr1 = pltpu.roll(wr, tr + 7, axis=0)        # wr1[i] = wr[i+1]
        pair = jnp.concatenate([wr[:tr, :], wr1[:tr, :]], axis=-1)
        # residual lane shift: out[c'] = pair[c' + c]
        rolled = pltpu.roll(pair, 2 * _LANE - c, axis=1)
        out_ref[v] = rolled[:, :_LANE]


def batched_slice(bank: Array, starts: Array, size: int,
                  interpret=None) -> Array:
    """out[v, :] = bank[starts[v] : starts[v] + size].

    ``bank``: [N] float32, N a multiple of 128 with at least
    ``size + 1024`` slack after the largest start (pad with zeros —
    device_mix.build_bank_padded does).  ``starts``: [V] int32 >= 0,
    arbitrary alignment.  ``size`` must be a multiple of 128."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert size % _LANE == 0
    n = bank.shape[0]
    assert n % _LANE == 0
    assert n >= size + _ALIGN, (
        f"bank must carry at least size + {_ALIGN} tail slack "
        f"(n={n}, size={size}); pad it (device_mix.build_bank_padded)")
    # clamp so a bad start can at worst read in-bank garbage, never
    # DMA out of bounds (the aligned window spans size + 1024 samples)
    starts = jnp.clip(jnp.asarray(starts, jnp.int32), 0,
                      n - size - _ALIGN)
    v0 = starts.shape[0]
    # pad the batch to the voice tile (a v_t = V fallback would give
    # one grid step with a [V, tr + 8, 128] scratch — VMEM blowup for
    # large odd V); padded rows fetch offset 0 and are sliced off
    rem = (-v0) % _V_TILE
    if rem:
        starts = jnp.concatenate(
            [jnp.asarray(starts, jnp.int32),
             jnp.zeros(rem, jnp.int32)])
    v = v0 + rem
    v_t = _V_TILE
    tr = size // _LANE
    bank2 = bank.reshape(n // _LANE, _LANE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(v // v_t,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((v_t, tr, _LANE),
                               lambda i, s: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((v_t, tr + 8, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((v_t,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, v_t=v_t, tr=tr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, tr, _LANE), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(starts, jnp.int32), bank2)
    # materialize before consumers: XLA fusing across the pallas_call
    # boundary degenerates (CLAUDE.md producer-fusion rule)
    out = jax.lax.optimization_barrier(out)
    return out.reshape(v, size)[:v0]
