"""Exact IIR biquad cascades over a TIME-SHARDED axis.

This is the TPU answer to the reference's fundamentally-sequential biquad
recurrence (SURVEY.md §7 hard part #1): each device computes the prefix
affine maps of its local block (ops.biquad.stage_prefix); the per-device
summary — the 2x2 end-of-block matrix product and zero-state response, 6
floats per stage — is all_gathered along the time axis; every device then
composes its true incoming state and finishes locally.  Communication per
stage is O(n_devices * 6) floats, independent of block length.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from lsp_dsp_units_tpu.ops import biquad as biquad_ops

Array = jax.Array


def _stage_sharded(x: Array, b0, b1, b2, a1, a2, s_global: Array,
                   axis_name: str) -> Tuple[Array, Array]:
    """One stage over a time-sharded last axis.

    ``s_global``: [..., 2] — the stream state entering THE FIRST shard.
    Returns (y_local, s_out_global) where s_out_global is the state after
    the LAST shard (identical on all devices).
    """
    A_scan, v_scan = biquad_ops.stage_prefix(x, b0, b1, b2, a1, a2)
    # local block summary: s_out = A_loc @ s_in + v_loc
    A_loc = jnp.stack([A_scan[0][..., -1], A_scan[1][..., -1],
                       A_scan[2][..., -1], A_scan[3][..., -1]], axis=-1)
    v_loc = jnp.stack([v_scan[0][..., -1], v_scan[1][..., -1]], axis=-1)

    # gather summaries from every time shard: [n, ..., 4] / [n, ..., 2]
    A_all = jax.lax.all_gather(A_loc, axis_name)
    v_all = jax.lax.all_gather(v_loc, axis_name)
    n = A_all.shape[0]
    idx = jax.lax.axis_index(axis_name)

    # compose predecessors serially (n is the device count — tiny)
    def compose(i, sv):
        a00, a01, a10, a11 = (A_all[i, ..., 0], A_all[i, ..., 1],
                              A_all[i, ..., 2], A_all[i, ..., 3])
        s0 = a00 * sv[..., 0] + a01 * sv[..., 1] + v_all[i, ..., 0]
        s1 = a10 * sv[..., 0] + a11 * sv[..., 1] + v_all[i, ..., 1]
        return jnp.stack([s0, s1], axis=-1)

    def body(i, carry):
        s_in, s_fin = carry
        nxt = compose(i, s_fin)
        s_in = jnp.where(i == idx, s_fin, s_in)
        return (s_in, nxt)

    # the carry becomes 'varying' over the time axis inside shard_map;
    # mark the (replicated) initial value accordingly
    s0 = jax.lax.pcast(s_global, axis_name, to="varying")
    s_in, s_final = jax.lax.fori_loop(0, n, body, (s0, s0))
    # s_final is mathematically identical on every shard (same gathered
    # summaries, same serial composition), but the vma type system can't
    # prove it; a masked psum makes it provably replicated so it can leave
    # shard_map with spec P() — 6 floats per stage, negligible
    s_final = jax.lax.psum(
        jnp.where(idx == n - 1, s_final, jnp.zeros_like(s_final)),
        axis_name)

    y, _ = biquad_ops.stage_apply(x, b0, A_scan, v_scan, s_in)
    return y, s_final


def biquad_cascade_time_sharded(coeffs: Array, state: Array, x: Array,
                                axis_name: str) -> Tuple[Array, Array]:
    """Serial biquad cascade over a time-sharded signal (exact).

    Args:
      coeffs: [K, 5] or [..., K, 5] (replicated across time shards).
      state:  [..., K, 2] global stream state entering the first shard
              (replicated).
      x:      [..., T_local] this device's time shard.
      axis_name: time mesh axis (inside shard_map).

    Returns (y_local, state') with state' the stream state after the last
    shard — bitwise identical on every device, ready to carry into the
    next super-block.
    """
    k = coeffs.shape[-2]
    y = x
    new_states = []
    for i in range(k):
        c = coeffs[..., i, :]
        if c.ndim == 1:
            b0, b1, b2, a1, a2 = (c[0], c[1], c[2], c[3], c[4])
        else:
            b0, b1, b2, a1, a2 = (c[..., 0:1], c[..., 1:2], c[..., 2:3],
                                  c[..., 3:4], c[..., 4:5])
        y, s = _stage_sharded(y, b0, b1, b2, a1, a2, state[..., i, :],
                              axis_name)
        new_states.append(s)
    return y, jnp.stack(new_states, axis=-2)
