"""Time-sharded execution of the fused block cascade (exact).

The fused cascade (ops.biquad_block.FusedCascadeParams) already
decomposes each block as ``y = y_zero(x) + G s`` / ``s' = M s + W x``.
Across a time-sharded axis each device:

1. runs its local blocks from ZERO state (collecting the per-block
   zero-state outputs and the accumulated state contribution d_dev);
2. all_gathers the tiny ``d_dev`` summaries (2K floats per device) and
   composes its true incoming state serially (the device count is small);
3. corrects its local outputs in closed form:
   ``y_true[j] = y_zero[j] + G M^j s_in_dev`` — no recomputation.

Unlike parallel.time_iir (f32 associative prefix products), the
transitions here are the f64-precomputed M matrices, so the sharded path
keeps the fused kernel's ~120 dB accuracy.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import biquad_block as bb
from lsp_dsp_units_tpu.ops.cplx import rfft_sc, irfft_sc, sc_mul

# device-path contractions run at HIGH precision (bf16_3x, f32-class
# accuracy): the TPU default (1-pass bf16) rounds f32 operands to ~8
# mantissa bits — measured as a ~6 dB chain-level SNR loss — while
# HIGHEST (6-pass) doubles the MXU passes for accuracy far below the
# chain's own f32 floor (NUMERICS.md round-4 late)
_PREC = jax.lax.Precision.HIGH

Array = jax.Array


def _host_m_powers(params: bb.FusedCascadeParams, m_blocks: int):
    """(M^m, [G M^j for j<m]) precomputed on the host in float64 and
    rounded ONCE to f32 — the same discipline as the fused kernel's
    own precompute (ops/biquad_block.py): trace-time f32 matmul chains
    would compound rounding with blocks-per-shard.  Returns None when
    the params are tracers (params passed as jit arguments instead of
    closures) — callers fall back to the traced f32 chain."""
    try:
        m64 = np.asarray(params.m_mat, np.float64)
        g64 = np.asarray(params.g_mat, np.float64)
    except (jax.errors.TracerArrayConversionError, TypeError):
        return None
    k2 = m64.shape[0]
    pows = [np.eye(k2)]
    for _ in range(m_blocks):
        pows.append(m64 @ pows[-1])
    m_shard = jnp.asarray(pows[m_blocks].astype(np.float32))
    gm = np.stack([g64 @ pows[j] for j in range(m_blocks)], 0)
    return m_shard, jnp.asarray(gm.astype(np.float32))


def fused_cascade_time_sharded(params: bb.FusedCascadeParams,
                               state: Array, x: Array, axis_name: str,
                               ) -> Tuple[Array, Array]:
    """x: [..., T_local] (multiple of B) inside shard_map; ``state``
    [..., K, 2] is the GLOBAL stream state entering the first shard
    (replicated).  Returns (y_local, state_out_global)."""
    b = bb.fused_block_size(params)
    k2 = params.m_mat.shape[0]
    t_loc = x.shape[-1]
    assert t_loc % b == 0
    m_blocks = t_loc // b

    # 1. local pass from zero state, keeping per-block incoming states
    sv0 = jnp.zeros(x.shape[:-1] + (k2,), jnp.float32)
    blocks = jnp.moveaxis(x.reshape(x.shape[:-1] + (m_blocks, b)), -2, 0)
    spec = sc_mul(rfft_sc(blocks, 2 * b), (params.h_re, params.h_im))
    y_zs = irfft_sc(spec, 2 * b)[..., :b]
    wx = jnp.einsum("kb,m...b->m...k", params.w_mat, blocks,
                    precision=_PREC)

    def step(s, inp):
        zs, wxi = inp
        y_blk = zs + jnp.einsum("bk,...k->...b", params.g_mat, s,
                                precision=_PREC)
        s2 = jnp.einsum("kj,...j->...k", params.m_mat, s,
                        precision=_PREC) + wxi
        return s2, y_blk

    d_dev, y_zero = jax.lax.scan(step, sv0, (y_zs, wx))
    # d_dev = state leaving the shard from local input alone

    # 2. exchange summaries; per-device transition is M^m (same for all)
    host = _host_m_powers(params, m_blocks)
    if host is not None:
        m_shard, gm = host
    else:
        m_shard = jnp.eye(k2, dtype=jnp.float32)
        for _ in range(m_blocks):
            m_shard = params.m_mat @ m_shard
        gm = None
    d_all = jax.lax.all_gather(d_dev, axis_name)        # [n, ..., 2K]
    n = d_all.shape[0]
    idx = jax.lax.axis_index(axis_name)
    s_global = state.reshape(state.shape[:-2] + (k2,))

    def body(i, carry):
        s_in, s_fin = carry
        nxt = jnp.einsum("kj,...j->...k", m_shard, s_fin,
                         precision=_PREC) + d_all[i]
        s_in = jnp.where(i == idx, s_fin, s_in)
        return (s_in, nxt)

    s0 = jax.lax.pcast(s_global, axis_name, to="varying")
    s_in_dev, s_final = jax.lax.fori_loop(0, n, body, (s0, s0))

    # 3. closed-form correction: y[j] += G M^j s_in_dev
    if gm is None:
        mj = jnp.eye(k2, dtype=jnp.float32)
        m_pows = []
        for _ in range(m_blocks):
            m_pows.append(mj)
            mj = params.m_mat @ mj
        gm = jnp.stack([params.g_mat @ p for p in m_pows], 0)  # [m,B,2K]
    corr = jnp.einsum("mbk,...k->m...b", gm, s_in_dev,
                      precision=_PREC)
    y = jnp.moveaxis(y_zero + corr, 0, -2).reshape(x.shape)

    # make the final state provably replicated (see time_iir)
    s_final = jnp.einsum("kj,...j->...k", m_shard, s_in_dev,
                         precision=_PREC) + d_dev
    s_final = jax.lax.psum(
        jnp.where(idx == n - 1, s_final, jnp.zeros_like(s_final)),
        axis_name)
    return y.astype(x.dtype), s_final.reshape(state.shape)
