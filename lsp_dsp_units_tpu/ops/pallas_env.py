"""Pallas TPU kernel for the peak-hold envelope follower.

The envelope recurrence (reference Compressor.cpp:231-256) is the one
truly sequential per-sample loop on the hot path.  As a ``lax.scan`` it
pays XLA per-step dispatch; as a single Pallas kernel the whole T-loop
runs inside one Mosaic program with the state resident in registers/VMEM
and channels vectorized across lanes.

Layout: x is processed as [T, C_pad] (time on sublanes, channels on
lanes, C padded to 128); parameters arrive via SMEM so knob changes do
not recompile the kernel.

When T is a multiple of 8 the loop runs U=8 time-steps per iteration:
one (8, 128) tile-aligned VMEM load/store per iteration instead of 8
single-sublane row accesses, and 1/8th the loop-bookkeeping — the
arithmetic per step (and therefore the result, bit for bit) is
unchanged, only the access pattern is.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_LANES = 128
_UNROLL = 8
_TILE_T = 8192     # time-tile rows per grid step (4 MB at 128 lanes)


def _env_step(xt, e, peak, hold, ta, tr, rt, nh, use_rt):
    """One envelope step (reference Compressor.cpp:231-256 recurrence)."""
    d = xt - e
    falling = d < 0.0
    holding = hold > 0.0
    tau_dn = jnp.where(use_rt > 0.5,
                       jnp.where(e > rt, tr, ta), tr)
    e_fall = e + tau_dn * d
    e_rise = e + ta * d
    new_e = jnp.where(falling, jnp.where(holding, e, e_fall), e_rise)
    rise_peaked = jnp.logical_and(~falling, e_rise >= peak)
    new_peak = jnp.where(falling, jnp.where(holding, peak, e_fall),
                         jnp.where(rise_peaked, e_rise, peak))
    new_hold = jnp.where(falling,
                         jnp.where(holding, hold - 1.0, hold),
                         jnp.where(rise_peaked, nh, hold))
    return new_e, new_peak, new_hold


def _kernel(params_ref, x_ref, s_ref, env_ref, sout_ref, carry_ref,
            *, unroll):
    """Grid-tiled over time: each grid step processes one x/env tile;
    the envelope state rides a VMEM scratch carry across the
    (sequentially executed) grid steps, so arbitrarily long T streams
    through a fixed VMEM footprint."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        carry_ref[...] = s_ref[...]

    ta = params_ref[0, 0]
    tr = params_ref[0, 1]
    rt = params_ref[0, 2]
    nh = params_ref[0, 3]
    use_rt = params_ref[0, 4]
    t_total = x_ref.shape[0]

    if unroll == 1:
        def body(t, carry):
            e, peak, hold = carry
            e, peak, hold = _env_step(x_ref[t, :], e, peak, hold,
                                      ta, tr, rt, nh, use_rt)
            env_ref[t, :] = e
            return e, peak, hold

        init = (carry_ref[0, :], carry_ref[1, :], carry_ref[2, :])
        e, p, h = jax.lax.fori_loop(0, t_total, body, init)
        carry_ref[0, :] = e
        carry_ref[1, :] = p
        carry_ref[2, :] = h
    else:
        # all values stay 2D [1, lanes] — Mosaic's vector layout
        # inference rejects mixed 1D/2D elementwise chains
        def body(k, carry):
            e, peak, hold = carry
            xt8 = x_ref[pl.ds(k * unroll, unroll), :]
            rows = []
            for j in range(unroll):
                e, peak, hold = _env_step(xt8[j:j + 1, :], e, peak,
                                          hold, ta, tr, rt, nh, use_rt)
                rows.append(e)
            env_ref[pl.ds(k * unroll, unroll), :] = jnp.concatenate(
                rows, axis=0)
            return e, peak, hold

        init = (carry_ref[0:1, :], carry_ref[1:2, :], carry_ref[2:3, :])
        e, p, h = jax.lax.fori_loop(0, t_total // unroll, body, init)
        carry_ref[0:1, :] = e
        carry_ref[1:2, :] = p
        carry_ref[2:3, :] = h

    @pl.when(i == pl.num_programs(0) - 1)
    def _finish():
        sout_ref[...] = carry_ref[...]


def _gate_step(xt, e, peak, hold, cur, ta, tr, nh, k0_end, k1_start):
    """One gate envelope + hysteresis step (reference Gate.cpp:267-367;
    see models/dynamics/gate.py): the _env_step recurrence with no
    release threshold (use_rt=0 -> tau_dn=tr), plus the curve switch."""
    new_e, new_peak, new_hold = _env_step(
        xt, e, peak, hold, ta, tr, jnp.float32(0.0), nh,
        jnp.float32(0.0))
    switch_up = jnp.logical_and(cur < 0.5, new_e > k0_end)
    switch_dn = jnp.logical_and(cur > 0.5, new_e < k1_start)
    new_cur = jnp.where(switch_up, 1.0,
                        jnp.where(switch_dn, 0.0, cur))
    return new_e, new_peak, new_hold, new_cur


def _gate_kernel(params_ref, x_ref, s_ref, env_ref, cur_ref, sout_ref,
                 *, unroll):
    from jax.experimental import pallas as pl

    ta = params_ref[0, 0]
    tr = params_ref[0, 1]
    nh = params_ref[0, 2]
    k0_end = params_ref[0, 3]
    k1_start = params_ref[0, 4]
    t_total = x_ref.shape[0]

    if unroll == 1:
        def body(t, carry):
            e, peak, hold, cur = carry
            e, peak, hold, cur = _gate_step(
                x_ref[t, :], e, peak, hold, cur, ta, tr, nh, k0_end,
                k1_start)
            env_ref[t, :] = e
            cur_ref[t, :] = cur
            return e, peak, hold, cur

        init = (s_ref[0, :], s_ref[1, :], s_ref[2, :], s_ref[3, :])
        e, p, h, c = jax.lax.fori_loop(0, t_total, body, init)
        sout_ref[0, :] = e
        sout_ref[1, :] = p
        sout_ref[2, :] = h
        sout_ref[3, :] = c
    else:
        # 2D [1, lanes] values throughout (see _kernel)
        def body(k, carry):
            e, peak, hold, cur = carry
            xt8 = x_ref[pl.ds(k * unroll, unroll), :]
            e_rows, c_rows = [], []
            for j in range(unroll):
                e, peak, hold, cur = _gate_step(
                    xt8[j:j + 1, :], e, peak, hold, cur, ta, tr, nh,
                    k0_end, k1_start)
                e_rows.append(e)
                c_rows.append(cur)
            env_ref[pl.ds(k * unroll, unroll), :] = jnp.concatenate(
                e_rows, axis=0)
            cur_ref[pl.ds(k * unroll, unroll), :] = jnp.concatenate(
                c_rows, axis=0)
            return e, peak, hold, cur

        init = (s_ref[0:1, :], s_ref[1:2, :], s_ref[2:3, :],
                s_ref[3:4, :])
        e, p, h, c = jax.lax.fori_loop(0, t_total // unroll, body, init)
        sout_ref[0:1, :] = e
        sout_ref[1:2, :] = p
        sout_ref[2:3, :] = h
        sout_ref[3:4, :] = c


def gate_envelope_pallas(env_state, curve, x: Array, tau_attack,
                         tau_release, hold_samples, k0_end, k1_start,
                         interpret: bool = False):
    """Gate envelope + active-curve track on 2D [C, T] inputs.

    Returns (EnvState', curve' [C] int32, env [C, T], curves [C, T]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from lsp_dsp_units_tpu.ops.dynamics import EnvState

    c, t = x.shape
    c_pad = -(-c // _LANES) * _LANES
    xt = jnp.zeros((t, c_pad), jnp.float32)
    xt = jax.lax.dynamic_update_slice(xt, x.T.astype(jnp.float32), (0, 0))
    s = jnp.zeros((4, c_pad), jnp.float32)
    s = s.at[0, :c].set(env_state.envelope)
    s = s.at[1, :c].set(env_state.peak)
    s = s.at[2, :c].set(env_state.hold.astype(jnp.float32))
    s = s.at[3, :c].set(curve.astype(jnp.float32))
    zero = jnp.float32(0.0)
    params = jnp.stack([
        jnp.asarray(tau_attack, jnp.float32),
        jnp.asarray(tau_release, jnp.float32),
        jnp.asarray(hold_samples, jnp.float32),
        jnp.asarray(k0_end, jnp.float32),
        jnp.asarray(k1_start, jnp.float32),
        zero, zero, zero]).reshape(1, 8)

    unroll = _UNROLL if t % _UNROLL == 0 else 1
    env_t, cur_t, s_out = pl.pallas_call(
        functools.partial(_gate_kernel, unroll=unroll),
        out_shape=(jax.ShapeDtypeStruct((t, c_pad), jnp.float32),
                   jax.ShapeDtypeStruct((t, c_pad), jnp.float32),
                   jax.ShapeDtypeStruct((4, c_pad), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(params, xt, s)

    new_state = EnvState(
        envelope=s_out[0, :c], peak=s_out[1, :c],
        hold=s_out[2, :c].astype(jnp.int32))
    new_curve = (s_out[3, :c] > 0.5).astype(jnp.int32)
    curves = (cur_t[:, :c].T > 0.5).astype(jnp.int32)
    return new_state, new_curve, env_t[:, :c].T, curves


def _rms_kernel(params_ref, x_ref, win_ref, lvl_ref, wout_ref,
                *, n_win, unroll):
    """Sliding-RMS detector in one VMEM pass.

    Pass A (serial rows, ``unroll`` per iteration): rolling sum
    ``rsum += sq[t] - sq[t - N]`` with the subtrahend read from the
    carried window for t < N and recomputed from x for t >= N; the
    row's rsum lands in lvl_ref.  Pass B (vectorized): one
    ``sqrt(max(rsum, 0) / N)`` sweep over the whole tile.  The XLA
    cumsum-difference form of the same window lowers to ~log2(T)
    full-array passes (measured 0.11 ms of the chain block for ~8 us
    of traffic — NUMERICS round-4 anatomy)."""
    from jax.experimental import pallas as pl

    g = params_ref[0, 0]
    t_total = x_ref.shape[0]

    def sq_rows(rows):
        v = rows * g
        return v * v

    def accum(new8, old8, rsum):
        rows = []
        for j in range(unroll):
            rsum = rsum + (new8[j:j + 1, :] - old8[j:j + 1, :])
            rows.append(rsum)
        return rsum, jnp.concatenate(rows, axis=0)

    # two loops so every slice offset is a plain k*unroll expression
    # (clamped min/max offsets + a where-select measured ~10x slower
    # through Mosaic than monotone strides): rows t < N subtract the
    # carried window (previous block's last N squares), rows t >= N
    # subtract this block's own squares N rows back.  N % unroll == 0
    # keeps the boundary between iterations.
    def body_head(k, rsum):
        t0 = k * unroll
        new8 = sq_rows(x_ref[pl.ds(t0, unroll), :])
        old8 = win_ref[pl.ds(t0, unroll), :]
        rsum, rows = accum(new8, old8, rsum)
        lvl_ref[pl.ds(t0, unroll), :] = rows
        return rsum

    def body_tail(k, rsum):
        t0 = k * unroll
        new8 = sq_rows(x_ref[pl.ds(t0, unroll), :])
        old8 = sq_rows(x_ref[pl.ds(t0 - n_win, unroll), :])
        rsum, rows = accum(new8, old8, rsum)
        lvl_ref[pl.ds(t0, unroll), :] = rows
        return rsum

    rsum0 = jnp.sum(win_ref[...], axis=0, keepdims=True)    # [1, C]
    rsum0 = jax.lax.fori_loop(0, n_win // unroll, body_head, rsum0)
    jax.lax.fori_loop(n_win // unroll, t_total // unroll, body_tail,
                      rsum0)
    inv_n = 1.0 / n_win
    lvl_ref[...] = jnp.sqrt(jnp.maximum(lvl_ref[...] * inv_n, 0.0))
    wout_ref[...] = sq_rows(x_ref[pl.ds(t_total - n_win, n_win), :])


def sliding_rms_pallas(window: Array, x: Array, n_win: int, gain,
                       interpret: bool = False):
    """Sliding-window RMS level detector on 2D [C, T] inputs
    (reference Sidechain.cpp:520-556 RMS mode).

    ``window``: [C, N] carried squared-detector history.  Returns
    (window' [C, N], level [C, T]).  Requires T >= N and
    T % 8 == N % 8 == 0 (callers fall back to the cumsum form
    otherwise — models/util/sidechain.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, t = x.shape
    n = int(n_win)
    assert t >= n and t % _UNROLL == 0 and n % _UNROLL == 0
    c_pad = -(-c // _LANES) * _LANES
    xt = jnp.zeros((t, c_pad), jnp.float32)
    xt = jax.lax.dynamic_update_slice(
        xt, jnp.abs(x).T.astype(jnp.float32), (0, 0))
    wt = jnp.zeros((n, c_pad), jnp.float32)
    wt = jax.lax.dynamic_update_slice(
        wt, window.T.astype(jnp.float32), (0, 0))
    params = jnp.reshape(jnp.asarray(
        [jnp.asarray(gain, jnp.float32)] + [jnp.float32(0.0)] * 7,
        jnp.float32), (1, 8))

    lvl, wout = pl.pallas_call(
        functools.partial(_rms_kernel, n_win=n, unroll=_UNROLL),
        out_shape=(jax.ShapeDtypeStruct((t, c_pad), jnp.float32),
                   jax.ShapeDtypeStruct((n, c_pad), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(params, xt, wt)
    return wout[:, :c].T, lvl[:, :c].T


def peak_envelope_pallas(env_state, x: Array, tau_attack, tau_release,
                         hold_samples, release_thresh=None,
                         interpret: bool = False):
    """Drop-in for ops.dynamics.peak_envelope on 2D [C, T] inputs.

    Returns (EnvState', env [C, T]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from lsp_dsp_units_tpu.ops.dynamics import EnvState

    c, t = x.shape
    c_pad = -(-c // _LANES) * _LANES
    xt = jnp.zeros((t, c_pad), jnp.float32)
    xt = jax.lax.dynamic_update_slice(xt, x.T.astype(jnp.float32), (0, 0))
    s = jnp.zeros((4, c_pad), jnp.float32)
    s = s.at[0, :c].set(env_state.envelope)
    s = s.at[1, :c].set(env_state.peak)
    s = s.at[2, :c].set(env_state.hold.astype(jnp.float32))
    zero = jnp.float32(0.0)
    params = jnp.stack([
        jnp.asarray(tau_attack, jnp.float32),
        jnp.asarray(tau_release, jnp.float32),
        zero if release_thresh is None
        else jnp.asarray(release_thresh, jnp.float32),
        jnp.asarray(hold_samples, jnp.float32),
        jnp.float32(0.0 if release_thresh is None else 1.0),
        zero, zero, zero]).reshape(1, 8)

    unroll = _UNROLL if t % _UNROLL == 0 else 1
    # time-tiled grid: bulk super-blocks (T = K * 8192) stream through
    # a fixed VMEM footprint instead of holding [T, C_pad] resident
    tile = _TILE_T if (t % _TILE_T == 0 and t > _TILE_T) else t
    grid = t // tile
    env_t, s_out = pl.pallas_call(
        functools.partial(_kernel, unroll=unroll),
        grid=(grid,),
        out_shape=(jax.ShapeDtypeStruct((t, c_pad), jnp.float32),
                   jax.ShapeDtypeStruct((4, c_pad), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((tile, c_pad), lambda i: (i, 0)),
                  pl.BlockSpec((4, c_pad), lambda i: (0, 0))],
        out_specs=(pl.BlockSpec((tile, c_pad), lambda i: (i, 0)),
                   pl.BlockSpec((4, c_pad), lambda i: (0, 0))),
        scratch_shapes=[pltpu.VMEM((4, c_pad), jnp.float32)],
        interpret=interpret,
    )(params, xt, s)

    new_state = EnvState(
        envelope=s_out[0, :c], peak=s_out[1, :c],
        hold=s_out[2, :c].astype(jnp.int32))
    return new_state, env_t[:, :c].T


def _accum_skip(new8, old8, rsum, unroll):
    """Skip-prefix rolling-sum tile: the sequential form chains 2
    dependent VPU ops per SAMPLE; here the per-tile diffs and their
    in-tile prefix (Hillis-Steele over the unroll rows, log2(U)
    vectorized passes) sit OFF the serial chain, leaving ONE dependent
    broadcast-add per U samples — an ~8x shorter recurrence.  The
    summation association differs from the sequential form (rsum +
    in-tile prefix vs row-by-row accumulation), changing ulps only."""
    d8 = new8 - old8
    p = d8
    sh = 1
    while sh < unroll:
        z = jnp.zeros_like(p[:sh, :])
        p = p + jnp.concatenate([z, p[:-sh, :]], axis=0)
        sh *= 2
    rows = rsum + p
    return rows[unroll - 1:unroll, :], rows


def _chain_dyn_kernel(params_ref, x_ref, win_ref, s_ref,
                      yout_ref, wout_ref, sout_ref, *, n_win, unroll,
                      skip_prefix=True):
    """Fused sidechain sliding-RMS -> compressor envelope -> two-knee
    gain -> apply, one VMEM pass (reference Sidechain.cpp:455-460 RMS +
    Compressor.cpp:231-256 envelope + :297-310 gain).  The rolling sum
    and the envelope recurrence are BOTH serial in t and share one
    loop; the knee gain (pure elementwise transcendentals, not in the
    dependency chain) is evaluated per ``unroll`` row group.

    params row [1, 32]: [g_sc, ta, tr, rt, nh, use_rt,
    knee0(start end gain tilt0 tilt1 herm0 herm1 herm2), knee1(...)].
    x_ref holds the RAW signal [T, C]; output rows are x * gain."""
    from jax.experimental import pallas as pl

    g = params_ref[0, 0]
    ta = params_ref[0, 1]
    tr = params_ref[0, 2]
    rt = params_ref[0, 3]
    nh = params_ref[0, 4]
    use_rt = params_ref[0, 5]
    t_total = x_ref.shape[0]
    inv_n = 1.0 / n_win

    def knee_gain(ax, lx, o):
        st = params_ref[0, o]
        en = params_ref[0, o + 1]
        gn = params_ref[0, o + 2]
        line = jnp.exp(lx * params_ref[0, o + 3] + params_ref[0, o + 4])
        herm = jnp.exp((params_ref[0, o + 5] * lx
                        + params_ref[0, o + 6]) * lx
                       + params_ref[0, o + 7])
        return jnp.where(ax <= st, gn, jnp.where(ax >= en, line, herm))

    def gain_rows(env8):
        ax = jnp.abs(env8)
        lx = jnp.log(jnp.maximum(ax, 1e-36))
        return knee_gain(ax, lx, 6) * knee_gain(ax, lx, 14)

    def sq_rows(rows):
        v = jnp.abs(rows) * g
        return v * v

    # PASS 1 — rolling sum of squares, written into yout_ref (scratch
    # until pass 3 overwrites it row-by-row).  Keeping the sqrt and
    # the envelope OUT of this chain matters: a single fused
    # per-sample chain (rsum -> sqrt -> envelope) measured ~20 us
    # SLOWER than the sum of the separate chains — the sqrt serializes
    # into the recurrence.  skip_prefix shortens the chain to one
    # dependent add per unroll tile (_accum_skip).
    if skip_prefix:
        def accum(new8, old8, rsum):
            return _accum_skip(new8, old8, rsum, unroll)
    else:
        def accum(new8, old8, rsum):
            rows = []
            for j in range(unroll):
                rsum = rsum + (new8[j:j + 1, :] - old8[j:j + 1, :])
                rows.append(rsum)
            return rsum, jnp.concatenate(rows, axis=0)

    def body_head(k, rsum):
        t0 = k * unroll
        new8 = sq_rows(x_ref[pl.ds(t0, unroll), :])
        old8 = win_ref[pl.ds(t0, unroll), :]
        rsum, rows = accum(new8, old8, rsum)
        yout_ref[pl.ds(t0, unroll), :] = rows
        return rsum

    def body_tail(k, rsum):
        t0 = k * unroll
        new8 = sq_rows(x_ref[pl.ds(t0, unroll), :])
        old8 = sq_rows(x_ref[pl.ds(t0 - n_win, unroll), :])
        rsum, rows = accum(new8, old8, rsum)
        yout_ref[pl.ds(t0, unroll), :] = rows
        return rsum

    rsum0 = jnp.sum(win_ref[...], axis=0, keepdims=True)
    rsum0 = jax.lax.fori_loop(0, n_win // unroll, body_head, rsum0)
    jax.lax.fori_loop(n_win // unroll, t_total // unroll, body_tail,
                      rsum0)

    # PASS 2 — vectorized level sweep over the whole tile
    yout_ref[...] = jnp.sqrt(jnp.maximum(yout_ref[...] * inv_n, 0.0))

    # PASS 3 — envelope recurrence (the ~8-op serial chain) reading
    # levels from yout_ref, then per-group knee gain applied to x;
    # each row group is read before it is overwritten
    def body_env(k, carry):
        e, peak, hold = carry
        t0 = k * unroll
        lvl8 = yout_ref[pl.ds(t0, unroll), :]
        x8 = x_ref[pl.ds(t0, unroll), :]
        rows = []
        for j in range(unroll):
            e, peak, hold = _env_step(lvl8[j:j + 1, :], e, peak, hold,
                                      ta, tr, rt, nh, use_rt)
            rows.append(e)
        env8 = jnp.concatenate(rows, axis=0)
        yout_ref[pl.ds(t0, unroll), :] = x8 * gain_rows(env8)
        return e, peak, hold

    init = (s_ref[0:1, :], s_ref[1:2, :], s_ref[2:3, :])
    e, pk, hd = jax.lax.fori_loop(0, t_total // unroll, body_env, init)
    sout_ref[0:1, :] = e
    sout_ref[1:2, :] = pk
    sout_ref[2:3, :] = hd
    wout_ref[...] = sq_rows(x_ref[pl.ds(t_total - n_win, n_win), :])


# (an in-kernel-transpose [C,T]-native variant of the fused
# dynamics kernel was built and measured SLOWER on-chip — 155 vs
# 134-140 us: Mosaic's [8192, 64] VMEM transpose lowers worse than
# XLA's HBM transpose — and was removed; NUMERICS.md round 5)


def chain_dyn_pallas(window: Array, env_state, x: Array, n_win: int,
                     sc_gain, tau_attack, tau_release, release_thresh,
                     hold_samples, knees, interpret: bool = False):
    """Fused RMS sidechain + compressor envelope + gain application on
    [C, T] inputs.

    ``window``: [C, N] carried squared-detector history.  ``knees``:
    (CompKnee, CompKnee).  Returns (window', EnvState', y*gain [C, T])
    — identical math to sliding_rms_pallas -> peak_envelope ->
    compressor_x2_gain -> multiply, in one kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from lsp_dsp_units_tpu.ops.dynamics import EnvState

    c, t = x.shape
    n = int(n_win)
    assert t >= n and t % _UNROLL == 0 and n % _UNROLL == 0
    c_pad = -(-c // _LANES) * _LANES
    xt = jnp.zeros((t, c_pad), jnp.float32)
    xt = jax.lax.dynamic_update_slice(
        xt, x.T.astype(jnp.float32), (0, 0))
    wt = jnp.zeros((n, c_pad), jnp.float32)
    wt = jax.lax.dynamic_update_slice(
        wt, window.T.astype(jnp.float32), (0, 0))
    s = jnp.zeros((3, c_pad), jnp.float32)
    s = s.at[0, :c].set(env_state.envelope)
    s = s.at[1, :c].set(env_state.peak)
    s = s.at[2, :c].set(env_state.hold.astype(jnp.float32))
    k0, k1 = knees
    vals = ([jnp.asarray(sc_gain, jnp.float32),
             jnp.asarray(tau_attack, jnp.float32),
             jnp.asarray(tau_release, jnp.float32),
             jnp.asarray(release_thresh, jnp.float32),
             jnp.asarray(hold_samples, jnp.float32),
             jnp.float32(1.0)]
            + [jnp.asarray(v, jnp.float32) for v in k0]
            + [jnp.asarray(v, jnp.float32) for v in k1]
            + [jnp.float32(0.0)] * 10)
    params = jnp.stack(vals).reshape(1, 32)

    yout, wout, s_out = pl.pallas_call(
        functools.partial(_chain_dyn_kernel, n_win=n, unroll=_UNROLL),
        out_shape=(jax.ShapeDtypeStruct((t, c_pad), jnp.float32),
                   jax.ShapeDtypeStruct((n, c_pad), jnp.float32),
                   jax.ShapeDtypeStruct((3, c_pad), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(params, xt, wt, s)

    new_state = EnvState(
        envelope=s_out[0, :c], peak=s_out[1, :c],
        hold=s_out[2, :c].astype(jnp.int32))
    return wout[:, :c].T, new_state, yout[:, :c].T
