"""Global meter reductions over sharded signals (SURVEY.md §2.12: psum
for global meters — integrated-loudness sums, true-peak max, correlation
sums over ICI instead of the reference's single-machine accumulation).
All functions run inside shard_map with the given axis names.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def global_mean_square(x: Array, axis_names) -> Array:
    """Mean square over the full (sharded) time axis of each channel row:
    x [..., T_local] -> [...] global mean square."""
    local_sum = jnp.sum(x * x, axis=-1)
    total = jax.lax.psum(local_sum, axis_names)
    count = 1
    for a in (axis_names if isinstance(axis_names, (tuple, list))
              else (axis_names,)):
        count = count * jax.lax.axis_size(a)
    return total / (x.shape[-1] * count)


def global_true_peak(tp_local: Array, axis_names) -> Array:
    """Max-reduce per-sample true-peak values across shards."""
    return jax.lax.pmax(jnp.max(jnp.abs(tp_local), axis=-1), axis_names)


def global_correlation(a: Array, b: Array, axis_names) -> Array:
    """Normalized correlation over the full sharded signals."""
    sxy = jax.lax.psum(jnp.sum(a * b, axis=-1), axis_names)
    sxx = jax.lax.psum(jnp.sum(a * a, axis=-1), axis_names)
    syy = jax.lax.psum(jnp.sum(b * b, axis=-1), axis_names)
    den = jnp.sqrt(jnp.maximum(sxx * syy, 1e-36))
    return sxy / den


def global_loudness_blocks(block_loudness: Array, axis_name: str,
                           abs_thresh: float, rel_thresh: float,
                           valid: Array = None) -> Array:
    """Two-stage BS.1770 gated mean over time-sharded 400 ms block
    loudness values (ILUFS integrated loudness across hosts):
    block_loudness [M_local] per shard -> scalar integrated loudness.
    ``valid`` [M_local] bool masks positions that hold no block (e.g.
    the first shard's warm-up quarters before the first full block)."""
    above = block_loudness > abs_thresh
    if valid is not None:
        above = jnp.logical_and(above, valid)
    s1 = jax.lax.psum(jnp.sum(jnp.where(above, block_loudness, 0.0)),
                      axis_name)
    n1 = jax.lax.psum(jnp.sum(above.astype(jnp.float32)), axis_name)
    l1 = jnp.where(n1 > 0, s1 / jnp.maximum(n1, 1.0), 0.0)
    gate = jnp.maximum(l1 * rel_thresh, abs_thresh)
    above2 = block_loudness > gate
    if valid is not None:
        above2 = jnp.logical_and(above2, valid)
    s2 = jax.lax.psum(jnp.sum(jnp.where(above2, block_loudness, 0.0)),
                      axis_name)
    n2 = jax.lax.psum(jnp.sum(above2.astype(jnp.float32)), axis_name)
    return jnp.where(n2 > 0, s2 / jnp.maximum(n2, 1.0), 0.0)


def ilufs_integrated_time_sharded(meter, fparams, x_local: Array,
                                  axis_name: str) -> Array:
    """Integrated BS.1770-5 loudness of a TIME-SHARDED signal — the
    §2.12 "psum for global meters" path for ILUFS (reference ring:
    ILUFSMeter.cpp:411-453).  Runs inside shard_map:

    1. K-weighting IIR exactly across the shard boundaries (the fused
       summary-exchange kernel, parallel.fused_iir);
    2. local 100 ms quarter square-sums; the 3 quarters preceding each
       shard arrive by ppermute halo so the 75%-overlapped 400 ms
       gating blocks straddling boundaries are formed exactly;
    3. two-stage gated mean over ALL shards' block loudness values via
       psum (global_loudness_blocks).

    ``meter`` is the (host-side) ILUFSMeter carrying sizes/weights;
    ``fparams`` its weighting cascade precomputed with
    ops.biquad_block.precompute_fused(coeffs, block=meter.blk_size).
    x_local: [C, T_local], T_local a multiple of meter.blk_size.
    Returns the replicated integrated loudness (power domain, the same
    value as the sequential meter's state.loudness after the full
    signal).
    """
    from lsp_dsp_units_tpu.models.meters.loudness import (
        GATING_ABS_THRESH, GATING_REL_THRESH)
    from lsp_dsp_units_tpu.ops import biquad_block
    from lsp_dsp_units_tpu.parallel.fused_iir import (
        fused_cascade_time_sharded)

    c = x_local.shape[0]
    t_loc = x_local.shape[-1]
    assert t_loc % meter.blk_size == 0
    m = t_loc // meter.blk_size
    assert m >= 3, "each shard must hold at least 3 gating quarters"

    # 1. exact sharded weighting filter
    if fparams is not None:
        st0 = biquad_block.init_state(meter._coeffs.shape[0], (c,))
        y, _ = fused_cascade_time_sharded(fparams, st0, x_local,
                                          axis_name)
    else:
        y = x_local

    # 2. channel-weighted quarter loudness contributions [m]
    sq = (y * y).reshape(c, m, meter.blk_size)
    q = jnp.einsum("c,cm->m", meter.weights, jnp.sum(sq, axis=-1),
                   precision=jax.lax.Precision.HIGH) * meter.avg_coeff

    # halo: last 3 quarters of the LEFT neighbour
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    halo = jax.lax.ppermute(q[-3:], axis_name, perm)
    halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
    qh = jnp.concatenate([halo, q], 0)           # [m + 3]

    # sliding 400 ms block sums ending at each local quarter
    blocks = qh[3:] + qh[2:-1] + qh[1:-2] + qh[:-3]      # [m]
    gidx = idx * m + jnp.arange(m)
    valid = gidx >= 3                  # first full block needs 4 quarters

    # 3. global two-stage gate
    return global_loudness_blocks(blocks, axis_name, GATING_ABS_THRESH,
                                  GATING_REL_THRESH, valid=valid)
