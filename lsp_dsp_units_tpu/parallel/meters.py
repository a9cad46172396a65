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
                           abs_thresh: float, rel_thresh: float) -> Array:
    """Two-stage BS.1770 gated mean over time-sharded 400 ms block
    loudness values (ILUFS integrated loudness across hosts):
    block_loudness [M_local] per shard -> scalar integrated loudness."""
    above = block_loudness > abs_thresh
    s1 = jax.lax.psum(jnp.sum(jnp.where(above, block_loudness, 0.0)),
                      axis_name)
    n1 = jax.lax.psum(jnp.sum(above.astype(jnp.float32)), axis_name)
    l1 = jnp.where(n1 > 0, s1 / jnp.maximum(n1, 1.0), 0.0)
    gate = jnp.maximum(l1 * rel_thresh, abs_thresh)
    above2 = block_loudness > gate
    s2 = jax.lax.psum(jnp.sum(jnp.where(above2, block_loudness, 0.0)),
                      axis_name)
    n2 = jax.lax.psum(jnp.sum(above2.astype(jnp.float32)), axis_name)
    return jnp.where(n2 > 0, s2 / jnp.maximum(n2, 1.0), 0.0)
