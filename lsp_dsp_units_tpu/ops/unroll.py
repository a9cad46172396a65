"""Chunked scan unrolling — shared harness for the sequential kernels.

Per-step dispatch overhead dominates short scan bodies on TPU, so the
sequential paths (envelope followers, seq biquad cascades) fuse
``unroll`` recurrence iterations into each ``lax.scan`` step: same math,
unrolled in the trace.  This is the one shared implementation of the
reshape/loop/stack scaffolding those kernels use.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp


def unrolled_scan(step: Callable[[Any, Any], Tuple[Any, Any]], init: Any,
                  xs: Any, t: int, unroll: int) -> Tuple[Any, Any]:
    """``lax.scan(step, init, xs)`` with ``unroll`` iterations fused per
    scan step.

    ``xs``: pytree of arrays with leading time axis of length ``t``;
    ``step`` maps ``(state, xs_slice) -> (state, y)``.  Returns
    ``(state, ys)`` with ``ys`` stacked on a leading time axis, exactly
    like a plain scan.  Falls back to unroll=1 when ``t`` is not a
    multiple of ``unroll``.
    """
    u = unroll if (unroll > 1 and t % unroll == 0) else 1
    if u == 1:
        return jax.lax.scan(step, init, xs)

    xc = jax.tree_util.tree_map(
        lambda a: a.reshape((t // u, u) + a.shape[1:]), xs)

    def chunk(s, xu):
        outs = []
        for i in range(u):
            s, y = step(s, jax.tree_util.tree_map(lambda a: a[i], xu))
            outs.append(y)
        # tree-stack so steps may emit pytrees (e.g. (env, curve))
        return s, jax.tree_util.tree_map(
            lambda *ys: jnp.stack(ys, 0), *outs)

    state, ys = jax.lax.scan(chunk, init, xc)     # ys: [T/u, u, ...]
    return state, jax.tree_util.tree_map(
        lambda a: a.reshape((t,) + a.shape[2:]), ys)


__all__ = ["unrolled_scan"]
