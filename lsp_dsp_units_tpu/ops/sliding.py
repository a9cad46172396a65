"""Trailing-window running sums — the batched/parallel form of the
reference's incremental sliding sums with periodic drift refresh
(Sidechain.cpp:455-460, LoudnessMeter.cpp:440-451,
Correlometer.cpp:143-157, Panometer / Depopper RMS loops).

One cumsum + difference replaces the per-sample add/subtract recurrence:
all T window sums materialize in parallel on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def sliding_sum(frame: Array, n: int, t: int) -> Array:
    """Trailing-window sums over ``frame = [n history, t new]`` (last
    axis): ``out[i] = sum(frame[i+1 .. i+n])`` for i in [0, t) — each
    output is the sum of the window ENDING at new sample i."""
    cz = jnp.concatenate(
        [jnp.zeros_like(frame[..., :1]), jnp.cumsum(frame, axis=-1)],
        axis=-1)
    return cz[..., n + 1: n + 1 + t] - cz[..., 1: 1 + t]


__all__ = ["sliding_sum"]
