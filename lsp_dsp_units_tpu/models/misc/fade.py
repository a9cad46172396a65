"""Linear fade-in / fade-out ramps (reference: src/main/misc/fade.cpp)."""

from __future__ import annotations

import jax.numpy as jnp


def fade_in(x, fade_len: int):
    """Linear fade over the first ``fade_len`` samples of the last axis."""
    n = x.shape[-1]
    i = jnp.arange(n, dtype=x.dtype)
    g = jnp.minimum(i / jnp.asarray(max(fade_len, 1), x.dtype), 1.0)
    if fade_len <= 0:
        return x
    return x * g


def fade_out(x, fade_len: int):
    """Linear fade over the last ``fade_len`` samples of the last axis."""
    n = x.shape[-1]
    if fade_len <= 0:
        return x
    i = jnp.arange(n, dtype=x.dtype)
    # gain = (n-1-i)/fade_len clipped to [0,1], with the final sample at 0
    g = jnp.clip((n - 1 - i) / jnp.asarray(fade_len, x.dtype), 0.0, 1.0)
    return x * g
