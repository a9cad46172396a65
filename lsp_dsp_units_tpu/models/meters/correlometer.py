"""Correlometer — normalized sliding correlation of two signals
(reference: src/main/meters/Correlometer.cpp).

``corr[n] = sum(xy) / sqrt(sum(x^2) * sum(y^2))`` over the trailing
window.  The reference updates the three sums incrementally with a
periodic full recompute to cancel float drift
(Correlometer.cpp:134-180); here each call recomputes via cumsum
differences, which bounds drift per call by construction.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lsp_dsp_units_tpu.ops.sliding import sliding_sum

Array = jax.Array


class CorrelometerState(NamedTuple):
    win_a: Array    # [..., N]
    win_b: Array    # [..., N]


# shared cumsum-difference kernel (ops.sliding)
_sliding_sum = sliding_sum


class Correlometer:
    def __init__(self, window: int):
        self.window = int(window)

    def init_state(self, batch_shape: Tuple[int, ...] = (),
                   ) -> CorrelometerState:
        n = self.window
        return CorrelometerState(
            win_a=jnp.zeros(batch_shape + (n,), jnp.float32),
            win_b=jnp.zeros(batch_shape + (n,), jnp.float32))

    def process(self, state: CorrelometerState, a: Array, b: Array,
                ) -> Tuple[CorrelometerState, Array]:
        n = self.window
        t = a.shape[-1]
        fa = jnp.concatenate([state.win_a, a], axis=-1)
        fb = jnp.concatenate([state.win_b, b], axis=-1)
        s_xy = _sliding_sum(fa * fb, n, t)
        s_xx = _sliding_sum(fa * fa, n, t)
        s_yy = _sliding_sum(fb * fb, n, t)
        den = jnp.sqrt(jnp.maximum(s_xx * s_yy, 0.0))
        corr = jnp.where(den > 1e-18, s_xy / jnp.maximum(den, 1e-18), 0.0)
        return CorrelometerState(win_a=fa[..., -n:], win_b=fb[..., -n:]), \
            corr
