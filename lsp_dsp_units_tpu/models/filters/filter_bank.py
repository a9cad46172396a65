"""FilterBank — serial biquad cascade executor
(reference: src/main/filters/FilterBank.cpp).

The reference repacks up to N chains into x8/x4/x2/x1 SIMD banks
(FilterBank.cpp:106-236) and runs them in series.  On TPU the packing is
unnecessary: the bank is just a ``[K, 5]`` coefficient array executed by
the time-parallel cascade kernel (:mod:`...ops.biquad`); channel batching
comes from leading array axes instead of SIMD lanes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import biquad as biquad_ops


class FilterBank:
    """Collects biquad chains, then executes them as one cascade.

    Mirrors the reference's begin()/add_chain()/end() lifecycle
    (FilterBank.cpp:94-236): ``begin`` resets, ``add_chain`` appends
    [K,5]-convention biquads, ``end`` freezes the coefficient array.
    State is explicit: callers hold the returned pytree.
    """

    def __init__(self):
        self._chains: List[np.ndarray] = []
        self._coeffs: Optional[np.ndarray] = None
        self._last_size: int = -1

    # -- configuration ----------------------------------------------------
    def begin(self) -> None:
        self._chains = []

    def add_chain(self, biquads: np.ndarray) -> None:
        biquads = np.atleast_2d(np.asarray(biquads, np.float64))
        self._chains.append(biquads)

    def end(self) -> None:
        if self._chains:
            self._coeffs = np.concatenate(self._chains, axis=0)
        else:
            self._coeffs = np.zeros((0, 5), np.float64)

    @property
    def size(self) -> int:
        return 0 if self._coeffs is None else self._coeffs.shape[0]

    def coefficients(self, dtype=jnp.float32) -> jax.Array:
        if self._coeffs is None:
            self.end()
        return jnp.asarray(self._coeffs, dtype)

    # -- execution ---------------------------------------------------------
    def init_state(self, batch_shape: Tuple[int, ...] = (),
                   dtype=jnp.float32) -> jax.Array:
        """Fresh zero state.  The reference clears delays whenever the
        chain count changes (FilterBank.cpp:233-235); callers do the same
        by re-calling this after reconfiguration."""
        return biquad_ops.init_state(self.size, batch_shape, dtype)

    def process(self, state: jax.Array, x: jax.Array,
                coeffs: Optional[jax.Array] = None,
                ) -> Tuple[jax.Array, jax.Array]:
        """Run the cascade: returns (state', y).  Pass ``coeffs`` to use
        traced coefficients under jit."""
        c = coeffs if coeffs is not None else self.coefficients()
        if c.shape[-2] == 0:
            return state, x
        y, state = biquad_ops.biquad_cascade(c, state, x)
        return state, y

    def impulse_response(self, length: int) -> jax.Array:
        """Unit-impulse response from zero state
        (reference FilterBank.cpp:293-330 backs up/restores delays; here
        state is explicit so nothing to restore)."""
        return biquad_ops.impulse_response(self.coefficients(), length)


def process_cascade(coeffs: jax.Array, state: jax.Array, x: jax.Array):
    """Functional cascade execution: (coeffs [K,5], state, x) -> (state', y)."""
    if coeffs.shape[-2] == 0:
        return state, x
    y, state = biquad_ops.biquad_cascade(coeffs, state, x)
    return state, y
