"""Filter — single parametric filter unit
(reference: src/main/filters/Filter.cpp, include/.../filters/Filter.h).

TPU-native shape: design (host float64, :mod:`.design`) produces a biquad
cascade; processing is the time-parallel cascade kernel.  The reference's
lazy rebuild-on-dirty-flag (Filter.cpp:698-702) becomes: re-call
:meth:`Filter.update` (cheap host math), which yields new traced
coefficients; state is carried explicitly by the caller.  Latency is
always 0 for IIR (reference Filter.h latency contract).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import biquad as biquad_ops
from lsp_dsp_units_tpu.models.filters.design import (
    FilterParams, FilterType, FilterDesign, design_filter, freq_chart,
    digital_freq_response)


class Filter:
    """Stateless-config filter: holds params + design, exposes functional
    processing over explicit state pytrees."""

    def __init__(self, sample_rate: int = 48000,
                 params: Optional[FilterParams] = None):
        self.sample_rate = int(sample_rate)
        self.params = params or FilterParams()
        self._design: Optional[FilterDesign] = None

    # -- configuration (reference Filter::update, Filter.cpp:141-159) -----
    def update(self, sample_rate: Optional[int] = None,
               params: Optional[FilterParams] = None) -> "Filter":
        if sample_rate is not None:
            self.sample_rate = int(sample_rate)
        if params is not None:
            self.params = params
        self._design = None
        return self

    @property
    def design(self) -> FilterDesign:
        if self._design is None:
            self._design = design_filter(self.params, self.sample_rate)
        return self._design

    def coefficients(self, dtype=jnp.float32) -> jax.Array:
        """Digital biquads [K, 5] in the framework convention."""
        return jnp.asarray(self.design.biquads, dtype)

    @property
    def num_stages(self) -> int:
        return self.design.biquads.shape[0]

    def latency(self) -> int:
        """IIR filters report zero latency (reference Filter.h)."""
        return 0

    # -- execution ---------------------------------------------------------
    def init_state(self, batch_shape: Tuple[int, ...] = (),
                   dtype=jnp.float32) -> jax.Array:
        return biquad_ops.init_state(self.num_stages, batch_shape, dtype)

    def process(self, state: jax.Array, x: jax.Array,
                coeffs: Optional[jax.Array] = None,
                method: str = "assoc") -> Tuple[jax.Array, jax.Array]:
        """(state, x[..., T]) -> (state', y[..., T]).

        ``method``: 'assoc' (time-parallel scan — fast, ~95+ dB for
        typical audio-band filters, degrades for sub-100 Hz poles) or
        'seq' (sequential scan, the reference's numerical behavior
        class).  For block-aligned high-throughput use, precompute
        ops.biquad_block instead.
        """
        c = coeffs if coeffs is not None else self.coefficients()
        if c.shape[-2] == 0:
            return state, x
        batch = x.shape[:-1]
        if state.shape[:-2] != batch:
            try:
                state = jnp.broadcast_to(state, batch + state.shape[-2:])
            except ValueError:
                raise ValueError(
                    f"state batch shape {state.shape[:-2]} does not match "
                    f"input batch shape {batch}; create state with "
                    f"init_state(batch_shape={batch})") from None
        if method == "seq":
            y, state = biquad_ops.biquad_cascade_seq(c, state, x)
        elif method == "assoc":
            y, state = biquad_ops.biquad_cascade(c, state, x)
        else:
            raise ValueError(f"unknown method {method!r}; use 'assoc' or"
                             " 'seq'")
        return state, y

    # -- analysis (reference Filter.cpp:500-698, 2418-2428) ----------------
    def freq_chart(self, freqs: np.ndarray) -> np.ndarray:
        """Complex transfer function at the given frequencies (Hz)."""
        return freq_chart(self.design, freqs)

    def digital_response(self, freqs: np.ndarray) -> np.ndarray:
        return digital_freq_response(self.design.biquads, freqs,
                                     self.sample_rate)

    def impulse_response(self, length: int) -> jax.Array:
        return biquad_ops.impulse_response(self.coefficients(), length)


__all__ = ["Filter", "FilterParams", "FilterType"]
