"""Convolver — partitioned FFT convolution engine
(reference: src/main/util/Convolver.cpp, include/.../util/Convolver.h).

The reference splits the IR into a 128-tap direct segment, doubling
"raising levels", and constant rank-sized tail blocks, spreading tail FFT
work across sub-frames with a binary-counter schedule
(Convolver.cpp:144-286) — all latency-amortization for a serial CPU.

TPU redesign: a uniform frequency-delay-line (FDL) partitioned
overlap-save convolver (:mod:`...ops.fftconv`).  Zero latency is kept —
the newest block contributes through partition 0 in the same step — and
the work per block is one batched rfft + one fused complex
multiply-accumulate + one irfft, which XLA pipelines with no need for
manual task spreading.  ``rank`` selects the internal block size
2**(rank-1), mirroring the reference's rank in [8,16]
(Convolver.h:28-29).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import fftconv
from lsp_dsp_units_tpu.ops.cplx import cmul, rfft_sc, irfft_sc, sc_mul

CONVOLVER_RANK_MIN = 8    # reference Convolver.h:28
CONVOLVER_RANK_MAX = 16   # reference Convolver.h:29


class Convolver:
    """Streaming FFT convolver with explicit state.

    Use :meth:`init` with the impulse response, then :meth:`process` with
    input whose length is a multiple of the internal block (the common
    TPU case — the streaming runner guarantees it), or the rebuffering
    wrapper in :mod:`...utils.blocks` for arbitrary chunk sizes.
    """

    def __init__(self, ir: np.ndarray, rank: int = 12,
                 dtype=jnp.float32):
        rank = int(np.clip(rank, CONVOLVER_RANK_MIN, CONVOLVER_RANK_MAX))
        self.rank = rank
        self.block = 1 << (rank - 1)
        self.ir_length = int(np.asarray(ir).shape[-1])
        self.h_spectra = fftconv.parse_ir(
            jnp.asarray(ir, dtype), self.block)
        self.dtype = dtype

    @property
    def partitions(self) -> int:
        return self.h_spectra.re.shape[-2]

    def latency(self) -> int:
        """Zero latency, like the reference (direct head segment)."""
        return 0

    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> fftconv.FDLState:
        return fftconv.init_fdl(self.h_spectra, batch_shape, self.dtype)

    def process(self, state: fftconv.FDLState, x: jax.Array,
                ) -> Tuple[fftconv.FDLState, jax.Array]:
        """x last axis must be a multiple of ``self.block``."""
        return fftconv.fdl_process(self.h_spectra, state, x)


def convolve_oneshot(x: jax.Array, h: jax.Array) -> jax.Array:
    """Full linear convolution truncated to len(x), via one zero-padded
    FFT — for offline use and tests."""
    t = x.shape[-1]
    n = t + h.shape[-1]
    size = 1
    while size < n:
        size <<= 1
    xs = rfft_sc(x, size, axis=-1)
    hs = rfft_sc(h, size, axis=-1)
    y = irfft_sc(sc_mul(xs, hs), size, axis=-1)
    return y[..., :t].astype(x.dtype)
