"""FFT convolution kernels — the TPU replacement for the reference's
``dsp::fastconv_parse/fastconv_apply/fastconv_parse_apply`` packed-FFT
convolution primitives (used by Convolver.cpp:159-295 and
Equalizer.cpp:342-484).

Design: uniform partitioned overlap-save convolution with a
frequency-delay-line (FDL).  The reference's non-uniform doubling
partition scheme (Convolver.cpp:144-214) is a CPU latency-amortization
trick; on TPU a uniform FDL with a reasonably large block keeps all FFTs
batched and the multiply-accumulate a single fused VPU pass, while keeping
the same zero-latency semantics (the newest input block contributes to the
current output block through partition 0).

All spectra use the native one-sided ``rfft`` layout (complex64), not the
reference's packed-complex format.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops.cplx import cmul

Array = jax.Array


def parse_ir(ir: Array, block: int) -> Array:
    """Partition an impulse response into FDL spectra.

    Args:
      ir: [N] (or [..., N]) impulse response.
      block: partition block size B (power of two).

    Returns complex64 spectra [..., P, B+1] with P = ceil(N / B),
    each partition zero-padded to 2B before rfft (overlap-save layout).
    The analog of ``dsp::fastconv_parse`` per partition
    (reference Convolver.cpp:159-214).
    """
    n = ir.shape[-1]
    p = max(1, -(-n // block))
    pad = p * block - n
    ir_p = jnp.pad(ir, [(0, 0)] * (ir.ndim - 1) + [(0, pad)])
    parts = ir_p.reshape(ir.shape[:-1] + (p, block))
    parts = jnp.pad(parts, [(0, 0)] * (ir.ndim - 1) + [(0, 0), (0, block)])
    return jnp.fft.rfft(parts, axis=-1).astype(jnp.complex64)


class FDLState(NamedTuple):
    """Carried state of a partitioned convolver."""
    spectra: Array   # [..., P, F] complex64 — past input block spectra,
    #                  index 0 = newest
    history: Array   # [..., B] float32 — previous input block (for OLS)


def init_fdl(h_spectra: Array, batch_shape: Tuple[int, ...] = (),
             dtype=jnp.float32) -> FDLState:
    p, f = h_spectra.shape[-2], h_spectra.shape[-1]
    block = (f - 1)
    return FDLState(
        spectra=jnp.zeros(batch_shape + (p, f), jnp.complex64),
        history=jnp.zeros(batch_shape + (block,), dtype),
    )


def fdl_step(h_spectra: Array, state: FDLState, x_block: Array,
             ) -> Tuple[FDLState, Array]:
    """One block of uniform partitioned overlap-save convolution.

    Args:
      h_spectra: [..., P, F] partitioned IR spectra from :func:`parse_ir`.
      state: FDL state.
      x_block: [..., B] input block.

    Returns (state', y_block [..., B]) — the exact causal linear
    convolution output for this block.
    """
    frame = jnp.concatenate([state.history, x_block], axis=-1)  # [..., 2B]
    spec = jnp.fft.rfft(frame, axis=-1).astype(jnp.complex64)   # [..., F]
    fdl = jnp.concatenate([spec[..., None, :], state.spectra[..., :-1, :]],
                          axis=-2)
    acc = jnp.sum(cmul(fdl, h_spectra), axis=-2)                 # [..., F]
    y = jnp.fft.irfft(acc, axis=-1)[..., x_block.shape[-1]:]
    y = y.astype(x_block.dtype)
    return FDLState(spectra=fdl, history=x_block), y


def fdl_process(h_spectra: Array, state: FDLState, x: Array,
                ) -> Tuple[FDLState, Array]:
    """Process T = M*B samples (last axis) through the FDL convolver.

    Batches the forward FFTs of all M blocks in one call, then scans the
    FDL multiply-accumulate over blocks.
    """
    b = state.history.shape[-1]
    t = x.shape[-1]
    assert t % b == 0, f"input length {t} must be a multiple of block {b}"
    m = t // b
    if m == 1:
        return fdl_step(h_spectra, state, x)

    # all input frames: [..., M, 2B]
    xb = x.reshape(x.shape[:-1] + (m, b))
    prev = jnp.concatenate([state.history[..., None, :], xb[..., :-1, :]],
                           axis=-2)
    frames = jnp.concatenate([prev, xb], axis=-1)
    specs = jnp.fft.rfft(frames, axis=-1).astype(jnp.complex64)

    # scan the FDL over blocks (moveaxis M to front)
    specs_t = jnp.moveaxis(specs, -2, 0)  # [M, ..., F]

    def step(fdl, s):
        fdl = jnp.concatenate([s[..., None, :], fdl[..., :-1, :]], axis=-2)
        acc = jnp.sum(cmul(fdl, h_spectra), axis=-2)
        return fdl, acc

    fdl, accs = jax.lax.scan(step, state.spectra, specs_t)
    accs = jnp.moveaxis(accs, 0, -2)                  # [..., M, F]
    y = jnp.fft.irfft(accs, axis=-1)[..., b:]         # [..., M, B]
    y = y.reshape(x.shape).astype(x.dtype)
    return FDLState(spectra=fdl, history=xb[..., -1, :]), y


def direct_conv_block(h: Array, history: Array, x_block: Array) -> Array:
    """Small direct FIR over one block with history (time-domain).

    ``h``: [K] taps; ``history``: [..., K-1]; ``x_block``: [..., B].
    Used for short heads where FFT overhead dominates (the analog of the
    reference's 128-tap direct segment, Convolver.cpp:290-295).
    """
    k = h.shape[-1]
    frame = jnp.concatenate([history, x_block], axis=-1)
    # im2col windows: [..., B, K] (frame[n .. n+K-1]), y[n] = sum_k
    # x[n+K-1-k] h[k] -> use correlation with reversed taps
    idx = jnp.arange(x_block.shape[-1])[:, None] + jnp.arange(k)[None, :]
    windows = frame[..., idx]                          # [..., B, K]
    return jnp.einsum("...bk,k->...b", windows, h[::-1])


def np_convolve_golden(x: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Float64 full linear convolution golden model (truncated to len(x))."""
    y = np.convolve(np.asarray(x, np.float64), np.asarray(h, np.float64))
    return y[: len(x)]
