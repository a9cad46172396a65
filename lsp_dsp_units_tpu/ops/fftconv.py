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

All spectra are SPLIT-COMPLEX — (real, imag) float32 pairs — because the
TPU backend only supports complex dtype at the FFT boundary itself (see
ops.cplx).  Interestingly this mirrors the reference's own 'packed
complex' format choice: a storage layout picked for the hardware.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import cplx
from lsp_dsp_units_tpu.ops.cplx import (irfft_sc, rfft_sc, sc_mul, sc_sum)

Array = jax.Array


class Spectra(NamedTuple):
    """Split-complex spectra container."""
    re: Array
    im: Array


def parse_ir(ir: Array, block: int) -> Spectra:
    """Partition an impulse response into FDL spectra.

    Args:
      ir: [N] (or [..., N]) impulse response.
      block: partition block size B (power of two).

    Returns split-complex spectra [..., P, B+1] with P = ceil(N / B),
    each partition zero-padded to 2B before rfft (overlap-save layout).
    The analog of ``dsp::fastconv_parse`` per partition
    (reference Convolver.cpp:159-214).
    """
    n = ir.shape[-1]
    p = max(1, -(-n // block))
    pad = p * block - n
    ir_p = jnp.pad(ir, [(0, 0)] * (ir.ndim - 1) + [(0, pad)])
    parts = ir_p.reshape(ir.shape[:-1] + (p, block)).astype(jnp.float32)
    re, im = rfft_sc(parts, 2 * block)
    return Spectra(re.astype(jnp.float32), im.astype(jnp.float32))


class FDLState(NamedTuple):
    """Carried state of a partitioned convolver."""
    spec_re: Array   # [..., P, F] — past input block spectra, 0 = newest
    spec_im: Array
    history: Array   # [..., B] float32 — previous input block (for OLS)


def init_fdl(h_spectra: Spectra, batch_shape: Tuple[int, ...] = (),
             dtype=jnp.float32) -> FDLState:
    p, f = h_spectra.re.shape[-2], h_spectra.re.shape[-1]
    block = (f - 1)
    return FDLState(
        spec_re=jnp.zeros(batch_shape + (p, f), jnp.float32),
        spec_im=jnp.zeros(batch_shape + (p, f), jnp.float32),
        history=jnp.zeros(batch_shape + (block,), dtype),
    )


def fdl_step(h_spectra: Spectra, state: FDLState, x_block: Array,
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
    sr, si = rfft_sc(frame)
    fdl_re = jnp.concatenate([sr[..., None, :], state.spec_re[..., :-1, :]],
                             axis=-2)
    fdl_im = jnp.concatenate([si[..., None, :], state.spec_im[..., :-1, :]],
                             axis=-2)
    acc = sc_sum(sc_mul((fdl_re, fdl_im), (h_spectra.re, h_spectra.im)),
                 axis=-2)
    y = irfft_sc(acc, axis=-1)[..., x_block.shape[-1]:]
    y = y.astype(x_block.dtype)
    return FDLState(spec_re=fdl_re, spec_im=fdl_im, history=x_block), y


def fdl_process(h_spectra: Spectra, state: FDLState, x: Array,
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
    specs_re, specs_im = rfft_sc(frames)

    # Scan-free FDL MAC: output block m needs spectra of blocks m-p for
    # partitions p — a correlation over the block index.  Lay old state
    # (newest-first [P, F]) and the M new spectra on one time-ordered
    # axis, then gather [M, P] windows and contract with H in a single
    # einsum.  No sequential dependency, no 2x(P*F) shift-register copy
    # per block — the whole MAC is one batched gather + multiply-reduce.
    p = h_spectra.re.shape[-2]
    # S_seq[i] = spectrum of block (i - P); old state index q holds
    # block (-1-q) -> position P-1-q
    seq_re = jnp.concatenate([jnp.flip(state.spec_re, axis=-2), specs_re],
                             axis=-2)            # [..., P+M, F]
    seq_im = jnp.concatenate([jnp.flip(state.spec_im, axis=-2), specs_im],
                             axis=-2)
    idx = (p + jnp.arange(m)[:, None] - jnp.arange(p)[None, :])  # [M, P]
    win_re = jnp.take(seq_re, idx, axis=-2)      # [..., M, P, F]
    win_im = jnp.take(seq_im, idx, axis=-2)
    # broadcast-multiply + reduce over P (XLA fuses the contraction);
    # unlike a fixed "pf" einsum this also accepts batched IR spectra
    # [..., P, F] (per-channel IRs), matching fdl_step's broadcasting
    hre = h_spectra.re[..., None, :, :]          # [..., 1, P, F]
    him = h_spectra.im[..., None, :, :]
    acc_re = jnp.sum(win_re * hre - win_im * him, axis=-2)
    acc_im = jnp.sum(win_re * him + win_im * hre, axis=-2)
    y = irfft_sc((acc_re, acc_im), axis=-1)[..., b:]  # [..., M, B]
    y = y.reshape(x.shape).astype(x.dtype)
    # new state: newest P spectra, index 0 = newest (block M-1)
    fre = jnp.flip(seq_re[..., m:m + p, :], axis=-2)
    fim = jnp.flip(seq_im[..., m:m + p, :], axis=-2)
    return FDLState(spec_re=fre, spec_im=fim, history=xb[..., -1, :]), y


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
