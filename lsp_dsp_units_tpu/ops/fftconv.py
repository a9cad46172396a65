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

# device-path contractions run at HIGH precision (bf16_3x, f32-class
# accuracy): the TPU default (1-pass bf16) rounds f32 operands to ~8
# mantissa bits — measured as a ~6 dB chain-level SNR loss — while
# HIGHEST (6-pass) doubles the MXU passes for accuracy far below the
# chain's own f32 floor (NUMERICS.md round-4 late)
_PREC = jax.lax.Precision.HIGH


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

    # Bulk FDL MAC, history-read-once form.  Output block k needs
    # sum_p H[p] * spec(k - p); split by the sign of k - p:
    #   FAR  (old history):  Far[k]  = sum_q Old[q] * H[q + k + 1]
    #   NEAR (this call):    Near[k] = sum_{j<=k} S[j] * H[k - j]
    # Both are small contractions over the partition/block index with
    # the frequency axis batched — the carried history streams through
    # HBM ONCE per call instead of once per block (the lax.scan /
    # windowed-gather forms re-touch the [P, F] state for every block:
    # ~98 MB x K per super-step at rank 14, measured as the dominant
    # 0.21 ms/block stage — NUMERICS.md round-2 anatomy).
    p = h_spectra.re.shape[-2]
    if h_spectra.re.ndim > 2:
        # batched per-channel IR spectra: keep the windowed-gather form
        # (rare path; the einsum weights would need a batch dim)
        seq_re = jnp.concatenate(
            [jnp.flip(state.spec_re, axis=-2), specs_re], axis=-2)
        seq_im = jnp.concatenate(
            [jnp.flip(state.spec_im, axis=-2), specs_im], axis=-2)
        idx = (p + jnp.arange(m)[:, None] - jnp.arange(p)[None, :])
        win_re = jnp.take(seq_re, idx, axis=-2)
        win_im = jnp.take(seq_im, idx, axis=-2)
        hre = h_spectra.re[..., None, :, :]
        him = h_spectra.im[..., None, :, :]
        acc_re = jnp.sum(win_re * hre - win_im * him, axis=-2)
        acc_im = jnp.sum(win_re * him + win_im * hre, axis=-2)
        fre = jnp.flip(seq_re[..., m:m + p, :], axis=-2)
        fim = jnp.flip(seq_im[..., m:m + p, :], axis=-2)
    else:
        f = h_spectra.re.shape[-1]
        # FAR weights Wf[q, k, f] = H[q + k + 1, f] (0 past the end)
        iq = jnp.arange(p)[:, None] + jnp.arange(m)[None, :] + 1  # [P,M]
        okf = iq <= p - 1
        iqc = jnp.minimum(iq, p - 1)
        wf_re = jnp.where(okf[..., None], h_spectra.re[iqc], 0.0)
        wf_im = jnp.where(okf[..., None], h_spectra.im[iqc], 0.0)
        # NEAR weights Wn[j, k, f] = H[k - j, f] for 0 <= k - j <= P-1
        ij = jnp.arange(m)[None, :] - jnp.arange(m)[:, None]      # [M,M]
        okn = jnp.logical_and(ij >= 0, ij <= p - 1)
        ijc = jnp.clip(ij, 0, p - 1)
        wn_re = jnp.where(okn[..., None], h_spectra.re[ijc], 0.0)
        wn_im = jnp.where(okn[..., None], h_spectra.im[ijc], 0.0)
        # old history in oldest-last order: Old[q] = state block -1-q
        old_re, old_im = state.spec_re, state.spec_im    # [..., P, F]
        # split-complex contractions (f batched, q/j contracted)
        far_re = (jnp.einsum("...qf,qkf->...kf", old_re, wf_re,
                             precision=_PREC)
                  - jnp.einsum("...qf,qkf->...kf", old_im, wf_im,
                               precision=_PREC))
        far_im = (jnp.einsum("...qf,qkf->...kf", old_re, wf_im,
                             precision=_PREC)
                  + jnp.einsum("...qf,qkf->...kf", old_im, wf_re,
                               precision=_PREC))
        near_re = (jnp.einsum("...jf,jkf->...kf", specs_re, wn_re,
                              precision=_PREC)
                   - jnp.einsum("...jf,jkf->...kf", specs_im, wn_im,
                                precision=_PREC))
        near_im = (jnp.einsum("...jf,jkf->...kf", specs_re, wn_im,
                              precision=_PREC)
                   + jnp.einsum("...jf,jkf->...kf", specs_im, wn_re,
                                precision=_PREC))
        acc_re = far_re + near_re
        acc_im = far_im + near_im
        # new state: newest P spectra, index 0 = newest (block M-1)
        if m >= p:
            fre = jnp.flip(specs_re[..., m - p:, :], axis=-2)
            fim = jnp.flip(specs_im[..., m - p:, :], axis=-2)
        else:
            fre = jnp.concatenate(
                [jnp.flip(specs_re, axis=-2),
                 state.spec_re[..., : p - m, :]], axis=-2)
            fim = jnp.concatenate(
                [jnp.flip(specs_im, axis=-2),
                 state.spec_im[..., : p - m, :]], axis=-2)
    y = irfft_sc((acc_re, acc_im), axis=-1)[..., b:]  # [..., M, B]
    y = y.reshape(x.shape).astype(x.dtype)
    return FDLState(spec_re=fre, spec_im=fim, history=xb[..., -1, :]), y


class RingFDLState(NamedTuple):
    """FDL state with RING storage: the per-block shift register of
    fdl_step rewrites the whole [P, F] spectra buffer every block
    (2 x ~98 MB of HBM traffic at rank 14); the ring writes only the
    new spectrum slot and ROTATES the (small) IR spectra instead.
    PARTITION-MAJOR layout [P, ..., F] (batch dims in the middle): the
    per-slot write is then a leading-plane update, and the Pallas MAC
    kernel's [1, C_tile, F] blocks satisfy Mosaic's tiling rule (the
    channel-major [..., P, F] layout would need illegal [8, 1, F]
    blocks).  ``pos`` is the slot holding the newest block's
    spectrum."""
    spec_re: Array   # [P, ..., F] ring storage, partition-major
    spec_im: Array
    history: Array   # [..., B] previous input block (overlap-save)
    pos: Array       # [] int32


def init_ring_fdl(h_spectra: Spectra, batch_shape: Tuple[int, ...] = (),
                  dtype=jnp.float32, packed: bool = False
                  ) -> RingFDLState:
    """``packed=True`` stores the ring in the scrambled-packed order of
    ops.pallas_fft (F = block instead of block + 1, Nyquist folded into
    the DC bin's imaginary slot): fdl_ring_step then runs the whole FDL
    through the Pallas four-step FFT + MAC kernels.  The h_spectra
    stay natural-order; the step packs them on the fly (tiny)."""
    p, f = h_spectra.re.shape[-2], h_spectra.re.shape[-1]
    block = (f - 1)
    if packed:
        from lsp_dsp_units_tpu.ops import pallas_fft
        if not pallas_fft.supported(2 * block):
            raise ValueError(
                f"packed ring FDL requires a pallas_fft-supported frame "
                f"size (2*block = {2 * block}: power of two >= 2048 with "
                f"an [n1 >= 8, n2 % 128 == 0] grid); use packed=False")
    fdim = block if packed else f
    return RingFDLState(
        spec_re=jnp.zeros((p,) + batch_shape + (fdim,), jnp.float32),
        spec_im=jnp.zeros((p,) + batch_shape + (fdim,), jnp.float32),
        history=jnp.zeros(batch_shape + (block,), dtype),
        pos=jnp.int32(p - 1))


def fdl_ring_step(h_spectra: Spectra, state: RingFDLState,
                  x_block: Array) -> Tuple[RingFDLState, Array]:
    """One block of partitioned overlap-save convolution over the ring
    FDL — identical math to :func:`fdl_step` (same products, same
    summation order over partitions), different storage: slot
    ``(pos + 1) % P`` receives the new spectrum (one [F] write per
    channel) and the IR spectra are gathered rotated so partition p
    multiplies slot ``(pos+1-p) % P``.  The big [P, ..., F] history
    buffer is READ once and written 1/P-th per block instead of fully
    rewritten twice."""
    p = h_spectra.re.shape[-2]
    frame = jnp.concatenate([state.history, x_block], axis=-1)
    w = (state.pos + 1) % p
    # Mosaic fast path: MAC + slot write in one Pallas program (the XLA
    # form below materializes the product and copies the carried ring
    # around its dynamic-update-slice — measured ~160 us/block vs
    # ~40 us of ring traffic, NUMERICS round-4 anatomy).  Gated on a
    # [P, C, F] ring (the chain layout) and the TPU backend; CPU tests
    # take the XLA path (tests/test_fftconv.py forces this branch in
    # interpret mode).
    b = x_block.shape[-1]
    packed = state.spec_re.shape[-1] == b        # init_ring_fdl(packed=)
    if packed and state.spec_re.ndim == 3 and h_spectra.re.ndim == 2:
        # fully-fused Pallas FDL: forward four-step packed FFT, ring
        # MAC and half-frame inverse in ONE kernel, spectra in
        # scrambled-packed order end to end (ops.pallas_fdl_fused)
        from lsp_dsp_units_tpu.ops import pallas_fft as pfft
        from lsp_dsp_units_tpu.ops.pallas_fdl_fused import \
            fdl_fused_pallas
        interp = jax.default_backend() != "tpu"
        nfft = 2 * b
        hre_p, him_p = pfft.pack_spectra(h_spectra.re, h_spectra.im,
                                         nfft)
        rot_full = (w - jnp.arange(p)) % p
        y, buf_re, buf_im = fdl_fused_pallas(
            state.spec_re, state.spec_im,
            jnp.take(hre_p, rot_full, axis=-2),
            jnp.take(him_p, rot_full, axis=-2),
            frame, w, nfft, interpret=interp, x3=pfft.X3)
        return RingFDLState(spec_re=buf_re, spec_im=buf_im,
                            history=x_block, pos=w), y.astype(x_block.dtype)
    # (A natural-order [P, C, 8193] Pallas MAC was built and measured
    # SLOWER than this XLA form on-chip — the ragged 8193-lane blocks
    # defeat Mosaic's tiling; the packed branch above is the fast path
    # and the XLA step below stays the natural-order implementation.)
    sr, si = rfft_sc(frame)
    # MAC over the OLD ring with the replaced slot's weight masked to
    # zero, plus the newest spectrum's H[0] term added separately.
    # Mathematically identical to updating the ring first and summing
    # sum_q buf[q] * H[(w-q)%P] — but it keeps the updated ring's ONLY
    # consumer the next-iteration carry, so XLA's buffer assigner can
    # alias the dynamic-update-slice in place.  With the MAC reading
    # the post-update ring instead, the update fuses into full-buffer
    # select passes that REWRITE all [*, P, F] spectra every block
    # (2 x 2 x 25 MB at rank 14/1 s IR — measured as the dominant FDL
    # stage cost in the NUMERICS round-4 anatomy).
    nb = state.spec_re.ndim - 2        # batch dims between P and F
    rot = (w - jnp.arange(p)) % p
    keep = (jnp.arange(p) != w).reshape((p,) + (1,) * (nb + 1))
    # h [..., P, F] gathered rotated, partition axis moved leading to
    # line up with the partition-major ring (singletons inserted so h's
    # batch dims align right against the ring's)
    hb = h_spectra.re.ndim - 2
    assert hb <= nb, (
        f"h_spectra carries {hb} batch dims but the ring state only "
        f"{nb}; broadcast the ring (init_ring_fdl batch_shape) instead")
    hshape = ((p,) + (1,) * (nb - hb) + h_spectra.re.shape[:-2]
              + h_spectra.re.shape[-1:])
    hre = jnp.where(keep, jnp.moveaxis(
        jnp.take(h_spectra.re, rot, axis=-2), -2, 0).reshape(hshape), 0.0)
    him = jnp.where(keep, jnp.moveaxis(
        jnp.take(h_spectra.im, rot, axis=-2), -2, 0).reshape(hshape), 0.0)
    acc_re, acc_im = sc_sum(
        sc_mul((state.spec_re, state.spec_im), (hre, him)), axis=0)
    h0re = h_spectra.re[..., 0, :]
    h0im = h_spectra.im[..., 0, :]
    acc = (acc_re + (sr * h0re - si * h0im),
           acc_im + (sr * h0im + si * h0re))
    buf_re = jax.lax.dynamic_update_index_in_dim(
        state.spec_re, sr, w, axis=0)
    buf_im = jax.lax.dynamic_update_index_in_dim(
        state.spec_im, si, w, axis=0)
    y = irfft_sc(acc, axis=-1)[..., x_block.shape[-1]:]
    return RingFDLState(spec_re=buf_re, spec_im=buf_im,
                        history=x_block, pos=w), y.astype(x_block.dtype)


# tests flip this to force the packed bulk branch (interpret mode)
# off-TPU; the gate otherwise keeps CPU runs on the XLA form
_BULK_PACKED_TEST = False


class OLSBulkState(NamedTuple):
    """Carried state of the big-FFT overlap-save bulk convolver: the
    last ``nfft - T`` input samples (time domain)."""
    history: Array       # [..., nfft - T] float32


def ols_bulk_spectra(ir: Array, t_super: int) -> Spectra:
    """One whole-IR spectrum for :func:`ols_bulk_process` at super-block
    size ``t_super``: nfft = 2 * t_super, requiring
    len(ir) <= t_super + 1."""
    n = ir.shape[-1]
    nfft = 2 * t_super
    assert n <= t_super + 1, (n, t_super)
    re, im = rfft_sc(ir.astype(jnp.float32), nfft)
    return Spectra(re.astype(jnp.float32), im.astype(jnp.float32))


def init_ols_bulk(t_super: int, batch_shape: Tuple[int, ...] = (),
                  ) -> OLSBulkState:
    return OLSBulkState(history=jnp.zeros(batch_shape + (t_super,),
                                          jnp.float32))


def ols_bulk_process(h: Spectra, state: OLSBulkState, x: Array,
                     ) -> Tuple[OLSBulkState, Array]:
    """Exact causal convolution of one super-block by single big-FFT
    overlap-save: frame = [history, x] -> rfft(2T) -> spectral multiply
    -> irfft -> last T samples.

    The TPU-native BULK form of the partitioned FDL: one FFT of 2T and
    ~3 HBM passes per super-block instead of per-block partition MACs
    that re-stream the [P, F] history spectra for every block (the
    einsum/batched-matmul forms of that MAC pad 47x16 matmuls onto the
    128x128 MXU — measured 17x slower than this).  Semantics identical
    to fdl_process for IRs up to T+1 taps; latency is one super-block,
    the intended trade for offline/bulk serving (the realtime path
    keeps the per-block FDL)."""
    t = x.shape[-1]
    assert state.history.shape[-1] == t, (state.history.shape, t)
    frame = jnp.concatenate([state.history, x.astype(jnp.float32)],
                            axis=-1)
    # packed Pallas FFT path: at bulk sizes the four-step's factors
    # reach [256, 512]+ and the matmuls FILL the MXU (unlike the
    # per-block [64, 128] grids), while the native FFT runs 15-20x off
    # HBM rate (one 64x262144 rfft measured 3-4 ms — NUMERICS.md)
    from lsp_dsp_units_tpu.ops import pallas_fft as pfft
    if (frame.ndim == 2 and h.re.ndim == 1
            and pfft.supported(2 * t)
            and (jax.default_backend() == "tpu" or _BULK_PACKED_TEST)):
        interp = jax.default_backend() != "tpu"
        sr, si = pfft.rfft_packed(frame, interpret=interp)
        hre_p, him_p = pfft.pack_spectra(h.re, h.im, 2 * t)
        y = pfft.irfft_packed(
            pfft.mul_packed(sr, si, hre_p, him_p), 2 * t,
            interpret=interp, half="last")
        return OLSBulkState(history=x.astype(jnp.float32)), \
            y.astype(x.dtype)
    sr, si = rfft_sc(frame)
    acc = sc_mul((sr, si), (h.re, h.im))
    y = irfft_sc(acc, axis=-1)[..., t:]
    return OLSBulkState(history=x.astype(jnp.float32)), \
        y.astype(x.dtype)


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
    return jnp.einsum("...bk,k->...b", windows, h[::-1],
                      precision=_PREC)


def np_convolve_golden(x: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Float64 full linear convolution golden model (truncated to len(x))."""
    y = np.convolve(np.asarray(x, np.float64), np.asarray(h, np.float64))
    return y[: len(x)]
