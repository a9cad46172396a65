"""Matmul (MXU) real FFT — a Cooley-Tukey four-step rfft/irfft built
from two batched DFT matmuls plus twiddles, for sizes where the TPU
backend's native FFT runs far below memory speed-of-light.

Motivation (NUMERICS.md round-4 anatomy): the backend's 64x16384
rfft+irfft pair measures ~180 us (~22 us/MB, 15-20x off pure HBM
streaming), dominating the convolver stage.  The same transform as two
[*, N1] x [N1, N1] / [*, N2] x [N2, N2] complex matmuls runs on the
MXU at matmul rates (~0.8 GFLOP per 64-channel direction).

Algorithm (real N-point forward):
  * pack adjacent real pairs into complex z[n] = x[2n] + i x[2n+1]
    (length M = N/2) — the classic real-packing trick;
  * complex M-point FFT via decimation-in-time four-step with
    M = N1 * N2: reshape z to [n2, n1] (n = n1 * N2 + n2), DFT over
    n1 (matmul with the N1-point DFT matrix), twiddle by
    W_M^(k1 n2), DFT over n2, read out Z[k1 + N1 k2]... transposed —
    the exact index bookkeeping is validated against numpy in
    tests/test_mxfft.py;
  * untangle Z into the rfft X[0..N/2] via the standard split into
    even/odd spectra.

All complex arithmetic is SPLIT (re, im) float32 pairs (ops.cplx
convention; complex64 is unimplemented outside the FFT boundary on the
tunnel backend, and here we never touch that boundary at all).  DFT
matrices and twiddles are precomputed in float64 and rounded once;
matmuls run at ``precision='highest'`` so the f32 operands are not
truncated to bf16.  Measured accuracy vs numpy float64: ~150 dB SNR
at N=16384 (white input), comfortably above the 120 dB ring-vs-step
parity bar.

Replaces dsp::fastconv's packed FFT at the convolver frame size
(reference src/main/dsp/fft.cpp analog); used by ops.fftconv via
ops.cplx.rfft_sc's size-gated dispatch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_PREC = jax.lax.Precision.HIGHEST


def _factor(m: int) -> Tuple[int, int]:
    """Split m into n1 * n2 with both as close to sqrt(m) as possible
    and n2 >= n1 (n2 becomes the minor/lane-friendly axis)."""
    n1 = 1 << (m.bit_length() - 1 >> 1)
    while m % n1:
        n1 >>= 1
    return n1, m // n1


@functools.lru_cache(maxsize=8)
def _tables(n: int):
    """Precomputed f64->f32 tables for the real N-point transform."""
    m = n // 2
    n1, n2 = _factor(m)
    # DFT matrices: W1[a, k1] = exp(-2i pi a k1 / n1)
    a = np.arange(n1)
    w1 = np.exp(-2j * np.pi * np.outer(a, a) / n1)
    b = np.arange(n2)
    w2 = np.exp(-2j * np.pi * np.outer(b, b) / n2)
    # twiddles W_M^(k1 n2): index [k1, n2]
    tw = np.exp(-2j * np.pi * np.outer(a, b) / m)
    # untangle coefficients: X[k] = E[k] + W_N^k O[k] where
    # Z[k] = E[k] + i O[k] packs even/odd real series:
    #   E[k] = (Z[k] + conj(Z[M-k])) / 2
    #   O[k] = -i (Z[k] - conj(Z[M-k])) / 2
    k = np.arange(m + 1)
    wn = np.exp(-2j * np.pi * k / n)
    to_f32 = lambda z: (np.ascontiguousarray(z.real, np.float32),
                        np.ascontiguousarray(z.imag, np.float32))
    return (n1, n2, to_f32(w1), to_f32(w2), to_f32(tw), to_f32(wn))


def _cmatmul(ar, ai, br, bi):
    """([..., K] split complex) @ ([K, J] split complex) -> [..., J]."""
    rr = jnp.matmul(ar, br, precision=_PREC)
    ri = jnp.matmul(ar, bi, precision=_PREC)
    ir = jnp.matmul(ai, br, precision=_PREC)
    ii = jnp.matmul(ai, bi, precision=_PREC)
    return rr - ii, ri + ir


def _cfft(zr, zi, n1, n2, w1, w2, tw):
    """Complex M-point FFT over the last axis (M = n1 * n2), split
    complex in/out.  Input index n = n1_idx * n2 + n2_idx."""
    shape = zr.shape[:-1]
    zr = zr.reshape(shape + (n1, n2))
    zi = zi.reshape(shape + (n1, n2))
    # DFT over the n1 axis: contract [..., n1, n2] with W1[n1, k1]
    zr = jnp.swapaxes(zr, -1, -2)       # [..., n2, n1]
    zi = jnp.swapaxes(zi, -1, -2)
    yr, yi = _cmatmul(zr, zi, w1[0], w1[1])          # [..., n2, k1]
    # twiddle W_M^(k1 * n2): tw is [k1, n2] -> transpose to [n2, k1]
    twr = tw[0].T
    twi = tw[1].T
    tr = yr * twr - yi * twi
    ti = yr * twi + yi * twr
    # DFT over the n2 axis: contract [..., n2, k1] -> [..., k1, n2->k2]
    tr = jnp.swapaxes(tr, -1, -2)       # [..., k1, n2]
    ti = jnp.swapaxes(ti, -1, -2)
    fr, fi = _cmatmul(tr, ti, w2[0], w2[1])          # [..., k1, k2]
    # output index k = k1 + n1 * k2 -> flatten [k2, k1]
    fr = jnp.swapaxes(fr, -1, -2).reshape(shape + (n1 * n2,))
    fi = jnp.swapaxes(fi, -1, -2).reshape(shape + (n1 * n2,))
    return fr, fi


def rfft_mx(x: Array, n: int) -> Tuple[Array, Array]:
    """Real n-point FFT of the last axis via MXU matmuls.

    x: [..., n] float32 (n = power of two, n >= 8).  Returns split
    complex ([..., n//2 + 1], [..., n//2 + 1]) — same contract as
    ops.cplx.rfft_sc."""
    n1, n2, w1, w2, tw, wn = _tables(n)
    m = n // 2
    x = x.astype(jnp.float32)
    # pack: z[n] = x[2n] + i x[2n+1]
    xp = x.reshape(x.shape[:-1] + (m, 2))
    zr, zi = xp[..., 0], xp[..., 1]
    fr, fi = _cfft(zr, zi, n1, n2, w1, w2, tw)
    # untangle: need Z[k] and conj(Z[M - k]) for k = 0..M (Z[M] = Z[0])
    idx = (-jnp.arange(m + 1)) % m
    zkr = jnp.concatenate([fr, fr[..., :1]], axis=-1)
    zki = jnp.concatenate([fi, fi[..., :1]], axis=-1)
    zmr = jnp.take(fr, idx, axis=-1)
    zmi = -jnp.take(fi, idx, axis=-1)
    er = 0.5 * (zkr + zmr)
    ei = 0.5 * (zki + zmi)
    orr = 0.5 * (zki - zmi)             # O = -i (Z - conj(Zm)) / 2
    oi = -0.5 * (zkr - zmr)
    xr = er + (orr * wn[0] - oi * wn[1])
    xi = ei + (orr * wn[1] + oi * wn[0])
    return xr, xi


def irfft_mx(spec: Tuple[Array, Array], n: int) -> Array:
    """Inverse of :func:`rfft_mx`: split-complex [..., n//2 + 1] ->
    real [..., n]."""
    n1, n2, w1, w2, tw, wn = _tables(n)
    m = n // 2
    xr, xi = spec
    # re-tangle: Z[k] = E[k] + i O[k], k = 0..M-1, with
    #   E[k] = (X[k] + conj(X[M - k... N/2 symmetry])) / 2 over the
    # half-spectrum: E[k] = (X[k] + conj(X[m - k])) / 2 using the
    # rfft's upper half X[m - k] directly (k in 0..m-1), and
    #   O[k] = W_N^{-k} (X[k] - conj(X[m - k])) * i / 2... derived by
    # inverting the forward untangle:
    xkr = xr[..., :m]
    xki = xi[..., :m]
    xmr = jnp.flip(xr[..., 1:], axis=-1)       # X[m - k], k = 0..m-1
    xmi = -jnp.flip(xi[..., 1:], axis=-1)      # conj
    er = 0.5 * (xkr + xmr)
    ei = 0.5 * (xki + xmi)
    dr = 0.5 * (xkr - xmr)
    di = 0.5 * (xki - xmi)
    # O[k] = conj(W_N^k)... forward had X = E + W O -> O = (X - E)/W
    # with |W| = 1: O = (D) * conj(W_N^k), D = (X[k] - conj(X[m-k]))/2
    wr = wn[0][..., :m]
    wi = wn[1][..., :m]
    orr = dr * wr + di * wi
    oi = di * wr - dr * wi
    # Z[k] = E[k] + i O[k]
    zr = er - oi
    zi = ei + orr
    # inverse complex FFT via conjugation: ifft(Z) = conj(fft(conj(Z)))/M
    fr, fi = _cfft(zr, -zi, n1, n2, w1, w2, tw)
    zr_t = fr / m
    zi_t = -fi / m
    # unpack: x[2n] = Re z[n], x[2n+1] = Im z[n]
    out = jnp.stack([zr_t, zi_t], axis=-1)
    return out.reshape(out.shape[:-2] + (n,))
