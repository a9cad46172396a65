"""MXU matmul FFT (ops.mxfft) vs the numpy float64 golden.

The TPU-side dispatch (ops.cplx._use_mxfft) is backend-gated off on
CPU, so these tests call the kernels directly; the contract is that of
ops.cplx.rfft_sc/irfft_sc (split complex, last axis)."""

import numpy as np
import jax.numpy as jnp

from lsp_dsp_units_tpu.ops.mxfft import rfft_mx, irfft_mx


def _snr(want, got):
    err = np.asarray(got).astype(np.complex128) - want
    return 10 * np.log10((np.abs(want) ** 2).sum()
                         / max((np.abs(err) ** 2).sum(), 1e-300))


def test_rfft_matches_numpy_golden():
    rng = np.random.default_rng(5)
    for n in (8, 64, 2048, 4096, 16384):
        x = rng.standard_normal((3, n)).astype(np.float32)
        xr, xi = rfft_mx(jnp.asarray(x), n)
        want = np.fft.rfft(x.astype(np.float64), n)
        got = np.asarray(xr) + 1j * np.asarray(xi)
        assert _snr(want, got) > 120.0, n


def test_irfft_roundtrip():
    rng = np.random.default_rng(6)
    for n in (64, 4096, 16384):
        x = rng.standard_normal((2, 3, n)).astype(np.float32)
        back = irfft_mx(rfft_mx(jnp.asarray(x), n), n)
        assert _snr(x.astype(np.float64), back) > 120.0, n


def test_irfft_of_arbitrary_halfspectrum():
    """irfft of a spectrum that is NOT a forward output (the FDL MAC
    accumulator) must still match numpy."""
    rng = np.random.default_rng(7)
    n = 4096
    sr = rng.standard_normal((4, n // 2 + 1)).astype(np.float32)
    si = rng.standard_normal((4, n // 2 + 1)).astype(np.float32)
    si[:, 0] = 0.0
    si[:, -1] = 0.0
    want = np.fft.irfft((sr + 1j * si).astype(np.complex128), n)
    got = irfft_mx((jnp.asarray(sr), jnp.asarray(si)), n)
    assert _snr(want, got) > 120.0


def test_convolution_through_mx_transforms():
    """Overlap-save convolution built on rfft_mx/irfft_mx matches the
    direct convolution — the convolver's actual usage pattern."""
    rng = np.random.default_rng(8)
    b = 1024
    x = rng.standard_normal((2, 2 * b)).astype(np.float32)
    h = rng.standard_normal(b).astype(np.float32) * 0.3
    xr, xi = rfft_mx(jnp.asarray(x), 2 * b)
    hr, hi = rfft_mx(jnp.asarray(np.pad(h, (0, b))), 2 * b)
    pr = xr * hr - xi * hi
    pi = xr * hi + xi * hr
    y = np.asarray(irfft_mx((pr, pi), 2 * b))[:, b:]
    want = np.stack([np.convolve(x[c].astype(np.float64), h)[b:2 * b]
                     for c in range(2)])
    assert _snr(want, y) > 110.0
