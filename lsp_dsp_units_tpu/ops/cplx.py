"""Split-complex arithmetic: spectra as (real, imag) float32 pairs.

The axon TPU backend returns ``UNIMPLEMENTED`` (or hangs in compile) for
essentially every non-FFT complex64 operation — multiply, concatenate,
sum — while the FFT ops themselves and ``.real``/``.imag`` extraction
work (empirically bisected).  The framework therefore keeps all spectra
in SPLIT-COMPLEX form: a pair of float32 arrays, converted from/to
complex64 only at the rfft/irfft boundary.  On healthy backends XLA
lowers complex arithmetic to exactly these real ops anyway, so this
costs nothing.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
SC = Tuple[Array, Array]   # (real, imag)


# MXU matmul FFT (ops.mxfft, Cooley-Tukey four-step, f64-precomputed
# tables, precision=HIGHEST): an attempt to beat the TPU backend's
# native FFT, which runs 15-20x below HBM streaming rate at the
# convolver frame sizes (NUMERICS.md round-4 anatomy: 180 us for one
# 64x16384 rfft+irfft pair).  MEASURED NEGATIVE on the current
# backend: the pair costs ~189 us — the two swapaxes data movements
# per stage plus the 3-pass HIGHEST-precision f32 matmuls eat the
# MXU win exactly (numerics are fine: 139 dB fwd / 136 dB roundtrip
# on-chip).  Kept opt-in via LSP_TPU_MXFFT=1 for backends with
# faster transposes or native-f32 MXUs; default is the native FFT.
_MXFFT_MIN = 2048

# read ONCE at import: jitted callers cache compiled programs, so a
# mid-process env flip would silently leave already-compiled shapes on
# the old branch (mirrors how pallas_fft.X3 is handled)
import os as _os
_MXFFT_ENABLED = _os.environ.get("LSP_TPU_MXFFT") == "1"


def _use_mxfft(n: int | None, axis: int) -> bool:
    return (_MXFFT_ENABLED
            and n is not None and axis == -1 and n >= _MXFFT_MIN
            and (n & (n - 1)) == 0
            and jax.default_backend() == "tpu")


# packed Pallas four-step FFT as the generic rfft_sc/irfft_sc TPU fast
# path (round-4 verdict ask #3: the backend's native FFT runs 15-20x
# below HBM streaming rate, but only the bench chain rode the Pallas
# kernel).  The scrambled-packed output is unscrambled by a TRANSPOSE
# (pack_spectra/unpack_spectra), so every natural-order consumer —
# spectral units, convolver glue, equalizer — wins without semantic
# changes.  bf16x3 matmuls (~105 dB) by default, like the chain;
# LSP_TPU_PACKED_FFT=0 opts out (read once at import — jitted callers
# cache compiled branches).
_PACKED_ENABLED = _os.environ.get("LSP_TPU_PACKED_FFT", "1") != "0"


def _use_packed(n: int, axis: int) -> bool:
    if not (_PACKED_ENABLED and axis == -1
            and jax.default_backend() == "tpu"):
        return False
    from lsp_dsp_units_tpu.ops import pallas_fft
    return pallas_fft.supported(n)


def rfft_sc(x: Array, n: int | None = None, axis: int = -1) -> SC:
    m = x.shape[axis] if n is None else int(n)
    if _use_packed(m, axis):
        from lsp_dsp_units_tpu.ops import pallas_fft as pfft
        lead = x.shape[:-1]
        if x.shape[-1] * 2 == m:
            # zero-padded upper half (block convolution): the zero
            # rows are never materialized and stage A contracts half
            # its columns (rfft_packed_zeropad)
            x2 = x.reshape((-1, m // 2)).astype(jnp.float32)
            pre, pim = pfft.rfft_packed_zeropad(x2)
        else:
            if x.shape[-1] < m:
                pad = [(0, 0)] * (x.ndim - 1) + [(0, m - x.shape[-1])]
                x = jnp.pad(x, pad)
            elif x.shape[-1] > m:
                x = x[..., :m]
            x2 = x.reshape((-1, m)).astype(jnp.float32)
            pre, pim = pfft.rfft_packed(x2)
        re, im = pfft.unpack_spectra(pre, pim, m)
        return (re.reshape(lead + (m // 2 + 1,)),
                im.reshape(lead + (m // 2 + 1,)))
    if _use_mxfft(m, axis):
        if x.shape[-1] < m:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, m - x.shape[-1])]
            x = jnp.pad(x, pad)
        elif x.shape[-1] > m:
            x = x[..., :m]
        from lsp_dsp_units_tpu.ops.mxfft import rfft_mx
        return rfft_mx(x, m)
    s = jnp.fft.rfft(x, n, axis=axis)
    return jnp.real(s), jnp.imag(s)


def irfft_sc(sc: SC, n: int | None = None, axis: int = -1) -> Array:
    m = 2 * (sc[0].shape[axis] - 1) if n is None else int(n)
    if _use_packed(m, axis) and sc[0].shape[-1] == m // 2 + 1:
        from lsp_dsp_units_tpu.ops import pallas_fft as pfft
        lead = sc[0].shape[:-1]
        re = sc[0].reshape((-1, m // 2 + 1)).astype(jnp.float32)
        im = sc[1].reshape((-1, m // 2 + 1)).astype(jnp.float32)
        # materialize before the pack transposes: XLA fusing the
        # caller's spectrum-hook producer into a transpose measured
        # ~5x slower in the SpectralProcessor context (NUMERICS r5)
        re, im = jax.lax.optimization_barrier((re, im))
        pre, pim = pfft.pack_spectra(re, im, m)
        y = pfft.irfft_packed((pre, pim), m)
        return y.reshape(lead + (m,))
    if _use_mxfft(m, axis) and sc[0].shape[-1] == m // 2 + 1:
        from lsp_dsp_units_tpu.ops.mxfft import irfft_mx
        return irfft_mx(sc, m)
    return jnp.fft.irfft(jax.lax.complex(sc[0], sc[1]), n, axis=axis)


def sc_from(z: Array) -> SC:
    return jnp.real(z), jnp.imag(z)


def sc_to(sc: SC) -> Array:
    return jax.lax.complex(sc[0], sc[1])


def sc_mul(a: SC, b: SC) -> SC:
    ar, ai = a
    br, bi = b
    return ar * br - ai * bi, ar * bi + ai * br


def sc_rmul(a: SC, g: Array) -> SC:
    return a[0] * g, a[1] * g


def sc_add(a: SC, b: SC) -> SC:
    return a[0] + b[0], a[1] + b[1]


def sc_sum(a: SC, axis: int) -> SC:
    return jnp.sum(a[0], axis=axis), jnp.sum(a[1], axis=axis)


def sc_concat(parts, axis: int) -> SC:
    return (jnp.concatenate([p[0] for p in parts], axis=axis),
            jnp.concatenate([p[1] for p in parts], axis=axis))


def sc_zeros(shape, dtype=jnp.float32) -> SC:
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def sc_conj(a: SC) -> SC:
    return a[0], -a[1]


def sc_abs(a: SC) -> Array:
    return jnp.sqrt(a[0] * a[0] + a[1] * a[1])


# Backwards-compatible helpers over complex arrays (CPU paths / tests).
def cmul(a: Array, b: Array) -> Array:
    """Complex multiply via real arithmetic (safe on all backends)."""
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    return jax.lax.complex(ar * br - ai * bi, ar * bi + ai * br)


def crmul(a: Array, g: Array) -> Array:
    """Complex * real multiply without complex-dtype broadcast ops."""
    return jax.lax.complex(jnp.real(a) * g, jnp.imag(a) * g)
