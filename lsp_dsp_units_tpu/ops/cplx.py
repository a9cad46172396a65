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


def rfft_sc(x: Array, n: int | None = None, axis: int = -1) -> SC:
    s = jnp.fft.rfft(x, n, axis=axis)
    return jnp.real(s), jnp.imag(s)


def irfft_sc(sc: SC, n: int | None = None, axis: int = -1) -> Array:
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
