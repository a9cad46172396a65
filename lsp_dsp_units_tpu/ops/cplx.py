"""Complex arithmetic compatibility helpers.

The axon TPU backend fails with ``UNIMPLEMENTED`` on broadcasting
complex64 * complex64 multiplies (empirically bisected: ``rfft(x) * h``
dies while the same product written in real arithmetic compiles and
runs).  Every spectrum product in the framework goes through these
helpers, which expand to explicit real/imag arithmetic — XLA fuses them
to the identical operation count on healthy backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def cmul(a: Array, b: Array) -> Array:
    """Complex multiply via real arithmetic (safe on all backends)."""
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    return jax.lax.complex(ar * br - ai * bi, ar * bi + ai * br)


def crmul(a: Array, g: Array) -> Array:
    """Complex * real multiply without complex-dtype broadcast ops."""
    return jax.lax.complex(jnp.real(a) * g, jnp.imag(a) * g)
