"""Device-side i16 delivery: TPDF dither from a precomputed table.

The chain's output leaves the chip as 16-bit PCM (the reference's own
sink format, Dither.cpp) — 4x fewer D2H bytes than f32.  The TPDF
noise comes from a device-resident table sliced at a per-call offset:
the same table-seeded-randomizer design as the reference Dither, and
~5% faster than threefry jax.random per call
(benchmarks/delivery_probe.py).  Shared by bench.py and the delivery
probe so the dither under measurement is the one being compared.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TABLE_EXTRA = 65536          # per-call offset wraps at this many slots


def tpdf_i16_table(channels: int, t: int, seed: int = 7) -> jax.Array:
    """[channels, t + TABLE_EXTRA] float32 TPDF noise at +-0.5 LSB."""
    rng = np.random.default_rng(seed)
    delta_half = 0.5 / 32768.0
    return jnp.asarray(
        ((rng.random((channels, t + TABLE_EXTRA))
          + rng.random((channels, t + TABLE_EXTRA)) - 1.0)
         * delta_half).astype(np.float32))


def quantize_i16(y: jax.Array, table: jax.Array, k) -> jax.Array:
    """Dither + quantize [..., T] float32 to int16 PCM; ``k`` is the
    per-call table offset (uint32, wraps at TABLE_EXTRA)."""
    noise = jax.lax.dynamic_slice(
        table, (jnp.uint32(0), k & jnp.uint32(TABLE_EXTRA - 1)),
        (table.shape[0], y.shape[-1]))
    return jnp.clip((y + noise) * 32767.0,
                    -32768.0, 32767.0).astype(jnp.int16)
