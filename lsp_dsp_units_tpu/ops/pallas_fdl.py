"""Pallas TPU kernel for the ring-FDL spectra MAC + slot write.

The partitioned-FFT convolver's per-block work outside the FFT pair is
(a) the complex MAC ``acc = sum_p ring[p] * H[(w-p)%P]`` over the
[P, C, F] spectra ring and (b) writing the newest block's spectrum into
slot ``w``.  As XLA ops (ops.fftconv.fdl_ring_step) the TPU HLO
materializes the product and pairs async copies around the carry's
dynamic-update-slice — measured ~160 us/block of the chain's FDL stage
against ~40 us of unavoidable ring traffic (NUMERICS.md round-4
anatomy).  This kernel does the MAC *as if the slot were already
written* (the ``p == w`` term reads the new spectrum directly), keeps
the accumulator resident in VMEM across partitions, and flushes the new
spectrum into the aliased ring buffer's slot ``w`` — one read of the
ring, one [C, F] accumulator write, one [C, F] slot write, nothing
materialized in between.

The ring is PARTITION-MAJOR [P, C, F]: Mosaic requires the last two
block dims be 8/128-divisible or span the array, so per-slot [1, C_t,
F] blocks are legal where channel-major [C_t, 1, F] blocks are not.

Matches the reference convolver's partition summation order
(/root/reference/src/main/util/Convolver.cpp frame MAC loop):
partition index ascending, the newest (p == w, i.e. H[0]) term
included in sequence.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_C_TILE = 8      # channel rows per grid step ([1, 8, F] f32 ring blocks)


def _kernel(w_ref, ring_re_ref, ring_im_ref, h_re_ref, h_im_ref,
            sr_ref, si_ref,
            acc_re_ref, acc_im_ref, rout_re_ref, rout_im_ref,
            *, packed_dc: bool):
    from jax.experimental import pallas as pl

    p = pl.program_id(1)
    n_p = pl.num_programs(1)
    w = w_ref[0]

    # ring-as-if-updated: the slot being replaced contributes the NEW
    # spectrum; arithmetic mask instead of a scalar-pred select (Mosaic
    # layout inference is happiest with pure elementwise chains)
    m = (p == w).astype(jnp.float32)
    xr = ring_re_ref[0, :, :] * (1.0 - m) + sr_ref[...] * m
    xi = ring_im_ref[0, :, :] * (1.0 - m) + si_ref[...] * m
    hr = h_re_ref[0, :, :]       # [1, F], broadcasts over channel rows
    hi = h_im_ref[0, :, :]

    prod_re = xr * hr - xi * hi
    prod_im = xr * hi + xi * hr
    if packed_dc:
        # scrambled-packed spectra (ops.pallas_fft): bin 0 carries
        # (DC, Nyquist) as two REAL values in (re, im) — their product
        # is slot-wise real multiplication, not complex
        dc = (jax.lax.broadcasted_iota(
            jnp.int32, prod_re.shape, 1) == 0).astype(jnp.float32)
        prod_re = prod_re * (1.0 - dc) + (xr * hr) * dc
        prod_im = prod_im * (1.0 - dc) + (xi * hi) * dc

    @pl.when(p == 0)
    def _init():
        acc_re_ref[...] = prod_re
        acc_im_ref[...] = prod_im

    @pl.when(p != 0)
    def _mac():
        acc_re_ref[...] += prod_re
        acc_im_ref[...] += prod_im

    @pl.when(p == n_p - 1)
    def _slot():
        rout_re_ref[0, :, :] = sr_ref[...]
        rout_im_ref[0, :, :] = si_ref[...]


def ring_mac_pallas(ring_re: Array, ring_im: Array,
                    h_rot_re: Array, h_rot_im: Array,
                    sr: Array, si: Array, w: Array,
                    interpret: bool = False,
                    packed_dc: bool = False
                    ) -> Tuple[Array, Array, Array, Array]:
    """MAC over the spectra ring + in-place slot write.

    ``ring_*``: [P, C, F] carried spectra, partition-major (donated;
    slot ``w`` of the returned buffers holds ``sr``/``si``).
    ``h_rot_*``: [P, F] IR spectra pre-rotated so partition p
    multiplies ring slot p under the as-if-updated convention
    (``h_rot[p] = H[(w - p) % P]``).  ``sr``/``si``: [C, F] newest
    block spectrum.  ``w``: [] int32.

    Returns (acc_re [C, F], acc_im [C, F], ring_re', ring_im').
    """
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p, c, f = ring_re.shape
    c_t = _C_TILE if c % _C_TILE == 0 else c
    w_arr = jnp.reshape(jnp.asarray(w, jnp.int32), (1,))
    h3_re = h_rot_re.reshape(p, 1, f)
    h3_im = h_rot_im.reshape(p, 1, f)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c // c_t, p),
        in_specs=[
            pl.BlockSpec((1, c_t, f), lambda ci, pi, wr: (pi, ci, 0)),
            pl.BlockSpec((1, c_t, f), lambda ci, pi, wr: (pi, ci, 0)),
            pl.BlockSpec((1, 1, f), lambda ci, pi, wr: (pi, 0, 0)),
            pl.BlockSpec((1, 1, f), lambda ci, pi, wr: (pi, 0, 0)),
            pl.BlockSpec((c_t, f), lambda ci, pi, wr: (ci, 0)),
            pl.BlockSpec((c_t, f), lambda ci, pi, wr: (ci, 0)),
        ],
        out_specs=(
            pl.BlockSpec((c_t, f), lambda ci, pi, wr: (ci, 0)),
            pl.BlockSpec((c_t, f), lambda ci, pi, wr: (ci, 0)),
            pl.BlockSpec((1, c_t, f), lambda ci, pi, wr: (wr[0], ci, 0)),
            pl.BlockSpec((1, c_t, f), lambda ci, pi, wr: (wr[0], ci, 0)),
        ),
    )
    acc_re, acc_im, rout_re, rout_im = pl.pallas_call(
        functools.partial(_kernel, packed_dc=packed_dc),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((c, f), jnp.float32),
            jax.ShapeDtypeStruct((c, f), jnp.float32),
            jax.ShapeDtypeStruct((p, c, f), jnp.float32),
            jax.ShapeDtypeStruct((p, c, f), jnp.float32),
        ),
        # scalar-prefetch arg is input 0; ring_re/ring_im are inputs 1/2
        input_output_aliases={1: 2, 2: 3},
        interpret=interpret,
    )(w_arr, ring_re, ring_im, h3_re, h3_im, sr, si)
    return acc_re, acc_im, rout_re, rout_im
