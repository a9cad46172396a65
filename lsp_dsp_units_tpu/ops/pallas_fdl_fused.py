"""Single-kernel ring-FDL convolver block: forward packed FFT -> ring
MAC -> half-frame inverse FFT, one Pallas program.

The three-kernel form (ops.pallas_fft rfft/irfft + ops.pallas_fdl ring
MAC) round-trips the new spectrum and the accumulator through HBM
(~16 MB/block) and pays three kernel launches; fusing keeps the
per-channel spectrum and accumulator in VMEM from the moment the FFT
produces them until the inverse consumes them.  Everything stays on the
[n1, n2] packed grid (ops.pallas_fft convention), so the spectra ring
is just a free 4D view of the carried [P, C, F] buffer.

Dataflow per channel tile (grid over C):
  z = deinterleaved frame halves          [c_t, n1, n2] x2 (XLA glue)
  S = fwd four-step + untangle            (pallas_fft._fwd_one)
  acc = sum_p ring'[p] * Hrot[p]          (ring' = ring with slot w := S)
  ring[w] := S                            (aliased in-place slot write)
  y = half-frame inverse                  (pallas_fft._inv_one, rows
                                           a >= n1/2 only)

Matches the reference convolver's frame loop semantics
(/root/reference/src/main/util/Convolver.cpp:159-293): one frame FFT,
partition MAC against the history FDL, one inverse per block.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from lsp_dsp_units_tpu.ops import pallas_fft as pfft

Array = jax.Array

_C_TILE = 4   # same-run A/B: 319.8 (ct=4) vs 323.0 (ct=8) vs 328.4 (ct=2) us/block


def _kernel(w_ref, zr_ref, zi_ref, ring_re_ref, ring_im_ref,
            h_re_ref, h_im_ref, *rest, n: int, x3: bool):
    t, tt = pfft._read_tables(rest[:21])
    (yr_ref, yi_ref, rout_re_ref, rout_im_ref) = rest[21:]
    dot = pfft._dot3 if x3 else pfft._dot
    m00 = t[10]
    w = w_ref[0]
    n_p = ring_re_ref.shape[0]
    inv_m = 2.0 / n

    # whole channel tile at once: lane-packed forward transform, 3D
    # elementwise ring MAC (h broadcasts [n1, n2] over the tile),
    # lane-packed half-frame inverse (pfft._fwd_tile/_inv_tile)
    sr3, si3 = pfft._fwd_tile(zr_ref[...], zi_ref[...], t, tt, dot,
                              x3=x3)
    # (a four-real-product-sum form with one select outside the loop
    # measured ~16 us SLOWER at SCAN=512 — four live [c_t, n1, n2]
    # accumulators spill; the two-accumulator masked form stays)
    acc_r = jnp.zeros_like(sr3)
    acc_i = jnp.zeros_like(si3)
    for p in range(n_p):
        m = (p == w).astype(jnp.float32)
        xr = ring_re_ref[p] * (1.0 - m) + sr3 * m
        xi = ring_im_ref[p] * (1.0 - m) + si3 * m
        hr = h_re_ref[p]
        hi = h_im_ref[p]
        pr = xr * hr - xi * hi
        pi = xr * hi + xi * hr
        pr = pr * (1.0 - m00) + (xr * hr) * m00
        pi = pi * (1.0 - m00) + (xi * hi) * m00
        acc_r = acc_r + pr
        acc_i = acc_i + pi
    rout_re_ref[0] = sr3
    rout_im_ref[0] = si3
    gr3, gi3 = pfft._inv_tile(acc_r, acc_i, t, tt, inv_m, "last", dot,
                              x3=x3)
    yr_ref[...] = gr3
    yi_ref[...] = gi3


def fdl_fused_pallas(ring_re: Array, ring_im: Array,
                     h_rot_re: Array, h_rot_im: Array,
                     frame: Array, w: Array, n: int,
                     interpret: bool = False, x3: bool = True
                     ) -> Tuple[Array, Array, Array]:
    """One convolver block, fully fused.

    ``ring_*``: [P, C, F] scrambled-packed spectra ring (donated; slot
    ``w`` of the returned buffers holds the frame's spectrum).
    ``h_rot_*``: [P, F] packed IR spectra pre-rotated
    (``h_rot[p] = H[(w - p) % P]``).  ``frame``: [C, N] overlap-save
    frame (N = 2B = 2F).  ``w``: [] int32.

    Returns (y [C, B] — the frame's last-half convolution output,
    ring_re', ring_im')."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p, c, f = ring_re.shape
    n1, n2 = pfft.factor_m(n)
    assert n1 * n2 == f and frame.shape == (c, n)
    c_t = _C_TILE if c % _C_TILE == 0 else c

    xp = frame.astype(jnp.float32).reshape(c, f, 2)
    zr = xp[..., 0].reshape(c, n1, n2)
    zi = xp[..., 1].reshape(c, n1, n2)
    ring4_re = ring_re.reshape(p, c, n1, n2)
    ring4_im = ring_im.reshape(p, c, n1, n2)
    h3_re = h_rot_re.reshape(p, n1, n2)
    h3_im = h_rot_im.reshape(p, n1, n2)
    w_arr = jnp.reshape(jnp.asarray(w, jnp.int32), (1,))

    consts = pfft._all_consts(n, c_t)
    const_specs = [
        pl.BlockSpec(v.shape, functools.partial(
            lambda nd, ci, wr: (0,) * nd, v.ndim)) for v in consts]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c // c_t,),
        in_specs=[
            pl.BlockSpec((c_t, n1, n2), lambda ci, wr: (ci, 0, 0)),
            pl.BlockSpec((c_t, n1, n2), lambda ci, wr: (ci, 0, 0)),
            pl.BlockSpec((p, c_t, n1, n2),
                         lambda ci, wr: (0, ci, 0, 0)),
            pl.BlockSpec((p, c_t, n1, n2),
                         lambda ci, wr: (0, ci, 0, 0)),
            pl.BlockSpec((p, n1, n2), lambda ci, wr: (0, 0, 0)),
            pl.BlockSpec((p, n1, n2), lambda ci, wr: (0, 0, 0)),
        ] + const_specs,
        out_specs=(
            pl.BlockSpec((c_t, n1 // 2, n2), lambda ci, wr: (ci, 0, 0)),
            pl.BlockSpec((c_t, n1 // 2, n2), lambda ci, wr: (ci, 0, 0)),
            pl.BlockSpec((1, c_t, n1, n2),
                         lambda ci, wr: (wr[0], ci, 0, 0)),
            pl.BlockSpec((1, c_t, n1, n2),
                         lambda ci, wr: (wr[0], ci, 0, 0)),
        ),
    )
    # materialize kernel inputs (see pallas_fft._call: producer
    # fusion into the custom-call input is pathologically slow)
    zr, zi = jax.lax.optimization_barrier((zr, zi))
    yzr, yzi, rout_re, rout_im = pl.pallas_call(
        functools.partial(_kernel, n=n, x3=x3),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((c, n1 // 2, n2), jnp.float32),
            jax.ShapeDtypeStruct((c, n1 // 2, n2), jnp.float32),
            jax.ShapeDtypeStruct((p, c, n1, n2), jnp.float32),
            jax.ShapeDtypeStruct((p, c, n1, n2), jnp.float32),
        ),
        # scalar prefetch is input 0; ring planes are inputs 3/4 and
        # alias outputs 2/3 (slot-only in-place write)
        input_output_aliases={3: 2, 4: 3},
        interpret=interpret,
    )(w_arr, zr, zi, ring4_re, ring4_im, h3_re, h3_im, *consts)

    m_half = (n1 // 2) * n2
    y = jnp.stack([yzr.reshape(c, m_half), yzi.reshape(c, m_half)],
                  axis=-1).reshape(c, 2 * m_half)
    return y, rout_re.reshape(p, c, f), rout_im.reshape(p, c, f)


def _eqfdl_kernel(w_ref, zx_r_ref, zx_i_ref, cz_r_ref, cz_i_ref,
                  hz_r_ref, hz_i_ref, ring_re_ref, ring_im_ref,
                  heq_r_ref, heq_i_ref, h_re_ref, h_im_ref,
                  *rest, n: int, x3: bool):
    t, tt = pfft._read_tables(rest[:21])
    (yr_ref, yi_ref, uz_r_ref, uz_i_ref,
     rout_re_ref, rout_im_ref) = rest[21:]
    dot = pfft._dot3 if x3 else pfft._dot
    m00 = t[10]
    w = w_ref[0]
    n_p = ring_re_ref.shape[0]
    inv_m = 2.0 / n
    heq_r = heq_r_ref[...]
    heq_i = heq_i_ref[...]

    # EQ zero-state convolution over the whole tile: zero-padded
    # lane-packed forward, packed product with the cascade spectrum
    # ([n1, n2] broadcast over channels), first-half inverse, plus the
    # carried-state correction (computed outside, z-packed)
    xr_s, xi_s = pfft._fwd_tile(zx_r_ref[...], zx_i_ref[...], t, tt,
                                dot, halfin=True, x3=x3)
    m00b = m00 > 0.5
    pr = jnp.where(m00b, xr_s * heq_r, xr_s * heq_r - xi_s * heq_i)
    pi = jnp.where(m00b, xi_s * heq_i, xr_s * heq_i + xi_s * heq_r)
    uzr3, uzi3 = pfft._inv_tile(pr, pi, t, tt, inv_m, "first", dot,
                                x3=x3)
    uzr3 = uzr3 + cz_r_ref[...]
    uzi3 = uzi3 + cz_i_ref[...]
    uz_r_ref[...] = uzr3
    uz_i_ref[...] = uzi3

    # FDL frame = [previous EQ-output block || this one], already in
    # packed z-rows (the EQ inverse emits exactly this format)
    zfr3 = jnp.concatenate([hz_r_ref[...], uzr3], axis=1)
    zfi3 = jnp.concatenate([hz_i_ref[...], uzi3], axis=1)
    sr3, si3 = pfft._fwd_tile(zfr3, zfi3, t, tt, dot, x3=x3)
    # two-accumulator masked MAC (see _kernel note)
    acc_r = jnp.zeros_like(sr3)
    acc_i = jnp.zeros_like(si3)
    for p in range(n_p):
        m = (p == w).astype(jnp.float32)
        xr = ring_re_ref[p] * (1.0 - m) + sr3 * m
        xi = ring_im_ref[p] * (1.0 - m) + si3 * m
        hr = h_re_ref[p]
        hi = h_im_ref[p]
        pr = xr * hr - xi * hi
        pi = xr * hi + xi * hr
        pr = pr * (1.0 - m00) + (xr * hr) * m00
        pi = pi * (1.0 - m00) + (xi * hi) * m00
        acc_r = acc_r + pr
        acc_i = acc_i + pi
    rout_re_ref[0] = sr3
    rout_im_ref[0] = si3
    gr3, gi3 = pfft._inv_tile(acc_r, acc_i, t, tt, inv_m, "last", dot,
                              x3=x3)
    yr_ref[...] = gr3
    yi_ref[...] = gi3


def eqfdl_fused_pallas(ring_re: Array, ring_im: Array,
                       h_rot_re: Array, h_rot_im: Array,
                       heq_re: Array, heq_im: Array,
                       x_block: Array, corr: Array, hist: Array,
                       w: Array, n: int,
                       interpret: bool = False, x3: bool = True):
    """EQ zero-state convolution + ring-FDL convolver block, ONE
    Pallas program (the chain's whole linear path per block).

    ``heq_*``: [F] packed EQ cascade spectrum.  ``x_block``: [C, B]
    raw input.  ``corr``: [C, B] the EQ's carried-state correction
    (g_mat @ sv, computed outside).  ``hist``: [C, B] previous block's
    EQ OUTPUT (the overlap-save history).  Other args as
    :func:`fdl_fused_pallas`.

    Returns (y [C, B], u [C, B] — this block's EQ output, to carry as
    the next ``hist`` — ring_re', ring_im')."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p, c, f = ring_re.shape
    n1, n2 = pfft.factor_m(n)
    b = n // 2
    assert n1 * n2 == f and x_block.shape == (c, b)
    c_t = _C_TILE if c % _C_TILE == 0 else c

    def zpack(v):
        vp = v.astype(jnp.float32).reshape(c, b // 2, 2)
        return (vp[..., 0].reshape(c, n1 // 2, n2),
                vp[..., 1].reshape(c, n1 // 2, n2))

    zx_r, zx_i = zpack(x_block)
    cz_r, cz_i = zpack(corr)
    hz_r, hz_i = zpack(hist)
    ring4_re = ring_re.reshape(p, c, n1, n2)
    ring4_im = ring_im.reshape(p, c, n1, n2)
    h3_re = h_rot_re.reshape(p, n1, n2)
    h3_im = h_rot_im.reshape(p, n1, n2)
    heq2_re = heq_re.reshape(n1, n2)
    heq2_im = heq_im.reshape(n1, n2)
    w_arr = jnp.reshape(jnp.asarray(w, jnp.int32), (1,))

    consts = pfft._all_consts(n, c_t)
    const_specs = [
        pl.BlockSpec(v.shape, functools.partial(
            lambda nd, ci, wr: (0,) * nd, v.ndim)) for v in consts]
    half_spec = pl.BlockSpec((c_t, n1 // 2, n2),
                             lambda ci, wr: (ci, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c // c_t,),
        in_specs=[half_spec, half_spec, half_spec, half_spec,
                  half_spec, half_spec,
                  pl.BlockSpec((p, c_t, n1, n2),
                               lambda ci, wr: (0, ci, 0, 0)),
                  pl.BlockSpec((p, c_t, n1, n2),
                               lambda ci, wr: (0, ci, 0, 0)),
                  pl.BlockSpec((n1, n2), lambda ci, wr: (0, 0)),
                  pl.BlockSpec((n1, n2), lambda ci, wr: (0, 0)),
                  pl.BlockSpec((p, n1, n2), lambda ci, wr: (0, 0, 0)),
                  pl.BlockSpec((p, n1, n2), lambda ci, wr: (0, 0, 0)),
                  ] + const_specs,
        out_specs=(half_spec, half_spec, half_spec, half_spec,
                   pl.BlockSpec((1, c_t, n1, n2),
                                lambda ci, wr: (wr[0], ci, 0, 0)),
                   pl.BlockSpec((1, c_t, n1, n2),
                                lambda ci, wr: (wr[0], ci, 0, 0))),
    )
    half_shape = jax.ShapeDtypeStruct((c, n1 // 2, n2), jnp.float32)
    zx_r, zx_i, cz_r, cz_i, hz_r, hz_i = jax.lax.optimization_barrier(
        (zx_r, zx_i, cz_r, cz_i, hz_r, hz_i))
    yzr, yzi, uzr, uzi, rout_re, rout_im = pl.pallas_call(
        functools.partial(_eqfdl_kernel, n=n, x3=x3),
        grid_spec=grid_spec,
        out_shape=(half_shape, half_shape, half_shape, half_shape,
                   jax.ShapeDtypeStruct((p, c, n1, n2), jnp.float32),
                   jax.ShapeDtypeStruct((p, c, n1, n2), jnp.float32)),
        # scalar prefetch is input 0; ring planes are inputs 7/8 and
        # alias outputs 4/5 (slot-only in-place write)
        input_output_aliases={7: 4, 8: 5},
        interpret=interpret,
    )(w_arr, zx_r, zx_i, cz_r, cz_i, hz_r, hz_i,
      ring4_re, ring4_im, heq2_re, heq2_im, h3_re, h3_im, *consts)

    m_half = (n1 // 2) * n2

    def unpack(zr, zi):
        out = jnp.stack([zr.reshape(c, m_half), zi.reshape(c, m_half)],
                        axis=-1)
        return out.reshape(c, 2 * m_half)

    return (unpack(yzr, yzi), unpack(uzr, uzi),
            rout_re.reshape(p, c, f), rout_im.reshape(p, c, f))
