"""Pallas TPU four-step real FFT in SCRAMBLED-PACKED spectrum order.

The backend's native FFT runs 15-20x below HBM streaming rate (the
64x16384 rfft+irfft pair measures ~180 us — NUMERICS.md round-4
anatomy) and the XLA matmul FFT (ops.mxfft) loses its MXU win to the
HBM transposes between the four-step stages.  This kernel keeps the
whole four-step inside VMEM, where the "transposes" are free: the
stage-1 DFT contracts the SUBLANE axis by multiplying the DFT matrix
from the LEFT, the stage-2 DFT contracts the LANE axis from the RIGHT,
and the conjugate-pair permutation of the real-input untangle is two
small permutation matmuls.  No data transposition ever happens.

The price is the OUTPUT ORDER: bin (k1, k2) of the [n1, n2] result
grid holds natural bin ``k = k1 + n1*k2`` ("scrambled"), and the
Nyquist bin is packed into the imaginary slot of the (real) DC bin so
the spectrum is exactly N/2 complex values on an aligned [n1, n2]
grid.  The ring-FDL convolver never looks at bin ORDER — its MAC is
elementwise and its IR spectra are packed once at build — so the
scramble costs nothing and the irfft here consumes it directly.
(Packing DC+Nyquist into one complex bin is the classic real-FFT
storage convention; the reference convolver likewise works on an
opaque internal packed spectrum via dsp::fastconv_parse/apply,
/root/reference/src/main/util/Convolver.cpp:159-293 — PARITY.md.)

Math (forward, N-point real, M = N/2 = n1*n2):
  z[n] = x[2n] + i x[2n+1]                       (real packing)
  Z[k1 + n1 k2] = sum_b W_M^(b k1) W_n2^(b k2) sum_a z[a,b] W_n1^(a k1)
      with z laid out [a, b] (n = a*n2 + b):
      stage A:  y  = W1 @ z        ([n1,n1] left-matmul, W1 symmetric)
      stage B:  t  = y * tw        (elementwise twiddle [n1,n2])
      stage C:  Z  = t @ W2        ([n2,n2] right-matmul)
  untangle:  X[k] = E[k] + W_N^k O[k],
      E = (Z + conj(Z[M-k]))/2,  O = -i (Z - conj(Z[M-k]))/2,
      with Z[M-k] = P1 @ (Z @ R) (+ row-0 fix via R0-R), all
      permutation matmuls;  X[M] (real) packed into im(X[0]).

Tables are precomputed in float64 and rounded once.  Matmuls run in
bf16x3 emulation by default (``X3``: 105 dB forward / 103 dB
roundtrip at N=16384, comfortably above the >=95 dB chain contract of
NUMERICS.md, at half the MXU passes) or at precision=HIGHEST
(138/135 dB measured on-chip) via ``x3=False``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_C_TILE = 8
_PREC = jax.lax.Precision.HIGHEST
# default matmul mode: bf16x3 emulation (see _dot3) — measured ~105 dB
# vs HIGHEST's 138 dB at roughly half the MXU time; flip per call via
# the x3= parameter, or globally with LSP_TPU_FFT_X3=0 (read ONCE at
# import — jitted callers cache compiled branches; the chain reads the
# same variable per trace, so both paths agree)
import os as _os
X3 = _os.environ.get("LSP_TPU_FFT_X3", "1") != "0"


def factor_m(n: int) -> Tuple[int, int]:
    """M = N/2 split as n1 * n2, both powers of two, preferring the
    most balanced split with n2 >= 128 (full lane tiles)."""
    m = n // 2
    n1 = 1 << (m.bit_length() - 1 >> 1)
    while m % n1:
        n1 >>= 1
    n2 = m // n1
    while n2 < 128 and n1 >= 2:
        n1 >>= 1
        n2 <<= 1
    return n1, n2


def _tables_bytes(n: int, c_t: int) -> int:
    """Closed-form byte size of the base + tile const tables (base:
    w1/w2/tw/wn pairs + p1/rrev/rfix/m0/m00; tile: the K-doubled
    W-cats, their half variants and I_ct (x) P1) — no arrays are
    built, so candidate-c_t probing costs nothing."""
    n1, n2 = factor_m(n)
    base = 3 * n1 * n1 + 4 * n2 * n2 + 6 * n1 * n2
    tile = 14 * n1 * n1 + 8 * n2 * n2 + (c_t * n1) ** 2
    return 4 * (base + tile)


def supported(n: int) -> bool:
    """Shapes this kernel handles well: N a power of two with an
    [n1 >= 8, n2 multiple of 128] packed grid that FITS VMEM at
    c_t = 1 INCLUDING the const tables (N = 131072's [256, 256] grid
    carries ~9 MB of tables alone; the bulk tier's N = 262144+
    super-blocks are further out — both must fall back to the native
    FFT instead of failing Mosaic's VMEM budget)."""
    if n & (n - 1) or n < 2048:
        return False
    n1, n2 = factor_m(n)
    if n1 < 8 or n2 % 128 != 0:
        return False
    # mirror _call's per-channel working-set estimate at c_t = 1
    per_c = 4 * (2 * n1 + 3 * n1) * n2 * 4
    return _tables_bytes(n, 1) + 2 * per_c <= (11 << 20)


@functools.lru_cache(maxsize=8)
def _tables(n: int):
    n1, n2 = factor_m(n)
    m = n // 2
    a = np.arange(n1)
    b = np.arange(n2)
    w1 = np.exp(-2j * np.pi * np.outer(a, a) / n1)          # [n1, n1]
    w2 = np.exp(-2j * np.pi * np.outer(b, b) / n2)          # [n2, n2]
    tw = np.exp(-2j * np.pi * np.outer(a, b) / m)           # [n1, n2]
    # W_N^k on the scrambled grid: k = k1 + n1 k2
    k_grid = a[:, None] + n1 * b[None, :]
    wn = np.exp(-2j * np.pi * k_grid / n)                   # [n1, n2]
    # conj-pair permutations: Z[M-k] = (P1 @ (Z @ R))[k1,k2] with the
    # k1 = 0 row read through R0 instead of R (see module docstring)
    r_rev = np.zeros((n2, n2), np.float32)
    r_rev[np.arange(n2)[::-1], np.arange(n2)] = 1.0         # b = n2-1-k2
    r0 = np.zeros((n2, n2), np.float32)
    r0[(-b) % n2, b] = 1.0                                  # b = (-k2)%n2
    p1 = np.zeros((n1, n1), np.float32)
    p1[(n1 - a) % n1, a] = 1.0    # row k1 reads row (n1-k1)%n1... see use
    # p1[src, dst]: (P1 @ Y)[k1] = sum_a P1[k1, a] Y[a] -> need
    # P1[k1, a] = 1 iff a = (n1 - k1) % n1
    p1 = np.zeros((n1, n1), np.float32)
    p1[a, (n1 - a) % n1] = 1.0
    m0 = np.zeros((n1, n2), np.float32)
    m0[0, :] = 1.0                                          # row-0 mask
    m00 = np.zeros((n1, n2), np.float32)
    m00[0, 0] = 1.0                                         # DC-bin mask
    f32 = lambda z: (np.ascontiguousarray(z.real, np.float32),
                     np.ascontiguousarray(z.imag, np.float32))
    return (n1, n2, f32(w1), f32(w2), f32(tw), f32(wn),
            p1, r_rev.astype(np.float32), (r0 - r_rev).astype(np.float32),
            m0, m00)


def _dot(a, b):
    return jnp.dot(a, b, precision=_PREC,
                   preferred_element_type=jnp.float32)


def _dot3(a, b):
    """bf16x3 f32-emulated matmul: split both operands into
    high + low bfloat16 halves and drop the low*low term — the classic
    3-pass decomposition (~2^-18 relative error, ~105 dB on the FFT
    sizes here).  Mosaic supports only DEFAULT (1-pass bf16, ~50 dB)
    and HIGHEST (6-pass, 138 dB measured) dot precisions; this is the
    missing middle at half of HIGHEST's MXU time (pass cost measured
    ~36 us per pass-set on the 64-ch pair — NUMERICS.md).  The
    repeated table splits across the unrolled channel loop are CSE'd
    by the compiler."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(p, q):
        # precision pinned: a global jax_default_matmul_precision of
        # "highest" would otherwise request fp32 contraction on these
        # bf16 operands, which Mosaic rejects ("Bad lhs type")
        return jnp.dot(p, q, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)

    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _split_bf16(a):
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    return ah, al


def _dperm(a, p, lhs_perm=False):
    """bf16x3-accuracy product with an EXACTLY-bf16-representable
    permutation matrix (0/1 entries): the matrix's low half is
    identically zero, so TWO passes reproduce the full split —
    (ah + al) @ p — instead of dot3's three."""
    ph = p.astype(jnp.bfloat16)
    ah, al = _split_bf16(a)

    def d(u, v):
        return jnp.dot(u, v, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)

    if lhs_perm:
        return d(ph, ah) + d(ph, al)
    return d(ah, ph) + d(al, ph)


def _conj_pair(zr, zi, p1, rrev, rfix, m0, dot, x3):
    """(zfr, zfi) with zf[k1,k2] = conj(Z[(M - k)%M]) on the scrambled
    grid.  Only ROW 0 of the rfix product survives the m0 mask, so the
    matmul runs on an 8-row slice (the minimum sublane tile) instead of
    the full grid — ~20% of the transform's MXU work saved; the
    permutation products themselves use the 2-pass exact-bf16 form
    under x3."""
    if x3:
        dperm_r = functools.partial(_dperm, lhs_perm=False)
        def dperm_l(p, a):
            return _dperm(a, p, lhs_perm=True)
    else:
        dperm_r = dot
        dperm_l = dot
    ar = dperm_r(zr, rrev)
    ai = dperm_r(zi, rrev)
    fr = dperm_r(zr[0:8, :], rfix)[0:1, :]
    fi = dperm_r(zi[0:8, :], rfix)[0:1, :]
    pr = dperm_l(p1, ar) + m0 * fr
    pi = dperm_l(p1, ai) + m0 * fi
    return pr, -pi


def _fwd_one(zr, zi, t, dot, halfin=False, x3=True):
    """Forward four-step + untangle for ONE channel ([n1, n2] grids).
    ``halfin=True``: the caller's frame is x || zeros (zero-padded
    linear convolution) and z carries only the FIRST n1/2 rows — the
    zero rows are never materialized and stage A contracts only the
    matching W1 columns."""
    (_, _, (w1r, w1i), (w2r, w2i), (twr, twi), (wnr, wni),
     p1, rrev, rfix, m0, m00) = t
    _dot = dot
    if halfin:
        n1 = w1r.shape[0]
        w1r = w1r[:, :n1 // 2]
        w1i = w1i[:, :n1 // 2]
    # stage A: y = W1 @ z
    yr = _dot(w1r, zr) - _dot(w1i, zi)
    yi = _dot(w1r, zi) + _dot(w1i, zr)
    # stage B: twiddle
    tr = yr * twr - yi * twi
    ti = yr * twi + yi * twr
    # stage C: Z = t @ W2
    fr = _dot(tr, w2r) - _dot(ti, w2i)
    fi = _dot(tr, w2i) + _dot(ti, w2r)
    # untangle to the rfft half-spectrum
    zfr, zfi = _conj_pair(fr, fi, p1, rrev, rfix, m0, dot, x3)
    er = 0.5 * (fr + zfr)
    ei = 0.5 * (fi + zfi)
    orr = 0.5 * (fi - zfi)        # O = -i (Z - conj_pair)/2
    oi = -0.5 * (fr - zfr)
    xr = er + wnr * orr - wni * oi
    xi = ei + wnr * oi + wni * orr
    # pack Nyquist X[M] = E[0,0] - O[0,0] into im of the DC bin
    xi = xi * (1.0 - m00) + (er - orr) * m00
    return xr, xi


def _inv_one(xr, xi, t, inv_m, half, dot, x3=True):
    """Inverse for ONE channel: scrambled-packed [n1, n2] spectrum ->
    packed time z = x[2n] + i x[2n+1] on the natural [a, b] grid.
    ``half`` selects which N/2 time samples the final stage computes:
    "last" (rows a >= n1/2 — all an overlap-save consumer keeps) or
    "first" (rows a < n1/2 — all a zero-padded linear-convolution
    consumer keeps), halving the final stage either way."""
    (_, _, (w1r, w1i), (w2r, w2i), (twr, twi), (wnr, wni),
     p1, rrev, rfix, m0, m00) = t
    _dot = dot
    if half == "last":
        n1 = w1r.shape[0]
        w1r = w1r[n1 // 2:, :]
        w1i = w1i[n1 // 2:, :]
    elif half == "first":
        n1 = w1r.shape[0]
        w1r = w1r[:n1 // 2, :]
        w1i = w1i[:n1 // 2, :]
    # strip the packed Nyquist: true X grid has im(X[0]) = 0
    k1 = 1.0 - m00
    xr0 = xr
    xi0 = xi * k1
    # Xf[k] = conj(X[M-k]); bin (0,0) must read the PACKED X[M]
    xfr, xfi = _conj_pair(xr0, xi0, p1, rrev, rfix, m0, dot, x3)
    xfr = xfr * k1 + xi * m00     # X[M] (real) from the packed slot
    xfi = xfi * k1
    er = 0.5 * (xr0 + xfr)
    ei = 0.5 * (xi0 + xfi)
    dr = 0.5 * (xr0 - xfr)
    di = 0.5 * (xi0 - xfi)
    # O = D * conj(W_N^k)
    orr = dr * wnr + di * wni
    oi = di * wnr - dr * wni
    # Z = E + i O
    zr = er - oi
    zi = ei + orr
    # inverse four-step (conjugated tables), natural-order output
    ur = _dot(zr, w2r) + _dot(zi, w2i)
    ui = _dot(zi, w2r) - _dot(zr, w2i)
    vr = ur * twr + ui * twi
    vi = ui * twr - ur * twi
    gr = _dot(w1r, vr) + _dot(w1i, vi)
    gi = _dot(w1r, vi) - _dot(w1i, vr)
    return gr * inv_m, gi * inv_m


@functools.lru_cache(maxsize=16)
def _tile_tables(n: int, c_t: int):
    """Channel-tile ("lane-packed") tables: every matmul of the
    four-step runs at full MXU width across the whole c_t-channel tile
    (NUMERICS round-4 anatomy: the per-channel [64,64]x[64,128] form
    under-fills the 128x128 systolic array to ~28% of peak).

      - stage A: ONE K-doubled complex matmul
        [[W1r,-W1i],[W1i,W1r]] [2n1,2n1] @ [zr;zi] [2n1, c_t*n2]
      - stage C: channels row-stacked, [c_t*n1, 2n2] @ W2cat [2n2,2n2]
      - P1 untangle permutation: block-diagonal I_ct (x) P1 (0/1
        entries, exact in bf16, 2-pass)
    """
    t = _tables(n)
    n1, n2 = t[0], t[1]
    (w1r, w1i), (w2r, w2i) = t[2], t[3]
    p1 = t[6]
    h = n1 // 2

    def blocks(a, b, c, d):
        return np.block([[a, b], [c, d]]).astype(np.float32)

    w1cat_fwd = blocks(w1r, -w1i, w1i, w1r)                 # [2n1, 2n1]
    w1cat_fwd_half = np.concatenate(
        [np.concatenate([w1r[:, :h], -w1i[:, :h]], axis=1),
         np.concatenate([w1i[:, :h], w1r[:, :h]], axis=1)],
        axis=0).astype(np.float32)                          # [2n1, n1]
    w2cat_fwd = blocks(w2r, w2i, -w2i, w2r)                 # [2n2, 2n2]
    w2cat_inv = blocks(w2r, -w2i, w2i, w2r)
    w1cat_inv = blocks(w1r, w1i, -w1i, w1r)                 # [[gr],[gi]]
    w1cat_inv_first = np.concatenate(
        [w1cat_inv[:h], w1cat_inv[n1:n1 + h]], axis=0)
    w1cat_inv_last = np.concatenate(
        [w1cat_inv[h:n1], w1cat_inv[n1 + h:]], axis=0)
    p1big = np.kron(np.eye(c_t, dtype=np.float32), p1)      # [ct*n1, ..]
    return (w1cat_fwd, w1cat_fwd_half, w2cat_fwd, w2cat_inv,
            w1cat_inv, w1cat_inv_first, w1cat_inv_last, p1big)


def _to_wide(rows, c_t, n1, n2):
    """[c_t*n1, n2] rows-stacked -> [n1, c_t*n2] wide-lanes (in-VMEM
    lane-slice + concat relayout; ~c_t small copies)."""
    return jnp.concatenate(
        [rows[c * n1:(c + 1) * n1, :] for c in range(c_t)], axis=-1)


def _to_rows(wide, c_t, n1, n2):
    """[n1, c_t*n2] wide-lanes -> [c_t*n1, n2] rows-stacked."""
    return jnp.concatenate(
        [wide[:, c * n2:(c + 1) * n2] for c in range(c_t)], axis=0)


def _conj_pair_rows(zr, zi, tt, t, c_t, dot, x3):
    """Rows-stacked [c_t*n1, n2] conj-pair: zf[k1,k2] = conj(Z[M-k])
    per channel.  R right-multiplies batch across channels for free;
    P1 runs as the block-diagonal I (x) P1; the row-0 rfix products
    batch all channels' first 8 rows into one matmul."""
    p1 = t[6]
    rrev = t[7]
    rfix = t[8]
    p1big = tt[7]
    n1 = p1.shape[0]
    n2 = rrev.shape[0]
    if x3:
        dperm_r = functools.partial(_dperm, lhs_perm=False)

        def dperm_l(p, a):
            return _dperm(a, p, lhs_perm=True)
    else:
        dperm_r = dot
        dperm_l = dot
    # R: one batched right-perm over re and im stacked along rows
    acat = dperm_r(jnp.concatenate([zr, zi], axis=0), rrev)
    ar = acat[:c_t * n1, :]
    ai = acat[c_t * n1:, :]
    # rfix: all channels' first-8-row slices, one matmul, keep row 0
    # of each channel's product
    r8r = jnp.concatenate(
        [zr[c * n1:c * n1 + 8, :] for c in range(c_t)], axis=0)
    r8i = jnp.concatenate(
        [zi[c * n1:c * n1 + 8, :] for c in range(c_t)], axis=0)
    f8 = dperm_r(jnp.concatenate([r8r, r8i], axis=0), rfix)
    # fix rows land on row c*n1 of each channel: build [c_t, n1, n2]
    # with row 0 = fix, rest 0 (free reshape from rows view)
    zero_tail = jnp.zeros((c_t, n1 - 1, n2), jnp.float32)

    def fix3(prod):
        rows0 = jnp.concatenate(
            [prod[c * 8:c * 8 + 1, :] for c in range(c_t)], axis=0)
        return jnp.concatenate(
            [rows0.reshape(c_t, 1, n2), zero_tail],
            axis=1).reshape(c_t * n1, n2)

    fxr = fix3(f8[:c_t * 8, :])
    fxi = fix3(f8[c_t * 8:, :])
    # P1 (block-diagonal): one 2-pass perm matmul over [re | im] lanes
    pcat = dperm_l(p1big, jnp.concatenate([ar, ai], axis=-1))
    pr = pcat[:, :n2] + fxr
    pi = pcat[:, n2:] + fxi
    return pr, -pi


def _fwd_tile(zr3, zi3, t, tt, dot, halfin=False, x3=True):
    """Forward four-step + untangle for a WHOLE channel tile
    [c_t, n1, n2] — every matmul at full MXU width (see _tile_tables).
    Bit-compatible with mapping _fwd_one over channels up to f32
    accumulation order inside the K-doubled contractions."""
    (_, _, _, _, (twr, twi), (wnr, wni),
     p1, rrev, rfix, m0, m00) = t
    c_t, n1_in, n2 = zr3.shape
    n1 = twr.shape[0]
    # stage A: one K-doubled matmul over the wide-lanes layout
    zw_r = jnp.concatenate([zr3[c] for c in range(c_t)], axis=-1)
    zw_i = jnp.concatenate([zi3[c] for c in range(c_t)], axis=-1)
    zcat = jnp.concatenate([zw_r, zw_i], axis=0)   # [2*n1_in, c_t*n2]
    w1cat = tt[1] if halfin else tt[0]
    y = dot(w1cat, zcat)                           # [2n1, c_t*n2]
    yr = _to_rows(y[:n1, :], c_t, n1, n2)          # [c_t*n1, n2]
    yi = _to_rows(y[n1:, :], c_t, n1, n2)
    # stage B: twiddle in the free 3D view ([n1, n2] broadcast)
    yr3 = yr.reshape(c_t, n1, n2)
    yi3 = yi.reshape(c_t, n1, n2)
    tr = (yr3 * twr - yi3 * twi).reshape(c_t * n1, n2)
    ti = (yr3 * twi + yi3 * twr).reshape(c_t * n1, n2)
    # stage C: one K-doubled rows-stacked matmul
    tcat = jnp.concatenate([tr, ti], axis=-1)      # [c_t*n1, 2n2]
    f = dot(tcat, tt[2])                           # [fr | fi]
    fr = f[:, :n2]
    fi = f[:, n2:]
    # untangle, with the E/O algebra FOLDED into three combined
    # twiddle tables: X = E + W*O with E = (Z + Zf)/2,
    # O = -i (Z - Zf)/2 expands to
    #   xr = A*fr + B*zfr + Cw*(fi - zfi)
    #   xi = A*fi + B*zfi - Cw*(fr - zfr)
    # with A = (1+wni)/2, B = (1-wni)/2, Cw = wnr/2 — 12 VPU ops per
    # element pair instead of 16 (the tables are 3 cheap elementwise
    # ops per kernel call, CSE'd)
    zfr, zfi = _conj_pair_rows(fr, fi, tt, t, c_t, dot, x3)
    aw = 0.5 * (1.0 + wni)
    bw = 0.5 * (1.0 - wni)
    cw = 0.5 * wnr
    fr3 = fr.reshape(c_t, n1, n2)
    fi3 = fi.reshape(c_t, n1, n2)
    zfr3 = zfr.reshape(c_t, n1, n2)
    zfi3 = zfi.reshape(c_t, n1, n2)
    xr3 = aw * fr3 + bw * zfr3 + cw * (fi3 - zfi3)
    xi3 = aw * fi3 + bw * zfi3 - cw * (fr3 - zfr3)
    # pack Nyquist X[M] = E[0,0] - O[0,0] into im of the DC bin:
    # E - O at the DC bin = (fr + zfr)/2 - (fi - zfi)/2
    xi3 = (xi3 * (1.0 - m00)
           + (0.5 * (fr3 + zfr3) - 0.5 * (fi3 - zfi3)) * m00)
    return xr3, xi3


def _inv_tile(xr3, xi3, t, tt, inv_m, half, dot, x3=True):
    """Inverse of _fwd_tile for a whole channel tile; ``half`` selects
    which N/2 time rows the final stage computes (see _inv_one)."""
    (_, _, _, _, (twr, twi), (wnr, wni),
     p1, rrev, rfix, m0, m00) = t
    c_t, n1, n2 = xr3.shape
    k1 = 1.0 - m00
    xr03 = xr3
    xi03 = xi3 * k1
    xr0 = xr03.reshape(c_t * n1, n2)
    xi0 = xi03.reshape(c_t * n1, n2)
    xfr, xfi = _conj_pair_rows(xr0, xi0, tt, t, c_t, dot, x3)
    xfr3 = xfr.reshape(c_t, n1, n2) * k1 + xi3 * m00
    xfi3 = xfi.reshape(c_t, n1, n2) * k1
    # folded E/O algebra (see _fwd_tile): Z = E + i O with
    # O = D * conj(W) expands to
    #   zr = A*x + B*xf - Cw*(xi - xfi),  zi = A*xi + B*xfi + Cw*(x - xf)
    aw = 0.5 * (1.0 + wni)
    bw = 0.5 * (1.0 - wni)
    cw = 0.5 * wnr
    zr = (aw * xr03 + bw * xfr3
          - cw * (xi03 - xfi3)).reshape(c_t * n1, n2)
    zi = (aw * xi03 + bw * xfi3
          + cw * (xr03 - xfr3)).reshape(c_t * n1, n2)
    # inverse stage C': rows-stacked K-doubled right-multiply
    u = dot(jnp.concatenate([zr, zi], axis=-1), tt[3])  # [ur | ui]
    ur3 = u[:, :n2].reshape(c_t, n1, n2)
    ui3 = u[:, n2:].reshape(c_t, n1, n2)
    vr = (ur3 * twr + ui3 * twi).reshape(c_t * n1, n2)
    vi = (ui3 * twr - ur3 * twi).reshape(c_t * n1, n2)
    # inverse stage A': one K-doubled matmul in wide-lanes layout
    vcat = jnp.concatenate([_to_wide(vr, c_t, n1, n2),
                            _to_wide(vi, c_t, n1, n2)], axis=0)
    if half == "last":
        w1cat = tt[6]
    elif half == "first":
        w1cat = tt[5]
    else:
        w1cat = tt[4]
    g = dot(w1cat, vcat) * inv_m            # [2*rows_out, c_t*n2]
    rows_out = g.shape[0] // 2
    gr3 = jnp.concatenate(
        [g[:rows_out, c * n2:(c + 1) * n2].reshape(1, rows_out, n2)
         for c in range(c_t)], axis=0)
    gi3 = jnp.concatenate(
        [g[rows_out:, c * n2:(c + 1) * n2].reshape(1, rows_out, n2)
         for c in range(c_t)], axis=0)
    return gr3, gi3


def _read_tables(rest):
    """Unpack the 13 base + 8 tile const refs passed to every kernel
    into the (t, tt) tuples the tile transforms consume."""
    (w1r_ref, w1i_ref, w2r_ref, w2i_ref, twr_ref, twi_ref,
     wnr_ref, wni_ref, p1_ref, rrev_ref, rfix_ref, m0_ref,
     m00_ref) = rest[:13]
    t = (None, None, (w1r_ref[...], w1i_ref[...]),
         (w2r_ref[...], w2i_ref[...]), (twr_ref[...], twi_ref[...]),
         (wnr_ref[...], wni_ref[...]), p1_ref[...], rrev_ref[...],
         rfix_ref[...], m0_ref[...], m00_ref[...])
    tt = tuple(r[...] for r in rest[13:21])
    return t, tt


def _fwd_kernel(zr_ref, zi_ref, *rest, x3, halfin=False):
    t, tt = _read_tables(rest)
    xr_ref, xi_ref = rest[21:]
    dot = _dot3 if x3 else _dot
    xr3, xi3 = _fwd_tile(zr_ref[...], zi_ref[...], t, tt, dot,
                         halfin=halfin, x3=x3)
    xr_ref[...] = xr3
    xi_ref[...] = xi3


def _inv_kernel(xr_ref, xi_ref, *rest, inv_m, half, x3):
    t, tt = _read_tables(rest)
    zr_ref, zi_ref = rest[21:]
    dot = _dot3 if x3 else _dot
    zr3, zi3 = _inv_tile(xr_ref[...], xi_ref[...], t, tt, inv_m, half,
                         dot, x3=x3)
    zr_ref[...] = zr3
    zi_ref[...] = zi3


def _all_consts(n: int, c_t: int):
    """The 13 base + 8 tile const arrays every kernel receives."""
    t = _tables(n)
    tt = _tile_tables(n, c_t)
    return ([jnp.asarray(v) for pair in (t[2], t[3], t[4], t[5])
             for v in pair]
            + [jnp.asarray(t[6]), jnp.asarray(t[7]), jnp.asarray(t[8]),
               jnp.asarray(t[9]), jnp.asarray(t[10])]
            + [jnp.asarray(v) for v in tt])


def _call(kernel, n: int, a_re: Array, a_im: Array,
          interpret: bool, out_rows: int = 0, in_rows: int = 0, **kw):
    from jax.experimental import pallas as pl

    t = _tables(n)
    n1, n2 = t[0], t[1]
    n1_out = out_rows or n1
    n1_in = in_rows or n1
    c = a_re.shape[0]
    # channel tile chosen by VMEM budget: tables + (in + out + ~3
    # intermediates) per channel, double-buffered — big transforms
    # (N = 262144: [256, 512] grids, 0.5 MB/plane) need small tiles
    per_c = 4 * (n1_in + n1_out + 3 * n1) * n2 * 4
    c_t = 1
    for cand in (8, 4, 2):
        # closed-form table sizes: materializing _all_consts for a
        # candidate that is then rejected would build (and lru-cache)
        # multi-MB kron tables for nothing
        if (c % cand == 0 and
                _tables_bytes(n, cand) + 2 * cand * per_c <= (11 << 20)):
            c_t = cand
            break
    if c % c_t:
        c_t = c
    consts = _all_consts(n, c_t)
    const_specs = [
        pl.BlockSpec(v.shape, functools.partial(
            lambda nd, ci: (0,) * nd, v.ndim)) for v in consts]
    # materialize the inputs BEFORE the kernel: letting XLA fuse the
    # caller's producer chain (windowing, frame concats) into the
    # custom-call input measured ~16x slower at the SpectralProcessor
    # shapes (4.2 ms vs 0.26 ms per 128-step scan iteration) — the
    # fused producer re-evaluates per grid-step DMA
    a_re, a_im = jax.lax.optimization_barrier((a_re, a_im))
    out_re, out_im = pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=(c // c_t,),
        in_specs=[pl.BlockSpec((c_t, n1_in, n2), lambda ci: (ci, 0, 0)),
                  pl.BlockSpec((c_t, n1_in, n2), lambda ci: (ci, 0, 0))]
        + const_specs,
        out_specs=(pl.BlockSpec((c_t, n1_out, n2), lambda ci: (ci, 0, 0)),
                   pl.BlockSpec((c_t, n1_out, n2), lambda ci: (ci, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((c, n1_out, n2), jnp.float32),
                   jax.ShapeDtypeStruct((c, n1_out, n2), jnp.float32)),
        interpret=interpret,
    )(a_re, a_im, *consts)
    return out_re, out_im


def rfft_packed(x: Array, interpret: bool = False, x3: bool = X3
                ) -> Tuple[Array, Array]:
    """Real N-point FFT -> scrambled-packed split-complex spectrum.

    x: [C, N] float32.  Returns (re, im) each [C, N//2] — bin order as
    per the module docstring (elementwise-compatible with any spectrum
    produced by this function or :func:`pack_spectra`)."""
    c, n = x.shape
    n1, n2 = factor_m(n)
    # materialize BEFORE the stride-2 deinterleave: XLA fusing a
    # caller's producer chain into these slices measured ~16x slower
    # in the SpectralProcessor context (NUMERICS round 5)
    x = jax.lax.optimization_barrier(x.astype(jnp.float32))
    xp = x.reshape(c, n // 2, 2)
    zr = xp[..., 0].reshape(c, n1, n2)
    zi = xp[..., 1].reshape(c, n1, n2)
    xr, xi = _call(_fwd_kernel, n, zr, zi, interpret, x3=x3)
    return jax.lax.optimization_barrier(
        (xr.reshape(c, n // 2), xi.reshape(c, n // 2)))


def rfft_packed_zeropad(x: Array, interpret: bool = False,
                        x3: bool = X3) -> Tuple[Array, Array]:
    """rfft_packed of ``x || zeros`` (N = 2 * len(x)) without ever
    materializing the zero half: the packed z rows a >= n1/2 are all
    zero, so the kernel receives only the first n1/2 rows and stage A
    contracts only the matching W1 columns (half the stage-A MXU work
    and half the input traffic — the zero-padded-convolution sibling
    of irfft_packed(half="first"))."""
    c, b = x.shape
    n = 2 * b
    n1, n2 = factor_m(n)
    x = jax.lax.optimization_barrier(x.astype(jnp.float32))
    xp = x.reshape(c, b // 2, 2)
    zr = xp[..., 0].reshape(c, n1 // 2, n2)
    zi = xp[..., 1].reshape(c, n1 // 2, n2)
    xr, xi = _call(_fwd_kernel, n, zr, zi, interpret,
                   in_rows=n1 // 2, x3=x3, halfin=True)
    return xr.reshape(c, n // 2), xi.reshape(c, n // 2)


def irfft_packed(spec: Tuple[Array, Array], n: int,
                 interpret: bool = False, half=False,
                 x3: bool = X3) -> Array:
    """Inverse of :func:`rfft_packed`: [C, N//2] scrambled-packed
    split-complex -> real [C, N].  ``half``: "last" (or True) returns
    only the last N/2 samples (the kept half of an overlap-save
    frame); "first" only the first N/2 (a zero-padded linear-conv
    block) — either skips half the final DFT stage and half the
    output traffic."""
    xr, xi = spec
    xr, xi = jax.lax.optimization_barrier((xr, xi))
    if half is True:
        half = "last"
    c = xr.shape[0]
    n1, n2 = factor_m(n)
    rows = n1 // 2 if half else n1
    zr, zi = _call(_inv_kernel, n, xr.reshape(c, n1, n2),
                   xi.reshape(c, n1, n2), interpret,
                   out_rows=rows, inv_m=float(2.0 / n), half=half,
                   x3=x3)
    m_out = rows * n2
    out = jnp.stack([zr.reshape(c, m_out), zi.reshape(c, m_out)],
                    axis=-1)
    # materialize the interleave before returning: consumers fusing
    # into it (overlap-add slicing) measured ~3x slower (NUMERICS r5)
    return jax.lax.optimization_barrier(out.reshape(c, 2 * m_out))


def pack_spectra(re: Array, im: Array, n: int) -> Tuple[Array, Array]:
    """Natural-order rfft spectrum [..., N//2 + 1] -> scrambled-packed
    [..., N//2] (Nyquist folded into im of the DC bin).

    The scramble permutation k = k1 + n1*k2 -> (k1, k2) is exactly a
    [n2, n1] -> [n1, n2] TRANSPOSE of the natural array, so the
    conversion is reshape + swapaxes (HBM-rate data movement), not a
    gather."""
    n1, n2 = factor_m(n)
    f = n // 2
    lead = re.shape[:-1]

    def scr(v):
        return jnp.swapaxes(v[..., :f].reshape(lead + (n2, n1)),
                            -1, -2).reshape(lead + (f,))

    pre = scr(re)
    pim = scr(im)
    # bin 0: re = DC (natural bin 0 maps to packed 0), im = Nyquist
    nyq = re[..., -1:]
    pim = jnp.concatenate([nyq, pim[..., 1:]], axis=-1)
    return pre, pim


def unpack_spectra(pre: Array, pim: Array, n: int
                   ) -> Tuple[Array, Array]:
    """Inverse of :func:`pack_spectra`."""
    n1, n2 = factor_m(n)
    f = n // 2
    lead = pre.shape[:-1]

    def unscr(v):
        return jnp.swapaxes(v.reshape(lead + (n1, n2)),
                            -1, -2).reshape(lead + (f,))

    re_nat = unscr(pre)
    im_nat = unscr(pim).at[..., 0].set(0.0)
    re = jnp.concatenate([re_nat, pim[..., :1]], axis=-1)   # Nyquist
    im = jnp.concatenate([im_nat, pim[..., :1] * 0.0], axis=-1)
    return re, im


def mul_packed(ar: Array, ai: Array, br: Array, bi: Array
               ) -> Tuple[Array, Array]:
    """Elementwise product of two scrambled-packed spectra: complex
    everywhere except bin 0, whose (re, im) slots hold the two REAL
    values (DC, Nyquist) and multiply slot-wise."""
    pr = ar * br - ai * bi
    pi = ar * bi + ai * br
    dc = jnp.arange(ar.shape[-1]) == 0
    pr = jnp.where(dc, ar * br, pr)
    pi = jnp.where(dc, ai * bi, pi)
    return pr, pi
