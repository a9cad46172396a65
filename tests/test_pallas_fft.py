"""ops.pallas_fft — the scrambled-packed four-step real FFT (interpret
mode; the TPU path runs the same kernels compiled by Mosaic, measured
138.6 dB HIGHEST / 105.4 dB bf16x3 on-chip, NUMERICS.md round-4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lsp_dsp_units_tpu.ops import pallas_fft as pf


def _snr(ref, out):
    err = np.asarray(out, np.float64) - np.asarray(ref, np.float64)
    return 10 * np.log10(max(np.sum(np.abs(np.asarray(ref)) ** 2), 1e-30)
                         / max(np.sum(np.abs(err) ** 2), 1e-30))


@pytest.mark.parametrize("x3,bar", [(False, 125.0), (True, 100.0)])
def test_rfft_packed_vs_numpy(x3, bar):
    rng = np.random.default_rng(0)
    n, c = 16384, 8
    x = rng.standard_normal((c, n)).astype(np.float32)
    re, im = pf.rfft_packed(jnp.asarray(x), interpret=True, x3=x3)
    ure, uim = pf.unpack_spectra(re, im, n)
    z = np.asarray(ure) + 1j * np.asarray(uim)
    g = np.fft.rfft(x.astype(np.float64), axis=-1)
    assert _snr(g, z) > bar


@pytest.mark.parametrize("x3,bar", [(False, 120.0), (True, 98.0)])
def test_roundtrip_and_half(x3, bar):
    rng = np.random.default_rng(1)
    n, c = 16384, 8
    x = rng.standard_normal((c, n)).astype(np.float32)
    spec = pf.rfft_packed(jnp.asarray(x), interpret=True, x3=x3)
    y = pf.irfft_packed(spec, n, interpret=True, x3=x3)
    assert _snr(x, y) > bar
    # half=True returns exactly the tail half of the full inverse
    yh = pf.irfft_packed(spec, n, interpret=True, x3=x3, half=True)
    np.testing.assert_array_equal(np.asarray(y)[:, n // 2:],
                                  np.asarray(yh))


def test_pack_unpack_consistency():
    """pack_spectra(natural rfft) equals the kernel's own output, and
    unpack inverts pack exactly."""
    rng = np.random.default_rng(2)
    n, c = 4096, 4
    x = rng.standard_normal((c, n)).astype(np.float32)
    re, im = pf.rfft_packed(jnp.asarray(x), interpret=True, x3=False)
    g = np.fft.rfft(x.astype(np.float64), axis=-1)
    pre, pim = pf.pack_spectra(
        jnp.asarray(g.real.astype(np.float32)),
        jnp.asarray(g.imag.astype(np.float32)), n)
    assert _snr(pre, re) > 120.0 and _snr(pim, im) > 120.0
    ure, uim = pf.unpack_spectra(pre, pim, n)
    np.testing.assert_allclose(np.asarray(ure)[..., :-1],
                               g.real.astype(np.float32)[..., :-1],
                               atol=0)
    np.testing.assert_array_equal(np.asarray(ure)[..., -1],
                                  g.real.astype(np.float32)[..., -1])
    assert float(np.max(np.abs(np.asarray(uim)[..., 0]))) == 0.0
    assert float(np.max(np.abs(np.asarray(uim)[..., -1]))) == 0.0


def test_supported_gate():
    assert pf.supported(16384) and pf.supported(4096)
    assert not pf.supported(1024)        # below the gate
    assert not pf.supported(12000)       # not a power of two
    # VMEM feasibility: tables + working set at c_t=1 must fit; the
    # [256, 256]-grid N=131072 carries ~9 MB of tables alone and the
    # bulk tier's super-block sizes are further out — both fall back
    # to the native FFT instead of failing Mosaic compilation
    assert pf.supported(65536)
    assert not pf.supported(131072)
    assert not pf.supported(262144)
    assert pf.factor_m(16384) == (64, 128)
    assert pf.factor_m(4096) == (16, 128)    # rebalanced to full lanes
    assert pf.factor_m(32768) == (128, 128)


def test_tables_bytes_closed_form():
    """_tables_bytes must track the REAL const-table sizes exactly —
    supported()'s VMEM gate and _call's tile choice both rely on it
    (a drift would re-admit shapes that fail Mosaic's budget)."""
    for n in (2048, 4096, 16384, 65536):
        for c_t in (1, 2, 4, 8):
            actual = sum(4 * int(np.prod(v.shape))
                         for v in pf._all_consts(n, c_t))
            assert pf._tables_bytes(n, c_t) == actual, (n, c_t)


def test_mul_packed_first_half_linear_conv():
    """Zero-padded linear convolution through the packed pipeline
    (rfft_packed -> mul_packed -> irfft_packed(half="first") — the EQ
    zero-state path) equals the natural-order split-complex form."""
    from lsp_dsp_units_tpu.ops.cplx import rfft_sc, irfft_sc, sc_mul

    rng = np.random.default_rng(5)
    b, c = 2048, 4
    n = 2 * b
    x = rng.standard_normal((c, b)).astype(np.float32)
    h = rng.standard_normal(b + 1).astype(np.float32) * 0.2
    hre, him = rfft_sc(jnp.asarray(h), n)

    ref = irfft_sc(sc_mul(rfft_sc(jnp.asarray(x), n), (hre, him)),
                   n)[..., :b]

    frame = jnp.concatenate([jnp.asarray(x), jnp.zeros((c, b))], -1)
    sr, si = pf.rfft_packed(frame, interpret=True)
    hre_p, him_p = pf.pack_spectra(hre, him, n)
    y = pf.irfft_packed(pf.mul_packed(sr, si, hre_p, him_p), n,
                        interpret=True, half="first")
    assert y.shape == (c, b)
    assert _snr(ref, y) > 95.0


def test_tile_transforms_match_per_channel_reference():
    """_fwd_tile/_inv_tile (the lane-packed production forms) must
    match _fwd_one/_inv_one (the per-channel reference implementation
    the tile math was derived from) — keeps the reference forms honest
    as documentation while the packed kernels evolve."""
    import jax
    import jax.numpy as jnp

    n = 4096
    c_t = 4
    n1, n2 = pf.factor_m(n)
    t = pf._tables(n)
    tj = (None, None,
          (jnp.asarray(t[2][0]), jnp.asarray(t[2][1])),
          (jnp.asarray(t[3][0]), jnp.asarray(t[3][1])),
          (jnp.asarray(t[4][0]), jnp.asarray(t[4][1])),
          (jnp.asarray(t[5][0]), jnp.asarray(t[5][1])),
          jnp.asarray(t[6]), jnp.asarray(t[7]), jnp.asarray(t[8]),
          jnp.asarray(t[9]), jnp.asarray(t[10]))
    tt = tuple(jnp.asarray(v) for v in pf._tile_tables(n, c_t))
    rng = np.random.default_rng(5)
    zr = jnp.asarray(rng.standard_normal((c_t, n1, n2))
                     .astype(np.float32))
    zi = jnp.asarray(rng.standard_normal((c_t, n1, n2))
                     .astype(np.float32))

    # exact-precision dots so the only difference is structure
    xr_t, xi_t = pf._fwd_tile(zr, zi, tj, tt, pf._dot, x3=False)
    for c in range(c_t):
        xr_1, xi_1 = pf._fwd_one(zr[c], zi[c], tj, pf._dot, x3=False)
        np.testing.assert_allclose(np.asarray(xr_t[c]),
                                   np.asarray(xr_1), atol=2e-3)
        np.testing.assert_allclose(np.asarray(xi_t[c]),
                                   np.asarray(xi_1), atol=2e-3)

    gr_t, gi_t = pf._inv_tile(xr_t, xi_t, tj, tt, 2.0 / n, "last",
                              pf._dot, x3=False)
    for c in range(c_t):
        gr_1, gi_1 = pf._inv_one(xr_t[c], xi_t[c], tj, 2.0 / n,
                                 "last", pf._dot, x3=False)
        np.testing.assert_allclose(np.asarray(gr_t[c]),
                                   np.asarray(gr_1), atol=2e-5)
        np.testing.assert_allclose(np.asarray(gi_t[c]),
                                   np.asarray(gi_1), atol=2e-5)
