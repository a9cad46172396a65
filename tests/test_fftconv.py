"""Convolver tests — oracle: naive float64 convolution (same pattern as
reference utest/util/convolver.cpp:32-40, tolerances :123,170)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lsp_dsp_units_tpu.ops import fftconv
from lsp_dsp_units_tpu.models.util.convolver import Convolver, convolve_oneshot
from lsp_dsp_units_tpu.utils.units import snr_db


def test_fdl_step_matches_naive():
    rng = np.random.default_rng(0)
    ir = rng.normal(size=300).astype(np.float32)
    x = rng.normal(size=1024).astype(np.float32)
    golden = fftconv.np_convolve_golden(x, ir)

    h = fftconv.parse_ir(jnp.asarray(ir), 128)
    st = fftconv.init_fdl(h)
    ys = []
    for i in range(0, 1024, 128):
        st, y = fftconv.fdl_step(h, st, jnp.asarray(x[i:i + 128]))
        ys.append(np.asarray(y))
    y = np.concatenate(ys)
    np.testing.assert_allclose(y, golden, rtol=1e-4, atol=1e-5)


def test_fdl_process_multiblock_equals_stepwise():
    rng = np.random.default_rng(1)
    ir = rng.normal(size=1000).astype(np.float32)
    x = rng.normal(size=2048).astype(np.float32)
    h = fftconv.parse_ir(jnp.asarray(ir), 256)

    st = fftconv.init_fdl(h)
    st2, y_all = fftconv.fdl_process(h, st, jnp.asarray(x))

    st = fftconv.init_fdl(h)
    ys = []
    for i in range(0, 2048, 256):
        st, y = fftconv.fdl_step(h, st, jnp.asarray(x[i:i + 256]))
        ys.append(np.asarray(y))
    np.testing.assert_allclose(np.asarray(y_all), np.concatenate(ys),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.spec_re),
                               np.asarray(st.spec_re), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.spec_im),
                               np.asarray(st.spec_im), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ir_len,blocks", [(1, 4), (127, 4), (4096, 2)])
def test_convolver_unit(ir_len, blocks):
    rng = np.random.default_rng(2)
    ir = rng.normal(size=ir_len).astype(np.float32)
    conv = Convolver(ir, rank=9)  # block = 256
    t = conv.block * blocks
    x = rng.normal(size=t).astype(np.float32)
    st = conv.init_state()
    st, y = conv.process(st, jnp.asarray(x))
    golden = fftconv.np_convolve_golden(x, ir)
    assert snr_db(np.asarray(y), golden) > 90.0


def test_convolver_batched_channels():
    rng = np.random.default_rng(3)
    ir = rng.normal(size=700).astype(np.float32)
    conv = Convolver(ir, rank=8)
    x = rng.normal(size=(4, conv.block * 3)).astype(np.float32)
    st = conv.init_state((4,))
    st, y = conv.process(st, jnp.asarray(x))
    for c in range(4):
        golden = fftconv.np_convolve_golden(x[c], ir)
        assert snr_db(np.asarray(y[c]), golden) > 90.0


def test_streaming_state_continuity():
    """Two sequential process() calls == one long call (carried FDL)."""
    rng = np.random.default_rng(4)
    ir = rng.normal(size=2000).astype(np.float32)
    conv = Convolver(ir, rank=8)
    b = conv.block
    x = rng.normal(size=b * 6).astype(np.float32)
    st = conv.init_state()
    st, y1 = conv.process(st, jnp.asarray(x[: b * 2]))
    st, y2 = conv.process(st, jnp.asarray(x[b * 2:]))
    y = np.concatenate([np.asarray(y1), np.asarray(y2)])
    golden = fftconv.np_convolve_golden(x, ir)
    assert snr_db(y, golden) > 90.0


def test_convolve_oneshot():
    rng = np.random.default_rng(5)
    ir = rng.normal(size=333).astype(np.float32)
    x = rng.normal(size=777).astype(np.float32)
    y = convolve_oneshot(jnp.asarray(x), jnp.asarray(ir))
    golden = fftconv.np_convolve_golden(x, ir)
    assert snr_db(np.asarray(y), golden) > 90.0


def test_direct_conv_block():
    rng = np.random.default_rng(6)
    h = rng.normal(size=16).astype(np.float32)
    x = rng.normal(size=64).astype(np.float32)
    hist = np.zeros(15, np.float32)
    y = fftconv.direct_conv_block(jnp.asarray(h), jnp.asarray(hist),
                                  jnp.asarray(x))
    golden = fftconv.np_convolve_golden(x, h)
    np.testing.assert_allclose(np.asarray(y), golden, rtol=1e-4, atol=1e-5)


def test_fdl_process_per_channel_irs():
    """Batched IR spectra [C, P, F] (one IR per channel) must work for
    BOTH the single-block (fdl_step) and multi-block (fdl_process)
    paths, matching per-channel scalar convolution."""
    rng = np.random.default_rng(9)
    block = 128
    irs = rng.normal(size=(2, 300)).astype(np.float32)
    h = fftconv.parse_ir(jnp.asarray(irs), block)     # [2, P, F]
    x = rng.normal(size=(2, 4 * block)).astype(np.float32)

    st = fftconv.init_fdl(h, (2,))
    st, y1 = fftconv.fdl_process(h, st, jnp.asarray(x[:, :block]))  # M=1
    st, y2 = fftconv.fdl_process(h, st, jnp.asarray(x[:, block:]))  # M=3
    got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)

    for c in range(2):
        golden = fftconv.np_convolve_golden(x[c], irs[c])
        assert snr_db(golden, got[c]) > 120.0


def test_state_checkpoint_extensionless_roundtrip(tmp_path):
    """save_state('ckpt')/load_state('ckpt') round-trips — np.savez
    appends .npz and load_state must mirror that."""
    from lsp_dsp_units_tpu.utils.state import save_state, load_state
    st = fftconv.init_fdl(
        fftconv.parse_ir(jnp.ones(64, jnp.float32), 32), (2,))
    st = st._replace(history=st.history + 1.5)
    p = str(tmp_path / "ckpt")                        # no extension
    save_state(p, st)
    st2 = load_state(p, fftconv.init_fdl(
        fftconv.parse_ir(jnp.ones(64, jnp.float32), 32), (2,)))
    np.testing.assert_array_equal(np.asarray(st2.history),
                                  np.asarray(st.history))


def test_convolver_odd_chunk_streaming_matches_direct():
    """Port of the reference convolver utest's small case
    (utest/util/convolver.cpp:87-125): a 31-tap ramp IR against a
    sparse impulse train, streamed in ODD 31-sample chunks (the
    reference Convolver accepts any count; here BlockStream provides
    the arbitrary-chunk push over the block-granular device kernel)."""
    from lsp_dsp_units_tpu.utils.blocks import BlockStream

    ir = np.arange(1.0, 32.0, dtype=np.float32)        # 0x1f taps
    n = 0x2000
    src = np.zeros(n + ir.size, np.float32)
    j = np.arange(0, n, 5)
    src[j] = np.where(np.arange(j.size) % 3 == 0, 1.0,
                      np.where(np.arange(j.size) % 3 == 1, 0.1, 0.01)
                      ).astype(np.float32)

    conv = Convolver(ir, rank=9)
    bs = BlockStream(lambda st, x: conv.process(st, jnp.asarray(x)),
                     conv.init_state(), conv.block)
    out = []
    for i in range(0, src.size, 31):
        out.append(bs.push(src[i:i + 31]))
    out.append(bs.flush())
    y = np.concatenate(out)[conv.block:]               # drop latency

    golden = np.convolve(src.astype(np.float64),
                         ir.astype(np.float64))[: src.size]
    err = np.abs(y[: src.size] - golden).max()
    scale = np.abs(golden).max()
    assert err < 1e-3 * scale, err


def test_ring_mac_pallas_matches_ring_step():
    """The Pallas ring-MAC fast path (ops.pallas_fdl, the TPU branch of
    fdl_ring_step) streamed over several blocks equals the XLA ring
    step to f32 summation noise."""
    from lsp_dsp_units_tpu.ops.cplx import rfft_sc, irfft_sc
    from lsp_dsp_units_tpu.ops.pallas_fdl import ring_mac_pallas

    rng = np.random.default_rng(7)
    block, c = 256, 16
    ir = rng.standard_normal(block * 5 + 37).astype(np.float32) * 0.2
    h = fftconv.parse_ir(jnp.asarray(ir), block)
    p = h.re.shape[-2]

    st_x = fftconv.init_ring_fdl(h, (c,))
    st_p = fftconv.init_ring_fdl(h, (c,))
    for k in range(2 * p + 3):
        x = jnp.asarray(
            rng.standard_normal((c, block)).astype(np.float32))
        st_x, y_ref = fftconv.fdl_ring_step(h, st_x, x)
        # the pallas branch, forced (interpret mode; the in-step gate
        # only takes it on the TPU backend)
        frame = jnp.concatenate([st_p.history, x], axis=-1)
        sr, si = rfft_sc(frame)
        w = (st_p.pos + 1) % p
        rot = (w - jnp.arange(p)) % p
        acc_re, acc_im, buf_re, buf_im = ring_mac_pallas(
            st_p.spec_re, st_p.spec_im,
            jnp.take(h.re, rot, axis=-2), jnp.take(h.im, rot, axis=-2),
            sr, si, w, interpret=True)
        y = irfft_sc((acc_re, acc_im), axis=-1)[..., block:]
        st_p = fftconv.RingFDLState(spec_re=buf_re, spec_im=buf_im,
                                    history=x, pos=w)
        assert snr_db(np.asarray(y_ref), np.asarray(y)) > 110.0, k
    np.testing.assert_allclose(np.asarray(st_x.spec_re),
                               np.asarray(st_p.spec_re), atol=1e-6)
    assert int(st_x.pos) == int(st_p.pos)


def test_ring_fdl_packed_matches_natural():
    """The scrambled-packed Pallas FDL (init_ring_fdl(packed=True):
    four-step packed FFT + packed-DC ring MAC, interpret mode off-TPU)
    streams identically to the natural-order XLA ring step."""
    rng = np.random.default_rng(11)
    block, c = 2048, 8
    ir = rng.standard_normal(block * 3 + 101).astype(np.float32) * 0.2
    h = fftconv.parse_ir(jnp.asarray(ir), block)
    p = h.re.shape[-2]

    st_n = fftconv.init_ring_fdl(h, (c,))
    st_p = fftconv.init_ring_fdl(h, (c,), packed=True)
    assert st_p.spec_re.shape == (p, c, block)
    for k in range(p + 3):
        x = jnp.asarray(
            rng.standard_normal((c, block)).astype(np.float32))
        st_n, y_ref = fftconv.fdl_ring_step(h, st_n, x)
        st_p, y = fftconv.fdl_ring_step(h, st_p, x)
        # bar = the >=95 dB chain contract (NUMERICS.md): the packed
        # path's default bf16x3 matmuls sit at ~103 dB per FFT
        assert snr_db(np.asarray(y_ref), np.asarray(y)) > 95.0, k


def test_ols_bulk_packed_matches_xla(monkeypatch):
    """The packed-Pallas bulk overlap-save branch (the TPU bulk tier)
    equals the native-FFT XLA form over streamed super-blocks."""
    rng = np.random.default_rng(13)
    t_super, c = 8192, 4
    ir = rng.standard_normal(4096).astype(np.float32) * 0.2
    h = fftconv.ols_bulk_spectra(jnp.asarray(ir), t_super)

    st_a = fftconv.init_ols_bulk(t_super, (c,))
    st_b = fftconv.init_ols_bulk(t_super, (c,))
    for k in range(3):
        x = jnp.asarray(
            rng.standard_normal((c, t_super)).astype(np.float32))
        st_a, y_ref = fftconv.ols_bulk_process(h, st_a, x)
        monkeypatch.setattr(fftconv, "_BULK_PACKED_TEST", True)
        st_b, y = fftconv.ols_bulk_process(h, st_b, x)
        monkeypatch.setattr(fftconv, "_BULK_PACKED_TEST", False)
        assert snr_db(np.asarray(y_ref), np.asarray(y)) > 95.0, k
