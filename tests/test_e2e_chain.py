"""End-to-end chain tests — the BASELINE configs' walking skeleton:
float64 golden SNR >= 95 dB (the driver north star, BASELINE.md)."""

import numpy as np
import jax.numpy as jnp

from lsp_dsp_units_tpu.ops import biquad, fftconv
from lsp_dsp_units_tpu.models.filters import (Filter, FilterParams,
                                              FilterType)
from lsp_dsp_units_tpu.pipeline import FilterConvChain, default_eq_params
from lsp_dsp_units_tpu.models.filters.design import design_filter
from lsp_dsp_units_tpu.utils.units import snr_db
from lsp_dsp_units_tpu.utils import wavio

SR = 48000


def _test_signal(n, channels=1, seed=0):
    """Band-limited noise + tones, like a music-ish fixture."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    sig = np.zeros((channels, n))
    for c in range(channels):
        sig[c] = (0.3 * np.sin(2 * np.pi * (220 + 40 * c) * t)
                  + 0.2 * np.sin(2 * np.pi * (997 + 11 * c) * t)
                  + 0.1 * rng.standard_normal(n))
    return sig.astype(np.float32)


def test_config1_filter_snr():
    """BASELINE config 1: BWC hi-shelf +6 dB @ 1 kHz slope 2 on mono
    48 kHz; >= 95 dB SNR vs the float64 golden chain."""
    x = _test_signal(SR)[0]
    flt = Filter(SR, FilterParams(ftype=FilterType.BT_BWC_HISHELF,
                                  slope=2, freq=1000.0, gain=2.0))
    st = flt.init_state()
    st, y = flt.process(st, jnp.asarray(x))
    golden = biquad.np_biquad_cascade_f64(flt.design.biquads, x)
    assert snr_db(np.asarray(y), golden) > 95.0


def test_config1_streaming_odd_blocks():
    """Same config streamed in odd chunk sizes (31, 127) — reference
    oracle pattern #3 (SURVEY.md §4)."""
    x = _test_signal(SR // 4)[0]
    flt = Filter(SR, FilterParams(ftype=FilterType.BT_BWC_HISHELF,
                                  slope=2, freq=1000.0, gain=2.0))
    golden = biquad.np_biquad_cascade_f64(flt.design.biquads, x)
    for chunk in (31, 127):
        st = flt.init_state()
        outs = []
        for i in range(0, x.size, chunk):
            st, y = flt.process(st, jnp.asarray(x[i:i + chunk]))
            outs.append(np.asarray(y))
        assert snr_db(np.concatenate(outs), golden) > 95.0, chunk


def test_filter_conv_chain_snr():
    """EQ cascade + 0.2 s convolver + sidechain compressor on
    multichannel audio vs float64 golden: the eq+conv stages against a
    full f64 rebuild, and chain.step's OWN output against the golden
    with the dynamics gain derived (by the product's own dynamics
    stage) from the golden conv signal."""
    chain = FilterConvChain(SR, channels=4, rank=11, ir_seconds=0.2)
    params = chain.build()
    state = chain.init_state(params)
    t = chain.block * 8
    x = _test_signal(t, channels=4)

    state, y = chain.step(params, state, jnp.asarray(x))
    y = np.asarray(y)

    from lsp_dsp_units_tpu.ops import biquad_block

    eq = np.concatenate([design_filter(p, SR).biquads
                         for p in default_eq_params(SR)], axis=0)
    # golden: filter + convolution — rebuild without the dynamics stage
    state2 = chain.init_state(params)
    y_eq, _ = biquad_block.cascade_block_fused(params.eq_block, state2.eq,
                                               jnp.asarray(x))
    _, y_conv = fftconv.fdl_process(params.h_spectra, state2.fdl, y_eq)
    y_conv = np.asarray(y_conv)

    golden = np.stack([
        fftconv.np_convolve_golden(biquad.np_biquad_cascade_f64(eq, x[c]),
                                   chain.ir)
        for c in range(4)])
    assert snr_db(y_conv, golden) > 95.0

    # full-chain output: apply the dynamics gain (computed through the
    # product's own sidechain+compressor on the GOLDEN conv signal) to
    # the golden — a wiring bug in step() (wrong stage order, channel
    # mixup, pre-dynamics output) would break this comparison
    sc_st, level = chain.sidechain.process(
        chain.sidechain.init_state((4,)),
        jnp.asarray(golden.astype(np.float32)))
    from lsp_dsp_units_tpu.ops import dynamics as dyn_ops
    _, gain, _ = chain.compressor.process(params.comp,
                                          dyn_ops.env_init((4,)), level)
    golden_full = golden * np.asarray(gain, np.float64)
    assert snr_db(y, golden_full) > 90.0


def test_wav_roundtrip(tmp_path):
    x = _test_signal(1000, channels=2)
    p = str(tmp_path / "t.wav")
    wavio.write_wav(p, x, SR)
    y, sr = wavio.read_wav(p)
    assert sr == SR
    np.testing.assert_allclose(y, x, atol=1e-7)
    # PCM16 path
    wavio.write_wav(p, x, SR, float32=False)
    y, _ = wavio.read_wav(p)
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_block_stream_rebuffering():
    """Host rebuffering wrapper: arbitrary chunk sizes over a fixed-block
    jitted processor, output delayed by exactly one block."""
    from lsp_dsp_units_tpu.utils.blocks import BlockStream

    flt = Filter(SR, FilterParams(ftype=FilterType.BT_RLC_BELL, slope=2,
                                  freq=1000.0, gain=2.0, quality=1.0))
    block = 256

    def proc(state, xb):
        return flt.process(state, jnp.asarray(xb))

    bs = BlockStream(proc, flt.init_state(), block)
    x = _test_signal(2000)[0]
    outs = []
    for i in range(0, 2000, 173):
        outs.append(bs.push(x[i:i + 173]))
    y = np.concatenate(outs)
    golden = biquad.np_biquad_cascade_f64(flt.design.biquads, x)
    # y is delayed by `block` samples
    assert snr_db(y[block:], golden[: y.size - block]) > 95.0
    np.testing.assert_allclose(y[:block], 0.0, atol=1e-7)


def test_block_stream_flush_drains_full_latency():
    """flush() must return the full one-block latency tail: identity
    processor -> push+flush reconstructs the ENTIRE input, including the
    last (partial or full) block (gap regression: outputs between the
    partial fill point and the block end used to be dropped)."""
    from lsp_dsp_units_tpu.utils.blocks import BlockStream

    ident = lambda s, xb: (s, xb)
    for n in (6, 8, 9, 12):           # partial, exact, 1-over, 1.5 blocks
        bs = BlockStream(ident, None, block=8)
        x = np.arange(1, n + 1, dtype=np.float32)
        got = np.concatenate([bs.push(x), bs.flush()])
        assert got.size == n + 8
        np.testing.assert_array_equal(got[8:], x)
        np.testing.assert_array_equal(got[:8], 0.0)


def test_bench_scan_superstep_matches_sequential():
    """The bench's K-block lax.scan super-step must produce EXACTLY the
    same i16 blocks and carried state as K sequential step calls (the
    'chain semantics unchanged' claim bench.py makes)."""
    import jax
    from lsp_dsp_units_tpu.pipeline import FilterConvChain
    from lsp_dsp_units_tpu.utils.delivery import (tpdf_i16_table,
                                                  quantize_i16)

    chain = FilterConvChain(48000, channels=4, rank=9, ir_seconds=0.05)
    params = chain.build()
    t = chain.block
    table = tpdf_i16_table(4, t)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((4, t)).astype(np.float32) * 0.25)
    K = 5

    def step_fn(params, state, x, k):
        state, y = chain.step(params, state, x)
        return state, quantize_i16(y, table, k)

    def super_fn(params, state, x, k0):
        def body(carry, _):
            st, k = carry
            st, q = step_fn(params, st, x, k)
            return (st, k + jnp.uint32(1)), q
        (st, _), qs = jax.lax.scan(body, (state, k0), None, length=K)
        return st, qs

    st_seq = chain.init_state(params)
    seq_out = []
    for k in range(K):
        st_seq, q = jax.jit(step_fn)(params, st_seq, xb, jnp.uint32(k))
        seq_out.append(np.asarray(q))
    st_scan, qs = jax.jit(super_fn)(params, chain.init_state(params),
                                    xb, jnp.uint32(0))
    np.testing.assert_array_equal(np.stack(seq_out), np.asarray(qs))
    for a, b in zip(jax.tree_util.tree_leaves(st_seq),
                    jax.tree_util.tree_leaves(st_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)


def test_bulk_step_matches_step():
    """The bench's BULK super-block path (ChainBulkState + big-FFT
    overlap-save convolver, pipeline.bulk_step) equals the per-block
    streaming step across multiple carried super-blocks."""
    chain = FilterConvChain(sample_rate=48000, channels=4, rank=9,
                            ir_seconds=0.005)
    params = chain.build()
    rng = np.random.default_rng(3)
    t_super = chain.block * 8
    h_bulk = chain.build_bulk(t_super)
    st = chain.init_state(params)
    bst = chain.init_bulk_state(params, t_super)
    for _ in range(3):
        x = jnp.asarray(
            rng.standard_normal((4, t_super)).astype(np.float32) * 0.25)
        st, y_ref = chain.step(params, st, x)
        bst, y_b = chain.bulk_step(params, h_bulk, bst, x)
        ref = np.asarray(y_ref, np.float64)
        err = np.asarray(y_b, np.float64) - ref
        snr = 10 * np.log10(np.sum(ref ** 2) / max(np.sum(err ** 2),
                                                   1e-30))
        assert snr > 110.0, snr


def test_step_ring_matches_step():
    """The ring-FDL streaming step (pipeline.step_ring — one spectra
    slot written per block instead of the full shift register) matches
    the reference-ordered step at f32 rounding level; the only
    difference is the partition summation order."""
    chain = FilterConvChain(sample_rate=48000, channels=4, rank=9,
                            ir_seconds=0.05)
    params = chain.build()
    rng = np.random.default_rng(4)
    st = chain.init_state(params)
    rst = chain.init_ring_state(params)
    for k in range(12):
        x = jnp.asarray(rng.standard_normal(
            (4, chain.block)).astype(np.float32) * 0.25)
        st, y = chain.step(params, st, x)
        rst, yr = chain.step_ring(params, rst, x)
        ref = np.asarray(y, np.float64)
        err = np.asarray(yr, np.float64) - ref
        snr = 10 * np.log10(max(np.sum(ref ** 2), 1e-30)
                            / max(np.sum(err ** 2), 1e-30))
        assert snr > 120.0, (k, snr)


def test_chain_dyn_pallas_matches_staged():
    """The fused sidechain+envelope+gain kernel (ops.pallas_env.
    chain_dyn_pallas, the TPU branch of step_ring's dynamics tail)
    equals the staged XLA path: sliding-RMS -> peak_envelope ->
    compressor_x2_gain -> multiply."""
    from lsp_dsp_units_tpu.ops import dynamics as dyn
    from lsp_dsp_units_tpu.ops.pallas_env import chain_dyn_pallas
    from lsp_dsp_units_tpu.models.dynamics.compressor import Compressor
    from lsp_dsp_units_tpu.models.util.sidechain import (
        Sidechain, SidechainMode)

    sr, c, t = 48000, 4, 512
    sc = Sidechain(sr, SidechainMode.RMS, reactivity_ms=2.0 / 3.0)
    n = sc.reactivity                      # 32 samples
    assert n % 8 == 0
    comp = Compressor(sr, attack_thresh=0.25, release_thresh=0.125,
                      attack_ms=2.0, release_ms=10.0, knee=0.7071,
                      ratio=4.0)
    cp = comp.build()
    rng = np.random.default_rng(3)

    sc_st = sc.init_state((c,))
    env_st = dyn.env_init((c,))
    win_f = sc_st.window
    env_f = env_st
    for k in range(4):
        x = jnp.asarray(
            (rng.standard_normal((c, t)) * 0.5).astype(np.float32))
        # staged golden
        sc_st, level = sc.process(sc_st, x)
        env_st, gain, _ = comp.process(cp, env_st, level)
        y_ref = np.asarray(x * gain)
        # fused kernel (interpret mode off-TPU)
        win_f, env_f, y = chain_dyn_pallas(
            win_f, env_f, x, n, sc.gain, cp.tau_attack,
            cp.tau_release, cp.release_thresh, cp.hold, cp.knees,
            interpret=True)
        err = np.asarray(y, np.float64) - y_ref
        snr = 10 * np.log10(max(np.sum(y_ref.astype(np.float64) ** 2),
                                1e-30) / max(np.sum(err ** 2), 1e-30))
        assert snr > 110.0, (k, snr)
    np.testing.assert_allclose(np.asarray(win_f),
                               np.asarray(sc_st.window), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(env_f.envelope),
                               np.asarray(env_st.envelope), rtol=1e-5)


def test_eqfdl_fused_matches_staged():
    """The single-kernel EQ-conv + ring-FDL path (ops.pallas_fdl_fused.
    eqfdl_fused_pallas, step_ring's TPU linear path) streamed over
    several blocks equals the staged cascade_block_fused +
    fdl_ring_step form."""
    from lsp_dsp_units_tpu.ops import biquad_block, fftconv
    from lsp_dsp_units_tpu.ops import pallas_fft as pfft
    from lsp_dsp_units_tpu.ops.pallas_fdl_fused import eqfdl_fused_pallas
    from lsp_dsp_units_tpu.pipeline import default_eq_params
    from lsp_dsp_units_tpu.models.filters.design import design_filter

    sr_hz, c, b = 48000, 8, 2048
    eq = np.concatenate(
        [design_filter(p, sr_hz).biquads
         for p in default_eq_params(sr_hz)[:4]], axis=0)
    eqp = biquad_block.precompute_fused(eq, b)
    rng = np.random.default_rng(9)
    ir = rng.standard_normal(3 * b - 17).astype(np.float32) * 0.1
    h = fftconv.parse_ir(jnp.asarray(ir), b)
    p_n = h.re.shape[-2]
    nfft = 2 * b
    k2 = eqp.m_mat.shape[0]

    eq_st = biquad_block.init_state(eq.shape[0], (c,))
    fdl_st = fftconv.init_ring_fdl(h, (c,))
    st_p = fftconv.init_ring_fdl(h, (c,), packed=True)
    eq_sv = eq_st
    heq_r, heq_i = pfft.pack_spectra(eqp.h_re, eqp.h_im, nfft)
    hre_p, him_p = pfft.pack_spectra(h.re, h.im, nfft)

    for k in range(p_n + 3):
        x = jnp.asarray(
            rng.standard_normal((c, b)).astype(np.float32) * 0.25)
        # staged golden
        u_ref, eq_st = biquad_block.cascade_block_fused(eqp, eq_st, x)
        fdl_st, y_ref = fftconv.fdl_ring_step(h, fdl_st, u_ref)
        # fused (interpret mode)
        sv = eq_sv.reshape(eq_sv.shape[:-2] + (k2,))
        corr = jnp.einsum("bk,...k->...b", eqp.g_mat, sv)
        w = (st_p.pos + 1) % p_n
        rot = (w - jnp.arange(p_n)) % p_n
        y, u, buf_re, buf_im = eqfdl_fused_pallas(
            st_p.spec_re, st_p.spec_im,
            jnp.take(hre_p, rot, axis=-2),
            jnp.take(him_p, rot, axis=-2),
            heq_r, heq_i, x, corr, st_p.history, w, nfft,
            interpret=True)
        sv2 = (jnp.einsum("kj,...j->...k", eqp.m_mat, sv)
               + jnp.einsum("kb,...b->...k", eqp.w_mat, x))
        eq_sv = sv2.reshape(eq_sv.shape)
        st_p = fftconv.RingFDLState(spec_re=buf_re, spec_im=buf_im,
                                    history=u, pos=w)

        for ref, out, tag in ((u_ref, u, "eq"), (y_ref, y, "conv")):
            ref = np.asarray(ref, np.float64)
            err = np.asarray(out, np.float64) - ref
            snr = 10 * np.log10(max(np.sum(ref ** 2), 1e-30)
                                / max(np.sum(err ** 2), 1e-30))
            assert snr > 95.0, (k, tag, snr)
