"""Convolver + Equalizer parity vs the COMPILED reference.

The genuine non-uniform partitioned Convolver (Convolver.cpp:144-313)
and the genuine 4-mode Equalizer (Equalizer.cpp:243-562) are compiled
in place (tests/ref_oracle) and streamed against this framework's
uniform-FDL Convolver and Equalizer — the BASELINE config-2/config-3
paths validated end-to-end against the real implementation.

The oracle's own FFT/fastconv stand-ins are validated first against
numpy direct convolution (independent of this framework).

Skipped cleanly when /root/reference is not present.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ref_oracle as ro  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from lsp_dsp_units_tpu.models.filters.design import (  # noqa: E402
    FilterParams, FilterType)
from lsp_dsp_units_tpu.models.filters.equalizer import (  # noqa: E402
    Equalizer, EqMode)
from lsp_dsp_units_tpu.models.util.convolver import Convolver  # noqa: E402

pytestmark = pytest.mark.skipif(
    not ro.available(), reason="/root/reference not present")

SR = 48000

EQ_FILTERS = (
    ("BT_BWC_HISHELF", 2, 1000.0, 1000.0, 10 ** (6 / 20), 0.707),
    ("BT_RLC_BELL", 2, 250.0, 250.0, 0.5, 1.2),
    ("DR_APO_PEAKING", 1, 4000.0, 4000.0, 1.8, 1.0),
)


def _snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = ref - np.asarray(test, np.float64)
    e = float(np.mean(err ** 2))
    if e == 0.0:
        return np.inf
    return 10.0 * np.log10(float(np.mean(ref ** 2)) / e)


def _ir(length=3000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(length)
            * np.exp(-np.arange(length) / (length / 5.0))).astype(np.float32)


def test_oracle_convolver_is_true_convolution():
    """Self-check INDEPENDENT of this framework: the compiled
    reference Convolver (running on the oracle's FFT stand-ins) must
    produce the mathematically true convolution — validates both the
    genuine partition scheduling and the stand-in fastconv semantics."""
    ir = _ir()
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(8192) * 0.3).astype(np.float32)
    y_ref = ro.convolver_process(ir, 12, x, block=512)
    y_true = np.convolve(x.astype(np.float64), ir.astype(np.float64))[:8192]
    assert _snr_db(y_true, y_ref) >= 120.0


def test_oracle_convolver_streaming_invariance():
    """Reference utest pattern (utest/util/convolver.cpp:43-53): odd
    chunk sizes must not change the output."""
    ir = _ir(1000)
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(4096) * 0.3).astype(np.float32)
    y_a = ro.convolver_process(ir, 10, x, block=4096)
    y_b = ro.convolver_process(ir, 10, x, block=127)
    assert _snr_db(y_a, y_b) >= 110.0


@pytest.mark.parametrize("rank,ir_len", [(9, 700), (12, 3000), (14, 20000)])
def test_convolver_matches_reference(rank, ir_len):
    """This framework's uniform-FDL Convolver vs the genuine
    non-uniform partitioned engine: same zero-latency semantics,
    >=110 dB agreement (132 dB measured at rank 12)."""
    ir = _ir(ir_len)
    rng = np.random.default_rng(3)
    n = 16384
    x = (rng.standard_normal(n) * 0.3).astype(np.float32)
    cv = Convolver(ir, rank=rank)
    blk = cv.block
    y_ref = ro.convolver_process(ir, rank, x, block=blk)
    state = cv.init_state()
    outs = []
    for off in range(0, n, blk):
        state, y = cv.process(state, jnp.asarray(x[off:off + blk]))
        outs.append(np.asarray(y))
    assert _snr_db(y_ref, np.concatenate(outs)) >= 110.0


@pytest.mark.parametrize("mode_name,mid,mymode,floor", [
    ("IIR", 1, EqMode.IIR, 95.0),
    ("FIR", 2, EqMode.FIR, 95.0),
    ("FFT", 3, EqMode.FFT, 120.0),
    ("SPM", 4, EqMode.SPM, 120.0),
])
def test_equalizer_mode_matches_reference(mode_name, mid, mymode, floor):
    """All 4 Equalizer modes vs the genuine implementation: output SNR
    above the north-star 95 dB (measured 100-130 dB this session) and
    EXACT latency parity (Equalizer.cpp:347,355)."""
    ids = ro.filter_type_ids()
    fl = np.array([[ids["FLT_" + nm], s, f, f2, g, q]
                   for (nm, s, f, f2, g, q) in EQ_FILTERS], np.float32)
    rng = np.random.default_rng(2)
    n = 32768
    blk = 4096
    x = (rng.standard_normal(n) * 0.25).astype(np.float32)
    y_ref, lat = ro.equalizer_process(mid, fl, 12, SR, x, block=blk)
    eq = Equalizer(SR, filters=len(EQ_FILTERS), mode=mymode, fir_rank=12)
    for i, (nm, s, f, f2, g, q) in enumerate(EQ_FILTERS):
        eq.set_params(i, FilterParams(ftype=FilterType[nm], slope=s,
                                      freq=f, freq2=f2, gain=g, quality=q))
    params = eq.build()
    state = eq.init_state(params)
    outs = []
    for off in range(0, n, blk):
        state, y = eq.process(params, state, jnp.asarray(x[off:off + blk]))
        outs.append(np.asarray(y))
    assert lat == eq.latency()
    assert _snr_db(y_ref, np.concatenate(outs)) >= floor


# ----------------------------------------------------- north-star capstone

def test_full_chain_matches_reference_single_and_sharded():
    """THE BASELINE north star (BASELINE.md): the full flagship chain —
    8-band EQ cascade -> partitioned convolver -> RMS sidechain ->
    downward compressor — against the same chain built from GENUINE
    compiled reference units (FilterBank cascade, non-uniform Convolver,
    Sidechain, Compressor) fed bit-identical coefficients.

    Measured: 80-84 dB per channel, which is the reference's OWN
    float32 arithmetic noise floor (its sequential f32 recurrences sit
    ~80 dB from the f64 ideal, NUMERICS.md) — verified here by showing
    the reference's eq+conv stages are no closer to the f64 golden than
    we are to the reference.  The 2x4-device sharded execution (channel
    DP x time SP with ppermute halos and affine IIR summaries) matches
    the genuine reference just as closely."""
    import jax
    from jax.sharding import PartitionSpec as P, NamedSharding
    from lsp_dsp_units_tpu.pipeline import FilterConvChain
    from lsp_dsp_units_tpu.ops import biquad as biquad_ops
    from lsp_dsp_units_tpu.parallel import mesh as pmesh

    sr, C, rank = 48000, 4, 11
    chain = FilterConvChain(sample_rate=sr, channels=C, rank=rank,
                            ir_seconds=0.25)
    params = chain.build()
    T = chain.block * 4
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((C, T)) * 0.25).astype(np.float32)

    # genuine reference component chain, channel by channel
    eq = np.asarray(params.eq_coeffs, np.float32)
    ref = np.zeros_like(x)
    ref_eqconv = np.zeros_like(x)
    for c in range(C):
        y_eq = ro.cascade_process_f32(eq, x[c])
        y_cv = ro.convolver_process(chain.ir, rank, y_eq, block=1024)
        ref_eqconv[c] = y_cv
        lvl = ro.sidechain_process(0, 1, 0, 10.0, 1.0, sr, y_cv, y_cv,
                                   block=1024)
        g, _ = ro.compressor_process(0, 0.25, 0.125, 10 ** (-72 / 20),
                                     10.0, 80.0, 0.7071, 4.0, 0.0, sr,
                                     lvl)
        ref[c] = y_cv * g

    # the reference's own distance from the f64 ideal (eq+conv path)
    from numpy.fft import rfft, irfft
    golden = np.zeros((C, T), np.float64)
    for c in range(C):
        g_eq = biquad_ops.np_biquad_cascade_f64(eq, x[c])
        n = T + chain.ir.size - 1
        nfft = 1 << int(np.ceil(np.log2(n)))
        g_cv = irfft(rfft(g_eq, nfft)
                     * rfft(chain.ir.astype(np.float64), nfft), nfft)[:T]
        golden[c] = g_cv
    ref_floor = min(_snr_db(golden[c], ref_eqconv[c]) for c in range(C))

    # ours, single device
    state = chain.init_state(params)
    _, y = chain.step(params, state, jnp.asarray(x))
    y = np.asarray(y)
    snr_single = min(_snr_db(ref[c], y[c]) for c in range(C))
    # measured band is 80-84 dB (NUMERICS.md); assert the band floor so
    # silent regressions inside the argued noise floor cannot hide
    assert snr_single >= 80.0
    # at the reference's own noise floor: as close to the reference as
    # the reference is to the ideal
    assert snr_single >= ref_floor - 6.0

    # ours, sharded over a 2x4 ('chan','time') mesh
    m = pmesh.make_mesh(chan=2, time=4)
    step = chain.sharded_step(m, params)
    sh_state = jax.device_put(
        chain.init_state(params),
        NamedSharding(m, P()))  # specs applied inside shard_map
    xs = jax.device_put(jnp.asarray(x),
                        NamedSharding(m, P(pmesh.CHAN_AXIS,
                                           pmesh.TIME_AXIS)))
    st2 = chain.init_state(params)
    st2, y_sh = step(st2, xs)
    y_sh = np.asarray(y_sh)
    snr_sharded = min(_snr_db(ref[c], y_sh[c]) for c in range(C))
    assert snr_sharded >= 80.0
    assert snr_sharded >= ref_floor - 6.0
    # sharded vs single-device agreement
    assert min(_snr_db(y[c], y_sh[c]) for c in range(C)) >= 90.0
