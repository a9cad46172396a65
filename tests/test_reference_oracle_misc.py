"""Noise / misc / stat / sidechain parity vs the COMPILED reference.

Bit-level (noise PRNGs) and float-level (pure math) comparisons against
the genuine implementations compiled in tests/ref_oracle.

Skipped cleanly when /root/reference is not present.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ref_oracle as ro  # noqa: E402

from lsp_dsp_units_tpu.models.misc import envelope as env_mod  # noqa: E402
from lsp_dsp_units_tpu.models.misc import fade as fade_mod  # noqa: E402
from lsp_dsp_units_tpu.models.misc import fft_crossover as fx  # noqa: E402
from lsp_dsp_units_tpu.models.misc import lfo as lfo_mod  # noqa: E402
from lsp_dsp_units_tpu.models.misc import sigmoid as sig_mod  # noqa: E402
from lsp_dsp_units_tpu.models.misc.windows import (  # noqa: E402
    Window, window)
from lsp_dsp_units_tpu.models.noise.lcg import (  # noqa: E402
    LCG, LCGDistribution)
from lsp_dsp_units_tpu.models.noise.mls import MLS  # noqa: E402
from lsp_dsp_units_tpu.models.noise.velvet import (  # noqa: E402
    Velvet, VelvetCore, VelvetType)
from lsp_dsp_units_tpu.models.util.randomizer import (  # noqa: E402
    Randomizer, RandomFunction)

pytestmark = pytest.mark.skipif(
    not ro.available(), reason="/root/reference not present")


# --- noise: bit-level parity -------------------------------------------

@pytest.mark.parametrize("nbits,state", [(8, 0x5A), (16, 0xACE1),
                                         (23, 1), (32, 0xDEADBEEF)])
def test_mls_bit_exact(nbits, state):
    mine = np.asarray(MLS(n_bits=nbits, state=state).process(1024),
                      np.float32)
    assert np.array_equal(mine, ro.mls(nbits, state, 1024))


def test_randomizer_bit_exact():
    for func in RandomFunction:
        fid = list(RandomFunction).index(func)
        mine = np.asarray(Randomizer(seed=777).random(func, 256),
                          np.float32)
        ref = ro.randomizer(777, fid, 256)
        # gaussian values pass near zero where f32-vs-f64 transcendental
        # rounding dominates — atol covers it
        np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=func.name)


def test_lcg_distributions_match():
    for dist in LCGDistribution:
        did = list(LCGDistribution).index(dist)
        mine = np.asarray(LCG(distribution=dist, seed=12345).process(512),
                          np.float32)
        ref = ro.lcg(12345, did, 512)
        np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=dist.name)


# reference enum ids (Velvet.h:33-46); this framework's VelvetCore
# enum is ordered differently, so map by NAME
REF_CORE = {VelvetCore.MLS: 0, VelvetCore.LCG: 1}
REF_VTYPE = {VelvetType.OVN: 0, VelvetType.OVNA: 1, VelvetType.ARN: 2,
             VelvetType.TRN: 3}


@pytest.mark.parametrize("core", list(VelvetCore), ids=lambda c: c.name)
@pytest.mark.parametrize("vtype", list(VelvetType), ids=lambda t: t.name)
def test_velvet_bit_exact(core, vtype):
    """All velvet families x both cores: spike positions AND signs match
    the genuine generator sample-for-sample."""
    v = Velvet(vtype=vtype, core=core, window_width=10.0, seed=42)
    v.mls.set_state(1)
    mine = np.asarray(v.generate(2048), np.float32)
    ref = ro.velvet(REF_CORE[core], REF_VTYPE[vtype], 2048, randseed=42,
                    mlsnbits=23, mlsseed=1, window_width=10.0)
    np.testing.assert_allclose(mine, ref, atol=1e-6)


def test_velvet_crushed_matches():
    v = Velvet(vtype=VelvetType.OVN, core=VelvetCore.LCG,
               window_width=10.0, seed=9, crush=True, crush_prob=0.4)
    mine = np.asarray(v.generate(2048), np.float32)
    ref = ro.velvet(1, 0, 2048, randseed=9, window_width=10.0,
                    crush=True, crush_prob=0.4)
    np.testing.assert_allclose(mine, ref, atol=1e-6)


# --- misc pure math -----------------------------------------------------

@pytest.mark.parametrize("kind", list(Window), ids=lambda w: w.value)
@pytest.mark.parametrize("n", [64, 255, 1024])
def test_windows_match(kind, n):
    """All 21 window kinds (windows.h:34-62; enum order mirrored)."""
    mine = window(n, kind)
    ref = ro.window(list(Window).index(kind), n)
    np.testing.assert_allclose(mine, ref, rtol=2e-5, atol=2e-6,
                               err_msg=kind.value)


LFO_FUNCS = ["triangular", "sine", "step_sine", "cubic", "step_cubic",
             "parabolic", "rev_parabolic", "logarithmic",
             "rev_logarithmic", "sqrt", "rev_sqrt", "circular",
             "rev_circular"]


@pytest.mark.parametrize("idx,name", list(enumerate(LFO_FUNCS)),
                         ids=LFO_FUNCS)
def test_lfo_functions_match(idx, name):
    """The reference's sine-family shapes use its quickmath
    approximation — this framework's quick=True path matches it
    BIT-EXACTLY (measured zero diff)."""
    import inspect
    phase = np.linspace(0.0, 1.0, 513).astype(np.float32)
    fn = getattr(lfo_mod, name)
    kwargs = ({"quick": True}
              if "quick" in inspect.signature(fn).parameters else {})
    mine = np.asarray(fn(phase, **kwargs), np.float32)
    ref = ro.lfo(idx, phase)
    # NOTE reference-verbatim quirk: lfo::step_sine mixes quick_sinf
    # (phase>=0.5) with exact sinf (phase<0.5) — lfo.cpp; this framework
    # uses one consistent path, so the bound is the quickmath error
    # (4e-5) rather than zero
    np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=5e-5,
                               err_msg=name)


SIG_FUNCS = ["hard_clip", "quadratic", "sine", "logistic", "arctangent",
             "hyperbolic_tangent", "hyperbolic", "guidermannian", "error",
             "smoothstep", "smootherstep", "circle"]


@pytest.mark.parametrize("idx,name", list(enumerate(SIG_FUNCS)),
                         ids=SIG_FUNCS)
def test_sigmoid_functions_match(idx, name):
    x = np.linspace(-3.0, 3.0, 601).astype(np.float32)
    mine = np.asarray(getattr(sig_mod, name)(x), np.float32)
    ref = ro.sigmoid(idx, x)
    np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=2e-5,
                               err_msg=name)


def test_fades_match():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(512).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fade_mod.fade_in(x, 100), np.float32),
        ro.fade(x, 100, out=False), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(fade_mod.fade_out(x, 100), np.float32),
        ro.fade(x, 100, out=True), rtol=1e-6, atol=1e-7)


REF_ENV_IDS = {  # envelope.h:34-48 enum order
    env_mod.Envelope.VIOLET: 0, env_mod.Envelope.BLUE: 1,
    env_mod.Envelope.WHITE: 2, env_mod.Envelope.PINK: 3,
    env_mod.Envelope.BROWN: 4, env_mod.Envelope.MINUS_4_5_DB: 5,
    env_mod.Envelope.PLUS_4_5_DB: 6,
}


@pytest.mark.parametrize("kind", list(REF_ENV_IDS), ids=lambda e: e.value)
def test_envelope_curves_match(kind):
    for log_grid in (False, True):
        mine = env_mod.noise_log(20.0, 20000.0, 1000.0, 256, kind) \
            if log_grid else env_mod.noise_lin(20.0, 20000.0, 1000.0,
                                               256, kind)
        ref = ro.envelope_noise(REF_ENV_IDS[kind], 256, 20.0, 20000.0,
                                1000.0, log_grid=log_grid)
        np.testing.assert_allclose(np.asarray(mine, np.float32), ref,
                                   rtol=3e-4, atol=1e-6)


def test_fft_crossover_curves_match():
    freqs = np.geomspace(20.0, 20000.0, 256).astype(np.float32)
    for slope in (-6.0, -12.0, -24.0, -48.0):
        np.testing.assert_allclose(
            np.asarray(fx.hipass_set(freqs, 1000.0, slope), np.float32),
            ro.fft_crossover_curve(freqs, 1000.0, slope, lo=False),
            rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(fx.lopass_set(freqs, 1000.0, slope), np.float32),
            ro.fft_crossover_curve(freqs, 1000.0, slope, lo=True),
            rtol=1e-4, atol=1e-6)


def test_fft_crossover_bins_match():
    """FFT-bin gain fill (fft_crossover.cpp:194-358) — the arrays the
    FFTCrossover bands actually apply."""
    for lo in (False, True):
        mine = (fx.lopass_fft_set if lo else fx.hipass_fft_set)(
            1000.0, -24.0, 48000.0, 10)
        ref = ro.fft_crossover_bins(10, 1000.0, -24.0, 48000.0, lo)
        m = np.asarray(mine, np.float32)
        assert m.shape[0] in (ref.shape[0], ref.shape[0] // 2 + 1)
        np.testing.assert_allclose(m, ref[:m.shape[0]], rtol=1e-4,
                                   atol=1e-6)


# --- stat ---------------------------------------------------------------

def test_quantized_counter_matches():
    from lsp_dsp_units_tpu.models.stat.quantized_counter import (
        QuantizedCounter)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(4096) * 0.5).astype(np.float32)
    x[100] = 3.0
    x[200] = -3.0
    ref_counters, below, above, count = ro.quantized_counter(
        -1.0, 1.0, 32, 4096, x, block=512)
    qc = QuantizedCounter(minimum=-1.0, maximum=1.0, levels=32,
                          period=4096)
    st = qc.init_state()
    for off in range(0, 4096, 512):
        st = qc.process(st, x[off:off + 512])
    mine = np.asarray(st.counts, np.int64)
    assert np.array_equal(mine, ref_counters.astype(np.int64))
    assert int(st.below) == below
    assert int(st.above) == above
