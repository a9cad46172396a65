"""Per-stage device-time probe for the flagship chain (scalar returns so
delivery cost is excluded; one subprocess run, best of 3 windows each)."""
import os, sys, time, json
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from lsp_dsp_units_tpu.pipeline import FilterConvChain
from lsp_dsp_units_tpu.ops import biquad_block, fftconv, dynamics as dyn

chain = FilterConvChain(sample_rate=48000, channels=64, rank=14, ir_seconds=1.0)
params = chain.build()
state = chain.init_state(params)
t = chain.block
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((64, t)).astype(np.float32) * 0.25)

def mk(fn):
    f = jax.jit(fn)
    s = f(state, x)
    np.asarray(s)  # force + surface errors
    def timed(iters=40):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                s = f(state, x)
            np.asarray(s)
            el = (time.perf_counter() - t0) / iters
            best = min(best, el)
        return best * 1e3
    return timed

def full(st, xx):
    st2, y = chain.step(params, st, xx)
    return jnp.sum(y) + jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b), st2.eq, 0.0)

def eq_only(st, xx):
    y, eq_st = biquad_block.cascade_block_fused(params.eq_block, st.eq, xx)
    return jnp.sum(y) + jnp.sum(eq_st)

def fdl_only(st, xx):
    fdl_st, y = fftconv.fdl_process(params.h_spectra, st.fdl, xx)
    return jnp.sum(y) + jnp.sum(fdl_st.history)

def sc_only(st, xx):
    sc_st, level = chain.sidechain.process(st.sc, xx)
    return jnp.sum(level) + jnp.sum(sc_st.rms)

def env_only(st, xx):
    env_st, gain, _ = chain.compressor.process(params.comp, st.env, jnp.abs(xx))
    return jnp.sum(gain)

res = {}
for name, fn in [("full", full), ("eq", eq_only), ("fdl", fdl_only),
                 ("sc", sc_only), ("env", env_only)]:
    try:
        res[name] = round(mk(fn)(), 4)
        print(name, res[name], "ms", flush=True)
    except Exception as e:
        print(name, "FAILED", repr(e)[:200], flush=True)
print(json.dumps(res))
