"""Interleaved marginal-cost probe: floor / eq / eq+fdl / full variants
timed in alternating windows so tunnel weather cancels in differences."""
import os, sys, time, json
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from lsp_dsp_units_tpu.pipeline import FilterConvChain
from lsp_dsp_units_tpu.ops import biquad_block, fftconv

chain = FilterConvChain(sample_rate=48000, channels=64, rank=14, ir_seconds=1.0)
params = chain.build()
state = chain.init_state(params)
t = chain.block
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((64, t)).astype(np.float32) * 0.25)

def floor_fn(st, xx):
    return jnp.sum(xx) + jnp.sum(st.eq)

def eq_fn(st, xx):
    y, eq_st = biquad_block.cascade_block_fused(params.eq_block, st.eq, xx)
    return jnp.sum(y) + jnp.sum(eq_st)

def eqfdl_fn(st, xx):
    y, eq_st = biquad_block.cascade_block_fused(params.eq_block, st.eq, xx)
    fdl_st, y = fftconv.fdl_process(params.h_spectra, st.fdl, y)
    return jnp.sum(y) + jnp.sum(eq_st) + jnp.sum(fdl_st.history[..., :8])

def full_fn(st, xx):
    st2, y = chain.step(params, st, xx)
    return jnp.sum(y) + jnp.sum(st2.eq)

variants = [("floor", jax.jit(floor_fn)), ("eq", jax.jit(eq_fn)),
            ("eqfdl", jax.jit(eqfdl_fn)), ("full", jax.jit(full_fn))]

# compile
for name, f in variants:
    np.asarray(f(state, x))
    print("compiled", name, flush=True)

ITERS = 25
best = {name: 1e9 for name, _ in variants}
for w in range(8):
    for name, f in variants:
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s = f(state, x)
        np.asarray(s)
        el = (time.perf_counter() - t0) / ITERS * 1e3
        best[name] = min(best[name], el)
    print(w, {k: round(v, 3) for k, v in best.items()}, flush=True)

marg = {"eq": best["eq"] - best["floor"],
        "fdl": best["eqfdl"] - best["eq"],
        "dyn": best["full"] - best["eqfdl"]}
print(json.dumps({"best_ms": {k: round(v, 4) for k, v in best.items()},
                  "marginal_ms": {k: round(v, 4) for k, v in marg.items()}}))
