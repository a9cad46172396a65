"""Envelope-kernel timing on hardware: unrolled Pallas vs full chain."""
import os, sys, time, json
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from lsp_dsp_units_tpu.pipeline import FilterConvChain
from lsp_dsp_units_tpu.ops import dynamics as dyn

chain = FilterConvChain(sample_rate=48000, channels=64, rank=14, ir_seconds=1.0)
params = chain.build()
state = chain.init_state(params)
t = chain.block
rng = np.random.default_rng(0)
x = jnp.asarray(np.abs(rng.standard_normal((64, t))).astype(np.float32) * 0.25)

def env_fn(st, xx):
    env_st, env = dyn.peak_envelope(st.env, xx, 0.01, 0.002, 480,
                                    release_thresh=0.125)
    return jnp.sum(env) + jnp.sum(env_st.envelope)

def floor_fn(st, xx):
    return jnp.sum(xx) + jnp.sum(st.eq)

def full_fn(st, xx):
    st2, y = chain.step(params, st, xx)
    return jnp.sum(y) + jnp.sum(st2.eq)

variants = [("floor", jax.jit(floor_fn)), ("env", jax.jit(env_fn)),
            ("full", jax.jit(full_fn))]
for name, f in variants:
    np.asarray(f(state, x))
    print("compiled", name, flush=True)

# correctness on hardware vs scan (CPU-free check: compare to numpy scan)
env_st, env = dyn.peak_envelope(state.env, x, 0.01, 0.002, 480,
                                release_thresh=0.125)
env_h = np.asarray(env)
assert np.isfinite(env_h).all()
print("env sample:", env_h[0, :4], flush=True)

ITERS = 30
best = {name: 1e9 for name, _ in variants}
for w in range(6):
    for name, f in variants:
        t0 = time.perf_counter()
        for _ in range(ITERS):
            s = f(state, x)
        np.asarray(s)
        el = (time.perf_counter() - t0) / ITERS * 1e3
        best[name] = min(best[name], el)
    print(w, {k: round(v, 3) for k, v in best.items()}, flush=True)
print(json.dumps({k: round(v, 4) for k, v in best.items()}))
