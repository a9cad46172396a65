"""Delivery-shape probe: does the tunnel stream smaller/raveled/
transposed output arrays faster?  Interleaved windows, one process."""
import os, sys, time, json
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from lsp_dsp_units_tpu.pipeline import FilterConvChain

chain = FilterConvChain(sample_rate=48000, channels=64, rank=14, ir_seconds=1.0)
params = chain.build()
state = chain.init_state(params)
t = chain.block
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((64, t)).astype(np.float32) * 0.25)

def q16(y):
    return jnp.clip(y * 32767.0, -32768.0, 32767.0).astype(jnp.int16)

def v_i16(st, xx):       # baseline: [64, 8192] i16
    st2, y = chain.step(params, st, xx)
    return st2, q16(y)

def v_flat(st, xx):      # raveled [524288] i16
    st2, y = chain.step(params, st, xx)
    return st2, q16(y).ravel()

def v_t(st, xx):         # transposed [8192, 64] i16
    st2, y = chain.step(params, st, xx)
    return st2, q16(y).T

def v_s2(st, xx):        # two [32, 8192] halves
    st2, y = chain.step(params, st, xx)
    q = q16(y)
    return st2, (q[:32], q[32:])

def v_s8(st, xx):        # eight [8, 8192] pieces
    st2, y = chain.step(params, st, xx)
    q = q16(y)
    return st2, tuple(q[i*8:(i+1)*8] for i in range(8))

variants = [("i16", jax.jit(v_i16)), ("flat", jax.jit(v_flat)),
            ("T", jax.jit(v_t)), ("s2", jax.jit(v_s2)),
            ("s8", jax.jit(v_s8))]

for name, f in variants:
    out = f(state, x)
    for l in jax.tree_util.tree_leaves(out[1]):
        np.asarray(l)
    print("compiled", name, flush=True)

ITERS = 25
best = {name: 1e9 for name, _ in variants}
for w in range(6):
    for name, f in variants:
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st2, q = f(state, x)
        for l in jax.tree_util.tree_leaves(q):
            np.asarray(l)
        el = (time.perf_counter() - t0) / ITERS * 1e3
        best[name] = min(best[name], el)
    print(w, {k: round(v, 3) for k, v in best.items()}, flush=True)

print(json.dumps({k: round(v, 4) for k, v in best.items()}))
print(json.dumps({k: round(64 * t / v * 1000.0 / 1e6, 1) + 0
                  for k, v in best.items()}))
