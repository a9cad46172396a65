"""Scan super-step probe 2: larger K + unroll factors."""
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

rng_t = np.random.default_rng(7)
delta_half = 0.5 / 32768.0
table = jnp.asarray(
    ((rng_t.random((64, t + 65536)) + rng_t.random((64, t + 65536)) - 1.0)
     * delta_half).astype(np.float32))

def q16(y, k):
    noise = jax.lax.dynamic_slice(table, (jnp.uint32(0), k & 65535),
                                  (64, y.shape[-1]))
    return jnp.clip((y + noise) * 32767.0, -32768.0, 32767.0).astype(jnp.int16)

def mk_super(K, unroll):
    def super_step(params, state, x, k0):
        def body(carry, i):
            st, k = carry
            st, y = chain.step(params, st, x)
            return (st, k + 1), q16(y, k)
        (st, _), qs = jax.lax.scan(body, (state, k0), None, length=K,
                                   unroll=unroll)
        return st, qs
    return jax.jit(super_step)

VARIANTS = [(16, 1), (16, 4), (32, 1), (32, 4), (64, 1)]
fns = {}
for K, u in VARIANTS:
    f = mk_super(K, u)
    t0 = time.perf_counter()
    st2, qs = f(params, state, x, jnp.uint32(0))
    np.asarray(qs[-1, 0, :4])
    fns[(K, u)] = f
    print("compiled K=%d u=%d (%.1fs)" % (K, u, time.perf_counter() - t0),
          flush=True)

best = {v: 0.0 for v in VARIANTS}
for w in range(6):
    for v in VARIANTS:
        K, u = v
        f = fns[v]
        iters = max(3, 128 // K)
        st = state
        t0 = time.perf_counter()
        for _ in range(iters):
            st, qs = f(params, st, x, jnp.uint32(w))
        np.asarray(qs[-1, 0, :4])
        el = time.perf_counter() - t0
        best[v] = max(best[v], 64 * t * K * iters / el)
    print(w, {"%d/%d" % v: round(best[v] / 1e6, 1) for v in VARIANTS},
          flush=True)

print(json.dumps({"%d/%d" % v: round(best[v] / 1e6, 1) for v in VARIANTS}))
