"""Scan super-step probe: amortize the tunnel dispatch floor by running
K chain steps inside ONE jit (lax.scan), returning the stacked i16
output.  Interleaved windows, one process, fetch once per window (same
protocol as bench.py)."""
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

def mk_super(K):
    def super_step(params, state, x, k0):
        def body(carry, i):
            st, k = carry
            st, y = chain.step(params, st, x)
            return (st, k + 1), q16(y, k)
        (st, _), qs = jax.lax.scan(body, (state, k0), None, length=K)
        return st, qs          # qs: [K, 64, t] i16
    return jax.jit(super_step)

KS = [1, 2, 4, 8, 16]
fns = {}
for K in KS:
    f = mk_super(K)
    st2, qs = f(params, state, x, jnp.uint32(0))
    np.asarray(qs[-1, 0, :4])   # force
    fns[K] = f
    print("compiled K=%d" % K, flush=True)

ITERS = {1: 30, 2: 20, 4: 12, 8: 8, 16: 5}
best = {K: 0.0 for K in KS}
for w in range(6):
    for K in KS:
        f = fns[K]
        k = jnp.uint32(w)
        st = state
        t0 = time.perf_counter()
        for _ in range(ITERS[K]):
            st, qs = f(params, st, x, k)
        np.asarray(qs[-1, 0, :4])
        el = time.perf_counter() - t0
        best[K] = max(best[K], 64 * t * K * ITERS[K] / el)
    print(w, {K: round(best[K] / 1e6, 1) for K in KS}, flush=True)

# honest-delivery variant: fetch the FULL stacked output every dispatch
best_fetch = {K: 0.0 for K in KS}
for w in range(4):
    for K in KS:
        f = fns[K]
        st = state
        t0 = time.perf_counter()
        for _ in range(max(3, ITERS[K] // 2)):
            st, qs = f(params, st, x, jnp.uint32(w))
            np.asarray(qs)
        el = time.perf_counter() - t0
        best_fetch[K] = max(best_fetch[K],
                            64 * t * K * max(3, ITERS[K] // 2) / el)
    print("fetch", w, {K: round(best_fetch[K] / 1e6, 1) for K in KS},
          flush=True)

print(json.dumps({"window_Msps": {K: round(best[K] / 1e6, 1) for K in KS},
                  "fetch_Msps": {K: round(best_fetch[K] / 1e6, 1)
                                 for K in KS}}))
