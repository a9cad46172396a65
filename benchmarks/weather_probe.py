"""Same-run decomposition of the bench super-step's per-block cost.

The round-2 scan-super-step measurement (595M samples/s) did not
reproduce at round-3 start (bench gave ~148M, matching the driver's
BENCH_r02 of 140M).  This probe interleaves, inside ONE process (so
tunnel weather cancels):

  floor    — trivial jit (sum -> scalar): the per-dispatch tunnel floor
  compute  — chain K=16 scan, scalar checksum return: on-device compute
  payload  — no chain, return a [16, 64, 8192] i16 fill: payload stream
  scan16   — the actual bench config (chain K=16, stacked i16 return)

Each timing is the best of WINDOWS windows of ITERS calls; variants are
interleaved round-robin so slow drift in tunnel weather applies to all
equally.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WINDOWS = 4
ITERS = 4
K = 16


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache_tpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from lsp_dsp_units_tpu.pipeline import FilterConvChain
    from lsp_dsp_units_tpu.utils.delivery import tpdf_i16_table, quantize_i16

    channels = 64
    chain = FilterConvChain(sample_rate=48000, channels=channels,
                            rank=14, ir_seconds=1.0)
    params = chain.build()
    state0 = chain.init_state(params)
    t = chain.block
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((channels, t)).astype(np.float32)
                    * 0.25)
    table = tpdf_i16_table(channels, t)

    def inner(params, st, x, k):
        st, y = chain.step(params, st, x)
        return st, quantize_i16(y, table, k)

    def scan16(params, state, x, k0):
        def body(carry, _):
            st, k = carry
            st, q = inner(params, st, x, k)
            return (st, k + jnp.uint32(1)), q
        (st, _), qs = jax.lax.scan(body, (state, k0), None, length=K)
        return st, qs

    def compute_only(params, state, x, k0):
        st, qs = scan16(params, state, x, k0)
        return st, jnp.sum(qs.astype(jnp.int32))

    def payload_only(x):
        # same output bytes as scan16, trivial compute
        v = jnp.sum(x).astype(jnp.int16)
        return jnp.full((K, channels, t), v, jnp.int16)

    def floor_fn(x):
        return jnp.sum(x)

    variants = {
        "floor": (jax.jit(floor_fn), lambda st, k: (x,)),
        "payload": (jax.jit(payload_only), lambda st, k: (x,)),
        "compute": (jax.jit(compute_only),
                    lambda st, k: (params, st, x, jnp.uint32(k))),
        "scan16": (jax.jit(scan16),
                   lambda st, k: (params, st, x, jnp.uint32(k))),
    }

    # warm up all
    states = {name: state0 for name in variants}
    for name, (fn, argf) in variants.items():
        out = fn(*argf(states[name], 0))
        if isinstance(out, tuple):
            states[name] = out[0]
            np.asarray(out[1])
        else:
            np.asarray(out)

    best = {name: float("inf") for name in variants}
    k = 0
    for _ in range(WINDOWS):
        for name, (fn, argf) in variants.items():
            t0 = time.perf_counter()
            for _ in range(ITERS):
                k += 1
                out = fn(*argf(states[name], k))
                if isinstance(out, tuple):
                    states[name] = out[0]
                    y = out[1]
                else:
                    y = out
            np.asarray(y)
            dt = (time.perf_counter() - t0) / ITERS
            best[name] = min(best[name], dt)

    res = {name: round(v * 1e3, 3) for name, v in best.items()}
    res["scan16_samples_per_s"] = round(channels * t * K / best["scan16"], 0)
    res["per_block_ms"] = {
        "floor": round(best["floor"] * 1e3, 3),
        "compute_per_block": round(
            (best["compute"] - best["floor"]) / K * 1e3, 3),
        "payload_per_block": round(
            (best["payload"] - best["floor"]) / K * 1e3, 3),
        "scan16_per_block": round(best["scan16"] / K * 1e3, 3),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
