"""Probe output-delivery strategies for the flagship chain on the TPU.

Round-1 anatomy of the 3.8-4 ms/dispatch (NUMERICS.md): device compute
0.583 ms/block, ~1.3 ms tunnel latency, ~2 ms eager host streaming of
the [64, 8192] f32 output (2 MB at ~1 GB/s).  The chain is delivery
bound, not compute bound.  This probe measures, within ONE run (tunnel
weather varies 3x between runs — never compare across runs):

  f32      — current bench delivery (baseline)
  i16      — device-side 16-bit quantization (the reference's own
             output format via its Dither stage): 4x fewer bytes
  bf16     — bfloat16 delivery: 2x fewer bytes
  i16xK    — i16 + K blocks per dispatch (amortizes tunnel latency)
  f32xK    — f32 + K blocks per dispatch
  scalar   — checksum-only return (compute upper bound)

Usage:  python benchmarks/delivery_probe.py --variant f32
        python benchmarks/delivery_probe.py           # orchestrate all
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_variant(name: str, blocks: int, iters: int):
    sys.path.insert(0, ROOT)
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

    channels = 64
    chain = FilterConvChain(sample_rate=48000, channels=channels,
                            rank=14, ir_seconds=1.0)
    params = chain.build()
    state = chain.init_state(params)
    t = chain.block * blocks
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((channels, t)).astype(np.float32)
                    * 0.25)

    def step_f32(params, state, x):
        state, y = chain.step(params, state, x)
        return state, y

    def step_i16(params, state, x):
        state, y = chain.step(params, state, x)
        q = jnp.clip(y * 32767.0, -32768.0, 32767.0).astype(jnp.int16)
        return state, q

    # dithered 16-bit delivery variants: threefry jax.random (i16d),
    # rbg hardware RNG (i16r), precomputed TPDF table slice (i16t — the
    # closest analogue of the reference's table-seeded Randomizer)
    base_key = jax.random.PRNGKey(0)
    delta_half = 0.5 / 32768.0

    def step_i16d(params, state, x, k):
        state, y = chain.step(params, state, x)
        kk = jax.random.fold_in(base_key, k)
        k1, k2 = jax.random.split(kk)
        tpdf = (jax.random.uniform(k1, y.shape)
                + jax.random.uniform(k2, y.shape) - 1.0)
        y = y + tpdf * delta_half
        q = jnp.clip(y * 32767.0, -32768.0, 32767.0).astype(jnp.int16)
        return state, q

    rbg_key = jax.random.key(0, impl="rbg")

    def step_i16r(params, state, x, k):
        state, y = chain.step(params, state, x)
        kk = jax.random.fold_in(rbg_key, k)
        k1, k2 = jax.random.split(kk)
        tpdf = (jax.random.uniform(k1, y.shape)
                + jax.random.uniform(k2, y.shape) - 1.0)
        y = y + tpdf * delta_half
        q = jnp.clip(y * 32767.0, -32768.0, 32767.0).astype(jnp.int16)
        return state, q

    from lsp_dsp_units_tpu.utils.delivery import (tpdf_i16_table,
                                                  quantize_i16)
    table = tpdf_i16_table(channels, t)

    def step_i16t(params, state, x, k):
        state, y = chain.step(params, state, x)
        return state, quantize_i16(y, table, k)

    def step_bf16(params, state, x):
        state, y = chain.step(params, state, x)
        return state, y.astype(jnp.bfloat16)

    def step_scalar(params, state, x):
        state, y = chain.step(params, state, x)
        return state, jnp.sum(y)

    fn = {"f32": step_f32, "i16": step_i16, "bf16": step_bf16,
          "scalar": step_scalar, "i16d": step_i16d, "i16r": step_i16r,
          "i16t": step_i16t}[name.rstrip("p")]
    keyed = name.rstrip("p") in ("i16d", "i16r", "i16t")
    raw = jax.jit(fn)
    if keyed:
        def step(params, state, x, _c=[0]):
            _c[0] += 1
            return raw(params, state, x, jnp.uint32(_c[0]))
    else:
        step = raw

    state, y = step(params, state, x)
    np.asarray(y)
    # validity must be checked on the REAL-VALUED output — the i16*
    # variants' cast silently swallows NaN (isfinite on int16 is
    # vacuous)
    _, y_f32 = jax.jit(chain.step)(params, chain.init_state(params), x)
    assert np.all(np.isfinite(np.asarray(y_f32))), "non-finite"

    # "p" suffix = pipelined delivery: keep DEPTH dispatches in flight
    # and fetch lagging outputs, so the D2H copy of block k overlaps the
    # dispatch+compute of k+1.. (jax dispatch is async; np.asarray on an
    # older output blocks only on that transfer)
    pipelined = name.endswith("p")
    depth = 2

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        if pipelined:
            pending = []
            for _ in range(iters):
                state, y = step(params, state, x)
                pending.append(y)
                if len(pending) > depth:
                    np.asarray(pending.pop(0))
            for y in pending:
                np.asarray(y)
        else:
            for _ in range(iters):
                state, y = step(params, state, x)
            np.asarray(y)
        elapsed = time.perf_counter() - t0
        best = max(best, channels * t * iters / elapsed)
    return {"variant": name, "blocks": blocks,
            "samples_per_sec": round(best, 1),
            "ms_per_block": round(1000.0 * channels * chain.block / best, 3)}


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--variant":
        name, blocks, iters = sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
        print(json.dumps(run_variant(name, blocks, iters)))
        return

    plan = [("i16", 1, 30), ("i16p", 1, 30), ("i16", 2, 20),
            ("i16p", 2, 20), ("i16", 4, 12), ("scalar", 1, 40)]
    results = []
    for name, blocks, iters in plan:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--variant",
                 name, str(blocks), str(iters)],
                capture_output=True, text=True, timeout=900, cwd=ROOT)
            for line in out.stdout.splitlines():
                if line.strip().startswith("{"):
                    r = json.loads(line)
                    results.append(r)
                    print(json.dumps(r), flush=True)
                    break
            else:
                print(f"# {name} x{blocks} failed: {out.stderr[-300:]}",
                      flush=True)
        except subprocess.TimeoutExpired:
            print(f"# {name} x{blocks} timed out", flush=True)
    os.makedirs(os.path.join(ROOT, ".scratch"), exist_ok=True)
    with open(os.path.join(ROOT, ".scratch", "delivery_probe.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
