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

    def step_bf16(params, state, x):
        state, y = chain.step(params, state, x)
        return state, y.astype(jnp.bfloat16)

    def step_scalar(params, state, x):
        state, y = chain.step(params, state, x)
        return state, jnp.sum(y)

    fn = {"f32": step_f32, "i16": step_i16, "bf16": step_bf16,
          "scalar": step_scalar}[name]
    step = jax.jit(fn)

    state, y = step(params, state, x)
    y_host = np.asarray(y)
    assert np.all(np.isfinite(np.asarray(y_host, np.float32))), "non-finite"

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
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

    plan = [("f32", 1, 20), ("i16", 1, 20), ("bf16", 1, 20),
            ("i16", 2, 20), ("i16", 4, 10), ("f32", 4, 10),
            ("scalar", 1, 40)]
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
    with open(os.path.join(ROOT, ".scratch", "delivery_probe.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
