"""Driver benchmark: samples/s/chip on the 64-channel filter+convolver
chain (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline = value / (48000 * 64) — how many times faster than real-time
the full 64-channel chain runs on one chip (the reference publishes no
throughput numbers — BASELINE.md — so real-time-rate is the operative
anchor).
"""

import json
import sys
import time

import numpy as np


def run_once(rank: int, blocks_per_step: int, iters: int):
    import jax
    import jax.numpy as jnp

    from lsp_dsp_units_tpu.pipeline import FilterConvChain

    sample_rate = 48000
    channels = 64
    chain = FilterConvChain(sample_rate=sample_rate, channels=channels,
                            rank=rank, ir_seconds=1.0)
    params = chain.build()
    state = chain.init_state(params)

    t = chain.block * blocks_per_step
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((channels, t)).astype(np.float32)
                    * 0.25)

    step = jax.jit(chain.step)

    # warm up / compile; np.asarray forces a real device->host fetch so
    # deferred backend errors surface here (the axon tunnel reports some
    # failures only at fetch time, not in block_until_ready)
    state, y = step(params, state, x)
    y_host = np.asarray(y)
    assert np.all(np.isfinite(y_host)), "non-finite bench output"

    t0 = time.perf_counter()
    for _ in range(iters):
        state, y = step(params, state, x)
    np.asarray(y)
    elapsed = time.perf_counter() - t0

    total_samples = channels * t * iters
    return total_samples / elapsed, sample_rate, channels


def main() -> None:
    last_err = None
    # prefer large per-call blocks; fall back to smaller graphs if the
    # backend rejects them (the axon tunnel is intermittently flaky with
    # large fused programs)
    for rank, blocks, iters in ((14, 6, 10), (14, 1, 30), (12, 4, 20)):
        try:
            value, sample_rate, channels = run_once(rank, blocks, iters)
            vs_baseline = value / (sample_rate * channels)
            print(json.dumps({
                "metric":
                    "samples_per_sec_per_chip_64ch_filter_conv_dyn_chain",
                "value": round(value, 1),
                "unit": "samples/s/chip",
                "vs_baseline": round(vs_baseline, 3),
            }))
            return
        except Exception as e:  # noqa: BLE001 — retry smaller config
            last_err = e
            print(f"bench config (rank={rank}, blocks={blocks}) failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
    raise SystemExit(f"all bench configs failed: {last_err}")


if __name__ == "__main__":
    main()
