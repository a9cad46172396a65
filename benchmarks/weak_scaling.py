"""Weak-scaling harness for the sharded chain (SURVEY §7 item 8 /
BASELINE >80% target).

Fixed work per device (channels-per-device x local time), growing the
mesh: reports per-device throughput and efficiency vs 1 device.

On real multi-chip hardware run it as-is (it uses whatever devices JAX
exposes).  In this environment only virtual CPU devices exist, so the
numbers demonstrate the HARNESS, not silicon efficiency — virtual
devices share the same host cores, which makes measured "efficiency"
a pessimistic lower bound (see docs/SCALING.md for the
communication-volume analysis that predicts ~92% on ICI).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/weak_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(n_dev: int, chan_per_dev: int = 4, blocks_per_dev: int = 2,
            rank: int = 10, iters: int = 5) -> dict:
    import jax
    import jax.numpy as jnp
    from lsp_dsp_units_tpu.parallel import mesh as pmesh
    from lsp_dsp_units_tpu.pipeline import FilterConvChain

    devs = jax.devices()[:n_dev]
    time_dim = 2 if n_dev % 2 == 0 else 1
    chan_dim = n_dev // time_dim
    mesh = pmesh.make_mesh(chan=chan_dim, time=time_dim, devices=devs)

    channels = chan_per_dev * chan_dim
    chain = FilterConvChain(48000, channels=channels, rank=rank,
                            ir_seconds=0.05)
    params = chain.build()
    state = chain.init_state(params)
    t = chain.block * blocks_per_dev * time_dim
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((channels, t)).astype(np.float32)
                    * 0.25)

    step = chain.sharded_step(mesh, params)
    state, y = step(state, x)           # compile
    jax.block_until_ready(y)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, y = step(state, x)
    jax.block_until_ready(y)
    el = time.perf_counter() - t0
    total = channels * t * iters
    return {"devices": n_dev, "mesh": f"{chan_dim}x{time_dim}",
            "channels": channels, "t_local": t // time_dim,
            "samples_per_s": round(total / el, 1),
            "samples_per_s_per_dev": round(total / el / n_dev, 1)}


def main() -> None:
    import jax
    # select the platform BEFORE any device use: the axon plugin
    # overrides JAX_PLATFORMS once the backend initializes (and a lone
    # tunneled chip is not a scaling testbed anyway)
    if os.environ.get("WEAK_SCALING_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
        if "host_platform_device_count" not in os.environ.get(
                "XLA_FLAGS", ""):
            jax.config.update("jax_num_cpu_devices", 8)
    # per-device work knobs (efficiency rises with local work because
    # the halo exchange + carried-state reconciliation is a fixed cost
    # per step — see docs/SCALING.md)
    chan_per_dev = int(os.environ.get("WS_CHAN_PER_DEV", "4"))
    blocks_per_dev = int(os.environ.get("WS_BLOCKS_PER_DEV", "2"))
    rank = int(os.environ.get("WS_RANK", "10"))
    n = len(jax.devices())
    sizes = [s for s in (1, 2, 4, 8) if s <= n]
    results = [measure(s, chan_per_dev, blocks_per_dev, rank)
               for s in sizes]
    base = results[0]["samples_per_s_per_dev"]
    for r in results:
        r["efficiency_vs_1dev"] = round(
            r["samples_per_s_per_dev"] / base, 3)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
