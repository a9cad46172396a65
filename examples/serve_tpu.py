"""Streaming server: shm audio rings -> native StreamEngine batch ->
jitted 64-channel chain on the TPU -> shm output rings.

This is the production-serving shape: N client streams are bound to row
ranges of one [64, block] batch; every pump iteration gathers a block
from each ready stream, runs ONE device step for all of them, and
scatters the processed rows back.  A built-in synthetic producer mode
feeds the rings so the demo is self-contained.

Usage:
  python examples/serve_tpu.py [--blocks N] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=50,
                    help="pump iterations to run")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (demo anywhere)")
    ap.add_argument("--rank", type=int, default=12,
                    help="chain rank (block = 2^(rank-1))")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu"))
    import jax.numpy as jnp

    from lsp_dsp_units_tpu.pipeline import FilterConvChain
    from lsp_dsp_units_tpu.shared import AudioStream, StreamEngine

    channels, streams = 64, 8            # 8 stereo-x4 client streams
    per_stream = channels // streams
    chain = FilterConvChain(48000, channels=channels, rank=args.rank,
                            ir_seconds=0.5)
    block = chain.block
    params = chain.build()
    state = chain.init_state(params)
    step = jax.jit(chain.step)

    pid = os.getpid()
    ins = [AudioStream.create(f"/serve_in{i}_{pid}", per_stream,
                              8 * block) for i in range(streams)]
    outs = [AudioStream.create(f"/serve_out{i}_{pid}", per_stream,
                               8 * block) for i in range(streams)]
    eng = StreamEngine(block=block, rows=channels)
    for i in range(streams):
        eng.bind(ins[i], outs[i], row=i * per_stream,
                 channels=per_stream)

    # warm the compile BEFORE going live (cold jit would overrun rings)
    print(f"backend={jax.default_backend()} block={block} "
          f"streams={streams}x{per_stream}ch — warming ...", flush=True)
    state, y = step(params, state, jnp.zeros((channels, block),
                                             jnp.float32))
    np.asarray(y)

    # pre-render the synthetic producers (client audio generation is not
    # part of the serving path being measured)
    rng = np.random.default_rng(0)
    feed = []
    for it in range(args.blocks):
        blocks_it = []
        for i in range(streams):
            tone = np.sin(2 * np.pi * (220 * (i + 1)) *
                          (np.arange(block) + it * block) / 48000.0)
            buf = np.tile(0.3 * tone, (per_stream, 1)).astype(np.float32)
            buf += 0.01 * rng.standard_normal(buf.shape).astype(np.float32)
            blocks_it.append(buf)
        feed.append(blocks_it)

    t0 = time.perf_counter()
    done = underrun_iters = 0
    y_pending = None          # one-block pipeline lag: the previous
    for it in range(args.blocks):   # block's D2H streams while this
        for s, buf in zip(ins, feed[it]):   # block computes
            s.write(buf)
        if eng.wait(min_ready=streams, timeout_ms=50) < streams:
            underrun_iters += 1
            continue
        batch = eng.gather()
        state, y = step(params, state, jnp.asarray(batch))
        if y_pending is not None:
            eng.scatter(np.asarray(y_pending))
        y_pending = y
        done += 1
    if y_pending is not None:
        eng.scatter(np.asarray(y_pending))
    elapsed = time.perf_counter() - t0
    g, u = eng.stats()
    sps = done * block * channels / elapsed
    print(f"served {done}/{args.blocks} batches "
          f"({underrun_iters} waits), gathered={g} underruns={u}")
    print(f"throughput {sps/1e6:.1f} M samples/s "
          f"({sps/(48000*channels):.1f}x realtime for {channels} ch)")

    drained = outs[0].avail()
    print(f"output ring 0 has {drained} frames pending for clients")
    for s in ins + outs:
        s.close()
    eng.close()


if __name__ == "__main__":
    main()
