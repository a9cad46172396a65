"""Multi-host (multi-process) execution of the sharded chain.

Demonstrates the SURVEY §2.12 DCN code path without a TPU pod: N worker
processes, one CPU device each, joined by ``jax.distributed`` (gloo
collectives).  The ('chan','time') mesh spans the processes, so the
convolver's time-halo ppermutes and the IIR summary all_gathers cross
the process boundary — exactly what ICI/DCN carries on real hardware.

Worker 0 also computes the single-device reference and asserts the
distributed result matches (>=95 dB), mirroring the single-process
dryrun contract.

Usage:  python benchmarks/multihost_demo.py            # orchestrates 2 workers
        python benchmarks/multihost_demo.py --workers 4
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def worker() -> None:
    pid = int(os.environ["LSP_PROCESS_ID"])
    n = int(os.environ["LSP_NUM_PROCESSES"])
    import jax
    jax.config.update("jax_num_cpu_devices", 1)
    from lsp_dsp_units_tpu.parallel import mesh as pmesh
    pmesh.init_distributed()

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lsp_dsp_units_tpu.pipeline import FilterConvChain

    assert jax.device_count() == n and jax.local_device_count() == 1
    # time axis across processes: halos/summaries ride the DCN path
    mesh = pmesh.make_mesh(chan=1, time=n)

    chain = FilterConvChain(48000, channels=4, rank=8, ir_seconds=0.02)
    params = chain.build()
    state = chain.init_state(params)
    t = chain.block * 2 * n
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, t)).astype(np.float32) * 0.25

    # globalize: x time-sharded from per-process slices, state replicated
    xspec = NamedSharding(mesh, P(pmesh.CHAN_AXIS, pmesh.TIME_AXIS))
    tl = t // n
    xg = jax.make_array_from_process_local_data(
        xspec, x[:, pid * tl: (pid + 1) * tl])
    state = jax.tree_util.tree_map(
        lambda leaf: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*((pmesh.CHAN_AXIS,)
                                    + (None,) * (leaf.ndim - 1)))),
            np.asarray(leaf)), state)

    step = chain.sharded_step(mesh, params)
    outs = []
    for _ in range(2):
        state, y = step(state, xg)
        outs.append(multihost_utils.process_allgather(y, tiled=True))

    # distributed ILUFS: the 400 ms gating ring spans the process
    # boundary; the two-stage gate reduces via psum across hosts
    # (parallel.meters.ilufs_integrated_time_sharded)
    from jax import shard_map
    from lsp_dsp_units_tpu.models.meters.loudness import ILUFSMeter
    from lsp_dsp_units_tpu.ops import biquad_block
    from lsp_dsp_units_tpu.parallel.meters import (
        ilufs_integrated_time_sharded)

    meter = ILUFSMeter(sample_rate=48000, channels=4,
                       max_int_time_s=10.0)
    blk = meter.blk_size
    tl_loud = 3 * blk                   # 300 ms per process
    xl = rng.standard_normal((4, n * tl_loud)).astype(np.float32) * 0.2
    xlg = jax.make_array_from_process_local_data(
        xspec, xl[:, pid * tl_loud: (pid + 1) * tl_loud])
    fp = biquad_block.precompute_fused(np.asarray(meter._coeffs), blk)
    gate = jax.jit(shard_map(
        lambda xs: ilufs_integrated_time_sharded(
            meter, fp, xs, pmesh.TIME_AXIS),
        mesh=mesh, in_specs=P(None, pmesh.TIME_AXIS),
        out_specs=P(), check_vma=False))
    # replicated scalar: read this process's addressable replica
    loud_sh = float(np.asarray(gate(xlg).addressable_data(0)))

    if pid == 0:
        ref_state = chain.init_state(params)
        snrs = []
        for got in outs:
            ref_state, y_ref = chain.step(params, ref_state,
                                          jnp.asarray(x))
            ref = np.asarray(y_ref)
            err = np.asarray(got) - ref
            p_sig = float(np.sum(ref * ref))
            p_err = float(np.sum(err * err))
            snrs.append(10.0 * np.log10(p_sig / max(p_err, 1e-30)))
        # distributed ILUFS gate vs the sequential meter
        mst = meter.init_state()
        mst, _ = meter.process(mst, jnp.asarray(xl))
        loud_ref = float(mst.loudness)
        loud_ok = (loud_ref > 0.0
                   and abs(loud_sh - loud_ref)
                   <= 1e-5 * max(loud_ref, 1e-9))

        # the documented contract: distributed == single-process at
        # >= 95 dB SNR, the same north star as the sharding unit tests
        ok = all(s >= 95.0 for s in snrs) and loud_ok
        print(json.dumps({"processes": n, "snr_db_per_step":
                          [round(s, 1) for s in snrs],
                          "ilufs_sharded": loud_sh,
                          "ilufs_sequential": loud_ref,
                          "ok": ok}),
              flush=True)
        if not ok:
            raise SystemExit(1)


def main() -> None:
    if "--worker" in sys.argv:
        worker()
        return
    n = 2
    if "--workers" in sys.argv:
        n = int(sys.argv[sys.argv.index("--workers") + 1])
    # bind an ephemeral port for the coordinator so concurrent
    # instances (CI shards, pytest next to a manual run) can't collide
    # or cross-talk; the race window between close() and the
    # coordinator's bind is harmless — worst case the launch fails and
    # the caller retries
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(n):
        env = dict(os.environ,
                   LSP_COORDINATOR=f"127.0.0.1:{port}",
                   LSP_NUM_PROCESSES=str(n), LSP_PROCESS_ID=str(pid),
                   JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=ROOT))
    ok = True
    try:
        for pid, p in enumerate(procs):
            try:
                out, err = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                ok = False
                print(f"# worker {pid} timed out", file=sys.stderr)
                continue
            for line in out.splitlines():
                if line.strip().startswith("{"):
                    print(line)
            if p.returncode != 0:
                ok = False
                print(f"# worker {pid} rc={p.returncode}: {err[-400:]}",
                      file=sys.stderr)
    finally:
        # one hung worker must not orphan its siblings (they hold the
        # coordinator port and gloo rendezvous forever)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
