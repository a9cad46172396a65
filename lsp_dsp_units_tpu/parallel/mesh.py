"""Device mesh helpers — the TPU-native replacement for the reference's
process-level IPC layer (SURVEY.md §2.6/§2.12).

Canonical mesh for the framework: axes ``('chan', 'time')`` — channels
are data-parallel (the reference loops channels serially, e.g.
ILUFSMeter.cpp:367-377; here they shard), long signals shard along time
with carried-state exchange (halo margins for FIR/FFT, affine summaries
for IIR — see :mod:`.halo` and :mod:`.time_iir`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHAN_AXIS = "chan"
TIME_AXIS = "time"


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     platform: Optional[str] = None) -> None:
    """Initialize the multi-host runtime (SURVEY §2.12 multi-host).

    On TPU pods the three arguments are auto-detected from the
    environment and this is just ``jax.distributed.initialize()``.  For
    CPU-based multi-process runs (tests, the DCN code path without
    silicon) pass them explicitly — or set ``LSP_COORDINATOR``,
    ``LSP_NUM_PROCESSES``, ``LSP_PROCESS_ID`` — and cross-process
    collectives use the gloo backend.  After this returns,
    ``jax.devices()`` is the GLOBAL device list and :func:`make_mesh`
    builds meshes spanning all hosts (XLA then routes the time-halo
    ppermutes and meter psums over ICI/DCN instead of intra-chip).
    """
    import os
    coordinator = coordinator or os.environ.get("LSP_COORDINATOR")
    if num_processes is None and "LSP_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["LSP_NUM_PROCESSES"])
    if process_id is None and "LSP_PROCESS_ID" in os.environ:
        process_id = int(os.environ["LSP_PROCESS_ID"])
    if platform == "cpu" or (platform is None
                             and num_processes is not None):
        # explicit process topology without TPU pod metadata -> CPU path
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(chan: Optional[int] = None, time: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('chan', 'time') mesh over the available devices.

    If ``chan`` is None, all devices not used by ``time`` go to the
    channel axis.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if chan is None:
        assert n % time == 0, (n, time)
        chan = n // time
    assert chan * time <= n, (chan, time, n)
    grid = np.asarray(devs[: chan * time]).reshape(chan, time)
    return Mesh(grid, (CHAN_AXIS, TIME_AXIS))


def chan_sharding(mesh: Mesh) -> NamedSharding:
    """[C, T] arrays sharded over channels only."""
    return NamedSharding(mesh, P(CHAN_AXIS, None))


def chan_time_sharding(mesh: Mesh) -> NamedSharding:
    """[C, T] arrays sharded over channels and time blocks."""
    return NamedSharding(mesh, P(CHAN_AXIS, TIME_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
