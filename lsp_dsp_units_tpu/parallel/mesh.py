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
