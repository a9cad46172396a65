"""Profiling helpers — the TPU analog of the reference's `profile` /
`trace` build features (SURVEY.md §5: the reference wires FEATURE flags
through its make system; here profiling is a runtime tool).

``trace(logdir)`` wraps ``jax.profiler`` so any processing region can be
captured for TensorBoard/xprof; ``time_fn`` measures steady-state
throughput of a jitted step the same way bench.py does (best of N timed
windows, device-fetch to surface deferred backend errors).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional, Tuple

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a JAX profiler trace of the enclosed region::

        with profiling.trace("/tmp/trace"):
            state, y = step(params, state, x)
    """
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, windows: int = 3,
            samples_per_call: Optional[int] = None,
            ) -> Tuple[float, Optional[float]]:
    """Steady-state timing of ``fn(*args)`` (already-jitted step).

    Carries nothing between calls — pass a closure if the step is
    stateful.  Returns ``(seconds_per_call, samples_per_second)`` where
    the second value is None unless ``samples_per_call`` is given.
    The first call (compile) is excluded; the best of ``windows`` timed
    windows is used (tunnel/backend latency jitters — see bench.py).
    """
    out = fn(*args)                 # compile call, excluded from timing
    leaves = jax_leaves(out)
    if leaves:
        np.asarray(leaves[0])

    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaves = jax_leaves(out)
        if leaves:
            np.asarray(leaves[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    rate = None if samples_per_call is None else samples_per_call / best
    return best, rate


def jax_leaves(tree):
    import jax
    return [l for l in jax.tree_util.tree_leaves(tree)
            if hasattr(l, "dtype")]
