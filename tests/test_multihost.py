"""Multi-process (multi-host surrogate) execution — SURVEY §2.12.

Spawns REAL separate processes joined by jax.distributed with gloo
collectives, one CPU device each, and runs the full sharded chain with
the time axis crossing the process boundary (the DCN path).  The demo
asserts distributed == single-device internally (worker 0).
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("workers", [2])
def test_multihost_demo_matches_single_process(workers):
    out = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "benchmarks", "multihost_demo.py"),
         "--workers", str(workers)],
        capture_output=True, text=True, timeout=540,
        env={k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
        cwd=ROOT)
    assert out.returncode == 0, out.stderr[-800:]
    assert '"ok": true' in out.stdout, out.stdout
