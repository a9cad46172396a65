"""Sidechain conditioner (reference: src/main/util/Sidechain.cpp,
include/.../util/Sidechain.h:35-51).

Source select (stereo -> detector) + level estimation mode:

* PEAK    — pass |x|.
* RMS     — sliding sum of squares over the reactivity window, ssqrt
            (reference Sidechain.cpp:520-556) — here a cumsum-difference
            over the window, recomputed fresh every process() call (which
            subsumes the reference's 0x2000-sample drift refresh,
            Sidechain.cpp:30-31,455-460).
* LPF     — one-pole smoother (time-parallel first-order scan).
* UNIFORM — sliding mean of absolute values.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops.sliding import sliding_sum
from lsp_dsp_units_tpu.ops import dynamics as dyn

Array = jax.Array


class SidechainSource(enum.Enum):
    MIDDLE = "middle"
    SIDE = "side"
    LEFT = "left"
    RIGHT = "right"
    AMIN = "amin"
    AMAX = "amax"


class SidechainMode(enum.Enum):
    PEAK = "peak"
    RMS = "rms"
    LPF = "lpf"
    UNIFORM = "uniform"


class SidechainState(NamedTuple):
    window: Array    # [..., N] trailing detector samples (RMS/UNIFORM)
    rms: Array       # [...] carried accumulator / LPF state


def select_source(left: Array, right: Array,
                  source: SidechainSource) -> Array:
    """Stereo source selection (reference Sidechain::preprocess,
    stereo non-midside path): detector = |selected|."""
    if source == SidechainSource.MIDDLE:
        s = 0.5 * (left + right)
    elif source == SidechainSource.SIDE:
        s = 0.5 * (left - right)
    elif source == SidechainSource.LEFT:
        s = left
    elif source == SidechainSource.RIGHT:
        s = right
    elif source == SidechainSource.AMIN:
        return jnp.minimum(jnp.abs(left), jnp.abs(right))
    else:  # AMAX
        return jnp.maximum(jnp.abs(left), jnp.abs(right))
    return jnp.abs(s)


class Sidechain:
    def __init__(self, sample_rate: int = 48000,
                 mode: SidechainMode = SidechainMode.RMS,
                 reactivity_ms: float = 10.0, gain: float = 1.0):
        self.sample_rate = int(sample_rate)
        self.mode = mode
        self.reactivity_ms = float(reactivity_ms)
        # reference Sidechain.cpp:119-128
        self.reactivity = max(int(sample_rate * reactivity_ms / 1000.0), 1)
        self.tau = float(
            1.0 - np.exp(np.log(1.0 - np.sqrt(0.5)) / self.reactivity))
        self.gain = float(gain)

    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> SidechainState:
        n = self.reactivity if self.mode in (SidechainMode.RMS,
                                             SidechainMode.UNIFORM) else 1
        return SidechainState(
            window=jnp.zeros(batch_shape + (n,), jnp.float32),
            rms=jnp.zeros(batch_shape, jnp.float32))

    def process(self, state: SidechainState, x: Array,
                ) -> Tuple[SidechainState, Array]:
        """x: detector signal [..., T] (already source-selected, >= 0
        except for PEAK/LPF which abs internally).  Returns level
        estimate."""
        x = jnp.abs(x) * self.gain
        n = self.reactivity
        if self.mode == SidechainMode.PEAK:
            return state, x
        if self.mode == SidechainMode.LPF:
            rms, y = dyn.onepole_lowpass(state.rms, x, self.tau)
            return state._replace(rms=rms), jnp.maximum(y, 0.0)
        if self.mode == SidechainMode.RMS:
            t = x.shape[-1]
            # Mosaic fast path: rolling-sum RMS in one VMEM pass (the
            # reference's own incremental form, Sidechain.cpp:455-460,
            # refreshed from the carried window every block).  The
            # cumsum-difference fallback lowers to ~log2(T) full-array
            # passes (0.11 ms of the chain block vs ~0.03 — NUMERICS
            # round-4 anatomy).  Gated like ops.dynamics.peak_envelope:
            # 2D input, tile-aligned shapes, VMEM budget.
            c_pad = -(-x.shape[0] // 128) * 128 if x.ndim == 2 else 0
            if (x.ndim == 2 and x.dtype == jnp.float32
                    and t >= n and t % 8 == 0 and n % 8 == 0
                    and jax.default_backend() == "tpu"
                    and (2 * t + 2 * n) * c_pad * 4 <= (9 << 20)):
                from lsp_dsp_units_tpu.ops.pallas_env import (
                    sliding_rms_pallas)
                win, y = sliding_rms_pallas(state.window, x, n, 1.0)
                return state._replace(window=win), y
            sq = x * x
            frame = jnp.concatenate([state.window, sq], axis=-1)
            win = _sliding_sum(frame, n, x.shape[-1])
            y = jnp.sqrt(jnp.maximum(win / n, 0.0))
            return state._replace(window=frame[..., -n:]), y
        # UNIFORM
        frame = jnp.concatenate([state.window, x], axis=-1)
        win = _sliding_sum(frame, n, x.shape[-1])
        y = jnp.maximum(win, 0.0) / n
        return state._replace(window=frame[..., -n:]), y


# shared cumsum-difference kernel (ops.sliding)
_sliding_sum = sliding_sum
