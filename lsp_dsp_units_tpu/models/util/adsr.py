"""ADSREnvelope — AHDBSSR envelope curve calculator
(reference: src/main/util/ADSREnvelope.cpp).

The envelope is a pure function of normalized time t in [0, 1):
attack -> (hold) -> decay -> (slope to break level) -> sustain ->
release, each segment shaped by a curve generator (two-segment line or
Hermite cubic with a curvature control).  Elementwise over t arrays —
ideal VPU code; callers drive it with a phase ramp.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.misc import interpolation as interp

Array = jax.Array


class ADSRFunction(enum.Enum):
    LINE = "line"      # two-segment line, midpoint at (x0+x1)/2
    LINE2 = "line2"    # two-segment line, breakpoint by curve ratio
    CUBIC = "cubic"    # Hermite cubic with zero end slopes


class _Segment(NamedTuple):
    x0: float
    x1: float
    y0: float
    y1: float
    curve: float
    func: ADSRFunction


def _seg_eval(seg: _Segment, t: Array) -> Array:
    x0, x1, y0, y1 = seg.x0, seg.x1, seg.y0, seg.y1
    if seg.func in (ADSRFunction.LINE, ADSRFunction.LINE2):
        if seg.func == ADSRFunction.LINE:
            t2 = 0.5 * (x0 + x1)
        else:
            t2 = x1 + (x0 - x1) * seg.curve
        cy = y0 + (y1 - y0) * seg.curve
        k1 = (cy - y0) / max(t2 - x0, 1e-9)
        k2 = (y1 - cy) / max(x1 - t2, 1e-9)
        return jnp.where(t < t2, y0 + k1 * (t - x0), cy + k2 * (t - t2))
    p = interp.hermite_cubic(x0, y0, 0.0, x1, y1, 0.0)
    return interp.polyval3(jnp.asarray(p, jnp.float32), t)


class ADSREnvelope:
    """Static envelope shape; :meth:`process` evaluates at time values."""

    def __init__(self, attack: float = 0.1, decay: float = 0.3,
                 sustain_level: float = 0.5, release: float = 0.8,
                 hold: Optional[float] = None,
                 break_level: Optional[float] = None,
                 slope: float = 0.5,
                 attack_func: ADSRFunction = ADSRFunction.CUBIC,
                 decay_func: ADSRFunction = ADSRFunction.CUBIC,
                 slope_func: ADSRFunction = ADSRFunction.CUBIC,
                 release_func: ADSRFunction = ADSRFunction.CUBIC,
                 curve: float = 0.5):
        self.attack = float(attack)
        self.hold = float(hold) if hold is not None else self.attack
        self.decay = float(decay)
        self.sustain_level = float(sustain_level)
        self.release = float(release)
        self.break_level = break_level
        self.slope = float(slope)

        hold_end = max(self.hold, self.attack)
        if break_level is not None:
            decay_end = self.decay
            slope_end = self.slope
            self.segs = [
                _Segment(0.0, self.attack, 0.0, 1.0, curve, attack_func),
                _Segment(hold_end, decay_end, 1.0, float(break_level),
                         curve, decay_func),
                _Segment(decay_end, slope_end, float(break_level),
                         self.sustain_level, curve, slope_func),
                _Segment(self.release, 1.0, self.sustain_level, 0.0,
                         curve, release_func),
            ]
        else:
            self.segs = [
                _Segment(0.0, self.attack, 0.0, 1.0, curve, attack_func),
                _Segment(hold_end, self.decay, 1.0, self.sustain_level,
                         curve, decay_func),
                None,
                _Segment(self.release, 1.0, self.sustain_level, 0.0,
                         curve, release_func),
            ]
        self.hold_end = hold_end

    def process(self, t: Array) -> Array:
        """Evaluate the envelope at t (any shape), 0 outside [0,1)
        (reference ADSREnvelope::do_process)."""
        t = jnp.asarray(t, jnp.float32)
        att, dec, rel = self.segs[0], self.segs[1], self.segs[3]
        out = jnp.full(t.shape, self.sustain_level, jnp.float32)
        out = jnp.where(t < rel.x1, out, 0.0)
        out = jnp.where(t >= rel.x0, _seg_eval(rel, t), out)
        if self.segs[2] is not None:
            sl = self.segs[2]
            out = jnp.where(t < sl.x1, _seg_eval(sl, t), out)
        out = jnp.where(t < dec.x1, _seg_eval(dec, t), out)
        out = jnp.where(t < self.hold_end, 1.0, out)
        out = jnp.where(t < att.x1, _seg_eval(att, t), out)
        out = jnp.where(jnp.logical_or(t <= 0.0, t >= 1.0), 0.0, out)
        return out

    def process_mul(self, t: Array, x: Array) -> Array:
        return x * self.process(t)
