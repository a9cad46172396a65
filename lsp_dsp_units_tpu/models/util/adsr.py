"""ADSREnvelope — AHDBSSR envelope curve calculator
(reference: src/main/util/ADSREnvelope.cpp).

The envelope is a pure function of normalized time t in [0, 1):
attack -> (hold) -> decay -> (slope to break level) -> sustain ->
release.  Each segment is shaped by one of the reference's six curve
generators (ADSREnvelope.cpp:124-240, evaluators :350-383):

  NONE    straight line between endpoints
  LINE    two-segment line, midpoint at (x0+x1)/2, level set by curve
  LINE2   two-segment line, breakpoint position AND level set by curve
  CUBIC   Hermite cubic through the endpoints with slopes taken from
          the chords to the curve-controlled midpoint
  QUADRO  quartic through both endpoints (zero end slopes) and a
          curve-controlled midpoint (interpolation::hermite_quadro)
  EXP     t*exp(kt) ramp, sharpness |0.5 - curve|*40, mirrored for
          curve > 0.5 (ADSREnvelope.cpp:196-222)

Segment times are normalized to [0,1] and clamped to be monotonic
exactly like the reference's ``limit_range`` cascade
(ADSREnvelope.cpp:240-258).  Evaluation is elementwise over t arrays —
ideal VPU code; callers drive it with a phase ramp.  Parity vs the
compiled reference: tests/test_reference_oracle_units.py.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.misc import interpolation as interp

Array = jax.Array


class ADSRFunction(enum.Enum):
    NONE = 0
    LINE = 1
    LINE2 = 2
    CUBIC = 3
    QUADRO = 4
    EXP = 5


class _Curve(NamedTuple):
    """Configured generator: kind + coefficient vector (reference
    gen_params_t union)."""
    func: ADSRFunction
    x0: float
    x1: float
    coef: Tuple[float, ...]


def _configure(func: ADSRFunction, curve: float, x0: float, x1: float,
               y0: float, y1: float) -> _Curve:
    """reference ADSREnvelope::configure_curve (ADSREnvelope.cpp:124-240).
    Degenerate (zero-length) segments keep the reference's raw math —
    inf/nan coefficients are fine because evaluation never selects them
    (t < x1 is empty when x1 <= x0 after the limit_range cascade)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        if func in (ADSRFunction.LINE, ADSRFunction.LINE2):
            if func == ADSRFunction.LINE:
                t2 = 0.5 * (x0 + x1)
            else:
                t2 = x1 + (x0 - x1) * curve
            cy = y0 + (y1 - y0) * curve
            k1 = (cy - y0) / (t2 - x0)
            b1 = y0 - k1 * x0
            k2 = (y1 - cy) / (x1 - t2)
            b2 = cy - k2 * t2
            return _Curve(func, x0, x1, (t2, k1, b1, k2, b2))
        if func == ADSRFunction.CUBIC:
            cx = 0.5 * (x0 + x1)
            cy = y0 + (y1 - y0) * curve
            k0 = (cy - y0) / (cx - x0)
            k1 = (y1 - cy) / (x1 - cx)
            p = interp.hermite_cubic(0.0, y0, k0, x1 - x0, y1, k1)
            return _Curve(func, x0, x1, tuple(float(v) for v in p))
        if func == ADSRFunction.QUADRO:
            cx = 0.5 * (x0 + x1)
            cy = y0 + (y1 - y0) * (0.3 + curve * 0.4)
            p = interp.hermite_quadro(0.0, y0, 0.0, x1 - x0, y1, 0.0,
                                      cx - x0, cy)
            return _Curve(func, x0, x1, tuple(float(v) for v in p))
        if func == ADSRFunction.EXP:
            kt = 0.5 - curve
            ndx = 1.0 / (x1 - x0)
            fkt = abs(kt) * 40.0
            ny = float(np.exp(-fkt))
            if kt >= 0.0:
                a0, a1, b0, b1 = y0, (y1 - y0) * ny, ndx, 0.0
            else:
                a0, a1, b0, b1 = y1, (y0 - y1) * ny, -ndx, 1.0
            return _Curve(func, x0, x1, (fkt, a0, a1, b0, b1))
        # NONE: straight line
        k = (y1 - y0) / (x1 - x0)
        return _Curve(func, x0, x1, (k, y0))


def _eval(c: _Curve, t: Array) -> Array:
    """reference generator evaluators (ADSREnvelope.cpp:350-383)."""
    f = c.coef
    if c.func in (ADSRFunction.LINE, ADSRFunction.LINE2):
        t2, k1, b1, k2, b2 = f
        return jnp.where(t < t2, t * k1 + b1, t * k2 + b2)
    if c.func == ADSRFunction.CUBIC:
        td = t - c.x0
        return ((f[0] * td + f[1]) * td + f[2]) * td + f[3]
    if c.func == ADSRFunction.QUADRO:
        td = t - c.x0
        return (((f[0] * td + f[1]) * td + f[2]) * td + f[3]) * td + f[4]
    if c.func == ADSRFunction.EXP:
        fkt, a0, a1, b0, b1 = f
        u = (t - c.x0) * b0 + b1
        return a0 + a1 * u * jnp.exp(u * fkt)
    k, b = f
    return (t - c.x0) * k + b


def _limit_range(t: float, prev: float) -> float:
    """reference limit_range (ADSREnvelope.cpp:118-122)."""
    return min(max(max(t, prev), 0.0), 1.0)


class ADSREnvelope:
    """Static envelope shape; :meth:`process` evaluates at time values.

    Times are normalized to [0, 1] and clamped monotonic exactly as the
    reference's update_settings does (ADSREnvelope.cpp:240-295)."""

    def __init__(self, attack: float = 0.1, decay: float = 0.3,
                 sustain_level: float = 0.5, release: float = 0.8,
                 hold: Optional[float] = None,
                 break_level: Optional[float] = None,
                 slope: float = 0.5,
                 attack_func: ADSRFunction = ADSRFunction.CUBIC,
                 decay_func: ADSRFunction = ADSRFunction.CUBIC,
                 slope_func: ADSRFunction = ADSRFunction.CUBIC,
                 release_func: ADSRFunction = ADSRFunction.CUBIC,
                 curve: float = 0.5,
                 attack_curve: Optional[float] = None,
                 decay_curve: Optional[float] = None,
                 slope_curve: Optional[float] = None,
                 release_curve: Optional[float] = None):
        clamp = lambda v: min(max(float(v), 0.0), 1.0)
        curve = clamp(curve)
        c_att = clamp(attack_curve if attack_curve is not None else curve)
        c_dec = clamp(decay_curve if decay_curve is not None else curve)
        c_slp = clamp(slope_curve if slope_curve is not None else curve)
        c_rel = clamp(release_curve if release_curve is not None else curve)

        self.use_hold = hold is not None
        self.use_break = break_level is not None
        self.sustain_level = clamp(sustain_level)
        self.break_level = clamp(break_level) if self.use_break else 0.0

        # limit_range cascade (ADSREnvelope.cpp:262-283)
        t_att = _limit_range(attack, 0.0)
        if self.use_hold:
            t_hold = _limit_range(hold, t_att)
            t_dec = _limit_range(decay, t_hold)
        else:
            t_hold = t_att
            t_dec = _limit_range(decay, t_att)
        if self.use_break:
            t_slp = _limit_range(slope, t_dec)
            t_rel = _limit_range(release, t_slp)
        else:
            t_slp = t_dec
            t_rel = _limit_range(release, t_dec)

        self.attack, self.hold, self.decay = t_att, t_hold, t_dec
        self.slope, self.release = t_slp, t_rel

        self.c_attack = _configure(attack_func, c_att, 0.0, t_att, 0.0, 1.0)
        if self.use_break:
            self.c_decay = _configure(decay_func, c_dec, t_hold, t_dec,
                                      1.0, self.break_level)
            self.c_slope = _configure(slope_func, c_slp, t_dec, t_slp,
                                      self.break_level, self.sustain_level)
        else:
            self.c_decay = _configure(decay_func, c_dec, t_hold, t_dec,
                                      1.0, self.sustain_level)
            self.c_slope = None
        self.c_release = _configure(release_func, c_rel, t_rel, 1.0,
                                    self.sustain_level, 0.0)

    def process(self, t: Array) -> Array:
        """Evaluate the envelope at t (any shape), 0 outside (0,1)
        (reference ADSREnvelope::do_process, ADSREnvelope.cpp:297-330)."""
        t = jnp.asarray(t, jnp.float32)
        # build from the back: release -> sustain -> (slope) -> decay ->
        # hold -> attack, matching do_process's first-match-wins ladder
        out = _eval(self.c_release, t)
        out = jnp.where(t < self.release, self.sustain_level, out)
        if self.c_slope is not None:
            out = jnp.where(t < self.slope, _eval(self.c_slope, t), out)
        out = jnp.where(t < self.decay, _eval(self.c_decay, t), out)
        out = jnp.where(t < self.hold, 1.0, out)
        out = jnp.where(t < self.attack, _eval(self.c_attack, t), out)
        out = jnp.where(jnp.logical_or(t <= 0.0, t >= 1.0), 0.0, out)
        return out

    def process_mul(self, t: Array, x: Array) -> Array:
        return x * self.process(t)
