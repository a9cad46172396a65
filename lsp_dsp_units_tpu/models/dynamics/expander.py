"""Expander — upward / downward expander
(reference: src/main/dynamics/Expander.cpp).
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import dynamics as dyn
from lsp_dsp_units_tpu.models.misc import interpolation as interp

Array = jax.Array

# reference Expander.cpp:32-36
MINIMUM_TILT = 0.001
UPPER_THRESHOLD = 13.815510558    # log(1e6)
LOWER_THRESHOLD = -16.118095651   # log(1e-7)
MIN_LOWER_THRESHOLD = 1e-7
MAX_UPPER_THRESHOLD = 1e6


class ExpanderMode(enum.Enum):
    DOWNWARD = "downward"
    UPWARD = "upward"


class ExpanderParams(NamedTuple):
    knee: dyn.ExpKnee
    tau_attack: Array
    tau_release: Array
    release_thresh: Array
    hold: Array


def _square_roots(p, y):
    """Roots of p0 x^2 + p1 x + p2 = y (reference Expander.cpp:44-58)."""
    a, b, c = p[0], -p[1], p[2] - y
    d = np.sqrt(max(b * b - 4.0 * a * c, 0.0))
    k = 1.0 / (2.0 * a)
    return (b + d) * k, (b - d) * k


class Expander:
    def __init__(self, sample_rate: int = 48000,
                 mode: ExpanderMode = ExpanderMode.DOWNWARD,
                 attack_thresh: float = 0.25, release_thresh: float = 0.0,
                 attack_ms: float = 20.0, release_ms: float = 100.0,
                 knee: float = 0.7071, ratio: float = 2.0,
                 hold_ms: float = 0.0):
        self.sample_rate = int(sample_rate)
        self.mode = mode
        self.attack_thresh = float(attack_thresh)
        self.release_thresh = float(release_thresh)
        self.attack_ms = float(attack_ms)
        self.release_ms = float(release_ms)
        self.knee = float(knee)
        self.ratio = float(ratio)
        self.hold_ms = float(hold_ms)

    def build(self) -> ExpanderParams:
        """Knee design (reference Expander::update_settings,
        Expander.cpp:200-259)."""
        start = self.attack_thresh * self.knee
        end = self.attack_thresh / self.knee
        log_ks, log_ke = np.log(start), np.log(end)
        log_th = np.log(self.attack_thresh)
        tilt0 = self.ratio - 1.0
        tilt1 = log_th * (1.0 - self.ratio)
        upward = self.mode == ExpanderMode.UPWARD
        if upward:
            herm = interp.hermite_quadratic(log_ks, 0.0, 0.0, log_ke, tilt0)
            ut = np.exp((UPPER_THRESHOLD - tilt1)
                        / max(tilt0, MINIMUM_TILT))
            if ut < end:
                r1, r2 = _square_roots(herm, UPPER_THRESHOLD)
                ut = np.exp(max(r1, r2))
            threshold = min(ut, MAX_UPPER_THRESHOLD)
        else:
            herm = interp.hermite_quadratic(log_ke, 0.0, 0.0, log_ks, tilt0)
            dt = np.exp((LOWER_THRESHOLD - tilt1)
                        / max(tilt0, MINIMUM_TILT))
            if dt > start:
                r1, r2 = _square_roots(herm, LOWER_THRESHOLD)
                dt = np.exp(min(r1, r2))
            threshold = max(dt, MIN_LOWER_THRESHOLD)

        f32 = jnp.float32
        knee = dyn.ExpKnee(
            start=f32(start), end=f32(end), tilt0=f32(tilt0),
            tilt1=f32(tilt1), herm0=f32(herm[0]), herm1=f32(herm[1]),
            herm2=f32(herm[2]), threshold=f32(threshold), upward=upward)
        return ExpanderParams(
            knee=knee,
            tau_attack=f32(dyn.tau(self.sample_rate, self.attack_ms)),
            tau_release=f32(dyn.tau(self.sample_rate, self.release_ms)),
            release_thresh=f32(self.release_thresh),
            hold=jnp.int32(round(self.sample_rate * self.hold_ms / 1000.0)))

    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> dyn.EnvState:
        return dyn.env_init(batch_shape)

    def process(self, params: ExpanderParams, state: dyn.EnvState,
                x: Array) -> Tuple[dyn.EnvState, Array, Array]:
        state, env = dyn.peak_envelope(
            state, x, params.tau_attack, params.tau_release, params.hold,
            params.release_thresh)
        gain = dyn.expander_gain(params.knee, env)
        return state, gain, env

    def curve(self, params: ExpanderParams, x: Array) -> Array:
        return dyn.expander_curve(params.knee, x)

    def amplification(self, params: ExpanderParams, x: Array) -> Array:
        return dyn.expander_gain(params.knee, x)
