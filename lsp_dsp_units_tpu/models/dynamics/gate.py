"""Gate with hysteresis (reference: src/main/dynamics/Gate.cpp).

Two curves (normal / hysteresis), each {threshold, zone, reduction} mapped
to a cubic-Hermite log-log knee (Gate.cpp:180-206); the zone-crossing state
machine of Gate::process (Gate.cpp:267-367) is carried per sample inside
the envelope scan: the active curve index switches to 1 when the envelope
exceeds curve0.end and back to 0 when it falls below curve1.start, and the
sample where the crossing is detected already uses the new curve (the
reference applies the bulk gain only up to — excluding — the breaking
sample).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import dynamics as dyn
from lsp_dsp_units_tpu.models.misc import interpolation as interp

Array = jax.Array


class GateParams(NamedTuple):
    knees: Tuple[dyn.GateKnee, dyn.GateKnee]   # [normal, hysteresis]
    tau_attack: Array
    tau_release: Array
    hold: Array


class GateState(NamedTuple):
    env: dyn.EnvState
    curve: Array    # [...] int32 active curve index (0 normal / 1 hyst)


class Gate:
    def __init__(self, sample_rate: int = 48000, threshold: float = 0.063,
                 zone: float = 0.5, hyst_threshold: float = None,
                 hyst_zone: float = None, reduction: float = 0.063,
                 attack_ms: float = 20.0, release_ms: float = 100.0,
                 hold_ms: float = 0.0):
        self.sample_rate = int(sample_rate)
        self.threshold = float(threshold)
        self.zone = float(zone)
        self.hyst_threshold = float(hyst_threshold
                                    if hyst_threshold is not None
                                    else threshold)
        self.hyst_zone = float(hyst_zone if hyst_zone is not None else zone)
        self.reduction = float(reduction)
        self.attack_ms = float(attack_ms)
        self.release_ms = float(release_ms)
        self.hold_ms = float(hold_ms)

    def _knee(self, threshold: float, zone: float) -> dyn.GateKnee:
        """(reference Gate::update_settings, Gate.cpp:180-206)"""
        start = threshold * zone
        end = threshold
        gain_start = self.reduction if self.reduction <= 1.0 else 1.0
        gain_end = 1.0 if self.reduction <= 1.0 else 1.0 / self.reduction
        herm = interp.hermite_cubic(np.log(start), np.log(gain_start), 0.0,
                                    np.log(end), np.log(gain_end), 0.0)
        f32 = jnp.float32
        return dyn.GateKnee(f32(start), f32(end), f32(gain_start),
                            f32(gain_end), f32(herm[0]), f32(herm[1]),
                            f32(herm[2]), f32(herm[3]))

    def build(self) -> GateParams:
        return GateParams(
            knees=(self._knee(self.threshold, self.zone),
                   self._knee(self.hyst_threshold, self.hyst_zone)),
            tau_attack=jnp.float32(dyn.tau(self.sample_rate,
                                           self.attack_ms)),
            tau_release=jnp.float32(dyn.tau(self.sample_rate,
                                            self.release_ms)),
            hold=jnp.int32(round(self.sample_rate * self.hold_ms / 1000.0)))

    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> GateState:
        return GateState(env=dyn.env_init(batch_shape),
                         curve=jnp.zeros(batch_shape, jnp.int32))

    def process(self, params: GateParams, state: GateState, x: Array,
                ) -> Tuple[GateState, Array, Array]:
        """(state, detector x [..., T]) -> (state', gain, envelope)."""
        k0, k1 = params.knees
        ta, tr, nh = params.tau_attack, params.tau_release, params.hold

        def step(s: GateState, xt):
            e, peak, hold = s.env.envelope, s.env.peak, s.env.hold
            d = xt - e
            falling = d < 0.0
            holding = hold > 0
            e_fall = e + tr * d
            e_rise = e + ta * d
            new_e = jnp.where(falling, jnp.where(holding, e, e_fall), e_rise)
            rise_peaked = jnp.logical_and(~falling, e_rise >= peak)
            new_peak = jnp.where(falling, jnp.where(holding, peak, e_fall),
                                 jnp.where(rise_peaked, e_rise, peak))
            new_hold = jnp.where(falling,
                                 jnp.where(holding, hold - 1, hold),
                                 jnp.where(rise_peaked, nh, hold))
            # hysteresis curve switch (uses the knee of the ACTIVE curve)
            cur = s.curve
            switch_up = jnp.logical_and(cur == 0, new_e > k0.end)
            switch_dn = jnp.logical_and(cur == 1, new_e < k1.start)
            new_cur = jnp.where(switch_up, 1, jnp.where(switch_dn, 0, cur))
            new_s = GateState(env=dyn.EnvState(new_e, new_peak, new_hold),
                              curve=new_cur)
            return new_s, (new_e, new_cur)

        # VMEM cap: the gate kernel maps THREE ungridded [T, C_pad]
        # buffers (x, env, cur); cap ~1M f32 elements per buffer
        # (~12 MB total of ~16 MB VMEM) and fall back to the scan
        # beyond it instead of failing Mosaic allocation
        if (x.ndim == 2 and x.dtype == jnp.float32
                and jax.default_backend() == "tpu"
                and x.shape[-1] * (-(-x.shape[0] // 128) * 128) <= 1 << 20):
            # single Pallas kernel: whole T-loop in one Mosaic program
            from lsp_dsp_units_tpu.ops.pallas_env import (
                gate_envelope_pallas)
            env_st, cur, env, curves = gate_envelope_pallas(
                state.env, state.curve, x, ta, tr, nh, k0.end, k1.start)
            state = GateState(env=env_st, curve=cur)
            g0 = dyn.gate_x1_gain(k0, env)
            g1 = dyn.gate_x1_gain(k1, env)
            gain = jnp.where(curves == 0, g0, g1)
            return state, gain, env

        t = x.shape[-1]
        # shared unroll harness (16 samples per scan step — dispatch
        # overhead dominates short bodies; falls back to 1 when t is
        # not a multiple)
        from lsp_dsp_units_tpu.ops.unroll import unrolled_scan
        state, (es, curves) = unrolled_scan(step, state,
                                            jnp.moveaxis(x, -1, 0), t, 16)
        env = jnp.moveaxis(es, 0, -1)
        curves = jnp.moveaxis(curves, 0, -1)
        g0 = dyn.gate_x1_gain(k0, env)
        g1 = dyn.gate_x1_gain(k1, env)
        gain = jnp.where(curves == 0, g0, g1)
        return state, gain, env

    def curve(self, params: GateParams, x: Array, hyst: bool = False,
              ) -> Array:
        return dyn.gate_x1_curve(params.knees[1 if hyst else 0], x)

    def amplification(self, params: GateParams, x: Array,
                      hyst: bool = False) -> Array:
        return dyn.gate_x1_gain(params.knees[1 if hyst else 0], x)
