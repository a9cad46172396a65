"""DynamicProcessor — 4-dot piecewise dynamics curve (compander)
(reference: src/main/dynamics/DynamicProcessor.cpp).

Up to 4 dots {input, output, knee} define 5 log-log ranges with
per-range ratios; the total gain is the sum of per-spline contributions
(spline_amp, DynamicProcessor.cpp:173-184), each a Hermite-quadratic
knee blend.  Attack/release level arrays give a LEVEL-DEPENDENT tau
(solve_reaction, :195-201) inside the shared peak-hold envelope.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import dynamics as dyn
from lsp_dsp_units_tpu.models.misc import interpolation as interp

Array = jax.Array

DOTS = 4
FLOAT_SAT_M_INF = 1e-37
FLOAT_SAT_P_INF = 1e37


class DynProcParams(NamedTuple):
    # splines: [S, 8] rows (thresh, makeup, knee_start, knee_stop,
    #          pre_ratio, post_ratio, herm0..)  packed below
    sp_thresh: Array
    sp_makeup: Array
    sp_kstart: Array
    sp_kstop: Array
    sp_pre: Array
    sp_post: Array
    sp_herm: Array          # [S, 3]
    att_level: Array        # [A]
    att_tau: Array
    rel_level: Array        # [R]
    rel_tau: Array
    hold: Array


class DynamicProcessor:
    def __init__(self, sample_rate: int = 48000, in_ratio: float = 1.0,
                 out_ratio: float = 1.0, hold_ms: float = 0.0,
                 attack_time_ms: Optional[List[float]] = None,
                 release_time_ms: Optional[List[float]] = None):
        self.sample_rate = int(sample_rate)
        self.in_ratio = float(in_ratio)
        self.out_ratio = float(out_ratio)
        self.hold_ms = float(hold_ms)
        self.dots: List[Optional[Tuple[float, float, float]]] = \
            [None] * DOTS
        self.attack_levels: List[Optional[float]] = [None] * DOTS
        self.release_levels: List[Optional[float]] = [None] * DOTS
        self.attack_times = list(attack_time_ms or [20.0] * (DOTS + 1))
        self.release_times = list(release_time_ms or [100.0] * (DOTS + 1))

    def set_dot(self, idx: int, inp: Optional[float],
                out: Optional[float] = None,
                knee: Optional[float] = None) -> None:
        if inp is None:
            self.dots[idx] = None
        else:
            self.dots[idx] = (float(inp), float(out), float(knee))

    def set_attack_level(self, idx: int, level: Optional[float]) -> None:
        self.attack_levels[idx] = level

    def set_release_level(self, idx: int, level: Optional[float]) -> None:
        self.release_levels[idx] = level

    def build(self) -> DynProcParams:
        """(reference update_settings + sort_splines,
        DynamicProcessor.cpp:213-339)"""
        tau = lambda ms: float(dyn.tau(self.sample_rate, ms))

        att = [(0.0, tau(self.attack_times[0]))]
        rel = [(0.0, tau(self.release_times[0]))]
        for i in range(DOTS):
            if self.attack_levels[i] is not None:
                att.append((float(self.attack_levels[i]),
                            tau(self.attack_times[i + 1])))
            if self.release_levels[i] is not None:
                rel.append((float(self.release_levels[i]),
                            tau(self.release_times[i + 1])))
        att.sort(key=lambda kv: kv[0])
        rel.sort(key=lambda kv: kv[0])

        dots = sorted([d for d in self.dots if d is not None],
                      key=lambda d: d[0])
        n = len(dots)
        sp = dict(thresh=[], makeup=[], kstart=[], kstop=[], pre=[],
                  post=[], herm=[])
        sub = 0.0
        for i, (din, dout, dknee) in enumerate(dots):
            pre = (self.in_ratio - 1.0) if i == 0 else 0.0
            if i + 1 < n:
                dx = np.log(dots[i + 1][0] / din)
                dy = np.log(dots[i + 1][1] / dout)
                post = dy / dx - 1.0
            else:
                post = (1.0 / self.out_ratio) - 1.0
            post -= sub
            sub += post
            thresh = np.log(din)
            knee = np.log(dknee)
            kstop = thresh - knee
            kstart = thresh + knee
            makeup = np.log(dout) - thresh if i == 0 else 0.0
            log_y1 = makeup + pre * knee
            herm = interp.hermite_quadratic(kstart, log_y1, pre, kstop,
                                            post)
            sp["thresh"].append(thresh)
            sp["makeup"].append(makeup)
            sp["kstart"].append(kstart)
            sp["kstop"].append(kstop)
            sp["pre"].append(pre)
            sp["post"].append(post)
            sp["herm"].append(herm)

        f32 = lambda v: jnp.asarray(np.asarray(v, np.float32))
        return DynProcParams(
            sp_thresh=f32(sp["thresh"]), sp_makeup=f32(sp["makeup"]),
            sp_kstart=f32(sp["kstart"]), sp_kstop=f32(sp["kstop"]),
            sp_pre=f32(sp["pre"]), sp_post=f32(sp["post"]),
            sp_herm=f32(np.asarray(sp["herm"]).reshape(n, 3) if n else
                        np.zeros((0, 3))),
            att_level=f32([a[0] for a in att]),
            att_tau=f32([a[1] for a in att]),
            rel_level=f32([r[0] for r in rel]),
            rel_tau=f32([r[1] for r in rel]),
            hold=jnp.int32(round(self.sample_rate * self.hold_ms
                                 / 1000.0)))

    # -- execution ----------------------------------------------------------
    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> dyn.EnvState:
        return dyn.env_init(batch_shape)

    @staticmethod
    def _solve_tau(levels: Array, taus: Array, e: Array) -> Array:
        """Level-dependent tau (reference solve_reaction)."""
        sel = e[..., None] >= levels
        idx = jnp.maximum(jnp.sum(sel.astype(jnp.int32), axis=-1) - 1, 0)
        return taus[idx]

    def process(self, params: DynProcParams, state: dyn.EnvState,
                x: Array) -> Tuple[dyn.EnvState, Array, Array]:
        """(state, detector x) -> (state', gain, envelope)."""
        nh = params.hold

        def step(s: dyn.EnvState, xt):
            e, peak, hold = s.envelope, s.peak, s.hold
            d = xt - e
            falling = d < 0.0
            holding = hold > 0
            tr = self._solve_tau(params.rel_level, params.rel_tau, e)
            ta = self._solve_tau(params.att_level, params.att_tau, e)
            e_fall = e + tr * d
            e_rise = e + ta * d
            new_e = jnp.where(falling, jnp.where(holding, e, e_fall),
                              e_rise)
            rise_peaked = jnp.logical_and(~falling, e_rise >= peak)
            new_peak = jnp.where(falling, jnp.where(holding, peak, e_fall),
                                 jnp.where(rise_peaked, e_rise, peak))
            new_hold = jnp.where(falling,
                                 jnp.where(holding, hold - 1, hold),
                                 jnp.where(rise_peaked, nh, hold))
            return dyn.EnvState(new_e, new_peak, new_hold), new_e

        from lsp_dsp_units_tpu.ops.unroll import unrolled_scan
        state, env = unrolled_scan(step, state, jnp.moveaxis(x, -1, 0),
                                   x.shape[-1], 16)
        env = jnp.moveaxis(env, 0, -1)
        gain = self.reduction(params, env)
        return state, gain, env

    def reduction(self, params: DynProcParams, x: Array) -> Array:
        """Gain from the spline sum (reference reduction())."""
        ax = jnp.clip(jnp.abs(x), FLOAT_SAT_M_INF, FLOAT_SAT_P_INF)
        lx = jnp.log(ax)[..., None]                 # [..., 1]
        pre_line = params.sp_makeup + params.sp_pre * (lx - params.sp_thresh)
        post_line = params.sp_makeup + params.sp_post * (lx
                                                        - params.sp_thresh)
        h = params.sp_herm
        herm = (h[:, 0] * lx + h[:, 1]) * lx + h[:, 2]
        contrib = jnp.where(lx <= params.sp_kstart, pre_line,
                            jnp.where(lx >= params.sp_kstop, post_line,
                                      herm))
        return jnp.exp(jnp.sum(contrib, axis=-1))

    def curve(self, params: DynProcParams, x: Array) -> Array:
        return self.reduction(params, x) * x
