"""Limiter — lookahead brick-wall limiter with iterative peak patching
(reference: src/main/dynamics/Limiter.cpp).

The reference keeps a gain buffer over the lookahead window and
repeatedly: finds the loudest sample of |gain * sidechain|, multiplies an
attack/sustain/release "patch" into the gain buffer centered at that
peak, and repeats until no sample exceeds the threshold — lowering the
knee every LIMITER_PEAKS_MAX iterations (Limiter.cpp:695-785).  12 modes
= {Hermite, Exp, Line} x {Thin, Wide, Tail, Duck} patch shapes
(Limiter.h:37-53), plus an optional ALR (automatic level regulation)
pre-stage (Limiter.cpp:675-693).

TPU reformulation: the data-dependent loop becomes a bounded
``lax.while_loop`` whose body patches ONE peak PER CHANNEL per iteration
(for a single channel this is exactly the reference's schedule; batching
channels runs C reference limiters in parallel).  The patch application
is a gather from the precomputed shape table — no scatter, no dynamic
slicing.  Iterations are capped (far above any practical patch count)
to bound compilation; the knee-lowering guarantees convergence.
"""

from __future__ import annotations

import enum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.misc import interpolation as interp

Array = jax.Array

LIMITER_PEAKS_MAX = 32       # knee lowering period (reference Limiter.cpp)
GAIN_LOWERING = 0.9886       # reference Limiter.cpp:35
MAX_PATCH_ITERS = 1024       # bounded-loop cap (reference is unbounded)


class LimiterMode(enum.Enum):
    HERM_THIN = "herm_thin"
    HERM_WIDE = "herm_wide"
    HERM_TAIL = "herm_tail"
    HERM_DUCK = "herm_duck"
    EXP_THIN = "exp_thin"
    EXP_WIDE = "exp_wide"
    EXP_TAIL = "exp_tail"
    EXP_DUCK = "exp_duck"
    LINE_THIN = "line_thin"
    LINE_WIDE = "line_wide"
    LINE_TAIL = "line_tail"
    LINE_DUCK = "line_duck"


class LimiterParams(NamedTuple):
    patch: Array          # [P] patch shape 0..1
    middle: Array         # [] int32 peak offset within the patch
    threshold: Array
    alr_ks: Array
    alr_ke: Array
    alr_gain: Array
    alr_herm: Array       # [3]
    alr_tau_att: Array
    alr_tau_rel: Array


class LimiterState(NamedTuple):
    gcarry: Array         # [..., 5L] gain buffer carry (init ones)
    alr_env: Array        # [...] ALR envelope


class Limiter:
    def __init__(self, sample_rate: int = 48000,
                 mode: LimiterMode = LimiterMode.HERM_THIN,
                 threshold: float = 1.0, attack_ms: float = 5.0,
                 release_ms: float = 5.0, lookahead_ms: float = 5.0,
                 knee: float = 1.0, alr: bool = False,
                 alr_attack_ms: float = 5.0, alr_release_ms: float = 50.0,
                 alr_knee: float = 0.7071):
        self.sample_rate = int(sample_rate)
        self.mode = mode
        self.threshold = float(threshold)
        # NOTE reference-verbatim: `knee` only enters the ALR threshold
        # (Limiter.cpp:459, thresh = fThreshold*fKnee*-9dB); the patch
        # loop's knee local starts at 1.0 regardless (Limiter.cpp:715),
        # so with alr=False this parameter is inert — same as upstream.
        self.knee = float(knee)
        self.alr = bool(alr)
        self.alr_attack_ms = float(alr_attack_ms)
        self.alr_release_ms = float(alr_release_ms)
        self.alr_knee = float(alr_knee)
        self.lookahead = max(8, int(sample_rate * lookahead_ms / 1000.0))
        self.attack_ms = float(attack_ms)
        self.release_ms = float(release_ms)

    def latency(self) -> int:
        return self.lookahead

    # -- design (reference init_sat/init_exp/init_line,
    #    Limiter.cpp:278-395) ------------------------------------------------
    def _patch_shape(self) -> Tuple[np.ndarray, int]:
        la = self.lookahead
        attack = int(np.clip(int(self.sample_rate * self.attack_ms
                                 / 1000.0), 8, la))
        name = self.mode.value
        kind, shape = name.split("_")
        # reference-verbatim quirks (do not "fix"):
        # * init_sat derives release from the CLAMPED ATTACK count
        #   (`release = lsp_limit(attack, 8, nLookahead*2)`,
        #   Limiter.cpp:284) — so herm modes always have release==attack;
        # * init_exp's shape if-chain tests LM_HERM_* (Limiter.cpp:327-
        #   346), which never matches an exp mode — exp modes always take
        #   the WIDE branch.
        if kind == "herm":
            release = attack
        else:
            release = int(np.clip(int(self.sample_rate * self.release_ms
                                      / 1000.0), 8, la * 2))
        if kind == "exp":
            shape = "wide"
        if shape == "thin":
            n_att, n_plane = attack, attack
        elif shape == "tail":
            n_att, n_plane = attack // 2, attack
        elif shape == "duck":
            n_att, n_plane = attack, attack + release // 2
        else:  # wide
            n_att, n_plane = attack // 2, attack + release // 2
        n_rel = attack + release + 1
        middle = attack

        t = np.arange(n_rel, dtype=np.float64)
        out = np.zeros(n_rel)
        if kind == "herm":
            va = interp.hermite_cubic(-1.0, 0.0, 0.0, n_att, 1.0, 0.0)
            vr = interp.hermite_cubic(n_plane, 1.0, 0.0, n_rel, 0.0, 0.0)
            att_vals = interp.polyval3(va, t)
            rel_vals = interp.polyval3(vr, t)
        elif kind == "exp":
            va = interp.exponent(-1.0, 0.0, n_att, 1.0, 2.0 / attack)
            vr = interp.exponent(n_plane, 1.0, n_rel, 0.0, 2.0 / release)
            att_vals = va[0] + va[1] * np.exp(va[2] * t)
            rel_vals = vr[0] + vr[1] * np.exp(vr[2] * t)
        else:  # line
            va = interp.linear(-1.0, 0.0, n_att, 1.0)
            vr = interp.linear(n_plane, 1.0, n_rel, 0.0)
            att_vals = va[0] * t + va[1]
            rel_vals = vr[0] * t + vr[1]
        out[:n_att] = att_vals[:n_att]
        out[n_att:n_plane] = 1.0
        out[n_plane:] = rel_vals[n_plane:]
        return out, middle

    def build(self) -> LimiterParams:
        patch, middle = self._patch_shape()
        # ALR knee (reference Limiter.cpp:459-469)
        thresh = self.threshold * self.knee * 10 ** (-9.0 / 20.0)
        ks = thresh * self.alr_knee
        ke = 2.0 * thresh - ks
        herm = interp.hermite_quadratic(ks, ks, 1.0, ke, 0.0)
        att = max(self.sample_rate * self.alr_attack_ms / 1000.0, 1.0)
        rel = max(self.sample_rate * self.alr_release_ms / 1000.0, 1.0)
        tau_a = 1.0 - np.exp(np.log(1.0 - np.sqrt(0.5)) / att)
        tau_r = 1.0 - np.exp(np.log(1.0 - np.sqrt(0.5)) / rel)
        return LimiterParams(
            patch=jnp.asarray(patch, jnp.float32),
            middle=jnp.int32(middle),
            threshold=jnp.float32(self.threshold),
            alr_ks=jnp.float32(ks), alr_ke=jnp.float32(ke),
            alr_gain=jnp.float32(thresh),
            alr_herm=jnp.asarray(herm, jnp.float32),
            alr_tau_att=jnp.float32(tau_a),
            alr_tau_rel=jnp.float32(tau_r))

    # -- state ----------------------------------------------------------------
    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> LimiterState:
        return LimiterState(
            gcarry=jnp.ones(batch_shape + (5 * self.lookahead,),
                            jnp.float32),
            alr_env=jnp.zeros(batch_shape, jnp.float32))

    # -- processing ------------------------------------------------------------
    def process(self, params: LimiterParams, state: LimiterState,
                sc: Array) -> Tuple[LimiterState, Array]:
        """sc: sidechain level [..., T] -> (state', gain [..., T]).

        The produced gain is DELAYED by ``lookahead`` samples relative to
        the sidechain (apply to the equally-delayed signal path, as the
        reference's callers do).
        """
        la = self.lookahead
        t = sc.shape[-1]
        w = t + 5 * la
        gbuf = jnp.concatenate(
            [state.gcarry,
             jnp.ones(sc.shape[:-1] + (w - 5 * la,), jnp.float32)],
            axis=-1)
        asc = jnp.abs(sc)

        # ALR pre-stage (reference process_alr, Limiter.cpp:675-693)
        alr_env = state.alr_env
        if self.alr:
            lvl = asc * jax.lax.dynamic_slice_in_dim(gbuf, la, t, axis=-1)

            def alr_step(e, s):
                e = e + jnp.where(s > e, params.alr_tau_att,
                                  params.alr_tau_rel) * (s - e)
                g = jnp.where(
                    e >= params.alr_ke, params.alr_gain / jnp.maximum(e,
                                                                      1e-12),
                    jnp.where(e > params.alr_ks,
                              params.alr_herm[0] * e + params.alr_herm[1]
                              + params.alr_herm[2] / jnp.maximum(e, 1e-12),
                              1.0))
                return e, g

            alr_env, alr_gain = jax.lax.scan(
                alr_step, alr_env, jnp.moveaxis(lvl, -1, 0))
            alr_gain = jnp.moveaxis(alr_gain, 0, -1)
            pad = jnp.ones(sc.shape[:-1] + (w,), jnp.float32)
            pad = jax.lax.dynamic_update_slice_in_dim(pad, alr_gain, la,
                                                      axis=-1)
            gbuf = gbuf * pad

        p = params.patch.shape[0]
        arange_w = jnp.arange(w)

        def cond(carry):
            gbuf, knee, iters = carry
            lvl = asc * jax.lax.dynamic_slice_in_dim(gbuf, la, t, axis=-1)
            any_peak = jnp.any(jnp.max(lvl, axis=-1) > params.threshold)
            return jnp.logical_and(any_peak,
                                   jnp.max(iters) < MAX_PATCH_ITERS)

        def body(carry):
            gbuf, knee, iters = carry
            lvl = asc * jax.lax.dynamic_slice_in_dim(gbuf, la, t, axis=-1)
            peak = jnp.argmax(lvl, axis=-1)               # [...]
            s = jnp.take_along_axis(lvl, peak[..., None],
                                    axis=-1)[..., 0]
            active = s > params.threshold
            k = jnp.where(
                active,
                (s - (params.threshold * knee - 1e-6))
                / jnp.maximum(s, 1e-12), 0.0)
            start = la + peak - params.middle
            rel = arange_w - start[..., None]             # [..., W]
            shape = jnp.where(
                jnp.logical_and(rel >= 0, rel < p),
                params.patch[jnp.clip(rel, 0, p - 1)], 0.0)
            gbuf = gbuf * (1.0 - k[..., None] * shape)
            iters = iters + jnp.where(active, 1, 0)
            knee = jnp.where(
                jnp.logical_and(active, iters % LIMITER_PEAKS_MAX == 0),
                knee * GAIN_LOWERING, knee)
            return gbuf, knee, iters

        knee0 = jnp.ones(sc.shape[:-1], jnp.float32)
        iters0 = jnp.zeros(sc.shape[:-1], jnp.int32)
        gbuf, _, _ = jax.lax.while_loop(cond, body, (gbuf, knee0, iters0))

        # bounded-loop safety: the reference iterates until no peak
        # remains; the jit loop caps at MAX_PATCH_ITERS (measured worst
        # over noise corpora < 512, tests/test_limiter.py).  On a normal
        # exit every level is already <= threshold and this is a no-op
        # (corr == 1); if the cap ever trips, residual peaks are clamped
        # point-wise so the brick-wall contract holds unconditionally.
        lvl = asc * jax.lax.dynamic_slice_in_dim(gbuf, la, t, axis=-1)
        corr = jnp.minimum(1.0, params.threshold
                           / jnp.maximum(lvl, 1e-12))
        pad = jnp.ones(sc.shape[:-1] + (w,), jnp.float32)
        pad = jax.lax.dynamic_update_slice_in_dim(pad, corr, la, axis=-1)
        gbuf = gbuf * pad

        gain = jax.lax.dynamic_slice_in_dim(gbuf, 0, t, axis=-1)
        gcarry = jax.lax.dynamic_slice_in_dim(gbuf, t, 5 * la, axis=-1)
        return LimiterState(gcarry=gcarry, alr_env=alr_env), gain
