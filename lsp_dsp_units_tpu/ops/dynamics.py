"""Dynamics kernels: envelope followers and knee gain curves — the TPU
replacement for lsp-dsp-lib's ``dsp::compressor_x2_gain/curve``,
``dsp::gate_x1_gain/curve`` and ``dsp::uexpander/dexpander_x1_*``
(used by reference Compressor.cpp:266, Gate.cpp:208-250, Expander.cpp).

* Envelope followers are branchy per-sample recurrences with peak-hold
  (reference Compressor.cpp:231-256) — data-dependent on their own state,
  so they stay a ``lax.scan``; throughput comes from vectorizing the scan
  body across the channel batch (64+ lanes per step on the VPU).
* Knee gain curves are pure elementwise log-domain piecewise functions —
  ideal VPU code, fully fused by XLA.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops.unroll import unrolled_scan

Array = jax.Array

# ---------------------------------------------------------------------------
# Envelope followers
# ---------------------------------------------------------------------------


def tau(sample_rate: int, time_ms) -> float:
    """Attack/release smoothing coefficient
    ``1 - exp(log(1 - 1/sqrt(2)) / (ms * sr / 1000))``
    (reference Compressor.cpp:94-95)."""
    samples = np.asarray(sample_rate * time_ms / 1000.0, np.float64)
    with np.errstate(divide="ignore"):
        t = 1.0 - np.exp(np.log(1.0 - np.sqrt(0.5)) / samples)
    return float(np.where(samples <= 0.0, 1.0, t))


class EnvState(NamedTuple):
    envelope: Array   # [...]
    peak: Array       # [...]
    hold: Array       # [...] int32 remaining hold samples


def env_init(batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> EnvState:
    return EnvState(envelope=jnp.zeros(batch_shape, dtype),
                    peak=jnp.zeros(batch_shape, dtype),
                    hold=jnp.zeros(batch_shape, jnp.int32))


def peak_envelope(state: EnvState, x: Array, tau_attack, tau_release,
                  hold_samples, release_thresh=None, unroll: int = 16,
                  ) -> Tuple[EnvState, Array]:
    """Branchy attack/release follower with peak-hold
    (exact scan form of reference Compressor.cpp:231-256 /
    Gate.cpp:282-306 — Gate passes ``release_thresh=None``).

    ``x``: [..., T] (the detector signal, usually abs or sidechain level).
    Returns (state', envelope [..., T]).

    The recurrence is data-dependent on its own state, so it stays a
    ``lax.scan`` — but per-step dispatch overhead dominates on TPU, so
    the scan body processes ``unroll`` samples per step (same math,
    unrolled in the trace).
    """
    # Mosaic fast path: one pallas program for the whole T-loop (see
    # ops.pallas_env).  Gated on (a) scalar coefficients — the kernel
    # broadcasts one (ta, tr, nh, rt) tuple over all channels, per-
    # channel arrays must take the scan path — and (b) a VMEM budget:
    # one tile of [T, C_pad] input + output must fit (~16 MB VMEM on
    # v5e; cap at ~1.18M f32 elements per buffer — the production
    # 8192x128 chain block is 1.05M and measured-good on chip).  Longer
    # T that tiles evenly streams through the kernel's time-tiled grid
    # (pallas_env._TILE_T; the bulk super-block path — 0.13 ms/block
    # at 16x8192, vs 2.2 ms/block for the scan fallback this guard
    # previously forced).
    from lsp_dsp_units_tpu.ops.pallas_env import _TILE_T
    c_pad = -(-x.shape[0] // 128) * 128 if x.ndim == 2 else 0
    vmem_ok = (x.ndim == 2
               and (x.shape[-1] * c_pad <= (9 << 20) // 8
                    or (x.shape[-1] % _TILE_T == 0
                        and _TILE_T * c_pad <= (9 << 20) // 8)))
    if (x.ndim == 2 and x.dtype == jnp.float32
            and jax.default_backend() == "tpu"
            and all(jnp.ndim(p) == 0 for p in
                    (tau_attack, tau_release, hold_samples))
            and (release_thresh is None
                 or jnp.ndim(release_thresh) == 0)
            and vmem_ok):
        from lsp_dsp_units_tpu.ops.pallas_env import peak_envelope_pallas
        return peak_envelope_pallas(state, x, tau_attack, tau_release,
                                    hold_samples, release_thresh)

    ta = jnp.asarray(tau_attack, x.dtype)
    tr = jnp.asarray(tau_release, x.dtype)
    nh = jnp.asarray(hold_samples, jnp.int32)
    rt = None if release_thresh is None else jnp.asarray(release_thresh,
                                                         x.dtype)

    def one(s: EnvState, xt):
        e, peak, hold = s.envelope, s.peak, s.hold
        d = xt - e
        falling = d < 0.0
        holding = hold > 0
        if rt is None:
            tau_dn = tr
        else:
            tau_dn = jnp.where(e > rt, tr, ta)
        # falling & holding: only decrement hold
        # falling & !holding: e += tau_dn * d ; peak = e
        # rising: e += ta * d ; if e >= peak: peak = e, hold = nh
        e_fall = e + tau_dn * d
        e_rise = e + ta * d
        new_e = jnp.where(falling, jnp.where(holding, e, e_fall), e_rise)
        rise_peaked = jnp.logical_and(~falling, e_rise >= peak)
        new_peak = jnp.where(falling, jnp.where(holding, peak, e_fall),
                             jnp.where(rise_peaked, e_rise, peak))
        new_hold = jnp.where(falling,
                             jnp.where(holding, hold - 1, hold),
                             jnp.where(rise_peaked, nh, hold))
        return EnvState(new_e, new_peak, new_hold), new_e

    t = x.shape[-1]
    state, es = unrolled_scan(one, state, jnp.moveaxis(x, -1, 0), t,
                              unroll)
    return state, jnp.moveaxis(es, 0, -1)


def onepole_lowpass(state: Array, x: Array, k) -> Tuple[Array, Array]:
    """One-pole smoother y[n] = y[n-1] + k (x[n] - y[n-1]) as a
    time-parallel first-order affine scan (Sidechain LPF mode)."""
    if x.shape[-1] == 0:  # empty block: no-op
        return state, x
    kk = jnp.asarray(k, x.dtype) * jnp.ones_like(x)
    a = 1.0 - kk
    b = kk * x

    def combine(c1, c2):
        a1, b1 = c1
        a2, b2 = c2
        return a1 * a2, a2 * b1 + b2

    a_s, b_s = jax.lax.associative_scan(combine, (a, b), axis=-1)
    y = a_s * state[..., None] + b_s
    return y[..., -1], y


# ---------------------------------------------------------------------------
# Compressor knees (reference Compressor.cpp:100-216, curve eval :297-310)
# ---------------------------------------------------------------------------


class CompKnee(NamedTuple):
    """One log-domain knee: gain 1 below start, tilt line above end,
    Hermite-quadratic blend between (all in log-log space)."""
    start: Array
    end: Array
    gain: Array
    tilt0: Array
    tilt1: Array
    herm0: Array
    herm1: Array
    herm2: Array


def comp_knee_gain(k: CompKnee, x: Array, lx: Array) -> Array:
    """Gain of one knee at |x| (log |x| precomputed)."""
    line = jnp.exp(lx * k.tilt0 + k.tilt1)
    herm = jnp.exp((k.herm0 * lx + k.herm1) * lx + k.herm2)
    return jnp.where(x <= k.start, k.gain,
                     jnp.where(x >= k.end, line, herm))


def compressor_x2_gain(knees: Tuple[CompKnee, CompKnee], x: Array) -> Array:
    """Product of two knees (reference ``dsp::compressor_x2_gain``)."""
    ax = jnp.abs(x)
    safe = jnp.maximum(ax, 1e-36)
    lx = jnp.log(safe)
    return comp_knee_gain(knees[0], ax, lx) * comp_knee_gain(knees[1], ax,
                                                             lx)


def compressor_x2_curve(knees: Tuple[CompKnee, CompKnee], x: Array) -> Array:
    return compressor_x2_gain(knees, x) * x


# ---------------------------------------------------------------------------
# Gate knee (reference Gate.cpp:180-265)
# ---------------------------------------------------------------------------


class GateKnee(NamedTuple):
    start: Array
    end: Array
    gain_start: Array
    gain_end: Array
    herm0: Array
    herm1: Array
    herm2: Array
    herm3: Array


def gate_x1_gain(k: GateKnee, x: Array) -> Array:
    ax = jnp.abs(x)
    lx = jnp.log(jnp.maximum(ax, 1e-36))
    herm = jnp.exp(((k.herm0 * lx + k.herm1) * lx + k.herm2) * lx + k.herm3)
    return jnp.where(ax <= k.start, k.gain_start,
                     jnp.where(ax >= k.end, k.gain_end, herm))


def gate_x1_curve(k: GateKnee, x: Array) -> Array:
    return gate_x1_gain(k, x) * x


# ---------------------------------------------------------------------------
# Expander knee (reference Expander.cpp:205-258)
# ---------------------------------------------------------------------------


class ExpKnee(NamedTuple):
    start: Array
    end: Array
    tilt0: Array
    tilt1: Array
    herm0: Array
    herm1: Array
    herm2: Array
    threshold: Array   # clamp point for the gain cap
    upward: bool


def expander_gain(k: ExpKnee, x: Array) -> Array:
    """Upward/downward expander gain (reference
    Expander::amplification, Expander.cpp:375-406): unity inside the
    'no-expansion' region, tilt line beyond the knee, Hermite blend
    within.  The saturation uses ``k.threshold`` exactly as the
    reference does — upward clamps the INPUT at threshold (so the gain
    saturates at gain(threshold), which Expander.build solves for the
    ~1e6 gain cap, possibly inside the knee), downward hard-mutes
    (gain 0) below threshold."""
    ax = jnp.abs(x)
    if k.upward:
        ax = jnp.minimum(ax, k.threshold)
    lx = jnp.log(jnp.maximum(ax, 1e-36))
    line = jnp.exp(lx * k.tilt0 + k.tilt1)
    herm = jnp.exp((k.herm0 * lx + k.herm1) * lx + k.herm2)
    if k.upward:
        return jnp.where(ax <= k.start, 1.0,
                         jnp.where(ax >= k.end, line, herm))
    g = jnp.where(ax >= k.end, 1.0,
                  jnp.where(ax <= k.start, line, herm))
    return jnp.where(ax < k.threshold, 0.0, g)


def expander_curve(k: ExpKnee, x: Array) -> Array:
    return expander_gain(k, x) * x
