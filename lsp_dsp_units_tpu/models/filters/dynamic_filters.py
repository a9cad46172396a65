"""DynamicFilters — filters whose coefficients vary per sample with a
gain control signal (reference: src/main/filters/DynamicFilters.cpp —
build_filter_bank + dsp::bilinear_transform_x8 +
dsp::dyn_biquad_process_x8, lines 204-314).

TPU design: the per-sample analog-cascade design and the bilinear
transform are traced jnp (pure elementwise over the gain signal), then
the per-sample-varying cascade executes on the dynamic biquad kernel
(ops.biquad.dyn_biquad_cascade — the associative-scan path with
time-varying coefficients).  The x8/x4/x2 SIMD batching of the reference
is unnecessary: all samples design in parallel by construction.

Supported dynamic types (the dynamic-EQ set): RLC/BWC bell and
lo/hi-shelf families, BT (bilinear) mode.  Frequency, slope and Q are
static per filter; only the gain varies per sample — exactly the
reference's usage (gain buffer argument of process()).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import biquad as biquad_ops
from lsp_dsp_units_tpu.models.filters.design import (FilterParams,
                                                     FilterType)

Array = jax.Array

_SUPPORTED = {
    FilterType.BT_RLC_BELL, FilterType.BT_RLC_LOSHELF,
    FilterType.BT_RLC_HISHELF, FilterType.BT_BWC_BELL,
    FilterType.BT_BWC_LOSHELF, FilterType.BT_BWC_HISHELF,
}


def _bilinear(t0, t1, t2, b0, b1, b2, kf):
    """Vectorized bilinear transform (reference Filter.cpp:2225-2267)."""
    kf2 = kf * kf
    T0, T1, T2 = t0, t1 * kf, t2 * kf2
    B0, B1, B2 = b0, b1 * kf, b2 * kf2
    n = 1.0 / (B0 + B1 + B2)
    return jnp.stack([
        (T0 + T1 + T2) * n,
        2.0 * (T0 - T2) * n,
        (T0 - T1 + T2) * n,
        2.0 * (B2 - B0) * n,
        (B1 - B2 - B0) * n,
    ], axis=-1)                                   # [..., 5]


def _design_per_sample(params: FilterParams, gain: Array,
                       sample_rate: int) -> Array:
    """Per-sample biquads [..., T, K, 5] from the gain signal.

    Cascade formulas mirror design.py (reference Filter.cpp:778-809 RLC
    shelves, :910-933 RLC bell, :1183-1219 BWC shelves, :1292-1355 BWC
    bell) with the gain as a traced array.
    """
    ft = params.ftype
    gain = gain.astype(jnp.float32)
    slope = max(int(params.slope), 1)
    q = params.quality
    kf = 1.0 / np.tan(params.freq * np.pi / sample_rate)
    g = jnp.maximum(gain, 1e-6)
    cascades = []

    if ft == FilterType.BT_RLC_BELL:
        fg = jnp.exp(jnp.log(g) / slope)
        k = 2.0 * (1.0 / fg + fg) / (1.0 + (2.0 * q) / slope)
        angle = jnp.arctan(fg)
        kt = k * jnp.sin(angle)
        kb = k * jnp.cos(angle)
        one = jnp.ones_like(g)
        for _ in range(slope):
            cascades.append((one, kt, one, one, kb, one))
    elif ft in (FilterType.BT_RLC_LOSHELF, FilterType.BT_RLC_HISHELF):
        lo = ft == FilterType.BT_RLC_LOSHELF
        gn = jnp.sqrt(g)
        fg = jnp.exp(jnp.log(gn) / (slope * 2))
        kq = 2.0 / (1.0 + q)
        for j in range(slope):
            t0, t1, t2 = fg, jnp.full_like(g, kq), 1.0 / fg
            b0, b1, b2 = 1.0 / fg, jnp.full_like(g, kq), fg
            if not lo:
                t0, t1, t2, b0, b1, b2 = b0, b1, b2, t0, t1, t2
            if j == 0:
                t0, t1, t2 = t0 * gn, t1 * gn, t2 * gn
            cascades.append((t0, t1, t2, b0, b1, b2))
    elif ft in (FilterType.BT_BWC_LOSHELF, FilterType.BT_BWC_HISHELF):
        hi = ft == FilterType.BT_BWC_HISHELF
        gn = jnp.sqrt(g)
        fg = jnp.exp(jnp.log(gn) / (2.0 * slope))
        k = 1.0 / (1.0 + q * (1.0 - jnp.exp(2.0 - gn - 1.0 / gn)))
        for j in range(slope):
            theta = ((2 * j + 1) * np.pi / 2) / (2 * slope)
            tsin = np.sin(theta)
            tcos = float(np.sqrt(1.0 - tsin * tsin))
            kfc = tsin * tsin + k * k * tcos * tcos
            top = (kfc / fg, 2.0 * k * tcos, fg)
            bot = (fg, 2.0 * k * tcos, kfc / fg)
            t, b = (top, bot) if hi else (bot, top)
            t0, t1, t2 = t
            b0, b1, b2 = b
            t0, t1, t2 = (jnp.broadcast_to(v, g.shape)
                          for v in (t0, t1, t2))
            b0, b1, b2 = (jnp.broadcast_to(v, g.shape)
                          for v in (b0, b1, b2))
            if j == 0:
                t0, t1, t2 = t0 * gn, t1 * gn, t2 * gn
            cascades.append((t0, t1, t2, b0, b1, b2))
    elif ft == FilterType.BT_BWC_BELL:
        fg = jnp.exp(jnp.log(g) / (2.0 * slope))
        k = 1.0 / (1.0 + q)
        up = g >= 1.0
        for j in range(slope):
            theta = ((2 * j + 1) * np.pi / 2) / (2 * slope)
            tsin = np.sin(theta)
            tcos = float(np.sqrt(1.0 - tsin * tsin))
            kfc = tsin * tsin + k * k * tcos * tcos
            one = jnp.ones_like(g)
            # boost pair vs cut pair selected per sample (Filter.cpp
            # 1292-1355 branches on gain >= 1)
            c1 = (one, jnp.where(up, 2 * k * tcos * fg / kfc,
                                 2 * k * tcos / kfc * one),
                  jnp.where(up, fg * fg / kfc, 1.0 / kfc * one),
                  one, jnp.where(up, 2 * k * tcos / kfc * one,
                                 2 * k * tcos / (fg * kfc)),
                  jnp.where(up, 1.0 / kfc * one, 1.0 / (fg * fg * kfc)))
            c2 = (one, jnp.where(up, 2 * k * tcos / fg,
                                 2 * k * tcos * one),
                  jnp.where(up, kfc / (fg * fg), kfc * one),
                  one, jnp.where(up, 2 * k * tcos * one,
                                 2 * k * tcos * fg),
                  jnp.where(up, kfc * one, kfc * fg * fg))
            cascades.append(c1)
            cascades.append(c2)
    else:
        raise ValueError(f"unsupported dynamic filter type: {ft}")

    bqs = [
        _bilinear(t0, t1, t2, b0, b1, b2, np.float32(kf))
        for (t0, t1, t2, b0, b1, b2) in cascades]
    return jnp.stack(bqs, axis=-2).astype(jnp.float32)  # [..., T, K, 5]


class DynamicFilters:
    """A bank of independently-typed dynamic filters; each filter id has
    static params and processes with its own per-sample gain signal
    (reference DynamicFilters::process(id, out, in, gain, samples))."""

    def __init__(self, sample_rate: int = 48000, filters: int = 1):
        self.sample_rate = int(sample_rate)
        self.params = [FilterParams()] * int(filters)
        self.active = [True] * int(filters)

    def set_params(self, fid: int, params: FilterParams) -> None:
        if params.ftype not in _SUPPORTED and \
                params.ftype != FilterType.NONE:
            raise ValueError(
                f"dynamic filters support {sorted(t.value for t in _SUPPORTED)}")
        self.params[fid] = params

    def set_active(self, fid: int, active: bool) -> None:
        self.active[fid] = bool(active)

    def num_stages(self, fid: int) -> int:
        p = self.params[fid]
        if p.ftype == FilterType.BT_BWC_BELL:
            return p.slope * 2
        return p.slope

    def init_state(self, fid: int, batch_shape: Tuple[int, ...] = (),
                   ) -> Array:
        return biquad_ops.init_state(self.num_stages(fid), batch_shape)

    def process(self, fid: int, state: Array, x: Array, gain: Array,
                method: str = "assoc") -> Tuple[Array, Array]:
        """x, gain: [..., T] -> (state', y).

        ``method``: 'assoc' (time-parallel scan; full precision for
        mid/high-frequency filters) or 'seq' (sequential f32 recurrence
        — the reference's own precision class, preferred for
        low-frequency / near-unit-pole dynamic filters)."""
        p = self.params[fid]
        if not self.active[fid] or p.ftype == FilterType.NONE:
            return state, x
        coeffs = _design_per_sample(p, gain, self.sample_rate)
        if method == "seq":
            y, state = biquad_ops.dyn_biquad_cascade_seq(coeffs, state, x)
        elif method == "assoc":
            y, state = biquad_ops.dyn_biquad_cascade(coeffs, state, x)
        else:
            raise ValueError(f"unknown method {method!r}; use 'assoc' or"
                             " 'seq'")
        return state, y

    def freq_chart(self, fid: int, gain: float,
                   freqs: np.ndarray) -> np.ndarray:
        """Chart at a fixed gain level (reference quality-interpolated
        curves): evaluate the per-sample design at one gain."""
        from lsp_dsp_units_tpu.models.filters.design import (
            digital_freq_response)
        coeffs = np.asarray(_design_per_sample(
            self.params[fid], jnp.asarray([gain], jnp.float32),
            self.sample_rate))[0]
        return digital_freq_response(coeffs, freqs, self.sample_rate)
