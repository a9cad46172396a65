"""Biquad cascade kernels — the TPU replacement for the reference's SIMD
biquad bank (lsp-dsp-lib ``dsp::biquad_process_x{1,2,4,8}``, used by
``FilterBank::process`` — reference: src/main/filters/FilterBank.cpp:256-291).

Coefficient convention (matches reference ``dsp::biquad_x1_t`` with the
feedback signs pre-negated, see reference src/main/filters/Filter.cpp:2258-2262)::

    y[n] = b0*x[n] + b1*x[n-1] + b2*x[n-2] + a1*y[n-1] + a2*y[n-2]

A cascade is ``coeffs[K, 5] = (b0, b1, b2, a1, a2)`` per stage, executed in
series.  Instead of translating the reference's x8 SIMD packing (a CPU
software-pipelining trick), the sample recurrence is broken with a
**time-parallel associative scan** over the direct-form-II-transposed state:

    DF2T:  y[n]  = b0*x[n] + s1[n-1]
           s1[n] = b1*x[n] + a1*y[n] + s2[n-1]
           s2[n] = b2*x[n] + a2*y[n]

    =>     s[n] = A s[n-1] + u x[n]
           A = [[a1, 1], [a2, 0]],   u = [b1 + a1*b0,  b2 + a2*b0]

The affine elements ``(A, u*x[n])`` compose associatively, so
``jax.lax.associative_scan`` evaluates all T states in O(log T) depth of
cheap elementwise 2x2 algebra on the VPU — fully batched over channels.
The same kernel with a time axis on the coefficients implements the
reference's per-sample-varying ``dsp::dyn_biquad_process_x*``
(src/main/filters/DynamicFilters.cpp:265-303).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops.unroll import unrolled_scan

Array = jax.Array


def init_state(num_stages: int, batch_shape: Tuple[int, ...] = (),
               dtype=jnp.float32) -> Array:
    """Zero DF2T state: shape ``batch_shape + (num_stages, 2)``."""
    return jnp.zeros(batch_shape + (num_stages, 2), dtype=dtype)


def _affine_combine(elem1, elem2):
    """Compose affine maps s -> A s + v:  (A2, v2) o (A1, v1)."""
    (a00_1, a01_1, a10_1, a11_1), (v0_1, v1_1) = elem1
    (a00_2, a01_2, a10_2, a11_2), (v0_2, v1_2) = elem2
    a00 = a00_2 * a00_1 + a01_2 * a10_1
    a01 = a00_2 * a01_1 + a01_2 * a11_1
    a10 = a10_2 * a00_1 + a11_2 * a10_1
    a11 = a10_2 * a01_1 + a11_2 * a11_1
    v0 = a00_2 * v0_1 + a01_2 * v1_1 + v0_2
    v1 = a10_2 * v0_1 + a11_2 * v1_1 + v1_2
    return (a00, a01, a10, a11), (v0, v1)


def stage_prefix(x: Array, b0, b1, b2, a1, a2):
    """Prefix affine maps of one biquad stage over the last (time) axis.

    Returns ``(A_scan, v_scan)`` where ``A_scan`` is a 4-tuple of [..., T]
    arrays (the 2x2 prefix matrix products) and ``v_scan`` a 2-tuple (the
    zero-state responses), such that the DF2T state after sample n is
    ``s[n] = A_scan[n] @ s_in + v_scan[n]`` for ANY incoming state.  This
    split is what makes the kernel shardable along time: devices exchange
    only their last (A, v) summary (see parallel.time_iir).
    """
    u0 = b1 + a1 * b0
    u1 = b2 + a2 * b0
    ones = jnp.ones_like(x)
    A = (a1 * ones, ones, a2 * ones, jnp.zeros_like(x))
    v = (u0 * x, u1 * x)
    return jax.lax.associative_scan(_affine_combine, (A, v), axis=-1)


def stage_apply(x: Array, b0, A_scan, v_scan, s_in: Array,
                ) -> Tuple[Array, Array]:
    """Complete one stage given its prefix maps and the incoming state."""
    s1_in = s_in[..., 0:1]  # [..., 1] — broadcasts over time
    s2_in = s_in[..., 1:2]
    s1 = A_scan[0] * s1_in + A_scan[1] * s2_in + v_scan[0]
    s2 = A_scan[2] * s1_in + A_scan[3] * s2_in + v_scan[1]
    # y[n] = b0 x[n] + s1[n-1]; shift s1 right by one, injecting s_in
    s1_prev = jnp.concatenate([s1_in, s1[..., :-1]], axis=-1)
    y = b0 * x + s1_prev
    s_out = jnp.stack([s1[..., -1], s2[..., -1]], axis=-1)
    return y, s_out


def _stage_assoc(x: Array, b0, b1, b2, a1, a2, s_in: Array,
                 ) -> Tuple[Array, Array]:
    """One biquad stage over the last (time) axis via associative scan.

    ``x``: [..., T]; coefficients broadcastable against ``x`` (scalars,
    [..., 1] per-batch, or [..., T] per-sample-varying); ``s_in``:
    [..., 2] carried DF2T state.  Returns (y [..., T], s_out [..., 2]).
    """
    A_scan, v_scan = stage_prefix(x, b0, b1, b2, a1, a2)
    return stage_apply(x, b0, A_scan, v_scan, s_in)


def _split_coeffs(c: Array):
    """Split [..., 5] coefficients into broadcastable (b0,b1,b2,a1,a2)."""
    if c.ndim == 1:  # shared scalars
        return c[0], c[1], c[2], c[3], c[4]
    # keep a trailing length-1 axis so they broadcast over time
    return (c[..., 0:1], c[..., 1:2], c[..., 2:3], c[..., 3:4], c[..., 4:5])


def biquad_cascade(coeffs: Array, state: Array, x: Array,
                   ) -> Tuple[Array, Array]:
    """Run a serial biquad cascade over the last (time) axis, time-parallel.

    Args:
      coeffs: [K, 5] (shared) or [..., K, 5] per-batch coefficients.
      state:  [..., K, 2] DF2T states (from :func:`init_state`).
      x:      [..., T] input.

    Returns ``(y [..., T], new_state [..., K, 2])``.  Equivalent to the
    reference's serial in-place chaining of biquad banks
    (FilterBank.cpp:256-291), with stage k filtering the full block before
    stage k+1 (LTI, so identical to per-sample ordering).
    """
    k = coeffs.shape[-2]
    if x.shape[-1] == 0:  # empty block: no-op
        return x, state
    y = x
    new_states = []
    for i in range(k):
        b0, b1, b2, a1, a2 = _split_coeffs(coeffs[..., i, :])
        y, s = _stage_assoc(y, b0, b1, b2, a1, a2, state[..., i, :])
        new_states.append(s)
    return y, jnp.stack(new_states, axis=-2)


def biquad_cascade_seq(coeffs: Array, state: Array, x: Array,
                       unroll: int = 16) -> Tuple[Array, Array]:
    """Sequential (lax.scan) path: exact per-sample DF2T order.

    Numerically the reference's own behavior class (~80 dB vs float64 for
    near-unit poles, where the f32 associative scan drops to ~40 dB);
    used where block alignment for the block-FFT path is unavailable.
    The scan body unrolls ``unroll`` samples per step (TPU per-step
    dispatch dominates otherwise).
    """
    k = coeffs.shape[-2]
    if x.shape[-1] == 0:
        return x, state

    def step(s, xt):
        y = xt
        new_s = []
        for i in range(k):
            c = coeffs[..., i, :]
            s1 = s[..., i, 0]
            s2 = s[..., i, 1]
            yi = c[..., 0] * y + s1
            ns1 = c[..., 1] * y + c[..., 3] * yi + s2
            ns2 = c[..., 2] * y + c[..., 4] * yi
            new_s.append(jnp.stack([ns1, ns2], axis=-1))
            y = yi
        return jnp.stack(new_s, axis=-2), y

    t = x.shape[-1]
    state, ys = unrolled_scan(step, state, jnp.moveaxis(x, -1, 0), t,
                              unroll)
    return jnp.moveaxis(ys, 0, -1), state


def dyn_biquad_cascade(coeffs: Array, state: Array, x: Array,
                       ) -> Tuple[Array, Array]:
    """Per-sample-varying biquad cascade (reference ``dsp::dyn_biquad_*``,
    src/main/filters/DynamicFilters.cpp:265-303).

    Args:
      coeffs: [..., T, K, 5] — one coefficient set per sample per stage.
      state:  [..., K, 2].
      x:      [..., T].
    """
    k = coeffs.shape[-2]
    if x.shape[-1] == 0:  # empty block: no-op
        return x, state
    y = x
    new_states = []
    for i in range(k):
        c = coeffs[..., i, :]  # [..., T, 5]
        y, s = _stage_assoc(
            y, c[..., 0], c[..., 1], c[..., 2], c[..., 3], c[..., 4],
            state[..., i, :])
        new_states.append(s)
    return y, jnp.stack(new_states, axis=-2)


def dyn_biquad_cascade_seq(coeffs: Array, state: Array, x: Array,
                           unroll: int = 16) -> Tuple[Array, Array]:
    """Sequential path for per-sample-varying cascades — the precision
    class of the reference's own f32 recurrence (dsp::dyn_biquad_*,
    DynamicFilters.cpp:265-303), for near-unit-pole (low-frequency)
    dynamic filters where the f32 associative scan loses ~36 dB.

    Args/shapes as :func:`dyn_biquad_cascade`."""
    k = coeffs.shape[-2]
    t = x.shape[-1]
    if t == 0:
        return x, state

    def step(s, inp):
        xt, ct = inp                       # ct: [..., K, 5]
        y = xt
        new_s = []
        for i in range(k):
            c = ct[..., i, :]
            s1 = s[..., i, 0]
            s2 = s[..., i, 1]
            yi = c[..., 0] * y + s1
            ns1 = c[..., 1] * y + c[..., 3] * yi + s2
            ns2 = c[..., 2] * y + c[..., 4] * yi
            new_s.append(jnp.stack([ns1, ns2], axis=-1))
            y = yi
        return jnp.stack(new_s, axis=-2), y

    xs = jnp.moveaxis(x, -1, 0)                       # [T, ...]
    cs = jnp.moveaxis(coeffs, -3, 0)                  # [T, ..., K, 5]
    state, ys = unrolled_scan(step, state, (xs, cs), t, unroll)
    return jnp.moveaxis(ys, 0, -1), state


def impulse_response(coeffs: Array, length: int) -> Array:
    """Impulse response of a cascade (reference FilterBank.cpp:293-330)."""
    x = jnp.zeros((length,), jnp.float32).at[0].set(1.0)
    st = init_state(coeffs.shape[-2], coeffs.shape[:-2], jnp.float32)
    y, _ = biquad_cascade(coeffs, st, x)
    return y


def np_biquad_cascade_f64(coeffs: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Float64 sequential golden model (host) for SNR tests.

    Mirrors the exact per-stage DF2T recurrence used on-device, in float64.
    """
    y = np.asarray(x, np.float64).copy()
    coeffs = np.asarray(coeffs, np.float64)
    for (b0, b1, b2, a1, a2) in coeffs:
        s1 = 0.0
        s2 = 0.0
        out = np.empty_like(y)
        for n in range(y.shape[-1]):
            v = b0 * y[n] + s1
            s1 = b1 * y[n] + a1 * v + s2
            s2 = b2 * y[n] + a2 * v
            out[n] = v
        y = out
    return y
