"""Delay lines (reference: src/main/util/Delay.cpp, DynamicDelay.cpp).

The reference's ring-buffer delay becomes a functional history buffer:
state holds the last ``max_delay`` input samples; a block of output is a
(static-shift) slice for ``Delay`` and a per-sample gather for
``DynamicDelay`` (time-varying delay + gain + feedback).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class DelayState(NamedTuple):
    history: Array   # [..., max_delay] trailing input samples


class Delay:
    """Fixed integer-sample delay with optional (ramping) gain
    (reference Delay.cpp:104-460)."""

    def __init__(self, max_delay: int):
        self.max_delay = int(max_delay)

    def init_state(self, batch_shape: Tuple[int, ...] = (),
                   dtype=jnp.float32) -> DelayState:
        return DelayState(
            history=jnp.zeros(batch_shape + (self.max_delay,), dtype))

    def process(self, state: DelayState, x: Array, delay: int,
                gain: Optional[Array] = None,
                ) -> Tuple[DelayState, Array]:
        """delay: static int in [0, max_delay]; gain: scalar or [..., T]."""
        assert 0 <= delay <= self.max_delay
        frame = jnp.concatenate([state.history, x], axis=-1)
        t = x.shape[-1]
        y = jax.lax.dynamic_slice_in_dim(
            frame, frame.shape[-1] - t - delay, t, axis=-1)
        if gain is not None:
            y = y * gain
        new_hist = frame[..., -self.max_delay:] if self.max_delay else \
            state.history
        return DelayState(history=new_hist), y

    def process_ramping(self, state: DelayState, x: Array, delay_from: int,
                        delay_to: int) -> Tuple[DelayState, Array]:
        """Linearly ramp the delay across the block
        (reference Delay::process_ramping, Delay.cpp:399-460); fractional
        positions round toward the reference's integer stepping."""
        if not (0 <= delay_from <= self.max_delay
                and 0 <= delay_to <= self.max_delay):
            raise ValueError(
                f"ramp delays ({delay_from}, {delay_to}) out of range "
                f"[0, {self.max_delay}]")
        frame = jnp.concatenate([state.history, x], axis=-1)
        t = x.shape[-1]
        base = self.max_delay + jnp.arange(t)
        d = jnp.round(
            delay_from + (delay_to - delay_from)
            * jnp.arange(t, dtype=jnp.float32) / max(t - 1, 1)
        ).astype(jnp.int32)
        idx = base - d
        y = jnp.take_along_axis(
            jnp.broadcast_to(frame, x.shape[:-1] + frame.shape[-1:]),
            jnp.broadcast_to(idx, x.shape[:-1] + (t,)), axis=-1)
        new_hist = frame[..., -self.max_delay:] if self.max_delay else \
            state.history
        return DelayState(history=new_hist), y


class DynamicDelayState(NamedTuple):
    buffer: Array    # [..., max_delay + 1] sample ring (head at index -1)


class DynamicDelay:
    """Per-sample varying delay with feedback injection
    (reference DynamicDelay.cpp DynamicDelay::process): per sample n with
    shift d[n], the input is written at the head, the delayed sample
    ``s = buf[head - d]`` is read, ``s * fgain[n]`` is added into the
    buffer at ``head - d + fdelay[n]`` (fdelay clamped to [0, d]), and the
    output re-reads ``buf[head - d]`` after the feedback add (so fdelay==0
    yields ``s * (1 + fgain)``).  The in-buffer feedback makes this a
    genuine sequential scan."""

    def __init__(self, max_delay: int):
        self.max_delay = int(max_delay)

    def init_state(self, batch_shape: Tuple[int, ...] = (),
                   dtype=jnp.float32) -> DynamicDelayState:
        return DynamicDelayState(
            buffer=jnp.zeros(batch_shape + (self.max_delay + 1,), dtype))

    def process(self, state: DynamicDelayState, x: Array, delay: Array,
                fgain: Array, fdelay: Array,
                ) -> Tuple[DynamicDelayState, Array]:
        """x [..., T]; delay int32, fgain float, fdelay int32 [..., T]."""
        m = self.max_delay + 1

        def step(buf, inputs):
            xt, dt, gt, ft = inputs
            dt = jnp.clip(dt, 0, self.max_delay)
            ft = jnp.clip(ft, 0, dt)
            buf = jnp.concatenate([buf[..., 1:], xt[..., None]], axis=-1)
            tail = (m - 1 - dt)[..., None]
            s = jnp.take_along_axis(buf, tail, axis=-1)[..., 0]
            feed = tail + ft[..., None]
            # scatter-add s*gt at `feed` along the last axis
            onehot = (jnp.arange(m) == feed).astype(buf.dtype)
            buf = buf + onehot * (s * gt)[..., None]
            y = jnp.take_along_axis(buf, tail, axis=-1)[..., 0]
            return buf, y

        xs = (jnp.moveaxis(x, -1, 0),
              jnp.moveaxis(jnp.broadcast_to(delay, x.shape), -1, 0),
              jnp.moveaxis(jnp.broadcast_to(fgain, x.shape), -1, 0),
              jnp.moveaxis(jnp.broadcast_to(fdelay, x.shape), -1, 0))
        buf, ys = jax.lax.scan(step, state.buffer, xs)
        return DynamicDelayState(buffer=buf), jnp.moveaxis(ys, 0, -1)
