"""Host-side block streaming: drive fixed-block jitted processors with
arbitrary caller chunk sizes.

The reference rebuffers internally everywhere (e.g. Equalizer.cpp:477-518
accumulates a frame, emits the previous one); under jit the block shape
must be static, so the rebuffering lives here on the host.  Units that are
stateless across samples (pure elementwise) don't need this.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import numpy as np


class BlockStream:
    """Wraps ``process(state, x_block) -> (state, y_block)`` (jitted, fixed
    block length B on the last axis) into a push API accepting any chunk
    size.  Output is delayed by exactly B samples (one block of latency),
    mirroring the reference's frame-accumulation pattern."""

    def __init__(self, process: Callable[[Any, np.ndarray], Tuple[Any, Any]],
                 state: Any, block: int, batch_shape: Tuple[int, ...] = (),
                 dtype=np.float32):
        self.process = process
        self.state = state
        self.block = int(block)
        self.batch_shape = tuple(batch_shape)
        self._in = np.zeros(self.batch_shape + (self.block,), dtype)
        self._out = np.zeros(self.batch_shape + (self.block,), dtype)
        self._fill = 0

    @property
    def latency(self) -> int:
        return self.block

    def push(self, x: np.ndarray) -> np.ndarray:
        """Feed ``x`` ([..., n]); returns n output samples (delayed)."""
        x = np.asarray(x)
        n = x.shape[-1]
        out = np.empty_like(x)
        done = 0
        while done < n:
            take = min(self.block - self._fill, n - done)
            self._in[..., self._fill:self._fill + take] = \
                x[..., done:done + take]
            out[..., done:done + take] = \
                self._out[..., self._fill:self._fill + take]
            self._fill += take
            done += take
            if self._fill == self.block:
                self.state, y = self.process(self.state, self._in)
                # np.array (copy) so a host-side processor returning its
                # input buffer can't alias _out to _in
                self._out = np.array(y, np.float32)
                # fresh input buffer: jnp.asarray / device_put on the CPU
                # backend may alias the numpy buffer ZERO-COPY, so
                # refilling the old `_in` in place would retroactively
                # corrupt the block the processor is still reading
                # (observed as flaky one-sample skips at block seams)
                self._in = np.zeros_like(self._in)
                self._fill = 0
        return out

    def flush(self) -> np.ndarray:
        """Drain the one block of buffered latency: the unemitted tail of
        the previous block's output plus (if a partial block is pending)
        the zero-padded partial block's head.  Always returns exactly
        ``block`` samples — for offline tails."""
        tail = self._out[..., self._fill:].copy()
        if self._fill:
            # fresh buffer for the same zero-copy-aliasing reason as push
            pad = np.zeros_like(self._in)
            pad[..., : self._fill] = self._in[..., : self._fill]
            self.state, y = self.process(self.state, pad)
            # a fresh _in as well: jnp.asarray may have aliased `pad`
            # zero-copy, so a later push() must not refill it in place
            self._in = np.zeros_like(self._in)
            self._out = np.array(y, np.float32)
            head = self._out[..., : self._fill].copy()
        else:
            head = np.zeros(self.batch_shape + (0,), self._out.dtype)
        self._fill = 0
        self._out = np.zeros_like(self._out)
        return np.concatenate([tail, head], axis=-1)


def pad_to_multiple(x: np.ndarray, block: int) -> Tuple[np.ndarray, int]:
    """Zero-pad the last axis up to a multiple of ``block``."""
    t = x.shape[-1]
    pad = (-t) % block
    if pad:
        x = np.concatenate(
            [x, np.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
    return x, pad
