"""Float FIFO primitives: RingBuffer, RawRingBuffer, ShiftBuffer, and the
MeterGraph decimators (reference: src/main/util/{RingBuffer,
RawRingBuffer, ShiftBuffer, MeterGraph, ScaledMeterGraph}.cpp).

These are host-side carriers in the TPU design (device state lives in
processor pytrees); they keep the reference's API surface for framework
users porting host code, implemented over numpy.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import numpy as np


class RingBuffer:
    """Head/tail FIFO of floats (reference RingBuffer.cpp, used by
    MeterGraph/Sidechain since 1.0.35 — reference CHANGELOG:13-15)."""

    def __init__(self, size: int):
        self.data = np.zeros(int(size), np.float32)
        self.head = 0
        self.count = 0

    @property
    def size(self) -> int:
        return self.data.size

    def clear(self) -> None:
        self.data[:] = 0.0
        self.head = 0
        self.count = 0

    def push(self, x) -> int:
        x = np.atleast_1d(np.asarray(x, np.float32))
        n = min(x.size, self.size)
        x = x[-n:]
        end = self.head + n
        if end <= self.size:
            self.data[self.head:end] = x
        else:
            cut = self.size - self.head
            self.data[self.head:] = x[:cut]
            self.data[: end - self.size] = x[cut:]
        self.head = end % self.size
        self.count = min(self.count + n, self.size)
        return n

    def tail(self, n: int) -> np.ndarray:
        """Last n pushed samples, oldest first (zero-padded if short)."""
        n = int(n)
        out = np.zeros(n, np.float32)
        take = min(n, self.count)
        start = (self.head - take) % self.size
        idx = (start + np.arange(take)) % self.size
        out[n - take:] = self.data[idx]
        return out

    # -- reference API surface (RingBuffer.cpp:76-209) ------------------
    def append(self, x) -> int:
        """Reference append: scalar or buffer; a buffer larger than the
        capacity keeps only its LAST ``size`` samples
        (RingBuffer.cpp:76-106)."""
        return self.push(x)

    def fill(self, value: float) -> None:
        """Fill the whole buffer and reset the head
        (RingBuffer.cpp:115-120)."""
        self.data[:] = np.float32(value)
        self.head = 0
        self.count = self.size

    def get(self, offset: int) -> float:
        """Sample ``offset`` steps back in time (0 = most recently
        appended); offsets outside the capacity read 0
        (RingBuffer.cpp:122-129)."""
        offset = int(offset)
        if offset < 0 or offset >= self.size:
            return 0.0
        return float(self.data[(self.head - offset - 1) % self.size])

    def get_range(self, offset: int, count: int,
                  ) -> Tuple[np.ndarray, int]:
        """``count`` samples at offsets ``offset, offset-1, ...``
        (oldest first); out-of-capacity offsets (too old, or negative =
        not yet written) read 0.  Returns (values, n) where n is the
        number of in-capacity samples actually read — the reference's
        ``get(float *dst, offset, count)`` return value
        (RingBuffer.cpp:147-183)."""
        offset, count = int(offset), int(count)
        offs = offset - np.arange(count)
        valid = (offs >= 0) & (offs < self.size)
        idx = (self.head - offs - 1) % self.size
        out = np.where(valid, self.data[idx], 0.0).astype(np.float32)
        return out, int(valid.sum())

    def lerp_get(self, offset: float) -> float:
        """Linear interpolation between get(floor(offset)) and
        get(floor(offset)+1) (RingBuffer.cpp:131-138)."""
        off = int(np.floor(offset))
        s1 = self.get(off)
        s2 = self.get(off + 1)
        return s1 + (s2 - s1) * (float(offset) - off)

    def tail_position(self, offset: int) -> int:
        """Raw index of the sample ``offset`` behind the head; the head
        itself for out-of-capacity offsets (RingBuffer.cpp:140-145)."""
        offset = int(offset)
        if offset >= self.size:
            return self.head
        return (self.head - offset - 1) % self.size

    def read(self, position: int, count: Optional[int] = None):
        """Raw positional read: a single sample at ``position`` (0 when
        out of range), or ``count`` samples starting there, wrapping
        around the capacity (RingBuffer.cpp:185-209).  An out-of-range
        position — negative included (the reference takes size_t, so
        negatives cannot reach it) — returns an EMPTY array, mirroring
        the reference's rc=0."""
        position = int(position)
        if count is None:
            return (float(self.data[position])
                    if 0 <= position < self.size else 0.0)
        if not 0 <= position < self.size:
            return np.zeros(0, np.float32)
        idx = (position + np.arange(int(count))) % self.size
        return self.data[idx].copy()


class ShiftBuffer:
    """Contiguous FIFO with linear storage and head shifting
    (reference ShiftBuffer.cpp): append at tail, remove from head, the
    valid region is always contiguous."""

    def __init__(self, size: int, gap: int = 0):
        self.data = np.zeros(int(size), np.float32)
        self.head = 0
        self.tail_pos = min(gap, int(size))

    def clear(self, gap: int = 0) -> None:
        self.data[:] = 0.0
        self.head = 0
        self.tail_pos = min(gap, self.data.size)

    def append(self, x) -> int:
        x = np.atleast_1d(np.asarray(x, np.float32))
        avail = self.data.size - self.tail_pos
        if x.size > avail:  # shift to make room
            used = self.tail_pos - self.head
            self.data[:used] = self.data[self.head:self.tail_pos]
            self.head = 0
            self.tail_pos = used
            avail = self.data.size - used
        n = min(x.size, avail)
        self.data[self.tail_pos:self.tail_pos + n] = x[:n]
        self.tail_pos += n
        return n

    def shift(self, n: int) -> np.ndarray:
        n = min(int(n), self.tail_pos - self.head)
        out = self.data[self.head:self.head + n].copy()
        self.head += n
        return out

    @property
    def avail(self) -> int:
        return self.tail_pos - self.head

    def view(self) -> np.ndarray:
        return self.data[self.head:self.tail_pos]


class MeterMethod(enum.Enum):
    MAXIMUM = "maximum"
    MINIMUM = "minimum"
    PEAK = "peak"     # max of |x|


class MeterGraph:
    """UI meter history: decimates the input into per-period min/max/peak
    frames kept in a ring (reference MeterGraph.cpp)."""

    def __init__(self, frames: int, period: int,
                 method: MeterMethod = MeterMethod.PEAK):
        self.period = max(1, int(period))
        self.method = method
        self.ring = RingBuffer(int(frames))
        self._acc: Optional[float] = None
        self._fill = 0
        self.current = 0.0

    def process(self, x) -> np.ndarray:
        """Consume samples; returns the frame values COMPLETED during
        this call (empty array if none) so cascaded samplers can stay on
        the sample-count timebase."""
        x = np.atleast_1d(np.asarray(x, np.float32))
        pos = 0
        done = []
        while pos < x.size:
            take = min(self.period - self._fill, x.size - pos)
            seg = x[pos:pos + take]
            if self.method == MeterMethod.MAXIMUM:
                v = float(seg.max())
                self._acc = v if self._acc is None else max(self._acc, v)
            elif self.method == MeterMethod.MINIMUM:
                v = float(seg.min())
                self._acc = v if self._acc is None else min(self._acc, v)
            else:
                v = float(np.abs(seg).max())
                self._acc = v if self._acc is None else max(self._acc, v)
            self._fill += take
            pos += take
            if self._fill >= self.period:
                self.ring.push(self._acc)
                self.current = self._acc
                done.append(self._acc)
                self._acc = None
                self._fill = 0
        return np.asarray(done, np.float32)

    def frames(self, n: int) -> np.ndarray:
        return self.ring.tail(n)


class ScaledMeterGraph:
    """Two-stage subsampling meter graph (reference
    ScaledMeterGraph.cpp): a fast sampler decimates by ``subsampling``
    and cascades into a slow one so zoomed-out views stay peak-accurate.

    The slow stage counts SAMPLES and carries the residual across
    frames exactly like the reference (``nCount += subsampling`` per
    subframe, emit when ``nCount >= period``, then ``nCount -= period``
    — ScaledMeterGraph.cpp:330-336), so the long-run frame period
    equals the requested ``period`` even when ``subsampling`` does not
    divide it (each frame jitters by < subsampling, it never drifts)."""

    def __init__(self, frames: int, period: int, subsampling: int,
                 method: MeterMethod = MeterMethod.PEAK):
        self.subsampling = max(1, int(subsampling))
        # reference set_period clamps to [subsampling, max_period]
        self.period = max(int(period), self.subsampling)
        self.fast = MeterGraph(frames, self.subsampling, method)
        self.method = method
        self.ring = RingBuffer(int(frames))
        self._acc: Optional[float] = None
        self._count = 0
        self.current = 0.0

    def _combine(self, acc: Optional[float], v: float) -> float:
        if acc is None:
            return v
        if self.method == MeterMethod.MINIMUM:
            return min(acc, v)
        return max(acc, v)

    def process(self, x) -> None:
        # feed every COMPLETED fast subframe into the slow accumulator,
        # each worth `subsampling` samples on the slow timebase
        for v in self.fast.process(x):
            self._acc = self._combine(self._acc, float(v))
            self._count += self.subsampling
            if self._count >= self.period:
                self.ring.push(self._acc)
                self.current = self._acc
                self._acc = None
                self._count -= self.period

    def frames(self, n: int) -> np.ndarray:
        return self.ring.tail(n)


class RawRingBuffer:
    """Ring buffer with caller-managed head: placement write at the head
    without advancing, explicit ``advance``, and reads at an offset
    BEHIND the head (reference RawRingBuffer.cpp:83-196 — ``write`` does
    not move the head, ``push`` does; ``read(offset, n)`` starts
    ``offset`` samples behind the current head).

    Counts larger than the capacity are clamped to the capacity, as in
    the reference (RawRingBuffer.cpp:85,107).
    """

    def __init__(self, size: int):
        self.data = np.zeros(int(size), np.float32)
        self.head = 0

    @property
    def size(self) -> int:
        return self.data.size

    def clear(self) -> None:
        self.data[:] = 0.0
        self.head = 0

    def reset(self) -> None:
        """Reset the head without clearing contents."""
        self.head = 0

    def fill(self, value: float) -> None:
        self.data[:] = np.float32(value)

    def position(self) -> int:
        return self.head

    def _place(self, x: np.ndarray) -> int:
        n = min(x.size, self.size)
        idx = (self.head + np.arange(n)) % self.size
        self.data[idx] = x[:n]
        return n

    def write(self, x) -> int:
        """Write at the current head WITHOUT advancing; returns the
        number of samples written (clamped to capacity)."""
        x = np.atleast_1d(np.asarray(x, np.float32))
        return self._place(x)

    def push(self, x) -> int:
        """Write at the current head and advance it past the data."""
        x = np.atleast_1d(np.asarray(x, np.float32))
        n = self._place(x)
        self.head = (self.head + n) % self.size
        return n

    def read(self, offset: int, count: int = 1) -> np.ndarray:
        """Read ``count`` samples starting ``offset`` samples behind the
        current head (wrapping forward)."""
        count = min(int(count), self.size)
        tail = (self.head - int(offset)) % self.size
        idx = (tail + np.arange(count)) % self.size
        return self.data[idx].copy()

    def read_one(self, offset: int) -> float:
        return float(self.data[(self.head - int(offset)) % self.size])

    def advance(self, count: int) -> int:
        """Advance the head; returns the new head index (the reference
        returns the new head pointer, RawRingBuffer.cpp:157-161)."""
        self.head = (self.head + int(count)) % self.size
        return self.head

    def tail(self, offset: int) -> int:
        """Index of the sample ``offset`` behind the head."""
        return (self.head - int(offset)) % self.size

    def head_remaining(self) -> int:
        """Samples before the head wraps (reference
        RawRingBuffer.h:181)."""
        return self.size - self.head

    def tail_remaining(self, offset: int) -> int:
        """Samples before the tail at ``offset`` wraps."""
        return self.size - self.tail(offset)

    def remaining(self, offset: int) -> int:
        """Samples before either the head or the tail wraps."""
        return min(self.head_remaining(), self.tail_remaining(offset))
