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

    def process(self, v: float) -> float:
        """Append one sample and pop the oldest (reference
        ShiftBuffer::process, ShiftBuffer.cpp:251-270); the init gap
        yields that many leading zeros."""
        if self.tail_pos >= self.data.size:
            if self.head <= 0:
                return 0.0
            used = self.tail_pos - self.head
            self.data[:used] = self.data[self.head:self.tail_pos]
            self.head = 0
            self.tail_pos = used
        self.data[self.tail_pos] = np.float32(v)
        self.tail_pos += 1
        out = float(self.data[self.head])
        self.head += 1
        return out

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
    """reference meter_method_t (MeterGraph.h:33-64).  PEAK holds the
    FIRST sample of each period (sample-and-hold), ABS_* reduce |x|,
    SIGN_* keep the signed value with the extreme |x|."""
    ABS_MAXIMUM = "abs_maximum"
    ABS_MINIMUM = "abs_minimum"
    SIGN_MAXIMUM = "sign_maximum"
    SIGN_MINIMUM = "sign_minimum"
    PEAK = "peak"


def _sampler_accumulate(method: MeterMethod, acc: Optional[float],
                        seg: np.ndarray, gain: float) -> float:
    """One chunk of the reference's per-period accumulation
    (MeterGraph.cpp:112-175 vector path): reduce the chunk with the
    method's kernel, then merge into the running value.  ``acc is
    None`` encodes the reference's nCount==0 unconditional take.

    NOTE reference-verbatim divergence: the reference's GAIN variant of
    MM_ABS_MAXIMUM (MeterGraph.cpp:258-264) compares with ``>`` —
    keeping the SMALLEST chunk maximum when a period spans several
    chunks — while its no-gain variant uses ``<``.  We implement the
    consistent (no-gain) semantics for both paths; period-aligned
    processing is identical either way."""
    if method == MeterMethod.PEAK:
        v = float(seg[0]) * gain
        return v if acc is None else acc
    if method == MeterMethod.ABS_MAXIMUM:
        v = float(np.abs(seg).max()) * gain
        return v if acc is None else max(acc, v)
    if method == MeterMethod.ABS_MINIMUM:
        v = float(np.abs(seg).min()) * gain
        return v if acc is None else min(acc, v)
    if method == MeterMethod.SIGN_MAXIMUM:
        v = float(seg[np.argmax(np.abs(seg))]) * gain
        return v if acc is None else (v if abs(v) > abs(acc) else acc)
    v = float(seg[np.argmin(np.abs(seg))]) * gain
    return v if acc is None else (v if abs(v) < abs(acc) else acc)


class _Sampler:
    """One decimating sampler: fCurrent/nCount/nPeriod over a frame ring
    (reference MeterGraph.cpp process, ScaledMeterGraph.cpp sampler_t)."""

    def __init__(self, frames: int, period: int, default: float = 0.0):
        self.period = max(1, int(period))
        self.ring = RingBuffer(int(frames))
        self.default = float(default)
        self._acc: Optional[float] = None
        self._fill = 0
        self.current = 0.0

    def process(self, method: MeterMethod, x: np.ndarray,
                gain: float = 1.0) -> np.ndarray:
        """Consume samples; returns frames COMPLETED during this call."""
        x = np.atleast_1d(np.asarray(x, np.float32))
        pos = 0
        done = []
        while pos < x.size:
            take = min(self.period - self._fill, x.size - pos)
            self._acc = _sampler_accumulate(method, self._acc,
                                            x[pos:pos + take], gain)
            self._fill += take
            pos += take
            if self._fill >= self.period:
                self.ring.push(self._acc)
                self.current = self._acc
                done.append(self._acc)
                self._acc = None
                self._fill = 0
        return np.asarray(done, np.float32)

    def read(self, n: int) -> np.ndarray:
        """Last n frames oldest-first, short history padded with the
        default value (reference MeterGraph::read)."""
        n = int(n)
        out = np.full(n, self.default, np.float32)
        take = min(n, self.ring.count)
        if take:
            out[n - take:] = self.ring.tail(take)
        return out


class MeterGraph:
    """UI meter history: decimates the input into per-period frames kept
    in a ring (reference MeterGraph.cpp)."""

    def __init__(self, frames: int, period: int,
                 method: MeterMethod = MeterMethod.ABS_MAXIMUM,
                 default: float = 0.0):
        self._s = _Sampler(frames, period, default)
        self.method = method

    @property
    def period(self) -> int:
        return self._s.period

    @property
    def current(self) -> float:
        return self._s.current

    def process(self, x, gain: float = 1.0) -> np.ndarray:
        """Consume samples; returns the frame values COMPLETED during
        this call (empty array if none)."""
        return self._s.process(self.method, x, gain)

    def frames(self, n: int) -> np.ndarray:
        return self._s.read(n)

    read = frames

    def level(self) -> float:
        """Most recent completed frame (reference MeterGraph::level)."""
        return self._s.ring.get(0)

    def fill(self, level: float) -> None:
        self._s.ring.fill(level)
        self._s._acc = None
        self._s._fill = 0


class ScaledMeterGraph:
    """Dual-resolution meter graph (reference ScaledMeterGraph.cpp):
    TWO INDEPENDENT samplers over the same raw input — a history
    sampler at the fixed ``subsampling`` period and a frames sampler at
    the requested ``period`` (clamped to [subsampling, max_period]).
    When the period changes, the frames ring is rebuilt by decimating
    the history ring and the triggering block is consumed by the
    history sampler only (reference process -> update_period,
    ScaledMeterGraph.cpp:269-356).

    NOTE reference-verbatim divergence: the reference's rebuild reads
    the history ring with the ABSOLUTE-position ``read()`` accessor
    (ScaledMeterGraph.cpp:297) where the head-relative ``get()`` matches
    its own push discipline; we decimate head-relative."""

    def __init__(self, frames: int, period: int, subsampling: int,
                 method: MeterMethod = MeterMethod.ABS_MAXIMUM,
                 max_period: Optional[int] = None):
        self.subsampling = max(1, int(subsampling))
        self.max_period = int(max_period if max_period is not None
                              else max(int(period), self.subsampling))
        samples = int(frames) * self.max_period
        subframes = -(-samples // self.subsampling)
        self.history = _Sampler(subframes, self.subsampling)
        self.frames_s = _Sampler(int(frames), 1)
        self.frames_n = int(frames)
        self.method = method
        self._period = 0           # active frames-sampler period
        self.period = 0            # requested (set_period)
        self.set_period(period)

    def set_period(self, period: int) -> None:
        self.period = min(max(int(period), self.subsampling),
                          self.max_period)

    def _update_period(self) -> bool:
        """reference update_period (ScaledMeterGraph.cpp:269-340):
        flush the in-progress history frame, retarget the frames
        sampler, rebuild its ring by decimating history subframes."""
        if self.period == self._period:
            return False
        if self.history._fill > 0 and self.history._acc is not None:
            self.history.ring.push(self.history._acc)
            self.history._acc = None
            self.history._fill = 0
        self._period = self.period
        s = self.frames_s
        s.period = self._period
        s._acc = None
        s._fill = 0
        s.ring.clear()
        # decimate the history into whole frames
        per_frame = -(-self._period // self.subsampling)
        total = per_frame * self.frames_n
        hist = self.history.read(total)
        for i in range(self.frames_n):
            seg = hist[i * per_frame:(i + 1) * per_frame]
            acc = None
            for v in seg:
                acc = _sampler_accumulate(self.method, acc,
                                          np.array([v], np.float32), 1.0)
            s.ring.push(0.0 if acc is None else acc)
        return True

    def process(self, x, gain: float = 1.0) -> None:
        self.history.process(self.method, x, gain)
        if not self._update_period():
            self.frames_s.process(self.method, x, gain)

    def frames(self, n: int) -> np.ndarray:
        return self.frames_s.read(n)

    read = frames

    def level(self) -> float:
        return self.frames_s.ring.get(0)

    def fill(self, level: float) -> None:
        self.frames_s.ring.fill(level)
        self.frames_s._acc = None
        self.frames_s._fill = 0
        self.history.ring.fill(level)
        self.history._acc = None
        self.history._fill = 0


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
