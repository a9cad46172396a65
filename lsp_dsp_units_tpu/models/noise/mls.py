"""MLS — maximum-length-sequence generator (LFSR)
(reference: src/main/noise/MLS.cpp; taps from Stahnke, "Primitive Binary
Polynomials", Math. Comp. 27(124), 1973 — same table the reference cites).

The LFSR recurrence is strictly sequential at 1 bit/sample; sequences are
generated host-side (numpy uint64) and cached per (n_bits, state) — an MLS
is periodic with period 2^n - 1, so one period is generated once and tiled
for bulk use.  Device-side consumers receive the float array.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

# Taps masks for n_bits = 1..64 (reference MLS.cpp vTapsMaskTable)
_TAPS = [
    1, 3, 3, 3,
    5, 3, 3, 99,
    17, 9, 5, 153,
    27, 6147, 3, 45,
    9, 129, 99, 9,
    5, 3, 33, 27,
    9, 387, 387, 9,
    5, 98307, 9, 402653187,
    8193, 49155, 5, 2049,
    5125, 99, 17, 2621445,
    9, 12582915, 99, 201326595,
    27, 3145731, 33, 402653187,
    513, 201326595, 98307, 9,
    98307, 206158430211, 16777217, 6291459,
    129, 524289, 6291459, 3,
    98307, 216172782113783811, 3, 27,
]

MAX_BITS = 64

# (n_bits, start_state) -> uint8 bit sequence of one full period
_PERIOD_CACHE: dict = {}


class MLS:
    def __init__(self, n_bits: int = 16, state: int = 0,
                 amplitude: float = 1.0, offset: float = 0.0):
        self.n_bits = int(np.clip(n_bits, 1, MAX_BITS))
        self.amplitude = float(amplitude)
        self.offset = float(offset)
        self._update(state)

    def _update(self, state: int) -> None:
        """(reference MLS::update_settings)"""
        n = self.n_bits
        self.feedback_bit = n - 1
        self.feedback_mask = 1 << self.feedback_bit
        self.active_mask = (1 << n) - 1 if n < MAX_BITS \
            else (1 << MAX_BITS) - 1
        self.taps_mask = _TAPS[n - 1]
        self.output_mask = 1
        s = state & self.active_mask
        self.state = s if s != 0 else self.active_mask

    def set_state(self, state: int) -> None:
        self._update(state)

    def get_period(self) -> int:
        return (1 << self.n_bits) - 1

    def progress(self) -> int:
        """One LFSR step, returns the output bit
        (reference MLS::progress)."""
        out = self.state & self.output_mask
        fb = bin(self.state & self.taps_mask).count("1") & 1
        self.state >>= 1
        self.state = (self.state & ~self.feedback_mask) \
            | (fb << self.feedback_bit)
        return out

    def process_single(self) -> float:
        return (self.amplitude if self.progress()
                else -self.amplitude) + self.offset

    def _run_bits(self, count: int) -> np.ndarray:
        """Tight-loop LFSR stepping returning the RAW bit sequence
        (uint8 0/1): local bindings + int.bit_count are ~20x the naive
        per-sample method-call path.  Advances state."""
        s = self.state
        taps = self.taps_mask
        fb_bit = self.feedback_bit
        keep = self.active_mask >> 1          # bits surviving the shift
        bits = bytearray(count)
        for i in range(count):
            bits[i] = s & 1
            fb = (s & taps).bit_count() & 1
            s = ((s >> 1) & keep) | (fb << fb_bit)
        self.state = s
        return np.frombuffer(bytes(bits), np.uint8)

    def _scale(self, raw: np.ndarray) -> np.ndarray:
        return (raw.astype(np.float32) * (2.0 * self.amplitude)
                - self.amplitude + self.offset)

    def process(self, count: int) -> np.ndarray:
        """Generate ``count`` bipolar samples (serial host loop; for
        bulk/tiled use prefer :meth:`full_period`, which is cached)."""
        return self._scale(self._run_bits(int(count)))

    def full_period(self) -> np.ndarray:
        """One full period from the current state, cached per
        (n_bits, state): the LFSR returns to its starting state after
        2^n - 1 steps, so the RAW bit sequence is generated once and
        scaled by the instance's amplitude/offset on every call
        (decoding bits back out of a scaled output would corrupt the
        cache for amplitude <= 0)."""
        key = (self.n_bits, self.state)
        raw = _PERIOD_CACHE.get(key)
        if raw is None:
            start = self.state
            raw = self._run_bits(self.get_period())
            assert self.state == start, "MLS period did not cycle"
            _PERIOD_CACHE[key] = raw
        return self._scale(raw)
