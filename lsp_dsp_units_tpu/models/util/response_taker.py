"""ResponseTaker — capture impulse/test responses by playing a test
sample and recording the return (reference: src/main/util/
ResponseTaker.cpp; parity: tests/test_reference_oracle_wave3.py).

Exact reference mechanics: the OUTPUT machine fades the passthrough out
(``fading`` seconds), pauses (``pause`` seconds of silence), emits the
test sample, then emits silence while the INPUT machine acquires
``test_len + tail + latency`` samples into the capture buffer — the
acquisition starts exactly when the test emission starts (the PAUSE ->
TEST_SIG_EMIT transition arms IP_ACQUIRE, ResponseTaker.cpp:250-276).
When the capture completes the output fades back in.  ``process(x)``
returns the passthrough output; the per-sample machines run on the host
(UI-rate control), the capture itself is a bulk copy.
"""

from __future__ import annotations

import enum
from typing import Optional

import numpy as np

from lsp_dsp_units_tpu.models.sampling.sample import Sample

DFL_FADE = 0.01
DFL_PAUSE = 0.5
DFL_TAIL = 1.0


class OpState(enum.Enum):
    BYPASS = "bypass"
    FADEOUT = "fadeout"
    PAUSE = "pause"
    EMIT = "emit"
    TAIL = "tail"
    FADEIN = "fadein"


class IpState(enum.Enum):
    BYPASS = "bypass"
    WAIT = "wait"
    ACQUIRE = "acquire"


class ResponseTaker:
    def __init__(self, sample_rate: int = 48000,
                 fading_s: float = DFL_FADE, pause_s: float = DFL_PAUSE,
                 tail_s: float = DFL_TAIL, latency_samples: int = 0):
        self.sample_rate = int(sample_rate)
        self.fade_n = int(sample_rate * fading_s)
        self.pause_n = int(sample_rate * pause_s)
        self.tail_n = int(sample_rate * tail_s)
        self.latency = int(latency_samples)
        # float32 accumulation like the reference: the fade length in
        # samples depends on the rounding of the repeated subtraction
        self.gain = np.float32(1.0)
        self.gain_delta = np.float32(1.0) / np.float32(self.fade_n + 1)
        self.test: Optional[Sample] = None
        self.op = OpState.BYPASS
        self.ip = IpState.BYPASS
        self._pause_left = 0
        self._emit_pos = 0
        self._acq_pos = 0
        self._capture: Optional[np.ndarray] = None
        self.cycle_complete = False

    # -- configuration (reference reconfigure/set_*) -----------------------
    def set_latency_samples(self, latency: int) -> None:
        self.latency = int(latency)

    def reconfigure(self, test: Sample) -> None:
        self.test = test
        n = test.length + self.tail_n + self.latency
        self._capture = np.zeros(n, np.float32)

    set_test_sample = reconfigure

    def start_capture(self) -> None:
        """reference ResponseTaker::start_capture (:344-359)."""
        assert self.test is not None, "reconfigure(test) first"
        self.ip = IpState.WAIT
        self.op = OpState.FADEOUT
        self._pause_left = 0
        self._emit_pos = 0
        self._acq_pos = 0
        self.cycle_complete = False

    def get_capture(self) -> Optional[np.ndarray]:
        return self._capture

    def get_response(self) -> Optional[Sample]:
        if self._capture is None:
            return None
        s = Sample(1, self._capture.size, self.sample_rate)
        s.data[0] = self._capture
        return s

    # -- streaming (reference process/process_in/process_out) ---------------
    def process_in(self, x: np.ndarray) -> np.ndarray:
        """Consume captured input; returns the passthrough copy."""
        x = np.asarray(x, np.float32)
        pos = 0
        n = x.size
        while pos < n:
            if self.ip == IpState.ACQUIRE:
                take = min(self._capture.size - self._acq_pos, n - pos)
                self._capture[self._acq_pos:self._acq_pos + take] = \
                    x[pos:pos + take]
                self._acq_pos += take
                pos += take
                if self._acq_pos >= self._capture.size:
                    self.ip = IpState.BYPASS
                    self.op = OpState.FADEIN
                    self.cycle_complete = True
            else:
                break
        return x

    def process_out(self, src: np.ndarray) -> np.ndarray:
        """Output machine over the passthrough signal ``src``."""
        src = np.asarray(src, np.float32)
        out = np.empty_like(src)
        n = src.size
        pos = 0
        while pos < n:
            if self.op == OpState.FADEOUT:
                while pos < n:
                    self.gain = np.float32(self.gain - self.gain_delta)
                    if self.gain <= 0.0:
                        self.gain = np.float32(0.0)
                        self._pause_left = self.pause_n
                        self.op = OpState.PAUSE
                        break
                    out[pos] = src[pos] * self.gain
                    pos += 1
            elif self.op == OpState.PAUSE:
                take = min(self._pause_left, n - pos)
                out[pos:pos + take] = 0.0
                self._pause_left -= take
                pos += take
                if self._pause_left <= 0:
                    self.op = OpState.EMIT
                    self._emit_pos = 0
                    self.ip = IpState.ACQUIRE
                    self._acq_pos = 0
            elif self.op == OpState.EMIT:
                data = self.test.data[0]
                take = min(data.size - self._emit_pos, n - pos)
                out[pos:pos + take] = data[self._emit_pos:
                                           self._emit_pos + take]
                self._emit_pos += take
                pos += take
                if self._emit_pos >= data.size:
                    self.op = OpState.TAIL
            elif self.op == OpState.TAIL:
                out[pos:n] = 0.0
                pos = n
            elif self.op == OpState.FADEIN:
                while pos < n:
                    self.gain = np.float32(self.gain + self.gain_delta)
                    if self.gain >= 1.0:
                        self.gain = np.float32(1.0)
                        self.op = OpState.BYPASS
                        break
                    out[pos] = src[pos] * self.gain
                    pos += 1
            else:  # BYPASS
                out[pos:n] = src[pos:n]
                pos = n
        return out

    def process(self, x: np.ndarray) -> np.ndarray:
        """reference ResponseTaker::process: capture the input, then run
        the output machine over it (passthrough when idle)."""
        y = self.process_in(x)
        return self.process_out(y)
