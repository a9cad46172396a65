"""ResponseTaker — capture impulse/test responses by playing a test
sample and recording the return (reference: src/main/util/ResponseTaker.cpp,
with the same ip/op state-machine pattern as LatencyDetector).
"""

from __future__ import annotations

import enum
from typing import List, Optional

import numpy as np

from lsp_dsp_units_tpu.models.sampling.sample import Sample


class RTState(enum.Enum):
    BYPASS = "bypass"
    WAIT = "wait"       # pre-roll silence
    EMIT = "emit"       # playing the test sample
    CAPTURE = "capture"  # recording the tail
    DONE = "done"


class ResponseTaker:
    def __init__(self, sample_rate: int = 48000, pre_silence_s: float = 0.1,
                 tail_s: float = 1.0):
        self.sample_rate = int(sample_rate)
        self.pre = int(sample_rate * pre_silence_s)
        self.tail = int(sample_rate * tail_s)
        self.test: Optional[Sample] = None
        self.state = RTState.BYPASS
        self._pos = 0
        self._captured: List[np.ndarray] = []
        self._cap_count = 0
        self.response: Optional[Sample] = None

    def set_test_sample(self, sample: Sample) -> None:
        self.test = sample

    def start_capture(self) -> None:
        assert self.test is not None, "bind a test sample first"
        self.state = RTState.WAIT
        self._pos = 0
        self._captured = []
        self._cap_count = 0
        self.response = None

    def capturing(self) -> bool:
        return self.state in (RTState.WAIT, RTState.EMIT, RTState.CAPTURE)

    def process_out(self, count: int) -> np.ndarray:
        out = np.zeros(count, np.float32)
        off = 0
        if self.state == RTState.WAIT:
            take = min(count, self.pre - self._pos)
            self._pos += take
            off = take
            if self._pos >= self.pre:
                self.state = RTState.EMIT
                self._pos = 0
        if self.state == RTState.EMIT and off < count:
            data = self.test.data[0]
            take = min(count - off, data.size - self._pos)
            out[off:off + take] = data[self._pos:self._pos + take]
            self._pos += take
            if self._pos >= data.size:
                self.state = RTState.CAPTURE
                self._pos = 0
        return out

    def process_in(self, x: np.ndarray) -> None:
        if not self.capturing():
            return
        self._captured.append(np.asarray(x, np.float32))
        self._cap_count += x.size
        total_needed = self.pre + self.test.data.shape[1] + self.tail
        if self._cap_count >= total_needed:
            rec = np.concatenate(self._captured)[:total_needed]
            # drop the pre-roll: the response is aligned to emission start
            resp = Sample(1, total_needed - self.pre, self.sample_rate)
            resp.data[0] = rec[self.pre:]
            self.response = resp
            self.state = RTState.DONE

    def process(self, x: np.ndarray) -> np.ndarray:
        self.process_in(x)
        return self.process_out(len(x))

    def get_response(self) -> Optional[Sample]:
        return self.response
