"""shared/ — native shared-memory IPC layer
(reference: src/main/shared/AudioStream.cpp, Catalog.cpp — SURVEY.md §2.6).

The C++ runtime (csrc/shm_runtime.cpp) provides a lock-free POSIX-shm
audio ring and a shared name registry; this module compiles it on demand
(g++ is in the image; pybind11 is not, so the binding is ctypes over a C
ABI) and wraps it in Python classes.

Scope note: this is the HOST-side transport between processes feeding
the JAX compute process.  Chip-to-chip transport is jax.sharding
collectives (parallel/), which replace the reference's single-machine
IPC for scaling (SURVEY.md §2.12).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_LOCK = threading.Lock()


def _build_lib() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    srcs = [os.path.join(root, "csrc", "shm_runtime.cpp"),
            os.path.join(root, "csrc", "stream_engine.cpp")]
    out = os.path.join(root, "csrc", "libshm_runtime.so")
    if (not os.path.exists(out)
            or any(os.path.getmtime(out) < os.path.getmtime(s)
                   for s in srcs)):
        cmd = (["g++", "-O2", "-fPIC", "-shared", "-std=c++17"] + srcs +
               ["-o", out, "-lpthread", "-lrt"])
        subprocess.run(cmd, check=True, capture_output=True)
    return out


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_lib())
            lib.as_create.restype = ctypes.c_void_p
            lib.as_create.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                      ctypes.c_uint32]
            lib.as_open.restype = ctypes.c_void_p
            lib.as_open.argtypes = [ctypes.c_char_p]
            lib.as_channels.restype = ctypes.c_uint32
            lib.as_channels.argtypes = [ctypes.c_void_p]
            lib.as_length.restype = ctypes.c_uint32
            lib.as_length.argtypes = [ctypes.c_void_p]
            lib.as_write.restype = ctypes.c_int
            lib.as_write.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_uint32]
            lib.as_read.restype = ctypes.c_int
            lib.as_read.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_uint32]
            lib.as_avail.restype = ctypes.c_uint64
            lib.as_avail.argtypes = [ctypes.c_void_p]
            lib.as_counter.restype = ctypes.c_uint64
            lib.as_counter.argtypes = [ctypes.c_void_p]
            lib.as_terminate.argtypes = [ctypes.c_void_p]
            lib.as_terminated.restype = ctypes.c_int
            lib.as_terminated.argtypes = [ctypes.c_void_p]
            lib.as_close.argtypes = [ctypes.c_void_p]
            lib.cat_open.restype = ctypes.c_void_p
            lib.cat_open.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
            lib.cat_publish.restype = ctypes.c_int
            lib.cat_publish.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_char_p]
            lib.cat_get.restype = ctypes.c_int
            lib.cat_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_char_p, ctypes.c_uint32]
            lib.cat_erase.restype = ctypes.c_int
            lib.cat_erase.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.cat_enumerate.restype = ctypes.c_int
            lib.cat_enumerate.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                          ctypes.c_uint32]
            lib.cat_revision.restype = ctypes.c_uint32
            lib.cat_revision.argtypes = [ctypes.c_void_p]
            lib.cat_keepalive.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            lib.cat_close.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.se_create.restype = ctypes.c_void_p
            lib.se_create.argtypes = [ctypes.c_uint32, ctypes.c_uint32]
            lib.se_bind.restype = ctypes.c_int
            lib.se_bind.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_void_p, ctypes.c_uint32,
                                    ctypes.c_uint32]
            lib.se_ready.restype = ctypes.c_int
            lib.se_ready.argtypes = [ctypes.c_void_p]
            lib.se_wait.restype = ctypes.c_int
            lib.se_wait.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                    ctypes.c_uint32]
            lib.se_gather.restype = ctypes.c_int
            lib.se_gather.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_float)]
            lib.se_scatter.restype = ctypes.c_int
            lib.se_scatter.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_float)]
            lib.se_stats.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_uint64),
                                     ctypes.POINTER(ctypes.c_uint64)]
            lib.se_destroy.argtypes = [ctypes.c_void_p]
            _LIB = lib
    return _LIB


class AudioStream:
    """Lock-free shared-memory audio ring (reference AudioStream.cpp).

    Writer: ``AudioStream.create(id, channels, length)``; readers:
    ``AudioStream.open(id)``.  Data is planar float32 [channels, frames];
    NaN/Inf/denormals are sanitized at the boundary (reference
    read_sanitized/write_sanitized)."""

    def __init__(self, handle, lib):
        self._h = handle
        self._lib = lib

    @classmethod
    def create(cls, shm_id: str, channels: int, length: int,
               ) -> "AudioStream":
        lib = _lib()
        h = lib.as_create(shm_id.encode(), channels, length)
        if not h:
            raise OSError(f"cannot create audio stream {shm_id}")
        return cls(h, lib)

    @classmethod
    def open(cls, shm_id: str) -> "AudioStream":
        lib = _lib()
        h = lib.as_open(shm_id.encode())
        if not h:
            raise OSError(f"cannot open audio stream {shm_id}")
        return cls(h, lib)

    @property
    def channels(self) -> int:
        return self._lib.as_channels(self._h)

    @property
    def length(self) -> int:
        return self._lib.as_length(self._h)

    def write(self, data: np.ndarray) -> int:
        data = np.ascontiguousarray(data, np.float32)
        if data.ndim == 1:
            data = data[None]
        c = self.channels
        if data.shape[0] != c:
            # as_write reads channels*frames floats unconditionally — a
            # short array would make it read past the buffer end
            raise ValueError(f"write expects {c} channel rows, "
                             f"got {data.shape[0]}")
        frames = data.shape[1]
        max_blk = self.length // 2
        if frames > max_blk:
            # as_write clamps frames to length/2 but strides the CALLER
            # buffer by the clamped count — channels >= 1 would be read
            # from the wrong rows, silently scrambling the audio
            raise ValueError(
                f"write block of {frames} frames exceeds the stream's "
                f"max block ({max_blk} = length/2); split the write")
        ptr = data.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        return self._lib.as_write(self._h, ptr, frames)

    def read(self, frames: int) -> np.ndarray:
        c = self.channels
        # as_read packs channel k at flat offset k*got (got = frames
        # actually read), so read into a flat buffer and re-stride after
        # the call — slicing a [C, frames] array would misalign every
        # channel past the first on a partial read
        out = np.zeros(c * frames, np.float32)
        ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        got = self._lib.as_read(self._h, ptr, frames)
        return out[: c * got].reshape(c, got)

    def avail(self) -> int:
        return self._lib.as_avail(self._h)

    def counter(self) -> int:
        return self._lib.as_counter(self._h)

    def terminate(self) -> None:
        self._lib.as_terminate(self._h)

    def terminated(self) -> bool:
        return bool(self._lib.as_terminated(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.as_close(self._h)
            self._h = None


class Catalog:
    """Shared-memory name registry of published streams
    (reference Catalog.cpp: publish/get/erase/enumerate + revision)."""

    def __init__(self, shm_id: str, max_records: int = 256):
        self._lib = _lib()
        self._h = self._lib.cat_open(shm_id.encode(), max_records)
        if not self._h:
            raise OSError(f"cannot open catalog {shm_id}")

    def publish(self, name: str, shm_id: str) -> bool:
        return bool(self._lib.cat_publish(self._h, name.encode(),
                                          shm_id.encode()))

    def get(self, name: str) -> Optional[str]:
        buf = ctypes.create_string_buffer(256)
        if self._lib.cat_get(self._h, name.encode(), buf, 256):
            return buf.value.decode()
        return None

    def erase(self, name: str) -> bool:
        return bool(self._lib.cat_erase(self._h, name.encode()))

    def enumerate(self) -> List[str]:
        buf = ctypes.create_string_buffer(65536)
        self._lib.cat_enumerate(self._h, buf, 65536)
        txt = buf.value.decode()
        return [n for n in txt.split("\n") if n]

    def keep_alive(self, name: str) -> None:
        self._lib.cat_keepalive(self._h, name.encode())

    def revision(self) -> int:
        return self._lib.cat_revision(self._h)

    def close(self, unlink: bool = False) -> None:
        if self._h:
            self._lib.cat_close(self._h, 1 if unlink else 0)
            self._h = None


class StreamEngine:
    """Native batching pump (csrc/stream_engine.cpp): binds shm audio
    rings to row ranges of one [rows, block] batch so MANY streams feed
    a single jitted device step — the TPU-native replacement for the
    reference's per-instance CPU processing loop.

    Typical loop::

        eng = StreamEngine(block=4096, rows=64)
        eng.bind(in_stream=a, out_stream=b, row=0, channels=2)
        ...
        while eng.wait(min_ready=1, timeout_ms=100) > 0:
            batch = eng.gather()               # [rows, block] np.float32
            state, y = jitted_step(params, state, jnp.asarray(batch))
            eng.scatter(np.asarray(y))
    """

    def __init__(self, block: int, rows: int):
        self._lib = _lib()
        self._h = self._lib.se_create(block, rows)
        if not self._h:
            raise RuntimeError("se_create failed")
        self.block = int(block)
        self.rows = int(rows)
        self._bound = []          # keep stream objects alive

    def bind(self, in_stream: Optional[AudioStream] = None,
             out_stream: Optional[AudioStream] = None, row: int = 0,
             channels: int = 1) -> int:
        ih = in_stream._h if in_stream is not None else None
        oh = out_stream._h if out_stream is not None else None
        slot = self._lib.se_bind(self._h, ih, oh, row, channels)
        if slot == -2:
            raise ValueError(
                "stream ring too small for the engine block: as_write "
                "clamps each call to length/2, so create streams with "
                "length >= 2*block")
        if slot == -3:
            raise ValueError(
                "stream channel count does not match the slot's "
                f"channels={channels}: gather/scatter copy "
                "stream_channels*block floats, so a mismatch would "
                "overflow the slot's row range")
        if slot < 0:
            raise ValueError(
                f"bad bind: rows [{row}, {row + channels}) out of range "
                f"or overlapping an existing slot")
        self._bound.append((in_stream, out_stream))
        return slot

    def ready(self) -> int:
        return self._lib.se_ready(self._h)

    def wait(self, min_ready: int = 1, timeout_ms: float = 100.0) -> int:
        """Ready count (>=0), or -1 if a bound input terminated."""
        return self._lib.se_wait(self._h, min_ready,
                                 int(timeout_ms * 1000))

    def gather(self) -> np.ndarray:
        """One block from every ready input into a fresh [rows, block]
        batch; underruns and unbound rows are zeroed.

        A NEW array is returned each call: callers hand the batch to
        jnp.asarray / jit, and JAX's CPU backend may alias the numpy
        buffer zero-copy — re-gathering into a shared buffer would
        retroactively corrupt the block the device is still reading."""
        batch = np.zeros((self.rows, self.block), np.float32)
        self._lib.se_gather(
            self._h,
            batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return batch

    def scatter(self, batch: np.ndarray) -> int:
        batch = np.ascontiguousarray(batch, np.float32)
        assert batch.shape == (self.rows, self.block), batch.shape
        return self._lib.se_scatter(
            self._h,
            batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))

    def stats(self) -> Tuple[int, int]:
        """(blocks gathered, underruns)."""
        g = ctypes.c_uint64()
        u = ctypes.c_uint64()
        self._lib.se_stats(self._h, ctypes.byref(g), ctypes.byref(u))
        return int(g.value), int(u.value)

    def close(self) -> None:
        if self._h:
            self._lib.se_destroy(self._h)
            self._h = None
            self._bound = []
