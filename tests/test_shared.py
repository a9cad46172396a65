"""Shared-memory IPC tests — the reference's oracle pattern: open writer
and reader on the same shm id IN ONE PROCESS and stream through the real
shared segment (reference utest/shared/audiostream.cpp:30-62,403-404;
catalog.cpp) — no fork, no fake backend."""

import os

import numpy as np
import pytest

from lsp_dsp_units_tpu.shared import AudioStream, Catalog

UID = f"/lsptpu_test_{os.getpid()}"


def test_audio_stream_roundtrip():
    w = AudioStream.create(UID + "_as", channels=2, length=4096)
    try:
        r = AudioStream.open(UID + "_as")
        assert r.channels == 2
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 512)).astype(np.float32)
        assert w.write(x) == 512
        assert r.avail() == 512
        y = r.read(512)
        np.testing.assert_allclose(y, x, atol=1e-7)
        assert r.avail() == 0
        # second block continues the stream
        x2 = rng.standard_normal((2, 300)).astype(np.float32)
        w.write(x2)
        y2 = r.read(300)
        np.testing.assert_allclose(y2, x2, atol=1e-7)
        r.close()
    finally:
        w.close()


def test_audio_stream_sanitizes():
    w = AudioStream.create(UID + "_sa", channels=1, length=1024)
    try:
        r = AudioStream.open(UID + "_sa")
        x = np.array([[1.0, np.nan, np.inf, -np.inf, 1e-38, 0.5]],
                     np.float32)
        w.write(x)
        y = r.read(6)
        np.testing.assert_array_equal(y[0], [1.0, 0.0, 0.0, 0.0, 0.0, 0.5])
        r.close()
    finally:
        w.close()


def test_audio_stream_ring_wrap():
    w = AudioStream.create(UID + "_wr", channels=1, length=256)
    try:
        r = AudioStream.open(UID + "_wr")
        total_in = []
        total_out = []
        rng = np.random.default_rng(1)
        for _ in range(20):
            x = rng.standard_normal((1, 100)).astype(np.float32)
            n = w.write(x)
            total_in.append(x[:, :n])
            total_out.append(r.read(n))
        np.testing.assert_allclose(np.concatenate(total_out, axis=1),
                                   np.concatenate(total_in, axis=1),
                                   atol=1e-7)
        r.close()
    finally:
        w.close()


def test_audio_stream_overrun_detection():
    w = AudioStream.create(UID + "_ov", channels=1, length=128)
    try:
        r = AudioStream.open(UID + "_ov")
        # write far more than the ring without reading
        for i in range(10):
            w.write(np.full((1, 64), float(i), np.float32))
        # reader must skip ahead (overrun) and still produce recent data
        y = r.read(64)
        assert y.shape[1] > 0
        assert y[0, -1] >= 8.0  # data from recent blocks
        r.close()
    finally:
        w.close()


def test_audio_stream_terminate_flag():
    w = AudioStream.create(UID + "_tm", channels=1, length=64)
    try:
        r = AudioStream.open(UID + "_tm")
        assert not r.terminated()
        w.terminate()
        assert r.terminated()
        r.close()
    finally:
        w.close()


def test_catalog():
    cat = Catalog(UID + "_cat", max_records=16)
    try:
        rev0 = cat.revision()
        assert cat.publish("drums", UID + "_s1")
        assert cat.publish("vox", UID + "_s2")
        assert cat.revision() > rev0
        assert cat.get("drums") == UID + "_s1"
        assert cat.get("missing") is None
        assert sorted(cat.enumerate()) == ["drums", "vox"]
        # a second handle (same process, same segment) sees the records
        cat2 = Catalog(UID + "_cat", max_records=16)
        assert cat2.get("vox") == UID + "_s2"
        cat2.close()
        # update in place bumps revision, not record count
        assert cat.publish("drums", UID + "_s3")
        assert cat.get("drums") == UID + "_s3"
        assert len(cat.enumerate()) == 2
        assert cat.erase("drums")
        assert cat.get("drums") is None
        cat.keep_alive("vox")
    finally:
        cat.close(unlink=True)


def test_catalog_stream_discovery_flow():
    """Publish a stream id via the catalog, discover and open it — the
    full producer/consumer handshake."""
    cat = Catalog(UID + "_flow", max_records=8)
    w = AudioStream.create(UID + "_flow_audio", channels=1, length=1024)
    try:
        cat.publish("main_out", UID + "_flow_audio")
        sid = cat.get("main_out")
        r = AudioStream.open(sid)
        x = np.ones((1, 16), np.float32) * 0.25
        w.write(x)
        np.testing.assert_allclose(r.read(16), x)
        r.close()
    finally:
        w.close()
        cat.close(unlink=True)


def test_stream_engine_pump():
    """StreamEngine (csrc/stream_engine.cpp): gather blocks from several
    shm rings into one batch, process, scatter back."""
    from lsp_dsp_units_tpu.shared import AudioStream, StreamEngine

    block, rows = 128, 6
    eng = StreamEngine(block=block, rows=rows)
    ins, outs, readers = [], [], []
    try:
        for i in range(2):
            ins.append(AudioStream.create(f"/lsp_se_in{i}_{os.getpid()}",
                                          2, 1024))
            outs.append(AudioStream.create(f"/lsp_se_out{i}_{os.getpid()}",
                                           2, 1024))
            eng.bind(ins[i], outs[i], row=2 * i, channels=2)
        # overlapping bind must fail
        with pytest.raises(ValueError):
            eng.bind(ins[0], outs[0], row=1, channels=2)
        # out-of-range bind must fail
        with pytest.raises(ValueError):
            eng.bind(ins[0], outs[0], row=5, channels=2)
        # channel-count mismatch must fail (stream_engine.cpp se_bind
        # rc -3): a 2-channel stream bound to a 1-channel slot would
        # make se_gather write stream_channels*block floats past the
        # batch row
        with pytest.raises(ValueError, match="channel count"):
            eng.bind(ins[0], outs[0], row=4, channels=1)

        assert eng.ready() == 0
        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((2, block)).astype(np.float32)
        x1 = rng.standard_normal((2, block)).astype(np.float32)
        ins[0].write(x0)
        assert eng.ready() == 1
        ins[1].write(x1)
        assert eng.wait(min_ready=2, timeout_ms=10) == 2

        batch = eng.gather()
        assert batch.shape == (rows, block)
        np.testing.assert_allclose(batch[0:2], x0, atol=1e-7)
        np.testing.assert_allclose(batch[2:4], x1, atol=1e-7)
        np.testing.assert_array_equal(batch[4:], 0.0)   # unbound rows

        # process (host math stands in for the jitted step) and scatter
        eng.scatter(batch * 0.5)
        readers = [AudioStream.open(f"/lsp_se_out{i}_{os.getpid()}")
                   for i in range(2)]
        # readers attach at current head; scatter again so they see data
        ins[0].write(x0)
        ins[1].write(x1)
        eng.gather()
        eng.scatter(batch * 0.5)
        got = readers[0].read(block)
        np.testing.assert_allclose(got, 0.5 * x0, atol=1e-6)

        # underrun: no fresh input -> zero-filled, counted
        assert eng.ready() == 0
        empty = eng.gather()
        np.testing.assert_array_equal(empty[0:2], 0.0)
        g, u = eng.stats()
        assert g == 4 and u == 2

        # termination surfaces through wait
        ins[0].terminate()
        assert eng.wait(min_ready=1, timeout_ms=5) == -1
    finally:
        eng.close()
        for s in ins + outs + readers:
            s.close()


def test_audio_stream_partial_read_multichannel_aligned():
    """Reading MORE than available from a multi-channel stream must
    return correctly-strided channel rows (as_read packs at stride=got;
    the wrapper used to slice a [C, frames] array and smear channels)."""
    w = AudioStream.create(UID + "_pr", channels=2, length=4096)
    r = AudioStream.open(UID + "_pr")
    data = np.stack([np.arange(100, dtype=np.float32),
                     np.arange(100, 200, dtype=np.float32)])
    w.write(data)
    got = r.read(256)                      # ask for more than available
    assert got.shape == (2, 100)
    np.testing.assert_array_equal(got, data)
    for s in (w, r):
        s.close()


def test_audio_stream_write_channel_mismatch_raises():
    """write() must reject arrays with the wrong channel count instead
    of letting as_write read past the end of the buffer."""
    import pytest
    w = AudioStream.create(UID + "_wc", channels=2, length=1024)
    with pytest.raises(ValueError, match="channel"):
        w.write(np.zeros(512, np.float32))          # mono into 2ch
    with pytest.raises(ValueError, match="channel"):
        w.write(np.zeros((3, 128), np.float32))     # 3ch into 2ch
    w.write(np.zeros((2, 128), np.float32))         # correct: ok
    w.close()


def test_stream_engine_rejects_undersized_ring():
    """Binding a ring that cannot hold one engine block must fail loudly
    (as_write clamps to length/2, which would silently truncate every
    scatter)."""
    import pytest
    from lsp_dsp_units_tpu.shared import StreamEngine
    eng = StreamEngine(block=4096, rows=1)
    small = AudioStream.create(UID + "_sm", channels=1, length=4096)
    with pytest.raises(ValueError, match="length >= 2\\*block"):
        eng.bind(out_stream=small, row=0, channels=1)
    big = AudioStream.create(UID + "_bg", channels=1, length=8192)
    eng.bind(out_stream=big, row=0, channels=1)     # ok
    for s in (small, big):
        s.close()
    eng.close()


def test_stream_engine_rejects_channel_mismatch():
    """Binding a stream whose own channel count differs from the slot's
    `channels` must fail loudly: as_read/as_write copy
    stream_channels*block floats based on the stream's header, so a
    mismatch would read/write past the slot's row range (heap overflow)."""
    import pytest
    from lsp_dsp_units_tpu.shared import StreamEngine
    eng = StreamEngine(block=128, rows=4)
    three = AudioStream.create(UID + "_c3", channels=3, length=1024)
    with pytest.raises(ValueError, match="channel count"):
        eng.bind(in_stream=three, row=0, channels=2)
    with pytest.raises(ValueError, match="channel count"):
        eng.bind(out_stream=three, row=0, channels=4)
    eng.bind(in_stream=three, row=0, channels=3)    # exact match ok
    three.close()
    eng.close()
