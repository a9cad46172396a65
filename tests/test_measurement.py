"""Measurement units: LatencyDetector, ResponseTaker, SyncChirpProcessor."""

import numpy as np
import pytest

from lsp_dsp_units_tpu.models.util.latency_detector import LatencyDetector
from lsp_dsp_units_tpu.models.util.response_taker import ResponseTaker
from lsp_dsp_units_tpu.models.util.sync_chirp import SyncChirpProcessor
from lsp_dsp_units_tpu.models.sampling import Sample
from lsp_dsp_units_tpu.utils.units import snr_db

SR = 48000


def _simulate_loop(detector_out: np.ndarray, latency: int,
                   gain: float = 0.7, noise: float = 0.001,
                   seed: int = 0) -> np.ndarray:
    """Simulated round trip: delay + gain + noise."""
    rng = np.random.default_rng(seed)
    delayed = np.concatenate(
        [np.zeros(latency, np.float32), detector_out])[: detector_out.size]
    return (delayed * gain
            + noise * rng.standard_normal(detector_out.size)
            ).astype(np.float32)


@pytest.mark.parametrize("true_latency", [0, 37, 480, 2400])
def test_latency_detector(true_latency):
    ld = LatencyDetector(SR, duration_s=0.1, max_latency_s=0.1)
    ld.start_capture()
    blk = 512
    # drive the loop: play probe, feed back the delayed response
    played = []
    pending = np.zeros(0, np.float32)
    for _ in range(40):
        out = ld.process_out(blk)
        played.append(out)
        loop = np.concatenate(played)
        resp = _simulate_loop(loop, true_latency)
        # feed only the new block of response
        start = loop.size - blk
        ld.process_in(resp[start:start + blk])
        if ld.latency_detected():
            break
    assert ld.latency_detected(), "no latency detected"
    assert abs(ld.get_latency() - true_latency) <= 1, \
        (ld.get_latency(), true_latency)


def test_response_taker():
    """Emission and capture arm at the same instant (reference
    ResponseTaker.cpp:250-276), so a loopback with delay d peaks at
    index d of the capture — with pause chosen so the arming lands on a
    block boundary (fade 480 + pause 288 = 768 = 3 blocks)."""
    blk = 256
    latency = 300           # >= blk so the harness block-lag is covered
    rt = ResponseTaker(SR, pause_s=288.0 / SR, tail_s=0.05)
    test = Sample(1, 1000, SR)
    test.data[0, 0] = 1.0     # unit impulse test signal
    rt.reconfigure(test)
    rt.start_capture()

    dline = np.zeros(latency, np.float32)
    out = np.zeros(blk, np.float32)
    for _ in range(SR // blk):
        inbuf = np.empty(blk, np.float32)
        for i in range(blk):
            inbuf[i] = dline[0] * 0.5
            dline = np.roll(dline, -1)
            dline[-1] = out[i]
        out = rt.process(inbuf)
        if rt.cycle_complete:
            break
    resp_sample = rt.get_response()
    assert resp_sample is not None
    peak = int(np.argmax(np.abs(resp_sample.data[0])))
    # the one-block-lagged loopback adds blk to the observed latency
    # (same as the oracle harness in test_reference_oracle_wave3)
    assert peak == latency + blk
    assert abs(resp_sample.data[0][peak] - 0.5) < 1e-6


def test_sync_chirp_identity_system():
    """Measuring a known system (delay + gain) recovers its IR."""
    scp = SyncChirpProcessor(SR, duration_s=0.5, f_start=20.0,
                             f_end=20000.0)
    sweep = scp.sweep()
    delay, gain = 200, 0.6
    response = np.concatenate(
        [np.zeros(delay, np.float32), sweep * gain,
         np.zeros(1000, np.float32)])
    ir = scp.linear_ir(response, length=1000)
    peak = int(np.argmax(np.abs(ir)))
    # lag 0 sits at index 8 (the default pre-ring guard)
    assert abs(peak - (delay + 8)) <= 2
    # gain recovery is a spectral contract: the band-limited time peak
    # sits below the true gain (out-of-band energy is absent), but the
    # measured frequency response must read `gain` across the band
    H = np.abs(np.fft.rfft(ir, 1 << 13))
    freqs = np.fft.rfftfreq(1 << 13, 1.0 / SR)
    band = (freqs > 100) & (freqs < 15000)
    err_db = 20 * np.log10(H[band] / gain)
    assert np.abs(np.median(err_db)) < 0.1
    assert np.abs(err_db).max() < 1.0


def test_sync_chirp_edc_rt60():
    """EDC of an exponential decay gives back its RT60."""
    t = np.arange(SR) / SR
    rt60_true = 0.5
    ir = np.exp(-6.91 * t / rt60_true) * np.random.default_rng(
        0).standard_normal(SR)
    edc = SyncChirpProcessor.energy_decay(ir)
    assert edc[0] == 0.0
    rt = SyncChirpProcessor.rt60(edc, SR)
    assert abs(rt - rt60_true) < 0.1


def test_sync_chirp_harmonic_offset():
    scp = SyncChirpProcessor(SR, duration_s=1.0, f_start=20.0,
                             f_end=20000.0)
    # L = 1/ln(1000); offset of k=2 is L*ln2 seconds
    expect = scp.L * np.log(2.0) * SR
    assert abs(scp.harmonic_offset(2) - expect) < 1.0
