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
    rt = ResponseTaker(SR, pre_silence_s=0.01, tail_s=0.05)
    test = Sample(1, 1000, SR)
    test.data[0, 0] = 1.0     # unit impulse test signal
    rt.set_test_sample(test)
    rt.start_capture()

    blk = 256
    played = []
    latency = 100
    while rt.capturing():
        out = rt.process_out(blk)
        played.append(out)
        loop = np.concatenate(played)
        resp = _simulate_loop(loop, latency, gain=0.5, noise=0.0)
        rt.process_in(resp[loop.size - blk: loop.size])
    resp_sample = rt.get_response()
    assert resp_sample is not None
    # the captured response contains the impulse at `latency`
    peak = int(np.argmax(np.abs(resp_sample.data[0])))
    assert abs(peak - latency) <= 1


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
