"""Reference-in-the-loop oracle for parity tests.

Compiles the GENUINE reference filter design layer
(/root/reference/src/main/filters/Filter.cpp + FilterBank.cpp) in place
against minimal stub headers (stubs/), and wraps it in ctypes.  Tests
use it to validate this framework's ``design.py`` against the actual
reference implementation — the strongest available oracle (BASELINE.md
north star: >=95 dB SNR vs reference output).

Skips cleanly (``available() -> False``) when /root/reference or g++ is
absent, so the suite stays green outside this environment.
"""

from __future__ import annotations

import ctypes
import os
import re
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

REFERENCE_ROOT = "/root/reference"
_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libref_oracle.so")

_REF_SOURCES = [
    os.path.join(REFERENCE_ROOT, "src/main/filters/Filter.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/filters/FilterBank.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/iface/IStateDumper.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/dynamics/Compressor.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/dynamics/Expander.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/dynamics/Gate.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/dynamics/Limiter.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/misc/interpolation.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/Delay.cpp"),
    # wave 2: FFT-layer units + pure math + noise + ctl + stat
    os.path.join(REFERENCE_ROOT, "src/main/dynamics/AutoGain.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/dynamics/SimpleAutoGain.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/dynamics/DynamicProcessor.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/dynamics/SurgeProtector.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/filters/Equalizer.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/filters/ButterworthFilter.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/filters/SpectralTilt.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/Convolver.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/SpectralProcessor.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/Sidechain.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/RingBuffer.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/RawRingBuffer.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/Randomizer.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/Dither.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/misc/windows.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/misc/envelope.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/misc/fade.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/misc/fft_crossover.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/misc/lfo.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/misc/sigmoid.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/misc/broadcast.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/noise/LCG.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/noise/MLS.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/noise/Velvet.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/ctl/Bypass.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/ctl/Blink.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/ctl/Counter.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/ctl/Crossfade.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/ctl/Toggle.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/stat/QuantizedCounter.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/Crossover.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/meters/Correlometer.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/meters/Panometer.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/meters/LoudnessMeter.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/meters/ILUFSMeter.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/meters/PeakMeter.cpp"),
    # wave 3: behavioral state machines + graph decimators
    os.path.join(REFERENCE_ROOT, "src/main/util/ADSREnvelope.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/Trigger.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/MeterGraph.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/ScaledMeterGraph.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/DynamicDelay.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/Depopper.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/ShiftBuffer.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/filters/DynamicFilters.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/SpectralSplitter.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/MultiSpectralProcessor.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/FFTCrossover.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/Oversampler.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/meters/TruePeakMeter.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/Oscillator.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/sampling/SamplePlayer.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/sampling/Playback.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/sampling/PlaySettings.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/sampling/helpers/playback.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/sampling/helpers/batch.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/LatencyDetector.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/ResponseTaker.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/Analyzer.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/util/SyncChirpProcessor.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/sampling/Sample.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/3d/raytrace.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/sampling/InSampleStream.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/3d/Allocator.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/3d/bsp/context.cpp"),
    # wave 4: the full genuine ray-tracing pipeline + noise facade
    os.path.join(REFERENCE_ROOT, "src/main/noise/Generator.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/3d/rt/context.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/3d/rt/mesh.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/3d/rt/plan.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/3d/RayTrace3D.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/3d/Scene3D.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/3d/Object3D.cpp"),
    # wave 4b: the LAST 2 of the 82 implementation files — the shm IPC
    # layer, over POSIX-shm ipc:: stubs (driven writer+reader in one
    # process like the reference's own utest)
    os.path.join(REFERENCE_ROOT, "src/main/shared/AudioStream.cpp"),
    os.path.join(REFERENCE_ROOT, "src/main/shared/Catalog.cpp"),
]

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_BUILD_ERR: Optional[str] = None


def available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "src"))


def _build() -> str:
    srcs = [os.path.join(_HERE, "oracle.cpp"),
            os.path.join(_HERE, "oracle2.cpp"),
            os.path.join(_HERE, "oracle3.cpp"),
            os.path.join(_HERE, "oracle4.cpp"),
            os.path.join(_HERE, "dsp_stub2.cpp"),
            os.path.join(_HERE, "dsp_stub3.cpp"),
            os.path.join(_HERE, "dsp_stub4.cpp")] + _REF_SOURCES
    if os.path.exists(_LIB_PATH) and all(
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(s)
            for s in srcs if os.path.exists(s)):
        return _LIB_PATH
    cmd = [
        "g++", "-O2", "-fPIC", "-shared", "-std=c++17",
        "-ffp-contract=off",  # plain IEEE ops: deterministic f32 recurrences
        "-DLSP_DSP_UNITS_BUILTIN",
        "-I", os.path.join(_HERE, "stubs"),
        "-I", os.path.join(REFERENCE_ROOT, "include"),
    ] + srcs + ["-o", _LIB_PATH]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"oracle build failed:\n{proc.stderr[-4000:]}")
    return _LIB_PATH


def _lib() -> ctypes.CDLL:
    global _LIB, _BUILD_ERR
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _BUILD_ERR is not None:
            raise RuntimeError(_BUILD_ERR)
        try:
            lib = ctypes.CDLL(_build())
        except Exception as e:          # remember: don't retry every test
            _BUILD_ERR = str(e)
            raise
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.ref_filter_design.restype = ctypes.c_int
        lib.ref_filter_design.argtypes = [
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_uint32, f32p, ctypes.c_int, i32p]
        lib.ref_filter_process.restype = ctypes.c_int
        lib.ref_filter_process.argtypes = [
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_uint32, f32p, f32p, ctypes.c_int, ctypes.c_int]
        u32, i32, f32 = ctypes.c_uint32, ctypes.c_int, ctypes.c_float
        lib.ref_compressor_process.restype = ctypes.c_int
        lib.ref_compressor_process.argtypes = [
            u32, f32, f32, f32, f32, f32, f32, f32, f32, u32,
            f32p, f32p, f32p, i32]
        lib.ref_compressor_curve.restype = ctypes.c_int
        lib.ref_compressor_curve.argtypes = [
            u32, f32, f32, f32, f32, f32, f32, f32, f32, u32,
            f32p, f32p, f32p, i32]
        lib.ref_expander_process.restype = ctypes.c_int
        lib.ref_expander_process.argtypes = [
            u32, f32, f32, f32, f32, f32, f32, f32, u32,
            f32p, f32p, f32p, i32]
        lib.ref_gate_process.restype = ctypes.c_int
        lib.ref_gate_process.argtypes = [
            f32, f32, f32, f32, f32, f32, f32, f32, u32,
            f32p, f32p, f32p, i32]
        lib.ref_limiter_process.restype = ctypes.c_int
        lib.ref_limiter_process.argtypes = [
            u32, f32, f32, f32, f32, f32, i32, f32, f32, f32, u32,
            f32p, f32p, i32, i32, ctypes.POINTER(ctypes.c_int)]
        lib.ref_cascade_process.restype = ctypes.c_int
        lib.ref_cascade_process.argtypes = [
            f32p, ctypes.c_int, f32p, f32p, ctypes.c_int]
        u64 = ctypes.c_uint64
        lib.ref_spectral_tilt.restype = ctypes.c_int
        lib.ref_spectral_tilt.argtypes = [u32, f32, u32, u32, f32, f32,
                                          u32, f32p, f32p, i32, i32]
        lib.ref_butterworth.restype = ctypes.c_int
        lib.ref_butterworth.argtypes = [u32, u32, f32, u32, f32p, f32p,
                                        i32, i32]
        lib.ref_dynproc_process.restype = ctypes.c_int
        lib.ref_dynproc_process.argtypes = [f32p, f32p, f32p, f32p, f32p,
                                            f32, f32, u32, f32p, f32p,
                                            f32p, i32, f32p, f32p, f32p,
                                            i32]
        lib.ref_autogain.restype = ctypes.c_int
        lib.ref_autogain.argtypes = [f32, f32, f32, f32, f32, f32, f32,
                                     i32, u32, f32p, f32p, f32, f32p, i32]
        lib.ref_simple_autogain.restype = ctypes.c_int
        lib.ref_simple_autogain.argtypes = [f32, f32, f32, f32, f32, u32,
                                            f32p, f32p, i32]
        lib.ref_surge_protector.restype = ctypes.c_int
        lib.ref_surge_protector.argtypes = [f32, f32, u32, u32, f32p,
                                            f32p, i32]
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.ref_correlometer.restype = ctypes.c_int
        lib.ref_correlometer.argtypes = [u32, u32, f32p, f32p, f32p,
                                         i32, i32]
        lib.ref_panometer.restype = ctypes.c_int
        lib.ref_panometer.argtypes = [u32, u32, u32, f32, f32p, f32p,
                                      f32p, i32, i32]
        lib.ref_loudness_meter.restype = ctypes.c_int
        lib.ref_loudness_meter.argtypes = [f32, u32, u32, f32p, f32p,
                                           f32p, i32, i32]
        lib.ref_ilufs_meter.restype = ctypes.c_int
        lib.ref_ilufs_meter.argtypes = [f32, u32, u32, f32p, f32p, f32p,
                                        i32, i32]
        lib.ref_crossover.restype = ctypes.c_int
        lib.ref_crossover.argtypes = [i32, f32p, u32p, u32, f32p, f32p,
                                      i32, i32]
        lib.ref_mls.restype = ctypes.c_int
        lib.ref_mls.argtypes = [u32, u64, f32, f32, f32p, i32]
        lib.ref_lcg.restype = ctypes.c_int
        lib.ref_lcg.argtypes = [u32, u32, f32, f32, f32p, i32]
        lib.ref_velvet.restype = ctypes.c_int
        lib.ref_velvet.argtypes = [u32, u32, u32, u32, u64, f32, f32,
                                   f32, f32, i32, f32, u32, f32p, i32]
        lib.ref_randomizer.restype = ctypes.c_int
        lib.ref_randomizer.argtypes = [u32, u32, f32p, i32]
        lib.ref_window.restype = ctypes.c_int
        lib.ref_window.argtypes = [u32, f32p, i32]
        lib.ref_lfo.restype = ctypes.c_int
        lib.ref_lfo.argtypes = [u32, f32p, f32p, i32]
        lib.ref_sigmoid.restype = ctypes.c_int
        lib.ref_sigmoid.argtypes = [u32, f32p, f32p, i32]
        lib.ref_fade.restype = ctypes.c_int
        lib.ref_fade.argtypes = [i32, f32p, f32p, i32, i32]
        lib.ref_envelope_noise.restype = ctypes.c_int
        lib.ref_envelope_noise.argtypes = [i32, u32, f32, f32, f32,
                                           f32p, i32]
        lib.ref_fft_crossover.restype = ctypes.c_int
        lib.ref_fft_crossover.argtypes = [i32, f32p, f32p, f32, f32, i32]
        lib.ref_fft_crossover_fft.restype = ctypes.c_int
        lib.ref_fft_crossover_fft.argtypes = [i32, f32p, f32, f32, f32, u32]
        lib.ref_quantized_counter.restype = ctypes.c_int
        lib.ref_quantized_counter.argtypes = [f32, f32, u32, u32, f32p,
                                              i32, i32, u32p, i32, u32p]
        lib.ref_sidechain_process.restype = ctypes.c_int
        lib.ref_sidechain_process.argtypes = [u32, u32, u32, f32, f32, u32,
                                              f32p, f32p, f32p, i32, i32]
        lib.ref_convolver_process.restype = ctypes.c_int
        lib.ref_convolver_process.argtypes = [
            f32p, i32, i32, f32, f32p, f32p, i32, i32]
        lib.ref_equalizer_process.restype = ctypes.c_int
        lib.ref_equalizer_process.argtypes = [
            u32, f32p, i32, u32, u32, f32p, f32p, i32, i32,
            ctypes.POINTER(ctypes.c_int)]
        lib.ref_filter_freq_chart.restype = ctypes.c_int
        lib.ref_filter_freq_chart.argtypes = [
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_uint32, f32p, f32p, f32p, ctypes.c_int]
        # wave 3 (oracle2.cpp)
        i32p_ = ctypes.POINTER(ctypes.c_int32)
        lib.ref_adsr.restype = ctypes.c_int
        lib.ref_adsr.argtypes = [f32p, f32, i32, f32, i32, f32,
                                 f32p, f32p, i32]
        lib.ref_trigger.restype = ctypes.c_int
        lib.ref_trigger.argtypes = [u32, u32, f32, f32, u32, f32p,
                                    i32p_, i32]
        lib.ref_meter_graph.restype = ctypes.c_int
        lib.ref_meter_graph.argtypes = [u32, u32, u32, f32p, f32, i32,
                                        i32, i32, f32p, i32]
        lib.ref_scaled_meter_graph.restype = ctypes.c_int
        lib.ref_scaled_meter_graph.argtypes = [u32, u32, u32, u32, f32p,
                                               f32, i32, i32, f32p, i32]
        lib.ref_dynamic_delay.restype = ctypes.c_int
        lib.ref_dynamic_delay.argtypes = [u32, f32p, f32p, f32p, f32p,
                                          f32p, i32, i32]
        lib.ref_depopper.restype = ctypes.c_int
        lib.ref_depopper.argtypes = [u32, u32, f32, f32, f32, u32, f32,
                                     f32, f32, f32, f32p, f32p, f32p,
                                     i32, i32]
        lib.ref_shift_buffer.restype = ctypes.c_int
        lib.ref_shift_buffer.argtypes = [u32, u32, i32p_, i32p_, i32,
                                         f32p, f32p, i32p]
        lib.ref_dynamic_filters.restype = ctypes.c_int
        lib.ref_dynamic_filters.argtypes = [u32, u32, f32, f32, f32, u32,
                                            f32p, f32p, f32p, i32, i32]
        lib.ref_spectral_splitter.restype = ctypes.c_int
        lib.ref_spectral_splitter.argtypes = [u32, u32, f32p, f32p, f32p,
                                              i32, i32]
        lib.ref_multi_spectral.restype = ctypes.c_int
        lib.ref_multi_spectral.argtypes = [u32, f32p, f32p, f32p, f32p,
                                           i32, i32]
        lib.ref_fft_crossover_unit.restype = ctypes.c_int
        lib.ref_fft_crossover_unit.argtypes = [u32, u32, f32p, i32, f32p,
                                               f32p, i32, i32]
        lib.ref_oversampler.restype = ctypes.c_int
        lib.ref_oversampler.argtypes = [u32, u32, i32, i32, f32p, f32p,
                                        f32p, i32, i32, i32p]
        cch = ctypes.c_char_p
        lib.ref_bsp_mesh.restype = ctypes.c_int
        lib.ref_bsp_mesh.argtypes = [f32p, i32, f32, f32, f32, f32p,
                                     i32, i32p]
        lib.ref_in_sample_stream.restype = ctypes.c_int
        lib.ref_in_sample_stream.argtypes = [f32p, i32, u32, i32, f32p,
                                             i32, i32p]
        lib.ref_rt_source.restype = ctypes.c_int
        lib.ref_rt_source.argtypes = [u32, f32, f32, f32, f32, f32, f32,
                                      f32, f32, f32, f32, f32p, f32p,
                                      i32, i32p]
        lib.ref_rt_capture.restype = ctypes.c_int
        lib.ref_rt_capture.argtypes = [f32, f32, f32, f32, f32, f32, f32,
                                       u32, f32, f32, u32, u32, f32p,
                                       i32p]
        lib.ref_sample_edit.restype = ctypes.c_int
        lib.ref_sample_edit.argtypes = [f32p, i32, u32, u32, f32, f32,
                                        f32, f32, f32p, i32, i32p, i32p]
        lib.ref_sample_wav_roundtrip.restype = ctypes.c_int
        lib.ref_sample_wav_roundtrip.argtypes = [f32p, i32, i32, u32, cch,
                                                 f32p, i32, i32p, i32p,
                                                 i32p]
        f64 = ctypes.c_double
        lib.ref_sync_chirp.restype = ctypes.c_int
        lib.ref_sync_chirp.argtypes = [u32, f64, f64, f32, f32, u32, f32,
                                       f32, f32p, i32, u32, f32, f32,
                                       f32p, i32, i32p, f32p, i32, i32p,
                                       f32p]
        lib.ref_latency_detector.restype = ctypes.c_int
        lib.ref_latency_detector.argtypes = [u32, f32, i32, f32, f32, f32,
                                             i32, i32, i32p]
        lib.ref_analyzer.restype = ctypes.c_int
        lib.ref_analyzer.argtypes = [u32, u32, u32, f32, f32, u32, u32,
                                     f32, f32p, i32, i32, f32p]
        lib.ref_response_taker.restype = ctypes.c_int
        lib.ref_response_taker.argtypes = [u32, f32p, i32, i32, f32, i32,
                                           i32, i32, f32p, i32, i32p]
        lib.ref_sample_player.restype = ctypes.c_int
        lib.ref_sample_player.argtypes = [f32p, i32, u32, u32, u32, u32,
                                          i32, u32, u32, f32, u32, i32,
                                          u32, i32, u32, u32, f32p, i32,
                                          i32]
        lib.ref_oscillator.restype = ctypes.c_int
        lib.ref_oscillator.argtypes = [u32, u32, u32, f32p, f32p, i32, i32]
        lib.ref_true_peak.restype = ctypes.c_int
        lib.ref_true_peak.argtypes = [u32, f32p, f32p, i32, i32]
        lib.ref_fft_crossover_unit_chart.restype = ctypes.c_int
        lib.ref_fft_crossover_unit_chart.argtypes = [f32p, u32, f32p,
                                                     f32p, i32]
        # wave 4 (oracle3.cpp): noise Generator facade
        lib.ref_noise_generator.restype = ctypes.c_int
        lib.ref_noise_generator.argtypes = [
            u32, u32, u32, f32, u32, u32, u64, u32, u32, u32,
            f32, f32, i32, f32, f32, f32, u32, f32p, i32, i32]
        # wave 4 (oracle3.cpp): the genuine ray tracer
        lib.ref_raytrace.restype = ctypes.c_int
        lib.ref_raytrace.argtypes = [
            f32p, i32, ctypes.POINTER(ctypes.c_int32), i32,  # scene
            f32p,                                            # material
            i32, f32p,                                       # source
            i32, i32, i32, f32p,                             # capture
            i32, f32, f32, f32, i32, i32, i32, i32,          # params
            f32p, i32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        # wave 4b (oracle4.cpp): genuine shared/AudioStream + Catalog
        # over the POSIX-shm ipc stubs (handle-based)
        vp = ctypes.c_void_p
        cch = ctypes.c_char_p
        i64 = ctypes.c_int64
        lng = ctypes.c_long
        lib.ref_as_new.restype = vp
        lib.ref_as_new.argtypes = []
        lib.ref_as_create.restype = i32
        lib.ref_as_create.argtypes = [vp, cch, u32, u32]
        lib.ref_as_allocate.restype = i32
        lib.ref_as_allocate.argtypes = [vp, cch, u32, u32, cch, u32]
        lib.ref_as_open.restype = i32
        lib.ref_as_open.argtypes = [vp, cch]
        lib.ref_as_begin.restype = i32
        lib.ref_as_begin.argtypes = [vp, i64]
        lib.ref_as_read.restype = i32
        lib.ref_as_read.argtypes = [vp, u32, f32p, u32, i32]
        lib.ref_as_write.restype = i32
        lib.ref_as_write.argtypes = [vp, u32, f32p, u32, i32]
        lib.ref_as_end.restype = i32
        lib.ref_as_end.argtypes = [vp]
        lib.ref_as_channels.restype = u32
        lib.ref_as_channels.argtypes = [vp]
        lib.ref_as_length.restype = u32
        lib.ref_as_length.argtypes = [vp]
        lib.ref_as_counter.restype = u32
        lib.ref_as_counter.argtypes = [vp]
        lib.ref_as_close.restype = i32
        lib.ref_as_close.argtypes = [vp]
        lib.ref_as_free.restype = None
        lib.ref_as_free.argtypes = [vp]
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.ref_cat_new.restype = vp
        lib.ref_cat_new.argtypes = []
        lib.ref_cat_open.restype = i32
        lib.ref_cat_open.argtypes = [vp, cch, u32]
        lib.ref_cat_close.restype = i32
        lib.ref_cat_close.argtypes = [vp]
        lib.ref_cat_free.restype = None
        lib.ref_cat_free.argtypes = [vp]
        lib.ref_cat_capacity.restype = u32
        lib.ref_cat_capacity.argtypes = [vp]
        lib.ref_cat_size.restype = u32
        lib.ref_cat_size.argtypes = [vp]
        lib.ref_cat_changed.restype = i32
        lib.ref_cat_changed.argtypes = [vp]
        lib.ref_cat_sync.restype = i32
        lib.ref_cat_sync.argtypes = [vp]
        lib.ref_cat_publish.restype = lng
        lib.ref_cat_publish.argtypes = [vp, u32, cch, cch, u32p]
        lib.ref_cat_get_by_name.restype = i32
        lib.ref_cat_get_by_name.argtypes = [vp, cch, u32p, u32p, u32p,
                                            cch]
        lib.ref_cat_get_by_index.restype = i32
        lib.ref_cat_get_by_index.argtypes = [vp, u32, u32p, u32p, cch,
                                             cch]
        lib.ref_cat_get_or_reserve.restype = i32
        lib.ref_cat_get_or_reserve.argtypes = [vp, cch, u32, u32p, u32p,
                                               cch]
        lib.ref_cat_validate.restype = i32
        lib.ref_cat_validate.argtypes = [vp, u32, u32, u32, cch, cch]
        lib.ref_cat_revoke.restype = i32
        lib.ref_cat_revoke.argtypes = [vp, u32, u32]
        lib.ref_cat_enumerate.restype = lng
        lib.ref_cat_enumerate.argtypes = [vp, u32, u32, u32p, u32p,
                                          u32p, cch, cch]
        lib.ref_cat_keep_alive.restype = i32
        lib.ref_cat_keep_alive.argtypes = [vp, cch]
        lib.ref_cat_gc.restype = i32
        lib.ref_cat_gc.argtypes = [vp]
        # wave 4b (oracle4.cpp): two-object genuine ray trace (divider
        # scenes with their own material — interface-physics parity)
        i32pp = ctypes.POINTER(ctypes.c_int32)
        lib.ref_raytrace2.restype = i32
        lib.ref_raytrace2.argtypes = [
            f32p, i32, i32pp, i32, f32p,          # room
            i32pp, i32, f32p,                     # divider
            i32, f32p,                            # source
            i32, i32, i32, f32p,                  # capture
            i32, f32, f32, f32, i32, i32, i32,    # params
            f32p, i32, i32pp, i32pp]
        _LIB = lib
        return lib


def filter_type_ids() -> Dict[str, int]:
    """Parse filter_type_t member names from the reference header
    (sequential values, no explicit assignments)."""
    path = os.path.join(REFERENCE_ROOT,
                        "include/lsp-plug.in/dsp-units/filters/common.h")
    with open(path, "r", encoding="utf-8") as f:
        text = f.read()
    m = re.search(r"enum\s+filter_type_t\s*\{(.*?)\};", text, re.S)
    if m is None:
        raise RuntimeError("filter_type_t enum not found")
    names = re.findall(r"\b(FLT_[A-Z0-9_]+)\b", m.group(1))
    return {name: i for i, name in enumerate(dict.fromkeys(names))}


def _f32(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def design(type_id: int, slope: int, freq: float, freq2: float,
           gain: float, quality: float, sr: int):
    """Returns (biquads[K,5] float32 (b0,b1,b2,a1,a2; a-negated),
    latency)."""
    lib = _lib()
    out = np.zeros((256, 5), np.float32)
    lat = ctypes.c_int(0)
    n = lib.ref_filter_design(type_id, slope, freq, freq2, gain,
                              quality, sr, _f32(out), 256,
                              ctypes.byref(lat))
    if n < 0:
        raise RuntimeError("ref_filter_design failed")
    return out[:n].copy(), lat.value


def process(type_id: int, slope: int, freq: float, freq2: float,
            gain: float, quality: float, sr: int, x: np.ndarray,
            block: int = 0) -> np.ndarray:
    lib = _lib()
    x = np.ascontiguousarray(x, np.float32)
    y = np.zeros_like(x)
    rc = lib.ref_filter_process(type_id, slope, freq, freq2, gain,
                                quality, sr, _f32(x), _f32(y),
                                x.size, block)
    if rc != 0:
        raise RuntimeError("ref_filter_process failed")
    return y


def compressor_process(mode: int, attack_thresh: float,
                       release_thresh: float, boost_thresh: float,
                       attack_ms: float, release_ms: float, knee: float,
                       ratio: float, hold_ms: float, sr: int,
                       x: np.ndarray):
    """Returns (gain, envelope) of the genuine Compressor::process."""
    lib = _lib()
    x = np.ascontiguousarray(x, np.float32)
    gain = np.zeros_like(x)
    env = np.zeros_like(x)
    lib.ref_compressor_process(mode, attack_thresh, release_thresh,
                               boost_thresh, attack_ms, release_ms, knee,
                               ratio, hold_ms, sr, _f32(x), _f32(gain),
                               _f32(env), x.size)
    return gain, env


def compressor_curve(mode: int, attack_thresh: float, release_thresh: float,
                     boost_thresh: float, attack_ms: float,
                     release_ms: float, knee: float, ratio: float,
                     hold_ms: float, sr: int, levels: np.ndarray):
    """Returns (curve, reduction) of the genuine Compressor knees."""
    lib = _lib()
    levels = np.ascontiguousarray(levels, np.float32)
    curve = np.zeros_like(levels)
    gain = np.zeros_like(levels)
    lib.ref_compressor_curve(mode, attack_thresh, release_thresh,
                             boost_thresh, attack_ms, release_ms, knee,
                             ratio, hold_ms, sr, _f32(levels), _f32(curve),
                             _f32(gain), levels.size)
    return curve, gain


def expander_process(mode: int, attack_thresh: float, release_thresh: float,
                     attack_ms: float, release_ms: float, knee: float,
                     ratio: float, hold_ms: float, sr: int, x: np.ndarray):
    lib = _lib()
    x = np.ascontiguousarray(x, np.float32)
    gain = np.zeros_like(x)
    env = np.zeros_like(x)
    lib.ref_expander_process(mode, attack_thresh, release_thresh,
                             attack_ms, release_ms, knee, ratio, hold_ms,
                             sr, _f32(x), _f32(gain), _f32(env), x.size)
    return gain, env


def gate_process(open_thresh: float, close_thresh: float, open_zone: float,
                 close_zone: float, reduction: float, attack_ms: float,
                 release_ms: float, hold_ms: float, sr: int, x: np.ndarray):
    lib = _lib()
    x = np.ascontiguousarray(x, np.float32)
    gain = np.zeros_like(x)
    env = np.zeros_like(x)
    lib.ref_gate_process(open_thresh, close_thresh, open_zone, close_zone,
                         reduction, attack_ms, release_ms, hold_ms, sr,
                         _f32(x), _f32(gain), _f32(env), x.size)
    return gain, env


def limiter_process(mode: int, thresh: float, attack_ms: float,
                    release_ms: float, lookahead_ms: float, knee: float,
                    sr: int, sc: np.ndarray, block: int = 0,
                    alr: bool = False, alr_attack: float = 5.0,
                    alr_release: float = 50.0, alr_knee: float = 1.0):
    """Returns (gain trajectory, latency) of the genuine Limiter."""
    lib = _lib()
    sc = np.ascontiguousarray(sc, np.float32)
    gain = np.zeros_like(sc)
    lat = ctypes.c_int(0)
    rc = lib.ref_limiter_process(mode, thresh, attack_ms, release_ms,
                                 lookahead_ms, knee, int(alr), alr_attack,
                                 alr_release, alr_knee, sr, _f32(sc),
                                 _f32(gain), sc.size, block,
                                 ctypes.byref(lat))
    if rc != 0:
        raise RuntimeError("ref_limiter_process failed")
    return gain, lat.value


def spectral_tilt(order: int, slope: float, slope_unit: int, norm: int,
                  lower: float, upper: float, sr: int, x: np.ndarray,
                  block: int = 0) -> np.ndarray:
    lib = _lib()
    x = np.ascontiguousarray(x, np.float32)
    y = np.zeros_like(x)
    lib.ref_spectral_tilt(order, slope, slope_unit, norm, lower, upper,
                          sr, _f32(x), _f32(y), x.size, block)
    return y


def butterworth(type_id: int, order: int, cutoff: float, sr: int,
                x: np.ndarray, block: int = 0) -> np.ndarray:
    lib = _lib()
    x = np.ascontiguousarray(x, np.float32)
    y = np.zeros_like(x)
    lib.ref_butterworth(type_id, order, cutoff, sr, _f32(x), _f32(y),
                        x.size, block)
    return y


def dynproc_process(dots, atk_lv, atk_t, rel_lv, rel_t, in_ratio, out_ratio,
                    sr, x, levels=None):
    """Returns (gain, env[, curve, model])."""
    lib = _lib()
    dots = np.ascontiguousarray(dots, np.float32)
    atk_lv = np.ascontiguousarray(atk_lv, np.float32)
    atk_t = np.ascontiguousarray(atk_t, np.float32)
    rel_lv = np.ascontiguousarray(rel_lv, np.float32)
    rel_t = np.ascontiguousarray(rel_t, np.float32)
    x = np.ascontiguousarray(x, np.float32)
    gain = np.zeros_like(x)
    env = np.zeros_like(x)
    if levels is None:
        lv = np.zeros(1, np.float32)
        curve = np.zeros(1, np.float32)
        model = np.zeros(1, np.float32)
        nl = 0
    else:
        lv = np.ascontiguousarray(levels, np.float32)
        curve = np.zeros_like(lv)
        model = np.zeros_like(lv)
        nl = lv.size
    lib.ref_dynproc_process(_f32(dots), _f32(atk_lv), _f32(atk_t),
                            _f32(rel_lv), _f32(rel_t), in_ratio, out_ratio,
                            sr, _f32(x), _f32(gain), _f32(env), x.size,
                            _f32(curve), _f32(model), _f32(lv), nl)
    if levels is None:
        return gain, env
    return gain, env, curve, model


def autogain(silence, deviation, sgrow, sfall, lgrow, lfall, max_gain,
             max_gain_on, sr, llong, lshort, lexp=1.0):
    lib = _lib()
    llong = np.ascontiguousarray(llong, np.float32)
    lshort = np.ascontiguousarray(lshort, np.float32)
    vca = np.zeros_like(llong)
    lib.ref_autogain(silence, deviation, sgrow, sfall, lgrow, lfall,
                     max_gain, int(max_gain_on), sr, _f32(llong),
                     _f32(lshort), lexp, _f32(vca), llong.size)
    return vca


def simple_autogain(grow, fall, gmin, gmax, threshold, sr, level):
    lib = _lib()
    level = np.ascontiguousarray(level, np.float32)
    gain = np.zeros_like(level)
    lib.ref_simple_autogain(grow, fall, gmin, gmax, threshold, sr,
                            _f32(level), _f32(gain), level.size)
    return gain


def surge_protector(on_th, off_th, transition, shutdown, x):
    lib = _lib()
    x = np.ascontiguousarray(x, np.float32)
    out = np.zeros_like(x)
    lib.ref_surge_protector(on_th, off_th, transition, shutdown, _f32(x),
                            _f32(out), x.size)
    return out


def correlometer(max_period: int, period: int, a: np.ndarray,
                 b: np.ndarray, block: int = 0) -> np.ndarray:
    lib = _lib()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    dst = np.zeros_like(a)
    rc = lib.ref_correlometer(max_period, period, _f32(a), _f32(b),
                              _f32(dst), a.size, block)
    if rc != 0:
        raise RuntimeError("ref_correlometer failed")
    return dst


def panometer(max_period: int, period: int, law: int, dfl: float,
              a: np.ndarray, b: np.ndarray, block: int = 0) -> np.ndarray:
    lib = _lib()
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    dst = np.zeros_like(a)
    rc = lib.ref_panometer(max_period, period, law, dfl, _f32(a), _f32(b),
                           _f32(dst), a.size, block)
    if rc != 0:
        raise RuntimeError("ref_panometer failed")
    return dst


def loudness_meter(period_ms: float, weighting: int, sr: int,
                   l: np.ndarray, r: np.ndarray,
                   block: int = 0) -> np.ndarray:
    lib = _lib()
    l = np.ascontiguousarray(l, np.float32)
    r = np.ascontiguousarray(r, np.float32)
    out = np.zeros_like(l)
    rc = lib.ref_loudness_meter(period_ms, weighting, sr, _f32(l),
                                _f32(r), _f32(out), l.size, block)
    if rc != 0:
        raise RuntimeError("ref_loudness_meter failed")
    return out


def ilufs_meter(int_time_s: float, weighting: int, sr: int, l: np.ndarray,
                r: np.ndarray, block: int = 0) -> np.ndarray:
    lib = _lib()
    l = np.ascontiguousarray(l, np.float32)
    r = np.ascontiguousarray(r, np.float32)
    out = np.zeros_like(l)
    rc = lib.ref_ilufs_meter(int_time_s, weighting, sr, _f32(l), _f32(r),
                             _f32(out), l.size, block)
    if rc != 0:
        raise RuntimeError("ref_ilufs_meter failed")
    return out


def crossover(freqs, slopes, sr: int, x: np.ndarray,
              block: int = 0) -> np.ndarray:
    """Returns [nsplits+1, n] band outputs of the genuine LR tree."""
    lib = _lib()
    freqs = np.ascontiguousarray(freqs, np.float32)
    slopes = np.ascontiguousarray(slopes, np.uint32)
    x = np.ascontiguousarray(x, np.float32)
    nb = freqs.size + 1
    outs = np.zeros((nb, x.size), np.float32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    rc = lib.ref_crossover(freqs.size, _f32(freqs),
                           slopes.ctypes.data_as(u32p), sr, _f32(x),
                           _f32(outs), x.size, block)
    if rc != 0:
        raise RuntimeError("ref_crossover failed")
    return outs


def mls(nbits: int, state: int, n: int, amplitude: float = 1.0,
        offset: float = 0.0) -> np.ndarray:
    lib = _lib()
    dst = np.zeros(n, np.float32)
    lib.ref_mls(nbits, state, amplitude, offset, _f32(dst), n)
    return dst


def lcg(seed: int, dist: int, n: int, amplitude: float = 1.0,
        offset: float = 0.0) -> np.ndarray:
    lib = _lib()
    dst = np.zeros(n, np.float32)
    lib.ref_lcg(seed, dist, amplitude, offset, _f32(dst), n)
    return dst


def velvet(core: int, vtype: int, n: int, randseed: int = 42,
           mlsnbits: int = 23, mlsseed: int = 0, window_width: float = 0.01,
           delta: float = 0.5, amplitude: float = 1.0, offset: float = 0.0,
           crush: bool = False, crush_prob: float = 0.5,
           sr: int = 48000) -> np.ndarray:
    lib = _lib()
    dst = np.zeros(n, np.float32)
    lib.ref_velvet(core, vtype, randseed, mlsnbits, mlsseed, window_width,
                   delta, amplitude, offset, int(crush), crush_prob, sr,
                   _f32(dst), n)
    return dst


def randomizer(seed: int, func: int, n: int) -> np.ndarray:
    lib = _lib()
    dst = np.zeros(n, np.float32)
    lib.ref_randomizer(seed, func, _f32(dst), n)
    return dst


def window(type_id: int, n: int) -> np.ndarray:
    lib = _lib()
    dst = np.zeros(n, np.float32)
    lib.ref_window(type_id, _f32(dst), n)
    return dst


def lfo(func_id: int, phase: np.ndarray) -> np.ndarray:
    lib = _lib()
    phase = np.ascontiguousarray(phase, np.float32)
    dst = np.zeros_like(phase)
    rc = lib.ref_lfo(func_id, _f32(phase), _f32(dst), phase.size)
    if rc != 0:
        raise RuntimeError("bad lfo func id")
    return dst


def sigmoid(func_id: int, x: np.ndarray) -> np.ndarray:
    lib = _lib()
    x = np.ascontiguousarray(x, np.float32)
    dst = np.zeros_like(x)
    rc = lib.ref_sigmoid(func_id, _f32(x), _f32(dst), x.size)
    if rc != 0:
        raise RuntimeError("bad sigmoid func id")
    return dst


def fade(src: np.ndarray, fade_len: int, out: bool = False) -> np.ndarray:
    lib = _lib()
    src = np.ascontiguousarray(src, np.float32)
    dst = np.zeros_like(src)
    lib.ref_fade(int(out), _f32(src), _f32(dst), fade_len, src.size)
    return dst


def envelope_noise(type_id: int, n: int, first: float, last: float,
                   center: float, log_grid: bool = False) -> np.ndarray:
    lib = _lib()
    dst = np.zeros(n, np.float32)
    lib.ref_envelope_noise(int(log_grid), type_id, first, last, center,
                           _f32(dst), n)
    return dst


def fft_crossover_curve(freqs: np.ndarray, f0: float, slope: float,
                        lo: bool) -> np.ndarray:
    lib = _lib()
    freqs = np.ascontiguousarray(freqs, np.float32)
    gain = np.zeros_like(freqs)
    lib.ref_fft_crossover(int(lo), _f32(freqs), _f32(gain), f0, slope,
                          freqs.size)
    return gain


def fft_crossover_bins(rank: int, f0: float, slope: float, sr: float,
                       lo: bool) -> np.ndarray:
    lib = _lib()
    mag = np.zeros((1 << rank), np.float32)
    lib.ref_fft_crossover_fft(int(lo), _f32(mag), f0, slope, sr, rank)
    return mag


def quantized_counter(vmin: float, vmax: float, levels: int, history: int,
                      x: np.ndarray, block: int = 0):
    """Returns (counters[levels], below, above, count)."""
    lib = _lib()
    x = np.ascontiguousarray(x, np.float32)
    counters = np.zeros(levels, np.uint32)
    extra = np.zeros(3, np.uint32)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    rc = lib.ref_quantized_counter(
        vmin, vmax, levels, history, _f32(x), x.size, block,
        counters.ctypes.data_as(u32p), levels,
        extra.ctypes.data_as(u32p))
    if rc != 0:
        raise RuntimeError("ref_quantized_counter failed")
    return counters, int(extra[0]), int(extra[1]), int(extra[2])


def sidechain_process(source: int, mode: int, stereo_mode: int,
                      reactivity_ms: float, gain: float, sr: int,
                      l: np.ndarray, r: np.ndarray,
                      block: int = 0) -> np.ndarray:
    lib = _lib()
    l = np.ascontiguousarray(l, np.float32)
    r = np.ascontiguousarray(r, np.float32)
    out = np.zeros_like(l)
    rc = lib.ref_sidechain_process(source, mode, stereo_mode,
                                   reactivity_ms, gain, sr, _f32(l),
                                   _f32(r), _f32(out), l.size, block)
    if rc != 0:
        raise RuntimeError("ref_sidechain_process failed")
    return out


def convolver_process(ir: np.ndarray, rank: int, x: np.ndarray,
                      block: int = 0, phase: float = 0.0) -> np.ndarray:
    """Genuine non-uniform partitioned Convolver."""
    lib = _lib()
    ir = np.ascontiguousarray(ir, np.float32)
    x = np.ascontiguousarray(x, np.float32)
    y = np.zeros_like(x)
    rc = lib.ref_convolver_process(_f32(ir), ir.size, rank, phase,
                                   _f32(x), _f32(y), x.size, block)
    if rc != 0:
        raise RuntimeError("ref_convolver_process failed")
    return y


def equalizer_process(mode: int, filters, fir_rank: int, sr: int,
                      x: np.ndarray, block: int = 0):
    """Genuine Equalizer.  ``filters`` = rows of
    (type_id, slope, freq, freq2, gain, quality).
    Returns (y, latency)."""
    lib = _lib()
    f = np.ascontiguousarray(filters, np.float32)
    x = np.ascontiguousarray(x, np.float32)
    y = np.zeros_like(x)
    lat = ctypes.c_int(0)
    rc = lib.ref_equalizer_process(mode, _f32(f), f.shape[0], fir_rank,
                                   sr, _f32(x), _f32(y), x.size, block,
                                   ctypes.byref(lat))
    if rc != 0:
        raise RuntimeError("ref_equalizer_process failed")
    return y, lat.value


def cascade_process_f32(biquads: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Run [K,5] (b0,b1,b2,a1,a2; a-negated) biquads through the
    oracle's own scalar float32 DF2T kernel (zero initial state)."""
    lib = _lib()
    c = np.ascontiguousarray(biquads, np.float32)
    x = np.ascontiguousarray(x, np.float32)
    y = np.zeros_like(x)
    lib.ref_cascade_process(_f32(c), c.shape[0], _f32(x), _f32(y), x.size)
    return y


def raytrace(verts: np.ndarray, faces: np.ndarray, material,
             src_cfg, cap_cfg, src_type: int = 0, cap_config: int = 0,
             cap_direction: int = 5, cap_side: int = 5,
             sample_rate: int = 48000, energy_thresh: float = 1e-3,
             tolerance: float = 1e-5, detalization: float = 1e-10,
             normalize: bool = True, rmin: int = -1, rmax: int = -1,
             threads: int = 1, max_len: int = 1 << 18) -> np.ndarray:
    """Run the GENUINE RayTrace3D pipeline on a programmatic scene.

    ``verts`` [nv,3] float32, ``faces`` [nf,3] int32 (winding so that
    normals point toward the sound side), ``material`` 9 floats,
    ``src_cfg`` 11 floats (x,y,z, yaw,pitch,roll, size, height, angle,
    curvature, amplitude), ``cap_cfg`` 9 floats (x,y,z, yaw,pitch,roll,
    capsule, angle, distance).  Returns [n_caps, length] float32 IRs.
    """
    lib = _lib()
    verts = np.ascontiguousarray(verts, np.float32).reshape(-1, 3)
    faces = np.ascontiguousarray(faces, np.int32).reshape(-1, 3)
    material = np.ascontiguousarray(material, np.float32)
    src_cfg = np.ascontiguousarray(src_cfg, np.float32)
    cap_cfg = np.ascontiguousarray(cap_cfg, np.float32)
    assert material.size == 9 and src_cfg.size == 11 and cap_cfg.size == 9
    out = np.zeros((2, max_len), np.float32)
    out_len = ctypes.c_int32(0)
    n_caps = ctypes.c_int32(0)
    i32p_ = ctypes.POINTER(ctypes.c_int32)
    rc = lib.ref_raytrace(
        _f32(verts), verts.shape[0],
        faces.ctypes.data_as(i32p_), faces.shape[0],
        _f32(material), src_type, _f32(src_cfg),
        cap_config, cap_direction, cap_side, _f32(cap_cfg),
        sample_rate, energy_thresh, tolerance, detalization,
        int(normalize), rmin, rmax, threads,
        _f32(out), max_len, ctypes.byref(out_len),
        ctypes.byref(n_caps))
    if rc != 0:
        raise RuntimeError(f"ref_raytrace failed: {rc}")
    n = min(out_len.value, max_len)
    return out[:n_caps.value, :n].copy()


def raytrace2(verts: np.ndarray, faces: np.ndarray, material,
              faces2, material2,
              src_cfg, cap_cfg, src_type: int = 0, cap_config: int = 0,
              cap_direction: int = 5, cap_side: int = 5,
              sample_rate: int = 48000, energy_thresh: float = 1e-3,
              tolerance: float = 1e-5, detalization: float = 1e-10,
              normalize: bool = True, rmin: int = -1, rmax: int = -1,
              max_len: int = 1 << 18) -> np.ndarray:
    """Two-object genuine ray trace: ``faces2``/``material2`` define a
    second object (e.g. a divider) with its own material — the
    interface-physics parity driver (RayTrace3D.cpp:641-832).  Other
    args as :func:`raytrace`; pass faces2=None for one object."""
    lib = _lib()
    verts = np.ascontiguousarray(verts, np.float32).reshape(-1, 3)
    faces = np.ascontiguousarray(faces, np.int32).reshape(-1, 3)
    material = np.ascontiguousarray(material, np.float32)
    if faces2 is None:
        faces2 = np.zeros((0, 3), np.int32)
    faces2 = np.ascontiguousarray(faces2, np.int32).reshape(-1, 3)
    material2 = np.ascontiguousarray(
        material2 if material2 is not None else np.zeros(9), np.float32)
    src_cfg = np.ascontiguousarray(src_cfg, np.float32)
    cap_cfg = np.ascontiguousarray(cap_cfg, np.float32)
    assert material.size == 9 and material2.size == 9
    assert src_cfg.size == 11 and cap_cfg.size == 9
    out = np.zeros((2, max_len), np.float32)
    out_len = ctypes.c_int32(0)
    n_caps = ctypes.c_int32(0)
    i32p_ = ctypes.POINTER(ctypes.c_int32)
    rc = lib.ref_raytrace2(
        _f32(verts), verts.shape[0],
        faces.ctypes.data_as(i32p_), faces.shape[0],
        _f32(material),
        faces2.ctypes.data_as(i32p_), faces2.shape[0],
        _f32(material2),
        src_type, _f32(src_cfg),
        cap_config, cap_direction, cap_side, _f32(cap_cfg),
        sample_rate, energy_thresh, tolerance, detalization,
        int(normalize), rmin, rmax,
        _f32(out), max_len, ctypes.byref(out_len),
        ctypes.byref(n_caps))
    if rc != 0:
        raise RuntimeError(f"ref_raytrace2 failed: {rc}")
    n = min(out_len.value, max_len)
    return out[:n_caps.value, :n].copy()


def freq_chart(type_id: int, slope: int, freq: float, freq2: float,
               gain: float, quality: float, sr: int,
               freqs: np.ndarray) -> np.ndarray:
    lib = _lib()
    freqs = np.ascontiguousarray(freqs, np.float32)
    re_ = np.zeros_like(freqs)
    im_ = np.zeros_like(freqs)
    rc = lib.ref_filter_freq_chart(type_id, slope, freq, freq2, gain,
                                   quality, sr, _f32(freqs), _f32(re_),
                                   _f32(im_), freqs.size)
    if rc != 0:
        raise RuntimeError("ref_filter_freq_chart failed")
    return re_ + 1j * im_
