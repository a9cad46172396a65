"""Single-thread CPU anchor for the flagship chain (VERDICT r1 weak #6).

Runs the SAME 64-channel EQ -> 1 s convolver -> RMS sidechain ->
compressor chain as bench.py, but on one CPU core with the best
conventional tools a native implementation would use: scipy's C lfilter
for the IIR cascade, pocketfft overlap-save for the convolution,
cumulative-sum sliding RMS, and a plain-C envelope follower
(csrc/cpu_env.c).  This is the closest available stand-in for the
reference's single-thread SIMD throughput — the reference publishes no
numbers (BASELINE.md) — and turns the TPU bench into "N x a CPU core".

Prints one JSON line: {"cpu_samples_per_sec": ..., "threads": 1}.
"""

import ctypes
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")


def _env_lib():
    src = os.path.join(ROOT, "csrc", "cpu_env.c")
    out = os.path.join(ROOT, "csrc", "libcpu_env.so")
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        subprocess.run(["gcc", "-O3", "-fPIC", "-shared", src, "-o", out],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(out)
    lib.env_follow.restype = None
    lib.env_follow.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float, ctypes.c_int32, ctypes.c_float]
    return lib


def main() -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from scipy.signal import lfilter

    from lsp_dsp_units_tpu.pipeline import FilterConvChain

    channels, rank = 64, 14
    chain = FilterConvChain(48000, channels=channels, rank=rank,
                            ir_seconds=1.0)
    params = chain.build()
    block = chain.block
    coeffs = np.asarray(params.eq_coeffs, np.float64)
    ir = chain.ir.astype(np.float32)

    # knee curve constants (numpy port of ops/dynamics.comp_knee_gain)
    knees = [
        {f: float(np.asarray(getattr(k, f)))
         for f in ("start", "end", "gain", "tilt0", "tilt1", "herm0",
                   "herm1", "herm2")}
        for k in params.comp.knees]
    tau_a = float(np.asarray(params.comp.tau_attack))
    tau_r = float(np.asarray(params.comp.tau_release))
    n_hold = int(np.asarray(params.comp.hold))
    rel_t = float(np.asarray(params.comp.release_thresh))
    sc_n = chain.sidechain.reactivity

    lib = _env_lib()

    def knee_gain(k, ax, lx):
        line = np.exp(lx * k["tilt0"] + k["tilt1"])
        herm = np.exp((k["herm0"] * lx + k["herm1"]) * lx + k["herm2"])
        return np.where(ax <= k["start"], k["gain"],
                        np.where(ax >= k["end"], line, herm))

    # overlap-save convolver state: FFT of IR partitions
    nfft = 2 * block
    n_part = (ir.size + block - 1) // block
    h_pad = np.zeros(n_part * block, np.float32)
    h_pad[: ir.size] = ir
    hs = np.fft.rfft(h_pad.reshape(n_part, block), nfft, axis=-1)

    blocks_n = 10
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((channels, block * blocks_n)) * 0.25
         ).astype(np.float32)

    env = np.zeros(channels, np.float32)
    peak = np.zeros(channels, np.float32)
    hold = np.zeros(channels, np.int32)
    fdl = np.zeros((channels, n_part, nfft // 2 + 1), np.complex64)
    sc_tail = np.zeros((channels, sc_n), np.float32)
    prev_block = np.zeros((channels, block), np.float32)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)

    # loop-invariant: the IR partition spectra in working precision
    # (converting inside the measured loop deflated the anchor)
    hs64 = hs.astype(np.complex64)

    def run(x):
        t = x.shape[-1]
        # 1. EQ cascade (scipy C lfilter, all channels, per stage)
        y = x.astype(np.float64)
        for b0, b1, b2, a1, a2 in coeffs:
            y = lfilter([b0, b1, b2], [1.0, -a1, -a2], y, axis=-1)
        y = y.astype(np.float32)
        out = np.empty_like(y)
        # 2-4 per block: FDL convolution, sliding RMS, envelope+gain
        nonlocal fdl, sc_tail, prev_block
        for m in range(t // block):
            blk = y[:, m * block: (m + 1) * block]
            frame = np.concatenate([prev_block, blk], axis=-1)
            prev_block = blk
            spec = np.fft.rfft(frame, nfft, axis=-1).astype(np.complex64)
            fdl = np.roll(fdl, 1, axis=1)
            fdl[:, 0] = spec
            acc = np.einsum("cpf,pf->cf", fdl, hs64)
            conv = np.fft.irfft(acc, nfft, axis=-1)[:, block:].astype(
                np.float32)
            # sliding RMS over reactivity window
            sq = np.concatenate([sc_tail, np.abs(conv) ** 2], axis=-1)
            cs = np.cumsum(sq, axis=-1, dtype=np.float64)
            win = cs[:, sc_n:] - cs[:, :-sc_n]
            level = np.sqrt(np.maximum(win / sc_n, 0.0)).astype(np.float32)
            sc_tail = sq[:, -sc_n:]
            # envelope (C, single thread)
            e_out = np.empty_like(level)
            lib.env_follow(
                np.ascontiguousarray(level).ctypes.data_as(fp),
                e_out.ctypes.data_as(fp), env.ctypes.data_as(fp),
                peak.ctypes.data_as(fp), hold.ctypes.data_as(ip),
                channels, block, tau_a, tau_r, n_hold, rel_t)
            ax = np.abs(e_out)
            lx = np.log(np.maximum(ax, 1e-36))
            gain = knee_gain(knees[0], ax, lx) * knee_gain(knees[1], ax,
                                                           lx)
            out[:, m * block: (m + 1) * block] = conv * gain
        return out

    run(x[:, : block * 2])  # warm caches
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        run(x)
        el = time.perf_counter() - t0
        best = max(best, x.size / el)
    print(json.dumps({"metric": "cpu_single_thread_same_chain",
                      "cpu_samples_per_sec": round(best, 1),
                      "threads": 1,
                      "realtime_x": round(best / (48000 * channels), 2)}))


if __name__ == "__main__":
    main()
