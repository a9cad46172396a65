"""Roofline accounting for the bench chain (SURVEY §5: per-kernel
roofline notes; round-3 verdict ask #8).

Answers "is 0.5 ms/block actually fast FOR THIS CHIP" by pricing each
stage of the 64-ch rank-14 chain block against the chip's HBM bandwidth
and FLOP peaks, three ways that must agree:

  analytic  — FLOPs/bytes counted from the actual shapes (this file,
              no device needed; run with --analytic)
  xla       — the compiled module's own cost model
              (compiled.cost_analysis(): flops, bytes accessed)
  measured  — interleaved stage-differencing on the real chip
              (--measure; the round-2 delivery-probe methodology:
              variants interleaved in one process so weather cancels)

speed-of-light time per stage = max(bytes / HBM_BW, flops / PEAK);
the chain is memory-bound everywhere (arithmetic intensity < 10
flops/byte vs the ~240 flops/byte MXU knee), so HBM bandwidth is the
binding roof, with one exception: the envelope follower is bound by
its SERIAL time axis (T dependent VPU steps), not by traffic — its
floor is T x (dependent-chain cycles) / clock, which the table carries
separately.

Chip peaks are published numbers per device_kind (the tunnel chip
reports its kind at runtime); unknown kinds fall back to v5e.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# published per-chip peaks: (bf16 matmul TFLOP/s, HBM GB/s, VPU clock GHz)
# f32 vector work peaks far lower than the MXU number; the chain is
# memory-bound so the BW column is the one that matters.
CHIP_PEAKS = {
    "TPU v4": (275.0, 1228.0, 0.94),
    "TPU v5e": (197.0, 819.0, 0.94),
    "TPU v5 lite": (197.0, 819.0, 0.94),
    "TPU v5p": (459.0, 2765.0, 0.94),
    "TPU v6e": (918.0, 1640.0, 0.94),
    "TPU v6 lite": (918.0, 1640.0, 0.94),
}


def fft_flops(n: int, batch: int) -> float:
    """Real FFT of length n: ~2.5 n log2 n (half the 5 n log n complex
    split-radix count)."""
    return 2.5 * n * math.log2(n) * batch


def analytic(chain, params) -> dict:
    """Per-stage FLOPs and HBM bytes for ONE streaming block of
    chain.step_ring (the bench path)."""
    c = chain.channels
    b = chain.block
    f = b + 1
    p = int(params.h_spectra.re.shape[0])
    k2 = int(params.eq_block.m_mat.shape[0])          # 2K balanced states
    n_win = 480                                        # 10 ms RMS window
    f32 = 4

    stages = {}
    # The fused linear path (ONE Pallas kernel): EQ zero-pad forward +
    # packed product + first-half inverse, then FDL forward + ring MAC
    # + last-half inverse; HBM touches x, the state correction, the
    # carried EQ-output block, the spectra ring (read + 1-slot write)
    # and y.  FLOPs counted as the four-step matmul work at bf16x3
    # (3 passes, pairing 2-pass/sliced — ops/pallas_fft.py) — unlike a
    # butterfly FFT this path is MXU-bound, not HBM-bound.
    mac_units = 2.0 * 128 * 128 * 128                # one [128^3] MAC set
    # per channel per full transform: stage A 4x(n1^2 n2) + stage C
    # 4x(n1 n2^2) + pairing (2 big + 2 small + fix/8), all x3 passes
    # (2 for the permutation terms)
    full_mxu = (4 * 64 * 64 * 128 + 4 * 64 * 128 * 128
                + 2 * 64 * 128 * 128 * (2 / 3) * 3
                + 2 * 64 * 64 * 128 * (2 / 3) * 3) * 3 * 2.0
    stages["linear_path"] = {
        "flops": (c * (0.75 + 0.5 + 1.0 + 0.5) * full_mxu
                  + 8.0 * c * p * b                  # ring MAC
                  + 2.0 * c * k2 * b * 2),           # G/W matmuls
        "bytes": f32 * (c * b * 5                    # x, corr, hist, u, y
                        + c * b * 2                  # slot write
                        + c * p * b * 2              # ring read
                        + p * b * 2),                # IR spectra
    }
    # Dynamics tail, ONE fused kernel (pallas_env.chain_dyn_pallas):
    # sliding-RMS rolling sum (2-cycle serial chain) + envelope
    # recurrence (8-cycle serial chain) + knee gain sweep; the two
    # serial chains run as separate passes, so the latency floor is
    # their SUM plus the vectorized sweeps
    stages["dyn_tail"] = {
        "flops": 50.0 * c * b + 10.0 * c * n_win,
        "bytes": f32 * (c * b * 2 + c * n_win * 2),
        "serial_t": b,
        "chain_cycles": 10,  # 2 (rolling sum) + 8 (envelope) per step
    }
    # TPDF i16 delivery: noise table read + clamp/round, i16 write
    stages["delivery_i16"] = {
        "flops": 8.0 * c * b,
        "bytes": f32 * (c * b * 2) + 2 * c * b,
    }
    return stages


def sol_table(stages: dict, peaks) -> list:
    tflops, gbs, ghz = peaks
    rows = []
    tot_f = tot_b = tot_sol = 0.0
    for name, s in stages.items():
        t_bw = s["bytes"] / (gbs * 1e9)
        t_fl = s["flops"] / (tflops * 1e12)
        t_serial = 0.0
        if "serial_t" in s:
            t_serial = s["serial_t"] * s["chain_cycles"] / (ghz * 1e9)
        sol = max(t_bw, t_fl, t_serial)
        rows.append((name, s["flops"] / 1e6, s["bytes"] / 1e6,
                     t_bw * 1e6, t_serial * 1e6, sol * 1e6))
        tot_f += s["flops"]
        tot_b += s["bytes"]
        tot_sol += sol
    rows.append(("TOTAL", tot_f / 1e6, tot_b / 1e6,
                 tot_b / (gbs * 1e9) * 1e6, 0.0, tot_sol * 1e6))
    return rows


def build():
    import numpy as np
    import jax.numpy as jnp
    from lsp_dsp_units_tpu.pipeline import FilterConvChain

    chain = FilterConvChain(sample_rate=48000, channels=64, rank=14,
                            ir_seconds=1.0)
    params = chain.build()
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((chain.channels, chain.block)).astype(np.float32)
        * 0.25)
    return chain, params, x


def main_analytic():
    chain, params, x = build()
    stages = analytic(chain, params)
    kind = "TPU v5e"
    print(f"analytic roofline (assumed {kind}; B={chain.block}, "
          f"C={chain.channels}, P={int(params.h_spectra.re.shape[0])})")
    hdr = (f"{'stage':<16}{'MFLOP':>9}{'MB':>9}{'t_bw us':>10}"
           f"{'t_serial us':>13}{'SoL us':>9}")
    print(hdr)
    for name, mf, mb, tbw, tser, sol in sol_table(stages, CHIP_PEAKS[kind]):
        print(f"{name:<16}{mf:>9.1f}{mb:>9.2f}{tbw:>10.1f}"
              f"{tser:>13.1f}{sol:>9.1f}")


def main_measure():
    import numpy as np
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache_tpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    chain, params, x = build()
    from lsp_dsp_units_tpu.ops import fftconv
    from lsp_dsp_units_tpu.ops import biquad_block
    from lsp_dsp_units_tpu.utils.delivery import tpdf_i16_table, quantize_i16

    dev = jax.devices()[0]
    kind = dev.device_kind
    peaks = CHIP_PEAKS.get(kind, CHIP_PEAKS["TPU v5e"])
    print(f"device_kind={kind!r} peaks(bf16 TFLOP/s, HBM GB/s)="
          f"{peaks[:2]}", flush=True)

    state0 = chain.init_ring_state(params)
    table = tpdf_i16_table(chain.channels, chain.block)

    # stage-prefix variants, all scalar-checksum returns (no payload);
    # marginal stage cost = t[i] - t[i-1], interleaved so weather cancels
    def v_floor(st, x):
        return st, jnp.sum(x) * 0.0

    def v_eq(st, x):
        y, eq = biquad_block.cascade_block_fused(params.eq_block, st.eq, x)
        return st._replace(eq=eq), jnp.sum(y) * 1e-9

    def v_fft(st, x):
        # one rfft+irfft pair at the convolver's frame size, no MAC:
        # isolates the backend's FFT cost inside the FDL stage
        from lsp_dsp_units_tpu.ops.cplx import rfft_sc, irfft_sc
        frame = jnp.concatenate([st.fdl.history, x], axis=-1)
        sr, si = rfft_sc(frame)
        y = irfft_sc((sr, si), axis=-1)[..., x.shape[-1]:]
        return st._replace(fdl=st.fdl._replace(history=x)), \
            jnp.sum(y) * 1e-9

    def v_fdl(st, x):
        y, eq = biquad_block.cascade_block_fused(params.eq_block, st.eq, x)
        fdl, y = fftconv.fdl_ring_step(params.h_spectra, st.fdl, y)
        return st._replace(eq=eq, fdl=fdl), jnp.sum(y) * 1e-9

    def v_linear(st, x):
        # the chain's fused linear path (EQ conv + FDL, one kernel):
        # step_ring's own code up to (not including) the dynamics tail
        from lsp_dsp_units_tpu.ops import pallas_fft as pfft
        from lsp_dsp_units_tpu.ops.pallas_fdl_fused import \
            eqfdl_fused_pallas
        eqp = params.eq_block
        k2 = eqp.m_mat.shape[0]
        sv = st.eq.reshape(st.eq.shape[:-2] + (k2,))
        corr = jnp.einsum("bk,...k->...b", eqp.g_mat, sv,
                          precision=jax.lax.Precision.HIGH)
        nfft = 2 * chain.block
        heq_r, heq_i = pfft.pack_spectra(eqp.h_re, eqp.h_im, nfft)
        p_n = params.h_spectra.re.shape[-2]
        w = (st.fdl.pos + 1) % p_n
        rot = (w - jnp.arange(p_n)) % p_n
        hre_p, him_p = pfft.pack_spectra(params.h_spectra.re,
                                         params.h_spectra.im, nfft)
        y, u, buf_re, buf_im = eqfdl_fused_pallas(
            st.fdl.spec_re, st.fdl.spec_im,
            jnp.take(hre_p, rot, axis=-2),
            jnp.take(him_p, rot, axis=-2),
            heq_r, heq_i, x, corr, st.fdl.history, w, nfft)
        sv2 = (jnp.einsum("kj,...j->...k", eqp.m_mat, sv,
                          precision=jax.lax.Precision.HIGH)
               + jnp.einsum("kb,...b->...k", eqp.w_mat, x,
                            precision=jax.lax.Precision.HIGH))
        fdl = fftconv.RingFDLState(spec_re=buf_re, spec_im=buf_im,
                                   history=u, pos=w)
        return st._replace(eq=sv2.reshape(st.eq.shape), fdl=fdl), \
            jnp.sum(y) * 1e-9

    def v_sc(st, x):
        y, eq = biquad_block.cascade_block_fused(params.eq_block, st.eq, x)
        fdl, y = fftconv.fdl_ring_step(params.h_spectra, st.fdl, y)
        sc, level = chain.sidechain.process(st.sc, y)
        return st._replace(eq=eq, fdl=fdl, sc=sc), jnp.sum(level) * 1e-9

    def v_env(st, x):
        st, y = chain.step_ring(params, st, x)
        return st, jnp.sum(y) * 1e-9

    def v_i16(st, x):
        st, y = chain.step_ring(params, st, x)
        return st, jnp.sum(quantize_i16(y, table, jnp.uint32(3))
                           .astype(jnp.float32)) * 1e-9

    # Stage-prefix chain matches the FUSED hot path: linear (EQ conv +
    # FDL, ONE Pallas kernel) -> dyn tail (sidechain+envelope+gain,
    # one Pallas kernel inside step_ring) -> i16.  "eq"/"fdl" (the
    # staged forms), "sidechain" and "fft1" sit LAST as side probes,
    # not part of the consecutive marginals.
    variants = [("floor", v_floor), ("linear", v_linear),
                ("dyn", v_env), ("i16", v_i16),
                ("eq", v_eq), ("fdl", v_fdl),
                ("sidechain", v_sc), ("fft1", v_fft)]

    # Each variant is timed as ONE dispatch running SCAN sequential
    # steps inside a lax.scan: device time scales by SCAN while the
    # tunnel round trip is paid once, so the per-step device estimate
    # (t - floor)/SCAN carries the floor's jitter divided by SCAN —
    # per-call differencing (the round-2 methodology) stops working
    # when the floor's weather jitter exceeds the stage deltas.
    # SCAN=128: a congested session's round trip jitters by +-3 ms,
    # so 32 steps/dispatch still left +-90 us/step of noise.
    SCAN = int(os.environ.get("ROOFLINE_SCAN", "128"))

    def scanned(fn):
        # every iteration sees a ROTATED input: a loop-invariant x lets
        # XLA hoist x-only work out of the scan (the EQ's whole
        # zero-state FFT convolution, ~160 us/block, vanished from the
        # measurement this way — NUMERICS.md round-4 late)
        def run(st, x):
            def body(carry, _):
                s, k, acc = carry
                xv = jnp.roll(x, k, axis=-1)
                s, c = fn(s, xv)
                return (s, k + 1, acc + c), None
            (s, _, acc), _ = jax.lax.scan(
                body, (st, jnp.int32(0), jnp.float32(0.0)), None,
                length=SCAN)
            return s, acc
        return run

    jitted = []
    for name, fn in variants:
        j = jax.jit(scanned(fn))
        st, c0 = j(state0, x)
        np.asarray(c0)   # compile + surface deferred errors
        jitted.append((name, j, st))
        print(f"compiled {name}", flush=True)

    # XLA's own cost model for the full step
    try:
        ca = jax.jit(v_env).lower(state0, x).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        print(json.dumps({"xla_cost_analysis": {
            "flops": ca.get("flops"),
            "bytes_accessed": ca.get("bytes accessed"),
        }}), flush=True)
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", flush=True)

    # Interleaved windows: one dispatch per variant per window,
    # within-window differencing, median across windows (robust to
    # the occasional 100 ms tunnel stall).  All times are per STEP
    # (call time / SCAN).
    WINDOWS = int(os.environ.get("ROOFLINE_WINDOWS", "9"))
    names = [name for name, _, _ in jitted]
    win_t = {name: [] for name in names}
    for w in range(WINDOWS):
        for name, j, st in jitted:
            t0 = time.perf_counter()
            s, out = j(st, x)
            np.asarray(out)
            win_t[name].append((time.perf_counter() - t0) / SCAN)

    arr = {name: np.asarray(ts) for name, ts in win_t.items()}
    med = {name: float(np.median(a)) for name, a in arr.items()}
    floor = med["floor"]
    best = {name: float(np.min(a)) for name, a in arr.items()}
    marg = {}
    prev = "floor"
    print(f"\n{'stage':<12}{'cum ms (med)':>13}{'marginal ms':>13}")
    for name in names:
        if name == "floor":
            marg[name] = float(np.median(arr[name]))
            print(f"{name:<12}{0.0:>13.3f}"
                  f"{marg[name] * SCAN * 1e3:>13.3f}")
        else:
            deltas = arr[name] - arr[prev]
            marg[name] = float(np.median(deltas))
            print(f"{name:<12}{(med[name] - floor) * 1e3:>13.3f}"
                  f"{marg[name] * 1e3:>13.3f}")
        prev = name

    stages = analytic(chain, params)
    meas = [marg.get("linear"), marg.get("dyn"), marg.get("i16")]
    full_dev = float(np.median(arr["dyn"] - arr["floor"]))
    print(f"\n{'stage':<16}{'SoL us':>9}{'measured us':>13}{'% SoL':>8}")
    rows = sol_table(stages, peaks)
    for (name, mf, mb, tbw, tser, sol), m in zip(rows, meas + [None]):
        if name == "TOTAL":
            pct = sol / (full_dev * 1e6) * 100 if full_dev > 0 else 0.0
            print(f"{name:<16}{sol:>9.1f}{full_dev * 1e6:>13.1f}"
                  f"{pct:>7.1f}%")
        elif m is not None:
            pct = sol / (m * 1e6) * 100 if m > 0 else float("nan")
            print(f"{name:<16}{sol:>9.1f}{m * 1e6:>13.1f}{pct:>7.1f}%")
        else:
            print(f"{name:<16}{sol:>9.1f}{'(fused above)':>13}")
    print(json.dumps({"floor_ms": floor * 1e3,
                      "full_step_device_ms": full_dev * 1e3,
                      "full_step_device_ms_best":
                          (best["dyn"] - best["floor"]) * 1e3,
                      "device_kind": kind}), flush=True)


if __name__ == "__main__":
    if "--measure" in sys.argv:
        main_measure()
    else:
        main_analytic()
