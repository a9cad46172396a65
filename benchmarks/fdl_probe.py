"""Split the packed-Pallas FDL stage cost into its parts on-chip:
deinterleave/interleave glue, forward FFT, FFT pair, ring MAC, full
step.  Methodology = benchmarks/roofline.py (one dispatch scans 128
sequential steps; interleaved windows; median of in-window diffs)."""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(ROOT, ".jax_cache_tpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5.0)
    except Exception:
        pass

    from lsp_dsp_units_tpu.ops import fftconv
    from lsp_dsp_units_tpu.ops import pallas_fft as pfft
    from lsp_dsp_units_tpu.ops.pallas_fdl import ring_mac_pallas

    C, B = 64, 8192
    N = 2 * B
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((C, B)).astype(np.float32) * .25)
    ir = rng.standard_normal(6 * B - 7).astype(np.float32) * 0.05
    h = fftconv.parse_ir(jnp.asarray(ir), B)
    p = h.re.shape[-2]
    st0 = fftconv.init_ring_fdl(h, (C,), packed=True)
    hre_p, him_p = pfft.pack_spectra(h.re, h.im, N)

    def v_floor(st, x):
        return st, jnp.sum(x) * 0.0

    def v_glue(st, x):
        # the XLA-side pack/unpack around the kernels: deinterleave to
        # (zr, zi) + re-interleave back
        frame = jnp.concatenate([st.history, x], axis=-1)
        xp = frame.reshape(C, N // 2, 2)
        zr, zi = xp[..., 0], xp[..., 1]
        out = jnp.stack([zr, zi], axis=-1).reshape(C, N)
        return st._replace(history=x), jnp.sum(out) * 1e-9

    def v_fwd(st, x):
        frame = jnp.concatenate([st.history, x], axis=-1)
        sr, si = pfft.rfft_packed(frame)
        return st._replace(history=x), (jnp.sum(sr) + jnp.sum(si)) * 1e-9

    def v_pair(st, x):
        frame = jnp.concatenate([st.history, x], axis=-1)
        sr, si = pfft.rfft_packed(frame)
        y = pfft.irfft_packed((sr, si), N)[..., B:]
        return st._replace(history=x), jnp.sum(y) * 1e-9

    def v_mac(st, x):
        # ring MAC + slot write only (spectrum input recycled from the
        # carried history's first F columns — content irrelevant)
        w = (st.pos + 1) % p
        rot = (w - jnp.arange(p)) % p
        sr = st.spec_re[0]
        si = st.spec_im[0]
        acc_re, acc_im, buf_re, buf_im = ring_mac_pallas(
            st.spec_re, st.spec_im,
            jnp.take(hre_p, rot, axis=-2), jnp.take(him_p, rot, axis=-2),
            sr, si, w, packed_dc=True)
        return st._replace(spec_re=buf_re, spec_im=buf_im, pos=w), \
            (jnp.sum(acc_re) + jnp.sum(acc_im)) * 1e-9

    def v_full(st, x):
        st, y = fftconv.fdl_ring_step(h, st, x)
        return st, jnp.sum(y) * 1e-9

    variants = [("floor", v_floor), ("glue", v_glue), ("fwd", v_fwd),
                ("pair", v_pair), ("mac", v_mac), ("full", v_full)]

    SCAN = 128

    def scanned(fn):
        def run(st, x):
            def body(carry, _):
                s, acc = carry
                s, c = fn(s, x)
                return (s, acc + c), None
            (s, acc), _ = jax.lax.scan(
                body, (st, jnp.float32(0.0)), None, length=SCAN)
            return s, acc
        return run

    jitted = []
    for name, fn in variants:
        j = jax.jit(scanned(fn))
        _, a = j(st0, x)
        np.asarray(a)
        print("compiled", name, flush=True)
        jitted.append((name, j))

    times = {n: [] for n, _ in variants}
    for w in range(9):
        for name, j in jitted:
            t0 = time.perf_counter()
            _, a = j(st0, x)
            np.asarray(a)
            times[name].append(time.perf_counter() - t0)

    med = {n: float(np.median(v)) for n, v in times.items()}
    floor = med["floor"]
    print(f"\n{'variant':<8}{'total ms':>10}{'per-step us':>13}")
    for n, _ in variants:
        per = (med[n] - floor) / SCAN * 1e6
        print(f"{n:<8}{med[n]*1e3:>10.2f}{per:>13.1f}")


if __name__ == "__main__":
    main()
