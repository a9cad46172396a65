"""Parameter sweep for the TPU tracer's late-reverb convergence vs the
genuine reference tracer (RT60 / echogram gap study — NUMERICS.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from benchmarks.raytrace_compare import genuine_ir, ours_ir, SR


def rt60(ir):
    e = np.asarray(ir, np.float64) ** 2
    sch = np.cumsum(e[::-1])[::-1]
    sch = 10 * np.log10(np.maximum(sch / sch[0], 1e-30))

    def t_at(db):
        return np.argmax(sch <= db) / SR
    return 3.0 * (t_at(-25.0) - t_at(-5.0))


def echo_diff(g, o):
    nb = int(0.120 * SR)
    bins = 192

    def echogram(ir):
        x = np.pad(np.asarray(ir, np.float64),
                   (0, max(0, nb - len(ir))))[:nb] ** 2
        e = x.reshape(-1, bins).sum(-1)
        return 10 * np.log10(np.maximum(e / e.max(), 1e-12))
    eg, eo = echogram(g), echogram(o)
    mask = (eg > -40) & (eo > -40)
    d = np.abs(eg - eo)[mask]
    return d.mean(), d.max(), int(mask.sum())


def golden_ir(ir_s=0.25):
    """EXACT image-source IR of the box room (signed pressure,
    reflection coefficient (trans-1)*(1-absorb) = -0.7 per bounce):
    the analytic ground truth both tracers approximate."""
    from benchmarks.raytrace_compare import (LX, LY, LZ, SRC, CAP,
                                             ABSORB, C_REF)
    refl = -(1.0 - ABSORB)
    max_d = C_REF * ir_s
    ir = np.zeros(int(ir_s * SR), np.float64)

    def axis_images(s, c, L):
        """[(coord_offset_from_capture, n_reflections)] per axis."""
        out = []
        n_max = int(max_d / (2 * L)) + 2
        for n in range(-n_max, n_max + 1):
            out.append((2 * n * L + s - c, abs(2 * n)))
            out.append((2 * n * L - s - c, abs(2 * n - 1)))
        return np.asarray(out)

    ax = [axis_images(SRC[i], CAP[i], L)
          for i, L in enumerate((LX, LY, LZ))]
    dx, rx = ax[0][:, 0], ax[0][:, 1]
    dy, ry = ax[1][:, 0], ax[1][:, 1]
    dz, rz = ax[2][:, 0], ax[2][:, 1]
    d2 = (dx[:, None, None] ** 2 + dy[None, :, None] ** 2
          + dz[None, None, :] ** 2)
    order = (rx[:, None, None] + ry[None, :, None]
             + rz[None, None, :])
    d = np.sqrt(d2).ravel()
    order = order.ravel()
    keep = d < max_d
    d, order = d[keep], order[keep]
    amp = np.sign(refl) ** order * np.abs(refl) ** order / np.maximum(
        d, 1e-6)
    bins = np.minimum((d / C_REF * SR).astype(np.int64), len(ir) - 1)
    np.add.at(ir, bins, amp)
    return ir.astype(np.float32)


def main():
    gold = golden_ir()
    rgold = rt60(gold)
    print(f"golden image-source: rt60 {rgold*1e3:.1f} ms")
    g, tg = genuine_ir(energy=1e-4)
    rg = rt60(g)
    dm, dx_, nb = echo_diff(gold, g)
    print(f"genuine: len {len(g)} rt60 {rg*1e3:.1f} ms ratio-vs-gold "
          f"{rg/rgold:.3f} echo-vs-gold mean {dm:.2f} max {dx_:.2f} "
          f"({tg:.1f}s)")

    import itertools
    for est, rays, gate in itertools.product(
            ("cone", "triangle"), (4096, 16384, 65536),
            (2.0, 8.0)):
        if est == "triangle" and gate != 2.0:
            continue    # gate only affects launch segments there
        t0 = time.time()
        o, _ = ours_ir(rays=rays, ir_s=0.25, gate=gate, est=est)
        ro = rt60(o)
        dm, dx, nb = echo_diff(g, o)
        gm, gx, _ = echo_diff(gold, o)
        print(f"est={est:>8} rays={rays:6d} gate={str(gate):>5}: "
              f"rt60 {ro*1e3:6.1f} ms r-gen {ro/rg:.3f} "
              f"r-gold {ro/rgold:.3f}  "
              f"echo-gen {dm:.2f}/{dx:.2f} "
              f"echo-gold {gm:.2f}/{gx:.2f}  "
              f"[{time.time()-t0:.1f}s]")


if __name__ == "__main__":
    main()
