"""Exploratory comparison: genuine RayTrace3D (compiled reference, via
tests/ref_oracle) vs the TPU tracer on the same box room.  Prints the
numbers the parity test's tolerances are calibrated from; results are
recorded in NUMERICS.md."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")   # axon overrides the env var

import numpy as np

from tests import ref_oracle

SR = 48000
C_REF = 340.29

LX, LY, LZ = 4.0, 3.0, 2.5
SRC = np.array([1.2, 1.0, 1.2])
CAP = np.array([2.8, 2.0, 1.3])
ABSORB = 0.3
CAP_R = 0.022       # fCapsule 2.2 -> radius m (raytrace.cpp:786)
SRC_SIZE = 0.01


def box_verts_faces():
    # shared tessellated mesh (see the test module's note on the
    # genuine tracer's barycentric-time chordal error on large faces)
    from tests.test_reference_oracle_raytrace import _box
    return _box()


def genuine_ir(rmin=-1, rmax=-1, energy=1e-3, normalize=False):
    v, f = box_verts_faces()
    mat = [ABSORB, ABSORB, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 1.0]
    src = [*SRC, 0, 0, 0, SRC_SIZE, SRC_SIZE, 50.0, 0.0, 1.0]
    cap = [*CAP, 0, 0, 0, CAP_R * 100.0, 0.0, 0.0]
    t0 = time.time()
    ir = ref_oracle.raytrace(
        v, f, mat, src, cap, src_type=8,          # RT_AS_ICOSPHERE
        cap_config=0, cap_direction=5,            # MONO, OMNI
        energy_thresh=energy, normalize=normalize,
        rmin=rmin, rmax=rmax)
    return ir[0], time.time() - t0


def ours_ir(rays=16384, ir_s=0.25, gate=None, bounces=40, seed=0,
            energy_floor=1e-4, est="triangle"):
    from lsp_dsp_units_tpu.models.threed.scene import (
        Scene3D, Object3D, Material)
    from lsp_dsp_units_tpu.models.threed.raytrace import (
        RayTrace3D, Capture)
    from lsp_dsp_units_tpu.models.threed.sources import (
        SourceSettings, SourceShape)
    v, f = box_verts_faces()
    scene = Scene3D()
    scene.add_object(Object3D("room", v, f, Material(
        absorption=ABSORB, transparency=0.0, permeability=1.0)))
    rt = RayTrace3D(scene, sample_rate=SR, ir_length_s=ir_s, rays=rays,
                    max_bounces=bounces, energy_floor=energy_floor,
                    air_absorption=0.0, seed=seed, gate_rays=gate,
                    capture_est=est)
    rt.add_source(SourceSettings(shape=SourceShape.ICOSPHERE,
                                 size=SRC_SIZE, amplitude=1.0,
                                 position=SRC))
    rt.add_capture(Capture(position=CAP))
    t0 = time.time()
    out = rt.process()
    return np.asarray(out.data[0]), time.time() - t0


def image_source_times():
    """First-order image-source distances for the 6 walls."""
    imgs = []
    for axis, lo, hi in ((0, 0.0, LX), (1, 0.0, LY), (2, 0.0, LZ)):
        for wall in (lo, hi):
            p = SRC.copy()
            p[axis] = 2 * wall - p[axis]
            imgs.append(np.linalg.norm(p - CAP))
    return np.sort(np.asarray(imgs))


def winenergy(ir, t_s, half_ms=1.5):
    b = int(round(t_s * SR))
    h = int(half_ms * 1e-3 * SR)
    lo, hi = max(b - h, 0), min(b + h, len(ir))
    return float(np.sum(ir[lo:hi] ** 2))


def main():
    d_direct = np.linalg.norm(CAP - SRC)
    t_direct = d_direct / C_REF
    print(f"direct: {d_direct:.3f} m = {t_direct*SR:.1f} samples")

    g0, tg0 = genuine_ir(rmin=0, rmax=0)
    g1, tg1 = genuine_ir(rmin=1, rmax=1)
    gall, tgall = genuine_ir(energy=1e-4)
    print(f"genuine: direct-only len {len(g0)} ({tg0:.2f}s), "
          f"1st-order len {len(g1)} ({tg1:.2f}s), "
          f"full len {len(gall)} ({tgall:.2f}s)")

    o, to = ours_ir()
    print(f"ours: len {len(o)} ({to:.2f}s)")

    # direct arrival
    gp = int(np.argmax(np.abs(g0)))
    op_win = o[:int((t_direct + 0.004) * SR)]
    op = int(np.argmax(np.abs(op_win)))
    print(f"direct peak: genuine {gp}, ours {op}, "
          f"geometric {t_direct*SR:.1f}")

    # first-order reflections: windowed energies around image times
    imgs = image_source_times()
    print("image-source times (samples):",
          np.round(imgs / C_REF * SR, 1))
    ge_d = winenergy(g0, t_direct)
    oe_d = winenergy(o, t_direct)
    print("windowed energy ratios (reflection / direct):")
    for d in imgs:
        t = d / C_REF
        ge = winenergy(g1, t) / ge_d
        oe = winenergy(o, t) / oe_d
        print(f"  t={t*SR:7.1f}sa  genuine {ge:8.4f}  ours {oe:8.4f}  "
              f"ratio {oe/ge if ge > 0 else float('nan'):6.2f}")

    # echogram: 4 ms bins over first 120 ms, dB, normalized to direct
    nb = int(0.120 * SR)
    bins = 192  # 4 ms
    def echogram(ir):
        x = ir[:nb] ** 2
        nfull = (len(x) // bins) * bins
        e = x[:nfull].reshape(-1, bins).sum(-1)
        return 10 * np.log10(np.maximum(e / e.max(), 1e-12))
    eg, eo = echogram(np.pad(gall, (0, max(0, nb - len(gall))))), \
        echogram(o)
    diff = np.abs(eg - eo)
    mask = (eg > -40) & (eo > -40)
    print(f"echogram |diff| dB over >-40dB bins: "
          f"mean {diff[mask].mean():.2f}, max {diff[mask].max():.2f} "
          f"({mask.sum()} bins)")

    # Schroeder RT60 (via T20) on both
    def rt60(ir):
        e = ir.astype(np.float64) ** 2
        sch = np.cumsum(e[::-1])[::-1]
        sch = 10 * np.log10(np.maximum(sch / sch[0], 1e-30))
        def t_at(db):
            idx = np.argmax(sch <= db)
            return idx / SR
        t5, t25 = t_at(-5.0), t_at(-25.0)
        return 3.0 * (t25 - t5)
    rg, ro = rt60(gall), rt60(o)
    print(f"RT60(T20): genuine {rg*1000:.1f} ms, ours {ro*1000:.1f} ms, "
          f"ratio {ro/rg:.3f}")


if __name__ == "__main__":
    main()
