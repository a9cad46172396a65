"""IR-level parity vs the COMPILED genuine ray tracer.

tests/ref_oracle (wave 4) compiles the reference's full beam-tracing
pipeline — 3d/RayTrace3D.cpp + 3d/rt/{context,mesh,plan}.cpp +
3d/Scene3D.cpp + 3d/Object3D.cpp — with a single-threaded ipc::Thread
stand-in (with threads=1 the reference's own main-thread path runs and
the thread class is never started, RayTrace3D.cpp:1555-1610).  Every
test here drives the GENUINE tracer and/or the TPU tracer on the same
box-room scene and compares at the impulse-response level: arrival
times, per-arrival amplitudes (against each other and against the
exact image-source model), echogram decay, and RT60.

Known, documented estimator differences (raytrace.py module
docstring): the genuine capture integrates beam areas across the
capture icosphere, smearing each arrival over the sphere-crossing
samples and summing COINCIDENT arrivals incoherently across beams; the
TPU tracer deposits each wavefront's image-source pressure into single
sample bins (coherent within a bin).  Windowed-energy comparisons
therefore use windows wider than the genuine smear, and exact
amplitude assertions are made against the image-source model (which
the genuine matches per single arrival — measured in
benchmarks/raytrace_compare.py and NUMERICS.md)."""

import numpy as np
import pytest

import tests.ref_oracle as ro

pytestmark = pytest.mark.skipif(not ro.available(),
                                reason="reference sources not present")

SR = 48000
C = 340.29                     # LSP_DSP_UNITS_SOUND_SPEED_M_S
LX, LY, LZ = 4.0, 3.0, 2.5
SRC = np.array([1.2, 1.0, 1.2])
CAP = np.array([2.8, 2.0, 1.3])
ABSORB = 0.3
CAP_R = 0.022                  # fCapsule 2.2 -> 0.022 m (raytrace.cpp:786)
SRC_SIZE = 0.01


def _box(cell=1.0):
    """Shoebox tessellated into ~cell-sized wall quads, normals inward.

    Tessellation matters for the GENUINE tracer: its arrival times are
    barycentric interpolations of vertex times across each reflecting
    triangle (RayTrace3D.cpp:689-709), a chordal approximation of the
    spherical wavefront whose error grows with triangle size — on
    whole-wall triangles first-order arrivals smear by +-70 samples;
    at 0.5 m cells they land within +-3 samples of the image-source
    times (the reference's own scenes are finely tessellated models).
    1.0 m cells (+-7 samples) keep the genuine runs under ~10 s each.
    """
    import math
    verts = {}
    faces = []

    def vid(p):
        key = (round(p[0], 6), round(p[1], 6), round(p[2], 6))
        if key not in verts:
            verts[key] = len(verts)
        return verts[key]

    def wall(origin, du, dv, nu, nv):
        o = np.array(origin, float)
        u = np.array(du, float) / nu
        v = np.array(dv, float) / nv
        for i in range(nu):
            for j in range(nv):
                a = vid(o + u * i + v * j)
                b = vid(o + u * (i + 1) + v * j)
                c = vid(o + u * (i + 1) + v * (j + 1))
                d = vid(o + u * i + v * (j + 1))
                faces.append((a, b, c))
                faces.append((a, c, d))

    n = lambda length: max(1, int(math.ceil(length / cell)))
    wall((0, 0, 0), (LX, 0, 0), (0, LY, 0), n(LX), n(LY))
    wall((0, 0, LZ), (0, LY, 0), (LX, 0, 0), n(LY), n(LX))
    wall((0, 0, 0), (0, 0, LZ), (LX, 0, 0), n(LZ), n(LX))
    wall((0, LY, 0), (LX, 0, 0), (0, 0, LZ), n(LX), n(LZ))
    wall((0, 0, 0), (0, LY, 0), (0, 0, LZ), n(LY), n(LZ))
    wall((LX, 0, 0), (0, 0, LZ), (0, LY, 0), n(LZ), n(LY))
    v = np.zeros((len(verts), 3), np.float32)
    for k, i in verts.items():
        v[i] = k
    return v, np.asarray(faces, np.int32)


def _genuine(rmin=-1, rmax=-1, energy=1e-3, normalize=False,
             cap=CAP):
    v, f = _box()
    mat = [ABSORB, ABSORB, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 1.0]
    src = [*SRC, 0, 0, 0, SRC_SIZE, SRC_SIZE, 50.0, 0.0, 1.0]
    capc = [*cap, 0, 0, 0, CAP_R * 100.0, 0.0, 0.0]
    ir = ro.raytrace(v, f, mat, src, capc,
                     src_type=8,                 # RT_AS_ICOSPHERE
                     cap_config=0, cap_direction=5,  # MONO, OMNI
                     energy_thresh=energy, normalize=normalize,
                     rmin=rmin, rmax=rmax)
    return ir[0]


def _ours(rays=16384, ir_s=0.25, cap=CAP, max_bounces=40,
          energy_floor=1e-3):
    from lsp_dsp_units_tpu.models.threed.scene import (
        Scene3D, Object3D, Material)
    from lsp_dsp_units_tpu.models.threed.raytrace import (
        RayTrace3D, Capture)
    from lsp_dsp_units_tpu.models.threed.sources import (
        SourceSettings, SourceShape)
    v, f = _box()                       # identical mesh to the genuine
    scene = Scene3D()
    scene.add_object(Object3D("room", v, f, Material(
        absorption=ABSORB, transparency=0.0, permeability=1.0)))
    rt = RayTrace3D(scene, sample_rate=SR, ir_length_s=ir_s, rays=rays,
                    max_bounces=max_bounces, energy_floor=energy_floor,
                    air_absorption=0.0)
    rt.add_source(SourceSettings(shape=SourceShape.ICOSPHERE,
                                 size=SRC_SIZE, amplitude=1.0,
                                 position=SRC))
    rt.add_capture(Capture(position=cap))
    return np.asarray(rt.process().data[0])


def _image_sources(cap=CAP):
    """First-order image distances, grouped (multiplicity counted)."""
    dists = []
    for axis, hi in ((0, LX), (1, LY), (2, LZ)):
        for wall in (0.0, hi):
            p = SRC.copy()
            p[axis] = 2 * wall - p[axis]
            dists.append(float(np.linalg.norm(p - cap)))
    groups = {}
    for d in dists:
        key = round(d, 3)
        groups[key] = groups.get(key, 0) + 1
    return sorted(groups.items())


def _win_energy(ir, t_s, half_samples=24):
    b = int(round(t_s * SR))
    lo, hi = max(b - half_samples, 0), min(b + half_samples, len(ir))
    return float(np.sum(np.asarray(ir[lo:hi], np.float64) ** 2))


def _win_amp(ir, t_s, half_samples=24):
    b = int(round(t_s * SR))
    lo, hi = max(b - half_samples, 0), min(b + half_samples, len(ir))
    return float(np.sum(ir[lo:hi]))


def _rt60(ir):
    e = np.asarray(ir, np.float64) ** 2
    sch = np.cumsum(e[::-1])[::-1]
    sch = 10 * np.log10(np.maximum(sch / max(sch[0], 1e-30), 1e-30))
    t5 = int(np.argmax(sch <= -5.0))
    t25 = int(np.argmax(sch <= -25.0))
    return 3.0 * (t25 - t5) / SR


# ------------------------------------------------ genuine self-checks

def test_genuine_direct_arrival_geometry():
    """The genuine direct arrival lands at the geometric flight time
    (minus the capture-sphere radius where the sweep starts)."""
    ir = _genuine(rmin=0, rmax=0)
    d = float(np.linalg.norm(CAP - SRC))
    t_geo = d / C * SR
    peak = int(np.argmax(np.abs(ir)))
    assert abs(peak - t_geo) <= (CAP_R + SRC_SIZE) / C * SR + 3.0
    nz = np.nonzero(np.abs(ir) > 1e-6)[0]
    # first energy no earlier than the sphere's near edge
    assert nz[0] >= (d - CAP_R - SRC_SIZE) / C * SR - 3.0


def test_genuine_reflection_order_composition():
    """IR(rmax=1) == IR(direct) + IR(first-order-only): the r_min/r_max
    binding gates recording, not tracing, so the components must add
    exactly (same deterministic single-threaded trace)."""
    g01 = _genuine(rmin=-1, rmax=1)
    g0 = _genuine(rmin=0, rmax=0)
    g1 = _genuine(rmin=1, rmax=1)
    n = max(len(g01), len(g0), len(g1))
    pad = lambda x: np.pad(x, (0, n - len(x)))
    total = pad(g0) + pad(g1)
    np.testing.assert_allclose(pad(g01), total, rtol=0, atol=1e-6)


def test_genuine_first_order_times_and_energy():
    """Genuine first-order reflections land at the image-source times
    with per-single-arrival windowed energy matching the image-source
    model (the beam-area integral preserves per-wavefront energy)."""
    g1 = _genuine(rmin=1, rmax=1)
    g0 = _genuine(rmin=0, rmax=0)
    e_direct = float(np.sum(np.asarray(g0, np.float64) ** 2))
    d_direct = float(np.linalg.norm(CAP - SRC))
    for d, mult in _image_sources():
        t = d / C
        e = _win_energy(np.pad(g1, (0, 40000))[:40000], t)
        # image-source energy prediction per arrival, x multiplicity.
        # The genuine capture deposits per-FRAGMENT sqrt-energies
        # (capture(), RayTrace3D.cpp:931), so its absolute per-arrival
        # energy shifts with how the tessellation fragments each
        # wavefront (measured: 1.0x on whole-wall triangles, ~0.4x per
        # single arrival at 1 m cells) — the reference normalizes its
        # output by default for this reason.  Assert order-of-magnitude
        # here; the exact analytic check is on the TPU tracer below,
        # whose family estimator is tessellation-independent.
        pred = ((1 - ABSORB) * d_direct / d) ** 2 * mult * e_direct
        assert 0.08 * pred <= e <= 4.0 * pred, (d, mult, e, pred)
    # a control window between the direct and the earliest reflection
    # stays silent (no spurious genuine arrivals)
    d_min = _image_sources()[0][0]
    t_ctrl = 0.5 * (d_direct + d_min) / C
    e_ctrl = _win_energy(np.pad(g1, (0, 40000))[:40000], t_ctrl,
                         half_samples=12)
    e_first = _win_energy(np.pad(g1, (0, 40000))[:40000], d_min / C)
    assert e_ctrl < 0.05 * e_first, (e_ctrl, e_first)


# ------------------------------------------------ ours vs genuine

def test_direct_arrival_matches_genuine():
    g0 = _genuine(rmin=0, rmax=0)
    ours = _ours(rays=8192, ir_s=0.02, max_bounces=1)
    gp = int(np.argmax(np.abs(g0)))
    op = int(np.argmax(np.abs(ours)))
    # genuine sweep starts at the sphere's near edge; centers agree
    # within the sphere transit
    assert abs(gp - op) <= CAP_R / C * SR + 3.0


def test_ours_matches_image_source_model_exactly():
    """The TPU tracer's direct + first-order arrivals match the exact
    image-source pressure model to <2% — tighter than the genuine
    beam-sweep integration itself (which spreads each arrival across
    the capture sphere)."""
    ours = _ours(rays=16384, ir_s=0.05, max_bounces=2)
    d_direct = float(np.linalg.norm(CAP - SRC))
    a_direct = _win_amp(ours, d_direct / C)
    assert abs(a_direct - 1.0 / d_direct) < 0.02 / d_direct
    for d, mult in _image_sources():
        a = _win_amp(ours, d / C, half_samples=12)
        pred = -mult * (1 - ABSORB) / d     # polarity: (trans-1) < 0
        assert abs(a - pred) < 0.05 * abs(pred), (d, mult, a, pred)


def _golden(ir_s=0.25):
    """EXACT image-source IR of the box room (signed pressure, wall
    reflection coefficient (trans-1)*(1-absorb) = -0.7) — the analytic
    ground truth BOTH tracers approximate.  Used to arbitrate the
    reverb tail: the genuine tracer's tail is truncated by its energy
    threshold (beams die around order ln(eps)/ln(0.7)), so a direct
    ours-vs-genuine RT60 comparison conflates estimator quality with
    threshold effects."""
    refl = -(1.0 - ABSORB)
    max_d = C * ir_s
    ir = np.zeros(int(ir_s * SR), np.float64)

    def axis_images(s, c, L):
        out = []
        n_max = int(max_d / (2 * L)) + 2
        for n in range(-n_max, n_max + 1):
            out.append((2 * n * L + s - c, abs(2 * n)))
            out.append((2 * n * L - s - c, abs(2 * n - 1)))
        return np.asarray(out)

    ax = [axis_images(SRC[i], CAP[i], L)
          for i, L in enumerate((LX, LY, LZ))]
    d2 = (ax[0][:, 0][:, None, None] ** 2
          + ax[1][:, 0][None, :, None] ** 2
          + ax[2][:, 0][None, None, :] ** 2)
    order = (ax[0][:, 1][:, None, None] + ax[1][:, 1][None, :, None]
             + ax[2][:, 1][None, None, :])
    d = np.sqrt(d2).ravel()
    order = order.ravel()
    keep = d < max_d
    d, order = d[keep], order[keep]
    amp = (np.sign(refl) ** order * np.abs(refl) ** order
           / np.maximum(d, 1e-6))
    bins = np.minimum((d / C * SR).astype(np.int64), len(ir) - 1)
    np.add.at(ir, bins, amp)
    return ir.astype(np.float32)


def _echogram(ir, nb, bins=192):
    x = np.pad(np.asarray(ir, np.float64),
               (0, max(0, nb - len(ir))))[:nb] ** 2
    e = x.reshape(-1, bins).sum(-1)
    return 10 * np.log10(np.maximum(e / e.max(), 1e-12))


def test_reverb_decay_matches_genuine():
    """Echogram (4 ms bins) and RT60 of the reverb tail, arbitrated by
    the exact image-source golden: both tracers are compared to it,
    and ours must track it at least as tightly as the genuine does
    (measured at matched 1e-3 energy thresholds: ours 2.8 dB mean vs
    genuine 6.8 dB; RT60/golden 0.82 vs 0.68 — both tails are
    threshold-truncated, ours less).  The early decay (genuine bins
    above -30 dB, where its truncation is irrelevant) must also agree
    directly between the two tracers."""
    gold = _golden()
    g = _genuine(energy=1e-3)
    o = _ours(rays=16384, ir_s=0.25)

    nb = int(0.120 * SR)
    ex, eg, eo = _echogram(gold, nb), _echogram(g, nb), _echogram(o, nb)

    def vs_gold(e):
        mask = (ex > -40) & (e > -40)
        return np.abs(ex - e)[mask], int(mask.sum())

    d_g, n_g = vs_gold(eg)
    d_o, n_o = vs_gold(eo)
    assert n_o >= 8 and n_g >= 8
    assert d_o.mean() < 4.0, d_o
    assert d_o.mean() <= d_g.mean() + 0.5, (d_o.mean(), d_g.mean())

    # early decay, directly tracer-vs-tracer
    mask = (eg > -30) & (eo > -30)
    assert mask.sum() >= 6
    diff = np.abs(eg - eo)[mask]
    assert diff.mean() < 5.0, diff

    rg, ro_, rx = _rt60(g), _rt60(o), _rt60(gold)
    # both truncated at 1e-3; ours must sit between the genuine's
    # truncated tail and the golden (with margin)
    assert 0.70 * rx <= ro_ <= 1.15 * rx, (ro_, rx)
    assert ro_ >= rg * 0.95, (ro_, rg)


def test_rt60_converges_to_image_source_model():
    """With the ray budget up and the energy floor down, the TPU
    tracer's RT60 converges to the exact image-source golden
    (measured: ratio 0.97 at 16k rays, 1.03 at 64k; the genuine
    tracer at its matching 1e-4 threshold sits at 0.94 —
    NUMERICS.md round-4 estimator study)."""
    gold = _golden()
    o = _ours(rays=65536, ir_s=0.25, energy_floor=1e-4)
    ro_, rx = _rt60(o), _rt60(gold)
    assert 0.88 * rx <= ro_ <= 1.12 * rx, (ro_, rx)
    nb = int(0.120 * SR)
    ex, eo = _echogram(gold, nb), _echogram(o, nb)
    mask = (ex > -40) & (eo > -40)
    d = np.abs(ex - eo)[mask]
    assert d.mean() < 2.5, d


def test_distance_scaling_matches_genuine():
    """Direct-arrival energy falls off as 1/r^2 in both tracers."""
    cap2 = np.array([2.0, 1.5, 1.3])
    d1 = float(np.linalg.norm(CAP - SRC))
    d2 = float(np.linalg.norm(cap2 - SRC))
    g_a = _genuine(rmin=0, rmax=0)
    g_b = _genuine(rmin=0, rmax=0, cap=cap2)
    o_a = _ours(rays=8192, ir_s=0.02, max_bounces=1)
    o_b = _ours(rays=8192, ir_s=0.02, max_bounces=1, cap=cap2)
    g_ratio = (np.sum(np.asarray(g_b, np.float64) ** 2)
               / np.sum(np.asarray(g_a, np.float64) ** 2))
    o_ratio = (np.sum(np.asarray(o_b, np.float64) ** 2)
               / np.sum(np.asarray(o_a, np.float64) ** 2))
    pred = (d1 / d2) ** 2
    assert abs(g_ratio / pred - 1.0) < 0.35, (g_ratio, pred)
    assert abs(o_ratio / pred - 1.0) < 0.35, (o_ratio, pred)
    assert abs(g_ratio / o_ratio - 1.0) < 0.35, (g_ratio, o_ratio)
