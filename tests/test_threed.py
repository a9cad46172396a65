"""3D acoustic raytracer tests: box room physics sanity."""

import numpy as np
import pytest

from lsp_dsp_units_tpu.models.threed import (
    Scene3D, box_room, Material, RayTrace3D, Source, Capture, MicPattern)
from lsp_dsp_units_tpu.models.threed.raytrace import SPEED_OF_SOUND

SR = 48000


def test_box_room_ir():
    scene = box_room((6.0, 4.0, 3.0), Material(absorption=0.4))
    rt = RayTrace3D(scene, SR, ir_length_s=0.3, rays=2048, max_bounces=15,
                    seed=1)
    rt.add_source(Source(np.array([2.0, 2.0, 1.5], np.float32)))
    rt.add_capture(Capture(np.array([4.0, 2.0, 1.5], np.float32)))
    ir = rt.process()
    assert ir.channels == 1
    e = ir.data[0]
    assert np.abs(e).sum() > 0
    # earliest arrival cannot beat the direct path (2 m)
    direct_bin = int(2.0 / SPEED_OF_SOUND * SR)
    first = int(np.nonzero(e)[0][0])
    assert first >= direct_bin - 2
    assert first <= direct_bin + int(0.01 * SR)  # within 10 ms of direct
    # energy decays over time (reverberant tail)
    early = np.abs(e[: SR // 20]).sum()
    late = np.abs(e[SR // 5:]).sum()
    assert early > late
    assert rt.progress == 1.0
    # per-group ray rounding can emit slightly more than requested
    assert rt.stats["rays_traced"] >= 2048


def test_absorption_shortens_reverb():
    def total_late_energy(absorption):
        scene = box_room((5.0, 4.0, 3.0), Material(absorption=absorption))
        rt = RayTrace3D(scene, SR, ir_length_s=0.25, rays=512,
                        max_bounces=25, seed=2)
        rt.add_source(Source(np.array([1.5, 1.5, 1.0], np.float32)))
        rt.add_capture(Capture(np.array([3.5, 2.5, 2.0], np.float32)))
        ir = rt.process()
        return np.abs(ir.data[0][SR // 10:]).sum()

    assert total_late_energy(0.8) < total_late_energy(0.1)


def test_cardioid_rejects_rear():
    scene = box_room((8.0, 8.0, 8.0), Material(absorption=0.95))
    rt = RayTrace3D(scene, SR, ir_length_s=0.1, rays=1024, max_bounces=2,
                    seed=3)
    rt.add_source(Source(np.array([2.0, 4.0, 4.0], np.float32)))
    # capture looks TOWARD the source (-x) vs AWAY
    toward = Capture(np.array([6.0, 4.0, 4.0], np.float32),
                     MicPattern.CARDIOID,
                     np.array([-1.0, 0.0, 0.0], np.float32))
    away = Capture(np.array([6.0, 4.0, 4.0], np.float32),
                   MicPattern.CARDIOID,
                   np.array([1.0, 0.0, 0.0], np.float32))
    rt.add_capture(toward)
    rt.add_capture(away)
    ir = rt.process()
    direct_bin = int(4.0 / SPEED_OF_SOUND * SR)
    w = slice(max(0, direct_bin - 5), direct_bin + 5)
    assert np.abs(ir.data[0][w]).sum() > np.abs(ir.data[1][w]).sum() * 3


def test_obj_roundtrip(tmp_path):
    p = str(tmp_path / "tri.obj")
    with open(p, "w") as fh:
        fh.write("o quad\nv 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    scene = Scene3D.load_obj(p)
    tri, mat, nrm = scene.flatten()
    assert tri.shape == (2, 3, 3)      # quad fan-triangulated
    np.testing.assert_allclose(np.abs(nrm[:, 2]), 1.0)


def test_capture_behind_wall_receives_nothing():
    """Occlusion: a capture separated from the source by a solid wall
    must receive (essentially) no energy, while an unobstructed capture
    in the same scene receives plenty."""
    from lsp_dsp_units_tpu.models.threed.scene import (
        Material, Object3D, box_room)
    from lsp_dsp_units_tpu.models.threed.raytrace import (
        RayTrace3D, Source, Capture, MicPattern)

    absorb = Material(absorption=0.9)
    sc = box_room(size=(8.0, 4.0, 3.0), material=absorb)
    # dividing wall at x=4 splitting the box into two rooms (both
    # triangle windings so it blocks from either side)
    wv = np.array([[4, 0, 0], [4, 4, 0], [4, 4, 3], [4, 0, 3]],
                  np.float32)
    wall_faces = np.asarray(
        [(0, 1, 2), (0, 2, 3), (2, 1, 0), (3, 2, 0)], np.int32)
    sc.add_object(Object3D("wall", wv, wall_faces, absorb))

    rt = RayTrace3D(sc, sample_rate=8000, ir_length_s=0.25, rays=512,
                    max_bounces=4, seed=3)
    rt.add_source(Source(np.array([2.0, 2.0, 1.5], np.float32)))
    rt.add_capture(Capture(np.array([6.0, 2.0, 1.5], np.float32),
                           pattern=MicPattern.OMNI))       # behind wall
    rt.add_capture(Capture(np.array([1.0, 2.0, 1.5], np.float32),
                           pattern=MicPattern.OMNI))       # same room
    smp = rt.process()
    ir = np.asarray(smp.data)
    blocked = float(np.abs(ir[0]).sum())
    open_ = float(np.abs(ir[1]).sum())
    assert open_ > 0.0
    # the walled-off capture gets only multi-bounce leakage around the
    # wall edges (the wall spans the full cross-section here: none)
    assert blocked < 0.05 * open_, (blocked, open_)


def test_late_arrivals_dropped_not_clamped():
    """Reflections arriving after the IR window must be dropped, not
    piled into the final bin."""
    from lsp_dsp_units_tpu.models.threed.scene import Material, box_room
    from lsp_dsp_units_tpu.models.threed.raytrace import (
        RayTrace3D, Source, Capture, MicPattern)

    sc = box_room(size=(60.0, 60.0, 60.0),
                  material=Material(absorption=0.05))
    rt = RayTrace3D(sc, sample_rate=8000, ir_length_s=0.05, rays=256,
                    max_bounces=12, seed=1)    # window << path lengths
    rt.add_source(Source(np.array([10.0, 30.0, 30.0], np.float32)))
    rt.add_capture(Capture(np.array([50.0, 30.0, 30.0], np.float32),
                           pattern=MicPattern.OMNI))
    ir = np.asarray(rt.process().data)[0]
    # the final bin must not be an outlier energy spike
    assert np.abs(ir[-1]) <= np.abs(ir).max() * 0.5 + 1e-12


def test_obj_two_objects_reference_utest(tmp_path):
    """Port of the reference scene-load utest (utest/3d/scene_load.cpp):
    two named quad objects with shared-index faces fan-triangulate into
    2 triangles each, names preserved."""
    p = str(tmp_path / "quads.obj")
    with open(p, "w") as fh:
        fh.write(
            "# Quad test\n"
            "o Quad 1\n"
            "v -2 -2 -1\nv 2 -2 -1\nv 2 2 -1\nv -2 2 -1\n"
            "vn 0 0 1\n"
            "f 1//1 2//1 3//1 4//1\n"
            "\n"
            "o Quad 2\n"
            "v -2 -2 -2\nv 2 -2 -2\nv 2 2 -2\nv -2 2 -2\n"
            "vn 0 0 1\n"
            "f 5//2 6//2 7//2 8//2\n")
    scene = Scene3D.load_obj(p)
    assert len(scene.objects) == 2
    assert scene.objects[0].name == "Quad 1"
    assert scene.objects[1].name == "Quad 2"
    assert all(o.triangles.shape[0] == 2 for o in scene.objects)
    tri, mat, nrm = scene.flatten()
    assert tri.shape == (4, 3, 3)
    # both quads lie in z-planes: unit z normals
    np.testing.assert_allclose(np.abs(nrm[:, 2]), 1.0)
