"""BSP back-to-front mesh emission (reference
src/main/3d/bsp/context.cpp): partition invariants, painter order,
straddler splitting, and winding flips."""

import numpy as np

from lsp_dsp_units_tpu.models.threed import BspContext, box_room


def tri_area(v):
    """Total area of triangles [n, 3, 3]."""
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    return 0.5 * np.linalg.norm(n, axis=-1).sum()


def quad(z, size=1.0):
    """Two triangles forming a unit quad at height z (+z normal)."""
    v = np.array([[0, 0, z], [size, 0, z], [size, size, z],
                  [0, size, z]], np.float32)
    return np.stack([v[[0, 1, 2]], v[[0, 2, 3]]])


def test_empty_and_clear():
    ctx = BspContext()
    ctx.build_tree()
    v, n, c = ctx.build_mesh([0, 0, 10])
    assert v.shape == (0, 3, 3)
    ctx.add_triangles(quad(0.0))
    ctx.clear()
    ctx.build_tree()
    assert ctx.root is None


def test_painter_order_two_parallel_quads():
    """Viewer above sees the lower quad first (it is farther); viewer
    below sees the upper quad first (context.cpp:515-547)."""
    ctx = BspContext()
    ctx.add_triangles(quad(0.0), color=(1, 0, 0, 1))
    ctx.add_triangles(quad(1.0), color=(0, 1, 0, 1))
    ctx.build_tree()

    v, n, c = ctx.build_mesh([0.5, 0.5, 5.0])     # above both
    assert v.shape[0] == 4
    # first emitted triangles are the z=0 (red) quad
    assert np.allclose(v[0][:, 2], 0.0) and c[0][0] == 1.0
    assert np.allclose(v[-1][:, 2], 1.0) and c[-1][1] == 1.0

    v2, n2, c2 = ctx.build_mesh([0.5, 0.5, -5.0])  # below both
    assert np.allclose(v2[0][:, 2], 1.0) and c2[0][1] == 1.0
    assert np.allclose(v2[-1][:, 2], 0.0) and c2[-1][0] == 1.0


def test_winding_flip_for_back_faces():
    """A +z-normal quad viewed from below is emitted with reversed
    winding and flipped normals (context.cpp:487-499)."""
    ctx = BspContext()
    ctx.add_triangles(quad(0.0))
    ctx.build_tree()

    v, n, c = ctx.build_mesh([0.5, 0.5, 2.0])
    emitted_n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    assert (emitted_n[:, 2] > 0).all() and (n[:, 2] > 0).all()

    v, n, c = ctx.build_mesh([0.5, 0.5, -2.0])
    emitted_n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    assert (emitted_n[:, 2] < 0).all() and (n[:, 2] < 0).all()


def test_straddler_split_conserves_area():
    """A vertical triangle crossing a horizontal splitter quad is cut
    into pieces; total area and piece sidedness are preserved
    (context.cpp:219-410)."""
    ctx = BspContext()
    big = quad(0.0, size=4.0)                     # splitter plane z=0
    cross = np.array([[[1, 1, -1], [3, 1, -1], [2, 1, 2]]], np.float32)
    ctx.add_triangles(big, color=(1, 0, 0, 1))
    ctx.add_triangles(cross, color=(0, 1, 0, 1))
    ctx.build_tree()

    v, n, c = ctx.build_mesh([2.0, -3.0, 5.0])
    green = c[:, 1] == 1.0
    assert green.sum() == 3                        # 1 above + 2 below
    assert np.isclose(tri_area(v[green]), tri_area(cross), rtol=1e-5)
    # each green piece lies strictly on one side of z=0
    z = v[green][:, :, 2]
    for zi in z:
        assert (zi >= -1e-4).all() or (zi <= 1e-4).all()
    # area of everything is conserved
    assert np.isclose(tri_area(v), tri_area(big) + tri_area(cross),
                      rtol=1e-5)


def test_on_plane_vertex_split():
    """Case A (context.cpp:219-287): one vertex ON the plane, the other
    two on opposite sides -> exactly two pieces."""
    ctx = BspContext()
    ctx.add_triangles(quad(0.0, size=4.0), color=(1, 0, 0, 1))
    tri = np.array([[[2, 1, 0], [1, 1, -2], [3, 1, 2]]], np.float32)
    ctx.add_triangles(tri, color=(0, 0, 1, 1))
    ctx.build_tree()
    v, n, c = ctx.build_mesh([2.0, -5.0, 5.0])
    blue = c[:, 2] == 1.0
    assert blue.sum() == 2
    assert np.isclose(tri_area(v[blue]), tri_area(tri), rtol=1e-5)


def test_box_room_mesh_complete():
    """All 12 room triangles emitted from inside, area conserved, and
    inward normals preserved (viewer inside faces every wall front)."""
    scene = box_room(size=(4.0, 3.0, 2.5))
    obj = scene.objects[0]
    ctx = BspContext()
    ctx.add_object(obj, color=(0.5, 0.5, 0.5, 1.0))
    ctx.build_tree()
    v, n, c = ctx.build_mesh([2.0, 1.5, 1.25])
    src = obj.vertices[obj.triangles]
    assert v.shape[0] >= 12
    assert np.isclose(tri_area(v), tri_area(src), rtol=1e-4)
    # every emitted triangle faces the interior viewer
    pov = np.array([2.0, 1.5, 1.25], np.float32)
    en = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    to_pov = pov[None, :] - v[:, 0]
    assert (np.einsum("ij,ij->i", en, to_pov) > 0).all()


def test_painter_order_is_occlusion_safe():
    """For random viewer positions around a two-plane scene, any
    emitted triangle that occludes another (same line of sight to the
    viewer) must come LATER in the emission order."""
    rng = np.random.default_rng(0)
    ctx = BspContext()
    ctx.add_triangles(quad(0.0, 2.0), color=(1, 0, 0, 1))
    ctx.add_triangles(quad(1.0, 2.0), color=(0, 1, 0, 1))
    # a vertical triangle crossing both planes
    ctx.add_triangles(
        np.array([[[0.5, 1.0, -0.5], [1.5, 1.0, -0.5], [1.0, 1.0, 1.5]]],
                 np.float32), color=(0, 0, 1, 1))
    ctx.build_tree()
    for _ in range(8):
        pov = rng.uniform(-1, 3, 3).astype(np.float32)
        pov[2] = rng.uniform(1.5, 4.0) * rng.choice([-1.0, 1.0])
        v, n, c = ctx.build_mesh(pov)
        # sample the centroid of each triangle; centroids closer to the
        # viewer along the SAME ray direction must be emitted later
        cen = v.mean(1)
        dist = np.linalg.norm(cen - pov[None, :], axis=-1)
        dirs = (cen - pov[None, :]) / dist[:, None]
        m = v.shape[0]
        for a in range(m):
            for b in range(a + 1, m):
                # nearly-collinear sight lines => b (later) must not be
                # farther than a when they overlap in view direction
                if dirs[a] @ dirs[b] > 0.9999 and dist[b] > dist[a] + 1e-3:
                    raise AssertionError(
                        f"pov {pov}: triangle {b} emitted after {a} but "
                        f"is farther ({dist[b]:.3f} > {dist[a]:.3f})")
