"""Scene3D / Object3D — triangle-soup scene model with OBJ loading
(reference: src/main/3d/Scene3D.cpp, Object3D.cpp, Allocator3D.cpp).

TPU-native layout: the scene is flat arrays — vertices [V, 3], triangles
[T, 3] vertex indices, per-triangle material parameters — instead of the
reference's linked vertex/edge/triangle adjacency structures (which serve
its BSP/culling pipeline; batched intersection tests need none of that).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


def _pair(v) -> Tuple[float, float]:
    """Scalar (incl. 0-d arrays) -> (outer, inner); 2-sequence passed
    through."""
    if np.ndim(v) == 0:
        return (float(v), float(v))
    a, b = v
    return (float(a), float(b))


@dataclass
class Material:
    """Acoustic surface material (reference rt::material_t,
    include/.../3d/rt/types.h:77-85).

    Each of ``absorption`` / ``diffusion`` / ``dispersion`` /
    ``transparency`` is a per-side (outer, inner) pair — index 0 applies
    when the wave hits the face from outside (along the normal's
    positive side), index 1 from inside; a scalar sets both sides.

    Semantics (reference RayTrace3D.cpp:755-788):
      absorption    amplitude fraction removed at the interface
      diffusion     virtual-source pullback for the REFLECTED wave:
                    1.0 = specular mirror, larger = more diffuse spread
      dispersion    virtual-source pullback for the REFRACTED wave
      transparency  amplitude fraction passing through the material
      permeability  inner/outer sound-speed ratio for the refracted wave
    """
    absorption: object = 0.1
    diffusion: object = 1.0
    dispersion: object = 1.0
    transparency: object = 0.0
    permeability: float = 1.0

    def __post_init__(self):
        self.absorption = _pair(self.absorption)
        self.diffusion = _pair(self.diffusion)
        self.dispersion = _pair(self.dispersion)
        self.transparency = _pair(self.transparency)
        self.permeability = float(self.permeability)
        # diffusion/dispersion enter the reflection geometry as
        # kd = (1 + 1/diffusion)*distance (RayTrace3D.cpp:759-788):
        # values <= 0 would silently fling the virtual source to
        # infinity (0.0 was also an earlier meaning of "no scattering"
        # in this package — under the reference semantics that is 1.0)
        for name in ("diffusion", "dispersion"):
            pair = getattr(self, name)
            if min(pair) <= 0.0:
                raise ValueError(
                    f"Material.{name} must be > 0 (1.0 = specular "
                    f"mirror, larger = more diffuse); got {pair}")

    def row(self) -> np.ndarray:
        """Flat parameter row [9] for Scene3D.flatten()."""
        return np.array([*self.absorption, *self.diffusion,
                         *self.dispersion, *self.transparency,
                         self.permeability], np.float32)


@dataclass
class Object3D:
    name: str
    vertices: np.ndarray        # [V, 3] float32
    triangles: np.ndarray       # [T, 3] int32 indices into vertices
    material: Material = field(default_factory=Material)


class Scene3D:
    def __init__(self):
        self.objects: List[Object3D] = []

    def add_object(self, obj: Object3D) -> None:
        self.objects.append(obj)

    @classmethod
    def load_obj(cls, path: str) -> "Scene3D":
        """Minimal Wavefront OBJ loader (v / f records, polygon fan
        triangulation) — the reference's scene source format."""
        scene = cls()
        verts: List[Tuple[float, float, float]] = []
        faces: List[Tuple[int, int, int]] = []
        name = "default"

        def flush():
            nonlocal faces, name
            if faces:
                scene.add_object(Object3D(
                    name=name,
                    vertices=np.asarray(verts, np.float32),
                    triangles=np.asarray(faces, np.int32)))
                faces = []

        with open(path) as fh:
            for line in fh:
                parts = line.strip().split()
                if not parts or parts[0].startswith("#"):
                    continue
                if parts[0] == "o" or parts[0] == "g":
                    flush()
                    # the object name is the REST OF THE LINE — names
                    # with spaces ("o Quad 1") are legal and preserved
                    # (reference utest/3d/scene_load.cpp pins this)
                    rest = line.strip().split(None, 1)
                    name = rest[1] if len(rest) > 1 else "default"
                elif parts[0] == "v":
                    verts.append((float(parts[1]), float(parts[2]),
                                  float(parts[3])))
                elif parts[0] == "f":
                    # OBJ indices are 1-based; NEGATIVE indices are
                    # relative to the vertices read so far (-1 = most
                    # recent) per the spec — int(p)-1 would off-by-one
                    # them through numpy wrapping
                    raw = [int(p.split("/")[0]) for p in parts[1:]]
                    idx = [r - 1 if r > 0 else len(verts) + r
                           for r in raw]
                    for i in range(1, len(idx) - 1):   # fan triangulate
                        faces.append((idx[0], idx[i], idx[i + 1]))
        flush()
        return scene

    def flatten(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All triangles as [T, 3, 3] with per-triangle material rows
        [T, 9] (absorption pair, diffusion pair, dispersion pair,
        transparency pair, permeability — see Material.row)."""
        tris = []
        mats = []
        for obj in self.objects:
            t = obj.vertices[obj.triangles]      # [T, 3, 3]
            tris.append(t)
            mats.append(np.tile(obj.material.row(), (t.shape[0], 1)))
        if not tris:
            return (np.zeros((0, 3, 3), np.float32),
                    np.zeros((0, 9), np.float32),
                    np.zeros((0, 3), np.float32))
        tri = np.concatenate(tris, 0).astype(np.float32)
        mat = np.concatenate(mats, 0).astype(np.float32)
        # face normals
        e1 = tri[:, 1] - tri[:, 0]
        e2 = tri[:, 2] - tri[:, 0]
        n = np.cross(e1, e2)
        ln = np.linalg.norm(n, axis=-1, keepdims=True)
        n = n / np.maximum(ln, 1e-12)
        return tri, mat, n.astype(np.float32)


def box_room(size=(6.0, 4.0, 3.0), material: Optional[Material] = None,
             ) -> Scene3D:
    """Convenience shoebox room (triangles facing inward)."""
    sx, sy, sz = size
    v = np.array([
        [0, 0, 0], [sx, 0, 0], [sx, sy, 0], [0, sy, 0],
        [0, 0, sz], [sx, 0, sz], [sx, sy, sz], [0, sy, sz]], np.float32)
    quads = [
        (0, 1, 2, 3),  # floor
        (7, 6, 5, 4),  # ceiling
        (0, 4, 5, 1),  # wall y=0
        (2, 6, 7, 3),  # wall y=sy
        (1, 5, 6, 2),  # wall x=sx
        (3, 7, 4, 0),  # wall x=0
    ]
    faces = []
    for (a, b, c, d) in quads:
        faces.append((a, b, c))
        faces.append((a, c, d))
    scene = Scene3D()
    scene.add_object(Object3D(
        "room", v, np.asarray(faces, np.int32),
        material or Material(absorption=0.3)))
    return scene
