"""Audio source shapes and ray-fan generation (reference:
src/main/3d/raytrace.cpp:39-689, include/.../3d/raytrace.h:35-115).

The reference emits beam GROUPS — an apex point ``s`` plus a triangle
``p[0..2]`` — per source shape, with the apex pulled along the group
normal by the dispersion-angle tangent (``apply_tangent``,
raytrace.cpp:156-164).  The TPU redesign keeps that exact geometry but
converts each group into a fan of RAYS: stratified barycentric points on
the group triangle, each ray starting on the triangle surface, directed
away from the apex, carrying the apex as its *virtual source* point (the
quantity the reference's reflection math transports,
RayTrace3D.cpp:755-788).

All twelve ``rt_audio_source_t`` shapes are implemented with the
reference's vertex tables and tessellations (raytrace.cpp:39-155 ico /
octa / box / tetra tables; 166-667 generators).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

X_SQRT3 = 1.73205080757
ICO_X = 0.525731112119133606
ICO_N = 0.0
ICO_Z = 0.850650808352039932

# icosahedron (raytrace.cpp:39-81)
ICO_VERTEX = np.array([
    [-ICO_X, ICO_N, ICO_Z], [ICO_X, ICO_N, ICO_Z],
    [-ICO_X, ICO_N, -ICO_Z], [ICO_X, ICO_N, -ICO_Z],
    [ICO_N, ICO_Z, ICO_X], [ICO_N, ICO_Z, -ICO_X],
    [ICO_N, -ICO_Z, ICO_X], [ICO_N, -ICO_Z, -ICO_X],
    [ICO_Z, ICO_X, ICO_N], [-ICO_Z, ICO_X, ICO_N],
    [ICO_Z, -ICO_X, ICO_N], [-ICO_Z, -ICO_X, ICO_N]], np.float64)
ICO_FACES = np.array([
    [0, 1, 4], [0, 4, 9], [9, 4, 5], [4, 8, 5],
    [4, 1, 8], [8, 1, 10], [8, 10, 3], [5, 8, 3],
    [5, 3, 2], [2, 3, 7], [7, 3, 10], [7, 10, 6],
    [7, 6, 11], [11, 6, 0], [0, 6, 1], [6, 10, 1],
    [9, 11, 0], [9, 2, 11], [9, 5, 2], [7, 11, 2]], np.int32)

# octahedron (raytrace.cpp:85-106)
OCTA_VERTEX = np.array([
    [0, 0, 1], [0, 0, -1], [1, 0, 0],
    [0, 1, 0], [-1, 0, 0], [0, -1, 0]], np.float64)
OCTA_FACES = np.array([
    [0, 2, 3], [0, 3, 4], [0, 4, 5], [0, 5, 2],
    [1, 3, 2], [1, 4, 3], [1, 5, 4], [1, 2, 5]], np.int32)

# box (raytrace.cpp:109-138)
BOX_VERTEX = np.array([
    [1, 1, 1], [-1, 1, 1], [-1, -1, 1], [1, -1, 1],
    [1, 1, -1], [-1, 1, -1], [-1, -1, -1], [1, -1, -1]], np.float64)
BOX_FACES = np.array([
    [0, 1, 2], [0, 2, 3], [0, 4, 5], [0, 5, 1],
    [1, 5, 6], [1, 6, 2], [0, 3, 7], [0, 7, 4],
    [3, 2, 6], [3, 6, 7], [5, 4, 7], [5, 7, 6]], np.int32)

# tetrahedron (raytrace.cpp:140-153)
TETRA_VERTEX = np.array([
    [0.942809041582, 0.0, -0.333333333333],
    [-0.471404520791, 0.816496580928, -0.333333333333],
    [-0.471404520791, -0.816496580928, -0.333333333333],
    [0.0, 0.0, 1.0]], np.float64)
TETRA_FACES = np.array(
    [[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 2, 3]], np.int32)


class SourceShape(enum.Enum):
    """rt_audio_source_t (raytrace.h:35-48)."""
    TRIANGLE = "triangle"
    TETRA = "tetra"
    OCTA = "octa"
    BOX = "box"
    ICO = "ico"
    CYLINDER = "cylinder"
    CONE = "cone"
    OCTASPHERE = "octasphere"
    ICOSPHERE = "icosphere"
    FSPOT = "fspot"
    CSPOT = "cspot"
    SSPOT = "sspot"


@dataclass
class SourceSettings:
    """rt_source_settings_t (raytrace.h:84-93): local-frame shape config
    plus a position/orientation transform."""
    shape: SourceShape = SourceShape.ICOSPHERE
    size: float = 0.1            # radius [m]
    height: float = 0.1          # height [m] (cylinder/cone/cspot)
    angle: float = 50.0          # dispersion angle [0..100] %
    curvature: float = 50.0      # spot curvature [0..100] %
    amplitude: float = 1.0
    position: np.ndarray = field(
        default_factory=lambda: np.zeros(3, np.float64))
    yaw: float = 0.0             # degrees, rotation about z
    pitch: float = 0.0           # degrees, rotation about y
    roll: float = 0.0            # degrees, rotation about x


def _rotation(yaw: float, pitch: float, roll: float) -> np.ndarray:
    """Z(yaw) @ Y(pitch) @ X(roll), degrees — the matrix composition of
    rt_configure_source (raytrace.cpp:748-775)."""
    cy, sy = np.cos(np.radians(yaw)), np.sin(np.radians(yaw))
    cp, sp = np.cos(np.radians(pitch)), np.sin(np.radians(pitch))
    cr, sr = np.cos(np.radians(roll)), np.sin(np.radians(roll))
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]], np.float64)
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]], np.float64)
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]], np.float64)
    return rz @ ry @ rx


def _apply_tangent(s: np.ndarray, p: np.ndarray, tg: float) -> np.ndarray:
    """Move the apex along the group-plane normal so its distance to the
    plane scales by ``tg`` (raytrace.cpp:156-164)."""
    n = np.cross(p[1] - p[0], p[2] - p[0])
    ln = np.linalg.norm(n)
    if ln < 1e-12:
        return s
    n = n / ln
    d = float(np.dot(n, s - p[0]))
    return s + n * (d * (tg - 1.0))


def _groups_from_faces(vertex, faces, size, tg) -> List[Tuple]:
    sp = np.zeros(3, np.float64)
    out = []
    for f in faces:
        p = vertex[f] * size
        out.append((_apply_tangent(sp, p, tg), p))
    return out


def _subdivided_sphere(vertex, faces, size, tg) -> List[Tuple]:
    """One flat 4-way face subdivision, apex at the center — the
    icosphere/octasphere generators (raytrace.cpp:536-667; midpoints are
    NOT re-projected onto the sphere, kept verbatim)."""
    sp = np.zeros(3, np.float64)
    out = []
    for f in faces:
        xp = vertex[f]
        mid = np.array([(xp[0] + xp[1]) * 0.5, (xp[1] + xp[2]) * 0.5,
                        (xp[2] + xp[0]) * 0.5])
        for tri in (np.array([xp[0], mid[0], mid[2]]),
                    np.array([xp[1], mid[1], mid[0]]),
                    np.array([xp[2], mid[2], mid[1]]),
                    np.array([mid[0], mid[1], mid[2]])):
            p = tri * size
            out.append((_apply_tangent(sp, p, tg), p))
    return out


def source_groups(cfg: SourceSettings) -> List[Tuple]:
    """Beam groups [(apex [3], triangle [3,3]), ...] in LOCAL frame —
    rt_gen_source_mesh (raytrace.cpp:669-689)."""
    tg = np.tan(np.radians(5.0 + 0.8 * cfg.angle))
    size, height = float(cfg.size), float(cfg.height)
    sh = cfg.shape

    if sh == SourceShape.TRIANGLE:         # raytrace.cpp:166-182
        half = 0.5 * size
        s = np.array([-size, 0.0, 0.0])
        p = np.array([[0.0, 0.0, size],
                      [0.0, -half * X_SQRT3, -half],
                      [0.0, half * X_SQRT3, -half]])
        return [(_apply_tangent(s, p, tg), p)]
    if sh == SourceShape.OCTA:
        return _groups_from_faces(OCTA_VERTEX, OCTA_FACES, size, tg)
    if sh == SourceShape.ICO:
        return _groups_from_faces(ICO_VERTEX, ICO_FACES, size, tg)
    if sh == SourceShape.BOX:
        return _groups_from_faces(BOX_VERTEX, BOX_FACES, size, tg)
    if sh == SourceShape.TETRA:
        return _groups_from_faces(TETRA_VERTEX, TETRA_FACES, size, tg)
    if sh == SourceShape.ICOSPHERE:
        return _subdivided_sphere(ICO_VERTEX, ICO_FACES, size, tg)
    if sh == SourceShape.OCTASPHERE:
        return _subdivided_sphere(OCTA_VERTEX, OCTA_FACES, size, tg)

    if sh == SourceShape.CYLINDER:         # raytrace.cpp:300-345
        n = 16
        sp = np.zeros(3)
        ka = np.pi / n
        kb = 2.0 * ka
        out = []
        for i in range(n):
            at = (i * kb, i * kb + kb)
            ab = (at[0] + ka, at[1] + ka)
            pt = [np.array([np.cos(a) * size, np.sin(a) * size, height])
                  for a in at]
            pb = [np.array([np.cos(a) * size, np.sin(a) * size, -height])
                  for a in ab]
            for tri in (np.array([pt[0], pb[0], pt[1]]),
                        np.array([pb[0], pb[1], pt[1]])):
                out.append((_apply_tangent(sp, tri, tg), tri))
        return out

    if sh in (SourceShape.CONE, SourceShape.FSPOT):
        # cone raytrace.cpp:347-376 (apex at center, tip +x*height);
        # flat spot :378-407 (identical fan, apex pulled back -x*size)
        n = 16
        sp = (np.zeros(3) if sh == SourceShape.CONE
              else np.array([-size, 0.0, 0.0]))
        tp = (np.array([height, 0.0, 0.0]) if sh == SourceShape.CONE
              else np.zeros(3))
        ka = 2.0 * np.pi / n
        out = []
        for i in range(n):
            a1, a2 = i * ka, (i + 1) * ka
            tri = np.array([
                tp,
                [0.0, np.cos(a2) * size, np.sin(a2) * size],
                [0.0, np.cos(a1) * size, np.sin(a1) * size]])
            out.append((_apply_tangent(sp, tri, tg), tri))
        return out

    if sh == SourceShape.SSPOT:            # raytrace.cpp:409-471
        n, r = 16, 4
        intr = size * (1.0 + np.tan(
            np.radians((100.0 - cfg.curvature) * 0.85)))
        sa = np.arccos(min(size / intr, 1.0))
        step = (np.pi / 2 - sa) / r
        sp = np.array([-intr * np.sin(sa), 0.0, 0.0])
        ka = np.pi / n
        kb = 2.0 * ka
        off = 0.0
        out = []
        for i in range(r):
            a1, a2 = sa + i * step, sa + (i + 1) * step
            r1, r2 = np.cos(a1) * intr, np.cos(a2) * intr
            x1 = sp[0] + np.sin(a1) * intr
            x2 = sp[0] + np.sin(a2) * intr
            for j in range(n):
                at = (off + j * kb, off + j * kb + kb)
                ab = (at[0] + ka, at[1] + ka)
                pt = [np.array([x1, np.cos(a) * r1, np.sin(a) * r1])
                      for a in at]
                pb = [np.array([x2, np.cos(a) * r2, np.sin(a) * r2])
                      for a in ab]
                for tri in (np.array([pt[0], pb[0], pt[1]]),
                            np.array([pb[0], pb[1], pt[1]])):
                    out.append((_apply_tangent(sp, tri, tg), tri))
            off += ka
        return out

    if sh == SourceShape.CSPOT:            # raytrace.cpp:473-534
        n = 8
        intr = size * (1.0 + np.tan(
            np.radians((100.0 - cfg.curvature) * 0.85)))
        sa = np.arccos(min(size / intr, 1.0))
        ea = np.pi - sa
        kb = (ea - sa) / n
        ka = 0.5 * kb
        sp = np.array([-intr * np.sin(sa), 0.0, 0.0])
        out = []
        pt = [None, None]
        pb = [None, None]
        for i in range(n):
            at = (sa + i * kb, sa + (i + 1) * kb)
            ab = [max(at[0] - ka, sa), at[1] - ka]
            pt = [np.array([sp[0] + np.sin(a) * intr,
                            np.cos(a) * intr, height]) for a in at]
            pb = [np.array([sp[0] + np.sin(a) * intr,
                            np.cos(a) * intr, -height]) for a in ab]
            for tri in (np.array([pt[0], pb[1], pb[0]]),
                        np.array([pt[0], pt[1], pb[1]])):
                out.append((_apply_tangent(sp, tri, tg), tri))
        last = np.array([sp[0] + np.sin(ea) * intr,
                         np.cos(ea) * intr, -height])
        tri = np.array([pt[1], last, pb[1]])
        out.append((_apply_tangent(sp, tri, tg), tri))
        return out

    raise ValueError(f"unknown source shape {sh}")


def _r2_sequence(n: int, seed: int = 0) -> np.ndarray:
    """Low-discrepancy 2D points in [0,1)^2 (R2 sequence).  ``seed``
    applies a Cranley-Patterson rotation so different seeds give
    decorrelated (still stratified) fans for variance estimation."""
    g = 1.32471795724474602596   # plastic number
    a = np.array([1.0 / g, 1.0 / (g * g)])
    i = np.arange(1, n + 1, dtype=np.float64)[:, None]
    shift = np.asarray(
        np.random.default_rng(seed).random(2) if seed else (0.0, 0.0))
    return (0.5 + shift[None, :] + i * a[None, :]) % 1.0


def source_rays(cfg: SourceSettings, total_rays: int, seed: int = 0,
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Emit a stratified ray fan for the configured source.

    Returns (origins [R,3], dirs [R,3], vsrc [R,3], amp [R]) in WORLD
    frame (position + yaw/pitch/roll applied, rt_configure_source
    raytrace.cpp:748-775).  Per-ray amplitude weights sum to
    ``cfg.amplitude`` and are proportional to each ray's LOCAL SOLID
    ANGLE as seen from its group apex (``dA·cosα/d²``): flat-triangle
    area sampling alone is up to ~30% denser (per steradian) near face
    centers than near vertices, which would bias the tracer's
    detection-cone amplitude estimator by whichever patch a capture
    cone lands on.  Solid-angle weighting makes an ICOSPHERE source
    exactly isotropic and keeps the cone estimator unbiased for every
    shape.
    """
    groups = source_groups(cfg)
    areas = np.array([0.5 * np.linalg.norm(
        np.cross(p[1] - p[0], p[2] - p[0])) for _, p in groups])
    if float(areas.sum()) <= 0.0:
        raise ValueError("degenerate source geometry")
    n_g = len(groups)
    per = max(1, int(np.ceil(total_rays / n_g)))
    uv = _r2_sequence(per, seed)
    # square -> triangle warp (keeps stratification)
    su = np.sqrt(uv[:, 0])
    b0 = 1.0 - su
    b1 = su * (1.0 - uv[:, 1])
    b2 = su * uv[:, 1]

    rot = _rotation(cfg.yaw, cfg.pitch, cfg.roll)
    pos = np.asarray(cfg.position, np.float64)

    origins, dirs, vsrcs, weights = [], [], [], []
    for (s, p), area in zip(groups, areas):
        pts = (b0[:, None] * p[0] + b1[:, None] * p[1]
               + b2[:, None] * p[2])                       # [per, 3]
        d = pts - s[None, :]
        ln = np.linalg.norm(d, axis=-1, keepdims=True)
        d = d / np.maximum(ln, 1e-12)
        # per-ray solid angle: dA * cos(angle to face normal) / d^2
        n_face = np.cross(p[1] - p[0], p[2] - p[0])
        n_face = n_face / max(np.linalg.norm(n_face), 1e-12)
        cos_a = np.abs(d @ n_face)
        omega = (area / per) * cos_a / np.maximum(ln[:, 0], 1e-12) ** 2
        origins.append(pts @ rot.T + pos)
        dirs.append(d @ rot.T)
        vsrcs.append(np.tile(s @ rot.T + pos, (per, 1)))
        weights.append(omega)
    w = np.concatenate(weights)
    amps = cfg.amplitude * w / w.sum()
    return (np.concatenate(origins).astype(np.float32),
            np.concatenate(dirs).astype(np.float32),
            np.concatenate(vsrcs).astype(np.float32),
            amps.astype(np.float32))
