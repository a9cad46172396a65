"""BSP tree for back-to-front (painter's algorithm) mesh emission
(reference: src/main/3d/bsp/context.cpp:118-553,
include/.../3d/bsp/{context,types}.h).

This serves the reference's debug/viewer rendering path: the scene's
triangles are partitioned by the planes of successive triangles, and
``build_mesh`` walks the tree far-side-first relative to a point of
view, so emitting the result in order draws correctly without a depth
buffer (transparent surfaces included).

Host-side numpy by design — this is scene preparation for a viewer, not
the ray-tracing hot path (which is the batched intersection kernel in
``raytrace.py``).  Instead of the reference's linked-list node arena
(context.cpp:143-161), nodes hold index-free triangle ARRAYS
([n, 3, 3] vertices + colors + inherited plane normals) and the
partition step classifies all of a node's triangles against the plane
in one vectorized pass, splitting straddlers by case exactly as
context.cpp:186-410 does (1-on/1-above/1-below -> 2 triangles;
1-alone/2-opposite -> 3 triangles).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

# "on plane" band for vertex/plane colocation, the float32 analogue of
# the reference's DSP_3D_TOLERANCE (rt/context.cpp:88-93)
TOLERANCE = 1e-5


@dataclass
class _Node:
    plane: Optional[np.ndarray] = None    # [4] nx ny nz dw
    on_v: Optional[np.ndarray] = None     # [n, 3, 3] coplanar triangles
    on_n: Optional[np.ndarray] = None     # [n, 3] inherited face normals
    on_c: Optional[np.ndarray] = None     # [n, 4] RGBA
    inside: Optional["_Node"] = None      # negative halfspace
    outside: Optional["_Node"] = None     # positive halfspace


def _planes(tri: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Unit face normals [n,3] and plane offsets dw [n] with
    n.x + dw = 0 on the plane (reference dsp::calc_plane_pv)."""
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.maximum(ln, 1e-20)
    dw = -np.einsum("ij,ij->i", n, tri[:, 0])
    return n.astype(np.float32), dw.astype(np.float32)


def _split_edge(a: np.ndarray, b: np.ndarray, da: np.ndarray,
                db: np.ndarray) -> np.ndarray:
    """Plane crossing of segments a->b given signed distances da/db
    (reference dsp::calc_split_point_p2v1)."""
    t = da / np.where(np.abs(da - db) < 1e-20, 1e-20, da - db)
    return a + (b - a) * t[..., None]


class BspContext:
    """Builder: ``add_object``/``add_triangles``, then ``build_tree``,
    then ``build_mesh(pov)`` per viewer position (the tree is reused
    across points of view, as in the reference)."""

    def __init__(self):
        self._tris: List[np.ndarray] = []
        self._cols: List[np.ndarray] = []
        self.root: Optional[_Node] = None

    def clear(self) -> None:
        self._tris.clear()
        self._cols.clear()
        self.root = None

    def add_triangles(self, tris, color=(1.0, 1.0, 1.0, 1.0),
                      transform: Optional[np.ndarray] = None) -> None:
        """Append triangles [n, 3, 3] with one RGBA color, optionally
        through a 4x4 transform (reference context.cpp:92-116)."""
        t = np.asarray(tris, np.float32).reshape(-1, 3, 3)
        if transform is not None:
            m = np.asarray(transform, np.float32)
            homo = np.concatenate(
                [t, np.ones((*t.shape[:2], 1), np.float32)], -1)
            t = np.einsum("ij,ntj->nti", m, homo)[..., :3]
        self._tris.append(t)
        c = np.asarray(color, np.float32).reshape(1, 4)
        self._cols.append(np.repeat(c, t.shape[0], 0))

    def add_object(self, obj, color=(1.0, 1.0, 1.0, 1.0),
                   transform: Optional[np.ndarray] = None) -> None:
        """Add a ``scene.Object3D``'s triangles."""
        self.add_triangles(obj.vertices[obj.triangles], color, transform)

    # -- tree construction --------------------------------------------

    def build_tree(self) -> None:
        if not self._tris:
            self.root = None
            return
        tri = np.concatenate(self._tris, 0)
        col = np.concatenate(self._cols, 0)
        nrm, _ = _planes(tri)
        self.root = self._build(tri, nrm, col)

    def _build(self, tri: np.ndarray, nrm: np.ndarray,
               col: np.ndarray) -> _Node:
        """Iterative splitter with an explicit task queue, mirroring
        context.cpp:118-157 (the reference also avoids recursion)."""
        root = _Node()
        queue: List[Tuple[_Node, np.ndarray, np.ndarray, np.ndarray]] = [
            (root, tri, nrm, col)]
        while queue:
            node, t, n, c = queue.pop()
            # the first triangle's plane is the splitter
            # (context.cpp:163-168, with the same TODO: no best-plane
            # heuristic)
            pn, pdw = _planes(t[:1])
            pn, pdw = pn[0], pdw[0]
            node.plane = np.concatenate([pn, pdw[None]]).astype(np.float32)

            d = t @ pn + pdw                          # [m, 3] signed dist
            tag = np.where(d > TOLERANCE, 0,
                           np.where(d < -TOLERANCE, 2, 1)).astype(np.int8)
            n_on = (tag == 1).sum(-1)
            n_out = (tag == 0).sum(-1)
            n_in = (tag == 2).sum(-1)

            whole_on = n_on == 3
            whole_out = (n_in == 0) & ~whole_on
            whole_in = (n_out == 0) & ~whole_on
            straddle = ~(whole_on | whole_out | whole_in)

            on_parts = [(t[whole_on], n[whole_on], c[whole_on])]
            out_parts = [(t[whole_out], n[whole_out], c[whole_out])]
            in_parts = [(t[whole_in], n[whole_in], c[whole_in])]

            if straddle.any():
                st, sn, sc = t[straddle], n[straddle], c[straddle]
                sd, stag = d[straddle], tag[straddle]
                o, i = self._split_straddlers(st, sn, sc, sd, stag)
                out_parts.append(o)
                in_parts.append(i)

            node.on_v, node.on_n, node.on_c = [
                np.concatenate(xs, 0) for xs in zip(*on_parts)]

            for parts, attr in ((out_parts, "outside"),
                                (in_parts, "inside")):
                pv, pn_, pc = [np.concatenate(xs, 0)
                               for xs in zip(*parts)]
                if pv.shape[0]:
                    child = _Node()
                    setattr(node, attr, child)
                    queue.append((child, pv, pn_, pc))
        return root

    @staticmethod
    def _split_straddlers(t, n, c, d, tag):
        """Split triangles crossing the plane.  Two shapes exist
        (context.cpp:219-410): one vertex ON + two opposite -> one
        split point, 2 triangles; one vertex alone vs an opposite edge
        -> two split points, 3 triangles (1 on the lone side, 2 on the
        other).  Vertices are rotated so the distinguished vertex is
        v0, preserving winding."""
        m = t.shape[0]
        out_t, out_n, out_c = [], [], []
        in_t, in_n, in_c = [], [], []

        on_ct = (tag == 1).sum(-1)
        # -- case A: exactly one vertex on the plane, others opposite
        case_a = on_ct == 1
        # -- case B: no vertex on the plane (2 vs 1) or one side has 2
        # including an on vertex?  With one on-vertex the remaining two
        # are opposite (else the whole triangle wouldn't straddle), so
        # everything not case A has a lone vertex against an opposite
        # pair, possibly with on-vertices counted toward the pair side.
        for k in range(m):
            tk, nk, ck, dk, gk = t[k], n[k], c[k], d[k], tag[k]
            if case_a[k]:
                # rotate so v0 is the on-plane vertex; v1/v2 opposite
                r = int(np.argmax(gk == 1))
                idx = [(r + j) % 3 for j in range(3)]
                v0, v1, v2 = tk[idx]
                d1, d2 = dk[idx[1]], dk[idx[2]]
                mpt = _split_edge(v1, v2, d1, d2)
                t_a = np.stack([v0, v1, mpt])     # v1's side
                t_b = np.stack([v0, mpt, v2])     # v2's side
                (out_t if d1 > 0 else in_t).append(t_a)
                (out_n if d1 > 0 else in_n).append(nk)
                (out_c if d1 > 0 else in_c).append(ck)
                (out_t if d2 > 0 else in_t).append(t_b)
                (out_n if d2 > 0 else in_n).append(nk)
                (out_c if d2 > 0 else in_c).append(ck)
            else:
                # lone vertex vs opposite pair: rotate the lone vertex
                # to v0 (an on-plane vertex, if any, joins the pair)
                pos = gk == 0
                lone_side = 0 if pos.sum() == 1 else 2
                r = int(np.argmax(gk == lone_side))
                idx = [(r + j) % 3 for j in range(3)]
                v0, v1, v2 = tk[idx]
                d0, d1, d2 = dk[idx]
                m1 = _split_edge(v0, v1, d0, d1)
                m2 = _split_edge(v0, v2, d0, d2)
                t_lone = np.stack([v0, m1, m2])
                t_p1 = np.stack([m1, v1, v2])
                t_p2 = np.stack([m1, v2, m2])
                lone_out = d0 > 0
                (out_t if lone_out else in_t).append(t_lone)
                (out_n if lone_out else in_n).append(nk)
                (out_c if lone_out else in_c).append(ck)
                for tp in (t_p1, t_p2):
                    (in_t if lone_out else out_t).append(tp)
                    (in_n if lone_out else out_n).append(nk)
                    (in_c if lone_out else out_c).append(ck)

        def pack(ts, ns, cs):
            if not ts:
                return (np.zeros((0, 3, 3), np.float32),
                        np.zeros((0, 3), np.float32),
                        np.zeros((0, 4), np.float32))
            return (np.stack(ts).astype(np.float32),
                    np.stack(ns).astype(np.float32),
                    np.stack(cs).astype(np.float32))

        return pack(out_t, out_n, out_c), pack(in_t, in_n, in_c)

    # -- painter's-order emission -------------------------------------

    def build_mesh(self, pov) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Emit all triangles back-to-front as seen from ``pov``:
        far subtree, then coplanar set, then near subtree
        (context.cpp:455-553).  Triangles facing away from the viewer
        are emitted with reversed winding and flipped normals
        (context.cpp:487-511).

        Returns (vertices [m, 3, 3], normals [m, 3], colors [m, 4]).
        """
        pov = np.asarray(pov, np.float32)
        verts: List[np.ndarray] = []
        norms: List[np.ndarray] = []
        cols: List[np.ndarray] = []

        def emit(node: _Node) -> None:
            if node.on_v is None or not node.on_v.shape[0]:
                return
            pn, pdw = _planes(node.on_v)
            dd = pn @ pov + pdw
            flip = dd < 0.0
            v = node.on_v.copy()
            v[flip] = v[flip][:, ::-1]          # reverse winding
            n = np.where(flip[:, None], -node.on_n, node.on_n)
            verts.append(v)
            norms.append(n)
            cols.append(node.on_c)

        # LIFO with the reference's push order last/self/first so the
        # pop order is first (far), self, last (near)
        stack: List[Tuple[_Node, bool]] = [(self.root, False)] \
            if self.root is not None else []
        while stack:
            node, do_emit = stack.pop()
            if do_emit:
                emit(node)
                continue
            d = float(node.plane[:3] @ pov + node.plane[3])
            first = node.outside if d < 0.0 else node.inside
            last = node.inside if d < 0.0 else node.outside
            if last is not None:
                stack.append((last, False))
            stack.append((node, True))
            if first is not None:
                stack.append((first, False))

        if not verts:
            return (np.zeros((0, 3, 3), np.float32),
                    np.zeros((0, 3), np.float32),
                    np.zeros((0, 4), np.float32))
        return (np.concatenate(verts, 0), np.concatenate(norms, 0),
                np.concatenate(cols, 0))
