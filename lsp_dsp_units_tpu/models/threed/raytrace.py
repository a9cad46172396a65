"""RayTrace3D — geometric-acoustics ray tracer producing impulse
responses (reference: src/main/3d/RayTrace3D.cpp, rt/*.cpp, raytrace.cpp).

TPU-native redesign: the reference pipelines ray GROUPS through worker
threads with view-frustum culling, triangle splitting and BSP ordering
(RayTrace3D.cpp:87-222) — CPU machinery for keeping per-ray work small.
Here a whole GENERATION of rays tests against ALL triangles at once
(Möller-Trumbore, batched [R, T] on the VPU/MXU); bounces iterate on the
host with device-side energy capture accumulation via scatter-add into
the IR bins.  Sources emit icosphere-distributed ray fans with energy
directivity; captures are point microphones with omni/cardioid/figure-8
patterns accumulating energy at the propagation delay (reference
raytrace.h capture/source primitives, rt_audio_capture_t patterns).
Capture legs are occlusion-tested against the full scene.

Documented simplifications vs the reference's material model
(rt::material_t): ``Material.diffusion`` and ``transparency`` are
accepted by :class:`..scene.Material` but not yet applied — reflections
are specular and blockers are fully opaque; only ``absorption`` (plus
air absorption and spherical spreading) shapes the energy decay.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.threed.scene import Scene3D
from lsp_dsp_units_tpu.models.sampling.sample import Sample

SPEED_OF_SOUND = 340.0   # m/s (reference sound speed constant)


class MicPattern(enum.Enum):
    OMNI = "omni"
    CARDIOID = "cardioid"
    FIGURE8 = "figure8"


@dataclass
class Source:
    position: np.ndarray             # [3]
    energy: float = 1.0


@dataclass
class Capture:
    position: np.ndarray             # [3]
    pattern: MicPattern = MicPattern.OMNI
    direction: np.ndarray = None     # [3] look direction for patterns

    def __post_init__(self):
        if self.direction is None:
            self.direction = np.array([1.0, 0.0, 0.0], np.float32)


def _fibonacci_sphere(n: int) -> np.ndarray:
    """Quasi-uniform ray directions (the reference tessellates an
    icosphere — raytrace.cpp icosphere generation; a Fibonacci sphere
    gives the same uniformity as a closed form)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    theta = np.pi * (1.0 + 5.0 ** 0.5) * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(phi)], -1).astype(np.float32)


def _intersect(origins, dirs, tri, eps=1e-6):
    """Batched Möller-Trumbore: rays [R,3]x[R,3] vs triangles [T,3,3].

    Returns (t_hit [R], tri_idx [R]) — nearest positive intersection
    (the TPU replacement for the reference's rt::context scan/cull/split
    pipeline: test EVERYTHING, reduce with argmin)."""
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0            # [T, 3]
    e2 = tri[:, 2] - v0
    # pvec = dir x e2 : [R, T, 3]
    pvec = jnp.cross(dirs[:, None, :], e2[None, :, :])
    det = jnp.sum(pvec * e1[None, :, :], -1)            # [R, T]
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    tvec = origins[:, None, :] - v0[None, :, :]         # [R, T, 3]
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(dirs[:, None, :] * qvec, -1) * inv_det
    t = jnp.sum(e2[None, :, :] * qvec, -1) * inv_det
    valid = ((jnp.abs(det) > eps) & (u >= -eps) & (v >= -eps)
             & (u + v <= 1.0 + eps) & (t > 1e-4))
    t = jnp.where(valid, t, jnp.inf)
    idx = jnp.argmin(t, axis=-1)                        # [R]
    t_hit = jnp.take_along_axis(t, idx[:, None], -1)[:, 0]
    return t_hit, idx


class RayTrace3D:
    """Host-orchestrated, device-batched acoustic ray tracer."""

    def __init__(self, scene: Scene3D, sample_rate: int = 48000,
                 ir_length_s: float = 1.0, rays: int = 4096,
                 max_bounces: int = 30, energy_floor: float = 1e-6,
                 air_absorption: float = 0.003, seed: int = 0):
        self.scene = scene
        self.sample_rate = int(sample_rate)
        self.ir_len = int(sample_rate * ir_length_s)
        self.rays = int(rays)
        self.max_bounces = int(max_bounces)
        self.energy_floor = float(energy_floor)
        self.air = float(air_absorption)
        self.sources: List[Source] = []
        self.captures: List[Capture] = []
        self.seed = seed
        self.progress: float = 0.0
        self._cancelled = False
        self.stats = {"rays_traced": 0, "bounces": 0, "captured": 0}

    def add_source(self, src: Source) -> None:
        self.sources.append(src)

    def add_capture(self, cap: Capture) -> None:
        self.captures.append(cap)

    def cancel(self) -> None:
        """Cooperative cancellation (reference bCancelled flag)."""
        self._cancelled = True

    # -- capture weighting --------------------------------------------------
    @staticmethod
    def _pattern_gain(pattern: MicPattern, cos_angle):
        if pattern == MicPattern.OMNI:
            return jnp.ones_like(cos_angle)
        if pattern == MicPattern.CARDIOID:
            return 0.5 * (1.0 + cos_angle)
        return jnp.abs(cos_angle)     # figure-8

    def process(self) -> Sample:
        """Trace all sources; returns a Sample with one channel per
        capture holding the energy impulse response (reference
        RayTrace3D::process binds captures to Sample channels)."""
        tri_np, mat_np, nrm_np = self.scene.flatten()
        assert tri_np.shape[0] > 0, "empty scene"
        tri = jnp.asarray(tri_np)
        absorption = jnp.asarray(mat_np[:, 0])
        nrm = jnp.asarray(nrm_np)
        cap_pos = jnp.asarray(
            np.stack([c.position for c in self.captures]).astype(
                np.float32))
        cap_dir = jnp.asarray(
            np.stack([c.direction / np.linalg.norm(c.direction)
                      for c in self.captures]).astype(np.float32))

        irs = np.zeros((len(self.captures), self.ir_len), np.float32)

        @jax.jit
        def bounce(origins, dirs, energy, dist):
            t_hit, idx = _intersect(origins, dirs, tri)
            hit = jnp.isfinite(t_hit)
            t_safe = jnp.where(hit, t_hit, 0.0)
            hit_pt = origins + dirs * t_safe[:, None]
            n = nrm[idx]
            # reflect: d' = d - 2 (d.n) n
            dn = jnp.sum(dirs * n, -1, keepdims=True)
            new_dirs = dirs - 2.0 * dn * n
            absorb = absorption[idx]
            new_energy = jnp.where(
                hit, energy * (1.0 - absorb)
                * jnp.exp(-self.air * t_safe), 0.0)
            new_dist = dist + t_safe

            # capture contributions from the segment start (direct line
            # of sight from the ray's current position to each capture,
            # deposited at total distance + capture distance)
            # [R, C]
            seg = cap_pos[None, :, :] - origins[:, None, :]
            cd = jnp.linalg.norm(seg, axis=-1)
            cdirs = seg / jnp.maximum(cd[..., None], 1e-9)
            cosang = jnp.sum(cdirs * (-cap_dir[None, :, :]), -1)
            gains = jnp.stack(
                [self._pattern_gain(c.pattern, cosang[:, ci])
                 for ci, c in enumerate(self.captures)], axis=1)
            delay = (dist[:, None] + cd) / SPEED_OF_SOUND
            raw_bins = (delay * self.sample_rate).astype(jnp.int32)
            # arrivals past the IR length are DROPPED (zero amplitude),
            # not clamped — clamping would pile all late reflections
            # into a spurious energy spike at the final sample
            in_range = raw_bins < self.ir_len
            bins = jnp.clip(raw_bins, 0, self.ir_len - 1)
            # occlusion: the capture leg contributes only with a clear
            # line of sight (nearest scene hit not closer than the
            # capture) — same batched Möller-Trumbore as the bounce
            flat_o = jnp.broadcast_to(
                origins[:, None, :], seg.shape).reshape(-1, 3)
            t_occ, _ = _intersect(flat_o, cdirs.reshape(-1, 3), tri)
            visible = t_occ.reshape(cd.shape) >= cd - 1e-3
            # inverse-square spreading + air absorption on capture leg
            amp = jnp.where(
                jnp.logical_and(in_range, visible),
                energy[:, None] * gains * jnp.exp(-self.air * cd)
                / jnp.maximum(cd * cd, 0.25), 0.0)
            return (hit_pt, new_dirs, new_energy, new_dist, bins, amp,
                    hit)

        rng = np.random.default_rng(self.seed)
        n_src = max(len(self.sources), 1)
        for si, src in enumerate(self.sources):
            if self._cancelled:
                break
            dirs = jnp.asarray(_fibonacci_sphere(self.rays))
            origins = jnp.broadcast_to(
                jnp.asarray(src.position, jnp.float32), (self.rays, 3))
            energy = jnp.full((self.rays,),
                              src.energy / self.rays, jnp.float32)
            dist = jnp.zeros((self.rays,), jnp.float32)
            self.stats["rays_traced"] += self.rays

            for b in range(self.max_bounces):
                if self._cancelled:
                    break
                origins, dirs, energy, dist, bins, amp, hit = bounce(
                    origins, dirs, energy, dist)
                amp_np = np.asarray(amp)
                bins_np = np.asarray(bins)
                for ci in range(len(self.captures)):
                    np.add.at(irs[ci], bins_np[:, ci], amp_np[:, ci])
                self.stats["bounces"] += 1
                self.stats["captured"] += int(np.count_nonzero(amp_np))
                if float(jnp.max(energy)) < self.energy_floor:
                    break
                self.progress = (si + (b + 1) / self.max_bounces) / n_src

        self.progress = 1.0
        out = Sample(len(self.captures), self.ir_len, self.sample_rate)
        out.data = irs
        return out
