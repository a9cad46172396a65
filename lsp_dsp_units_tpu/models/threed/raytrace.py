"""RayTrace3D — geometric-acoustics ray tracer producing impulse
responses (reference: src/main/3d/RayTrace3D.cpp, rt/*.cpp,
raytrace.cpp).

TPU-native redesign: the reference pipelines beam-group contexts through
worker threads with view-frustum culling, triangle splitting and BSP
ordering (RayTrace3D.cpp:87-222) — CPU machinery for keeping per-beam
work small.  Here a whole GENERATION of rays tests against ALL triangles
at once (Möller-Trumbore, batched [R, T] on the VPU/MXU); bounces
iterate on the host with device-side deposits into the IR bins.

Physics follows the reference's interface model exactly
(RayTrace3D.cpp:641-832 reflect_view):

* each ray transports a VIRTUAL SOURCE point (the beam apex ``sv.s``);
* at a surface hit the signed apex-to-plane distance ``d`` yields
  - reflected apex  = apex - (1 + 1/diffusion) * d * n   (diffusion 1.0
    = exact mirror; larger values pull the apex toward the surface and
    spread the reflection — RayTrace3D.cpp:759-764, 778-783)
  - refracted apex  = apex + (permeability/dispersion - 1) * d * n with
    the sound speed scaled by the permeability (765-771, 785-791);
* amplitudes are SIGNED pressure: after absorbing (1 - absorption),
  the reflection carries ``a * (transparency - 1)`` (polarity inverted)
  and the transmission ``a * transparency`` (757-767), using the
  outer/inner material side the wave actually hit;
* both branches continue: the 2R candidate rays are compacted back to R
  by keeping the largest |amplitude| (lax.top_k) — the TPU analogue of
  the reference's energy-threshold task queue (795-812).

Capture model: the reference integrates beam-triangle areas against a
capture icosphere (capture(), RayTrace3D.cpp:834-990).  Rays here use a
SELF-NORMALIZED FAMILY estimator anchored at the ray's VIRTUAL SOURCE.
A family = rays sharing the same virtual source (mm-quantized; this
merges both coplanar-triangle splits of one wall wavefront and
reflection orderings that fold to the same image point).  Detection
(default ``capture_est="triangle"``): a family's wavefront crosses a
capture iff the vsrc->capture segment passes through a family ray's
LAST-HIT TRIANGLE — the deterministic analogue of the reference's
beam-area integration, with the acceptance region bounded by the scene
tessellation rather than a sampling gate (``"cone"`` keeps the angular
gate of K_GATE expected in-cone rays, for very coarse scenes).  Each
crossing family deposits its FULL image-source pressure
``(amp/a0) * amp_total * gain / |capture - vsrc|`` exactly once, into
the ONE bin of its best-aligned (most-specular) ray — splitting the
deposit across the k crossing rays' chordal times would divide the
tail ENERGY by up to k (signed amplitudes in k distinct bins carry
a^2/k), the dominant error of the round-3 estimator (RT60 0.61-0.73x
the image-source golden; the single-bin family deposit measures
0.97-1.03x, tracking the golden 2.4x tighter than the genuine tracer
at matched energy thresholds — tests/test_reference_oracle_raytrace.py
and NUMERICS.md).  Remaining limits: families subtending less than
~4pi/R sr may be missed entirely (finite-ray tail truncation), and the
triangle test over-accepts by at most the tessellation margin around
each true patch.
Delay, air absorption and occlusion use the physical leg from the
segment start, at the ray's medium speed.  Capture legs are
BINARY-occluded against every triangle (any crossing blocks the leg;
transmitted arrivals are delivered by the refracted continuation ray,
never by scaling the leg — see _segment_clear).  Directivity gains are
the reference's six patterns (captures.pattern_gain).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Union

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.threed.scene import Scene3D
from lsp_dsp_units_tpu.models.threed.sources import (
    SourceSettings, SourceShape, source_rays)
from lsp_dsp_units_tpu.models.threed.captures import (
    CapturePattern, CaptureSettings, pattern_gain)
from lsp_dsp_units_tpu.models.sampling.sample import Sample

SPEED_OF_SOUND = 340.29  # m/s (LSP_DSP_UNITS_SOUND_SPEED_M_S, const.h:33)

# expected number of rays inside a capture's detection cone; the
# estimator normalizes by the ACTUAL per-family in-cone count, so the
# gate only sets the angular tolerance for "the wavefront crosses the
# capture" (blur ~sqrt(4*K_GATE/R) rad) and the family drop-out
# probability (~exp(-K_GATE) for families wider than the gate)
K_GATE = 8

# legacy alias: round-1 exposed MicPattern with OMNI/CARDIOID/FIGURE8;
# CapturePattern carries the reference's six types (CARDIOID and
# FIGURE8 are value-aliases of CARDIO and EIGHT)
MicPattern = CapturePattern


@dataclass
class Source:
    """Simple omni point-ish source (an ICOSPHERE of 1 cm radius);
    use SourceSettings directly for the full shape/directivity set."""
    position: np.ndarray             # [3]
    energy: float = 1.0


@dataclass
class Capture:
    position: np.ndarray             # [3]
    pattern: CapturePattern = CapturePattern.OMNI
    direction: np.ndarray = None     # [3] look direction for patterns

    def __post_init__(self):
        if self.direction is None:
            self.direction = np.array([1.0, 0.0, 0.0], np.float32)


def _mt_hits(origins, dirs, tri, eps):
    """Shared Möller-Trumbore core: rays [R,3]x[R,3] vs triangles
    [T,3,3] -> (inside [R,T] bool: ray line passes through the
    triangle ahead of the origin, t [R,T] ray parameter).  Callers add
    their own range predicate and reduction."""
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
    inside = ((jnp.abs(det) > eps) & (u >= -eps) & (v >= -eps)
              & (u + v <= 1.0 + eps) & (t > 1e-4))
    return inside, t


def _intersect(origins, dirs, tri, eps=1e-6):
    """Batched Möller-Trumbore: rays [R,3]x[R,3] vs triangles [T,3,3].

    Returns (t_hit [R], tri_idx [R]) — nearest positive intersection
    (the TPU replacement for the reference's rt::context scan/cull/split
    pipeline: test EVERYTHING, reduce with argmin)."""
    inside, t = _mt_hits(origins, dirs, tri, eps)
    t = jnp.where(inside, t, jnp.inf)
    idx = jnp.argmin(t, axis=-1)                        # [R]
    t_hit = jnp.take_along_axis(t, idx[:, None], -1)[:, 0]
    return t_hit, idx


def _segment_clear(origins, dirs, seg_len, tri, eps=1e-6):
    """Binary line-of-sight of each segment [L] from ``origins`` along
    ``dirs`` up to ``seg_len``: 1.0 when NO triangle crosses the
    segment, else 0.0.

    Capture legs must be binary-occluded even by transparent geometry:
    the transmitted wavefront is delivered by the REFRACTED
    continuation ray (which carries amp*transparency, the changed
    speed, and deposits on its own bounce) — scaling this leg by the
    crossed transparencies as well double-counted every arrival behind
    a (partially) transparent wall (measured 2x on a fully transparent
    one).  The reference equivalently stops each beam at the first
    surface and lets the transmitted view deposit separately
    (RayTrace3D.cpp:765-791)."""
    inside, t = _mt_hits(origins, dirs, tri, eps)
    crossed = inside & (t < seg_len[:, None] * (1.0 - 1e-3))
    return jnp.where(jnp.any(crossed, axis=-1), 0.0, 1.0)   # [L]


class RayTrace3D:
    """Host-orchestrated, device-batched acoustic ray tracer."""

    def __init__(self, scene: Scene3D, sample_rate: int = 48000,
                 ir_length_s: float = 1.0, rays: int = 4096,
                 max_bounces: int = 30, energy_floor: float = 1e-6,
                 air_absorption: float = 0.003, seed: int = 0,
                 gate_rays: float = None, capture_est: str = "triangle"):
        self.scene = scene
        self.sample_rate = int(sample_rate)
        self.ir_len = int(sample_rate * ir_length_s)
        self.rays = int(rays)
        self.max_bounces = int(max_bounces)
        self.energy_floor = float(energy_floor)
        self.air = float(air_absorption)
        self.sources: List[SourceSettings] = []
        self.captures: List[Union[Capture, CaptureSettings]] = []
        self.seed = seed
        # expected in-cone ray count of the detection gate (None =
        # K_GATE); with the self-normalized family estimator this only
        # trades angular blur (wider gate) against family drop-out
        # (narrower gate) — calibrated against the genuine reference
        # tracer in tests/test_reference_oracle_raytrace.py
        self.gate_rays = gate_rays
        # "triangle" (default): a reflected/refracted wavefront crosses
        # a capture iff the vsrc->capture segment passes through the
        # ray's LAST-HIT TRIANGLE — the deterministic analogue of the
        # reference's beam-area capture integration (the beam leaving a
        # surface exists exactly over the directions from the virtual
        # apex through the surface region; RayTrace3D.cpp:834-990),
        # with the overcount bounded by the scene tessellation instead
        # of a sampling gate.  "cone": the angular-gate estimator
        # (K_GATE expected in-cone rays); kept for point-ish captures
        # in very coarse scenes where triangles are much wider than
        # the capture.  Measured on the genuine-reference box room
        # (tests/test_reference_oracle_raytrace.py, NUMERICS.md):
        # triangle RT60 ratio ~1.0 vs cone 0.65-0.73 at equal rays.
        assert capture_est in ("triangle", "cone"), capture_est
        self.capture_est = capture_est
        self.progress: float = 0.0
        self._cancelled = False
        self.stats = {"rays_traced": 0, "bounces": 0, "captured": 0}

    def add_source(self, src: Union[Source, SourceSettings]) -> None:
        if isinstance(src, Source):
            src = SourceSettings(shape=SourceShape.ICOSPHERE, size=0.01,
                                 amplitude=src.energy,
                                 position=np.asarray(src.position))
        self.sources.append(src)

    def add_capture(self, cap: Union[Capture, CaptureSettings]) -> None:
        d = np.asarray(cap.direction, np.float32)
        if not np.isfinite(d).all() or float(np.linalg.norm(d)) < 1e-9:
            raise ValueError(
                "capture direction must be a finite non-zero vector "
                f"(got {d!r}); it is normalized for the directivity "
                "gain, so a zero vector would NaN the whole IR")
        self.captures.append(cap)

    def cancel(self) -> None:
        """Cooperative cancellation (reference bCancelled flag)."""
        self._cancelled = True

    def process(self) -> Sample:
        """Trace all sources; returns a Sample with one channel per
        capture holding the (signed pressure) impulse response
        (reference RayTrace3D::process binds captures to Sample
        channels)."""
        tri_np, mat_np, nrm_np = self.scene.flatten()
        assert tri_np.shape[0] > 0, "empty scene"
        tri = jnp.asarray(tri_np)
        # material rows: [abs0, abs1, dif0, dif1, disp0, disp1,
        #                 tr0, tr1, perm] (scene.Material.row)
        mat = jnp.asarray(mat_np)
        nrm = jnp.asarray(nrm_np)
        cap_pos = jnp.asarray(
            np.stack([c.position for c in self.captures]).astype(
                np.float32))
        cap_dir = jnp.asarray(
            np.stack([np.asarray(c.direction, np.float32)
                      / np.linalg.norm(c.direction)
                      for c in self.captures]).astype(np.float32))

        irs = np.zeros((len(self.captures), self.ir_len), np.float32)

        @jax.jit
        def bounce(origins, dirs, vsrc, amp, a0, speed, when, last_tri):
            # ---- capture deposits from the segment start ------------
            seg = cap_pos[None, :, :] - origins[:, None, :]     # [R,C,3]
            cd = jnp.linalg.norm(seg, axis=-1)
            cdirs = seg / jnp.maximum(cd[..., None], 1e-9)
            # alignment and 1/r spreading are measured from the ray's
            # VIRTUAL SOURCE: the wavefront expands from vsrc (the
            # segment origin is merely where it currently is), so the
            # cone estimator's solid-angle accounting and the pressure
            # law both anchor there.  Using the segment origin instead
            # under-deposits every reflection by ~cd/L and makes late
            # reverb decay like 1/L^2.
            vseg = cap_pos[None, :, :] - vsrc[:, None, :]       # [R,C,3]
            vL = jnp.linalg.norm(vseg, axis=-1)
            vdirs = vseg / jnp.maximum(vL[..., None], 1e-9)
            # detection cone: ray direction within the gate of the
            # vsrc->capture direction.  Deposits are normalized on the
            # host by each FAMILY's actual in-cone count, so the gate
            # width is an angular tolerance, not an amplitude constant.
            R = origins.shape[0]
            k_gate = float(self.gate_rays if self.gate_rays is not None
                           else K_GATE)
            cos_gate = 1.0 - 2.0 * k_gate / R
            ahead = jnp.sum(seg * dirs[:, None, :], -1) > 0.0
            acos = jnp.sum(dirs[:, None, :] * vdirs, -1)    # [R, C]
            cone_ok = (acos >= cos_gate) & ahead
            if self.capture_est == "triangle":
                # deterministic wavefront-crossing test: the beam that
                # left the ray's last-hit triangle covers exactly the
                # directions from vsrc through that triangle, so the
                # capture is inside the wavefront iff the vsrc->capture
                # segment crosses it (t in (0, vL): the wall sits
                # between the virtual apex and the capture).  Launch
                # segments (last_tri < 0, point-source wavefront covers
                # everything ahead) keep the cone test, which is exact
                # for them (one family spanning the whole launch).
                tl = tri[jnp.maximum(last_tri, 0)]         # [R, 3, 3]
                v0 = tl[:, 0]
                e1 = tl[:, 1] - v0
                e2 = tl[:, 2] - v0
                eps = 1e-6
                pvec = jnp.cross(vdirs, e2[:, None, :])     # [R, C, 3]
                det = jnp.sum(pvec * e1[:, None, :], -1)
                inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
                tvec = vsrc[:, None, :] - v0[:, None, :]
                u = jnp.sum(tvec * pvec, -1) * inv_det
                qvec = jnp.cross(tvec, e1[:, None, :])
                v = jnp.sum(vdirs * qvec, -1) * inv_det
                t_x = jnp.sum(e2[:, None, :] * qvec, -1) * inv_det
                crossing = ((jnp.abs(det) > eps) & (u >= -eps)
                            & (v >= -eps) & (u + v <= 1.0 + eps)
                            & (t_x > eps) & (t_x < vL * (1.0 + 1e-3)))
                aligned = jnp.where(last_tri[:, None] >= 0, crossing,
                                    cone_ok)
            else:
                aligned = cone_ok
            # directivity: kcos = propagation dir . capture look dir
            kcos = jnp.sum(vdirs * cap_dir[None, :, :], -1)
            gains = jnp.stack(
                [pattern_gain(self._pattern_of(c), kcos[:, ci])
                 for ci, c in enumerate(self.captures)], axis=1)
            # the capture leg rides the RAY'S medium speed (reference
            # capture() uses v->speed for the final leg) so arrivals
            # inside/behind permeable media bin at the right sample
            delay = when[:, None] + cd / speed[:, None]
            raw_bins = (delay * self.sample_rate).astype(jnp.int32)
            # arrivals past the IR length are DROPPED (zero amplitude),
            # not clamped — clamping would pile all late reflections
            # into a spurious energy spike at the final sample
            in_range = raw_bins < self.ir_len
            bins = jnp.clip(raw_bins, 0, self.ir_len - 1)
            # BINARY occlusion (see _segment_clear: transmitted
            # arrivals are delivered by the refracted continuation,
            # never by scaling this leg)
            flat_o = jnp.broadcast_to(
                origins[:, None, :], seg.shape).reshape(-1, 3)
            leg_clear = _segment_clear(
                flat_o, cdirs.reshape(-1, 3), cd.reshape(-1),
                tri).reshape(cd.shape)
            # contribution per in-cone ray BEFORE family normalization:
            # occluded rays stay in the family count (their blocked
            # wavefront share must reduce the family mean, exactly as
            # the reference clips occluded beam area) but deposit 0
            alive = (jnp.abs(amp) > 0.0)[:, None]
            alig = aligned & in_range & alive
            dep = jnp.where(
                alig,
                amp[:, None] * gains * leg_clear
                * jnp.exp(-self.air * cd)
                / jnp.maximum(vL, 0.05), 0.0)

            # ---- surface interaction --------------------------------
            t_hit, idx = _intersect(origins, dirs, tri)
            hit = jnp.isfinite(t_hit)
            t_safe = jnp.where(hit, t_hit, 0.0)
            hit_pt = origins + dirs * t_safe[:, None]
            n = nrm[idx]
            m = mat[idx]                                  # [R, 9]
            # side 0 (outer) when the ray hits the front face
            outer = jnp.sum(dirs * n, -1) < 0.0
            sel = lambda i0, i1: jnp.where(outer, m[:, i0], m[:, i1])
            absorb = sel(0, 1)
            diff = jnp.maximum(sel(2, 3), 1e-6)
            disp = jnp.maximum(sel(4, 5), 1e-6)
            trans = sel(6, 7)
            perm = jnp.maximum(m[:, 8], 1e-6)

            new_when = when + t_safe / speed
            a1 = jnp.where(hit, amp * (1.0 - absorb)
                           * jnp.exp(-self.air * t_safe), 0.0)

            # signed apex->plane distance (reference `distance`)
            d_pl = jnp.sum((vsrc - tri[idx, 0]) * n, -1)

            def continue_dir(apex, fallback_specular):
                to = hit_pt - apex
                ln = jnp.linalg.norm(to, axis=-1, keepdims=True)
                ok = ln[:, 0] > 1e-6
                safe = to / jnp.maximum(ln, 1e-9)
                return jnp.where(ok[:, None], safe, fallback_specular)

            dn = jnp.sum(dirs * n, -1, keepdims=True)
            specular = dirs - 2.0 * dn * n
            d_hit = jnp.maximum(
                jnp.linalg.norm(hit_pt - vsrc, axis=-1), 1e-9)

            def continuity(apex):
                # amplitude continuity at the interface: the carried
                # amp is a source-strength coefficient (deposit =
                # amp / r_from_apex), so an apex SHIFT (diffusion /
                # dispersion pullbacks, RayTrace3D.cpp:759-771) must
                # rescale amp by d_new/d_old at the hit point — a
                # mirror apex preserves the distance (factor 1), which
                # is why purely specular scenes never exposed this;
                # the genuine gets continuity for free from its
                # per-beam area accounting (sqrt(area/A) amplitudes).
                return jnp.linalg.norm(hit_pt - apex, axis=-1) / d_hit

            # reflected branch (RayTrace3D.cpp:759-764 / 778-783)
            kd_r = (1.0 + 1.0 / diff) * d_pl
            vsrc_r = vsrc - kd_r[:, None] * n
            dir_r = continue_dir(vsrc_r, specular)
            amp_r = a1 * (trans - 1.0) * continuity(vsrc_r)
            # refracted branch (765-771 / 785-791)
            kd_t = jnp.where(outer, perm / disp - 1.0,
                             1.0 / (disp * perm) - 1.0) * d_pl
            vsrc_t = vsrc + kd_t[:, None] * n
            dir_t = continue_dir(vsrc_t, dirs)
            amp_t = a1 * trans * continuity(vsrc_t)
            speed_t = jnp.where(outer, speed * perm, speed / perm)

            # ---- compaction: keep the strongest R of the 2R ---------
            c_orig = jnp.concatenate([hit_pt, hit_pt], 0)
            c_dir = jnp.concatenate([dir_r, dir_t], 0)
            c_vsrc = jnp.concatenate([vsrc_r, vsrc_t], 0)
            c_amp = jnp.concatenate([amp_r, amp_t], 0)
            c_speed = jnp.concatenate([speed, speed_t], 0)
            c_when = jnp.concatenate([new_when, new_when], 0)
            c_a0 = jnp.concatenate([a0, a0], 0)
            c_tri = jnp.concatenate([idx, idx], 0)
            # deterministic pseudo-random tie-break: with |reflected|
            # == |transmitted| (transparency == 0.5) a plain top_k
            # keeps the lowest indices — the ENTIRE transmitted family
            # — out of the survivor set
            h32 = (jnp.arange(c_amp.shape[0], dtype=jnp.uint32)
                   * jnp.uint32(2654435761)) >> 16
            tie = 1.0 + h32.astype(jnp.float32) * (1e-7 / 65536.0)
            _, top = jax.lax.top_k(jnp.abs(c_amp) * tie, R)
            return (c_orig[top], c_dir[top], c_vsrc[top], c_amp[top],
                    c_a0[top], c_speed[top], c_when[top], c_tri[top],
                    bins, dep, alig, acos)

        n_src = max(len(self.sources), 1)
        for si, src in enumerate(self.sources):
            if self._cancelled:
                break
            o_np, d_np, s_np, a_np = source_rays(src, self.rays,
                                                 self.seed)
            origins = jnp.asarray(o_np)
            dirs = jnp.asarray(d_np)
            vsrc = jnp.asarray(s_np)
            amp = jnp.asarray(a_np)
            speed = jnp.full((origins.shape[0],), SPEED_OF_SOUND,
                             jnp.float32)
            when = jnp.zeros((origins.shape[0],), jnp.float32)
            last_tri = jnp.full((origins.shape[0],), -1, jnp.int32)
            self.stats["rays_traced"] += int(origins.shape[0])
            # energy floor is RELATIVE to the launch amplitude: per-ray
            # amplitudes scale ~1/R with the ray budget, so an absolute
            # floor would silently kill every bounce at high budgets;
            # the reference's fEnergyThresh is likewise relative to its
            # ~unit initial beam amplitude (RayTrace3D.cpp:795-811)
            amp_floor = float(np.max(np.abs(a_np))) * self.energy_floor
            # launch amplitudes (solid-angle shares): amp/a0 is the
            # exact accumulated path gain, identical across a family
            a0 = jnp.asarray(a_np)
            amp_total = float(np.sum(np.abs(a_np)))

            a0_np = a_np
            vsrc_np = s_np
            for b in range(self.max_bounces):
                if self._cancelled:
                    break
                (origins, dirs, vsrc, amp, a0, speed, when, last_tri,
                 bins, dep, alig, acos) = bounce(origins, dirs, vsrc,
                                                 amp, a0, speed, when,
                                                 last_tri)
                dep_np = np.asarray(dep)
                bins_np = np.asarray(bins)
                alig_np = np.asarray(alig)
                acos_np = np.asarray(acos)
                # family identity = shared virtual source, quantized to
                # 1 mm.  This merges (a) coplanar-triangle splits of
                # one wall wavefront and (b) DEGENERATE reflection
                # orderings folding to the same image point (in a box
                # room ...A-then-B and ...B-then-A give identical
                # images; only one ordering is the physical specular
                # path, and the vsrc->capture segment can cross BOTH
                # orderings' last triangles) — keying by
                # (vsrc, triangle) instead double-deposits every such
                # image: measured RT60 drifting to 1.2-1.35x the
                # image-source golden as the ray budget grows.
                fam_keys = np.round(vsrc_np * 1e3).astype(np.int64)
                for ci in range(len(self.captures)):
                    m = alig_np[:, ci]
                    if not m.any():
                        continue
                    # self-normalized family estimator: dep/a0 is the
                    # per-ray path-gain deposit (identical across a
                    # family up to occlusion/air); averaging it over
                    # the family's crossing rays and scaling by the
                    # total launch amplitude yields each crossing
                    # wavefront's image-source pressure exactly once.
                    _, inv, cnt = np.unique(fam_keys[m], axis=0,
                                            return_inverse=True,
                                            return_counts=True)
                    w = (amp_total
                         / (np.abs(a0_np[m]) * cnt[inv])).astype(
                             np.float32)
                    # The family's FULL pressure lands in ONE bin — the
                    # arrival of its BEST-ALIGNED ray (the one closest
                    # to the true specular path, whose when + leg time
                    # is closest to the exact image arrival vL/speed).
                    # Splitting the deposit across the k crossing rays'
                    # chordal times divides the tail ENERGY by up to k
                    # (signed amplitudes in k distinct bins carry
                    # a^2/k, not a^2), which crushed RT60 by exactly
                    # the gate width (measured: ratio 0.61 at K_GATE=8
                    # vs 1.02 at K=1 before this fix; gate-independent
                    # ~1.0 after).  Occluded rays still deposit 0 into
                    # the family mean, preserving the reference's
                    # clipped-beam-area semantics.
                    b_m = bins_np[m, ci]
                    amp_f = np.bincount(
                        inv, weights=(dep_np[m, ci] * w).astype(
                            np.float64), minlength=len(cnt))
                    order = np.lexsort((-acos_np[m, ci], inv))
                    starts = np.searchsorted(inv[order],
                                             np.arange(len(cnt)))
                    best_bin = b_m[order[starts]]
                    np.add.at(irs[ci], best_bin,
                              amp_f.astype(np.float32))
                a0_np = np.asarray(a0)
                vsrc_np = np.asarray(vsrc)
                self.stats["bounces"] += 1
                self.stats["captured"] += int(np.count_nonzero(
                    dep_np * alig_np))
                if float(jnp.max(jnp.abs(amp))) < amp_floor:
                    break
                self.progress = (si + (b + 1) / self.max_bounces) / n_src

        self.progress = 1.0
        out = Sample(len(self.captures), self.ir_len, self.sample_rate)
        out.data = irs
        return out

    @staticmethod
    def _pattern_of(cap) -> CapturePattern:
        return getattr(cap, "pattern", CapturePattern.OMNI)
