"""Capture (microphone) configuration (reference:
src/main/3d/raytrace.cpp:777-870 rt_configure_capture,
src/main/3d/RayTrace3D.cpp:848-874 directivity patterns).

Provides the reference's six ``rt_audio_capture_t`` directivity
patterns, the five stereo/mono ``rt_capture_config_t`` arrangements
(MONO / XY / AB / ORTF / MS), and a first-order ambisonics B-format
helper (W = omni, X/Y/Z = bidirectional along the axes — the natural
composition of the reference's OMNI and BIDIR patterns).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import List

import numpy as np

from lsp_dsp_units_tpu.models.threed.sources import _rotation


class CapturePattern(enum.Enum):
    """rt_audio_capture_t (raytrace.h:50-58).  CARDIOID and FIGURE8 are
    round-1 legacy aliases of CARDIO and EIGHT.  NOTE the alias changed
    FIGURE8's gain law: round 1 used |cos(a)|, the reference's
    RT_AC_EIGHT is cos(a)^2 (RayTrace3D.cpp:867) — -3 dB narrower at
    45 degrees; the closest reference law to |cos| is RT_AC_BIDIR's
    signed cos(a) (RayTrace3D.cpp:863, use BIDIR)."""
    CARDIO = "cardio"
    CARDIOID = "cardio"
    SCARDIO = "scardio"
    HCARDIO = "hcardio"
    BIDIR = "bidir"
    EIGHT = "eight"
    FIGURE8 = "eight"
    OMNI = "omni"


def pattern_gain(pattern: CapturePattern, kcos):
    """Directivity gain for arrival-direction cosine ``kcos`` =
    dot(propagation direction of the incoming wave, capture look
    direction) — the reference's ``cv . pv`` (RayTrace3D.cpp:842-874).

    A wave travelling INTO the front of the capture has kcos = -1, so
    CARDIO peaks at 1 there; BIDIR is SIGNED (front arrivals negative)
    exactly as the reference computes it.
    """
    import jax.numpy as jnp
    if pattern == CapturePattern.CARDIO:
        return 0.5 * (1.0 - kcos)
    if pattern == CapturePattern.SCARDIO:
        return 2.0 * jnp.abs(0.5 - kcos) / 3.0
    if pattern == CapturePattern.HCARDIO:
        return 0.8 * jnp.abs(0.25 - kcos)
    if pattern == CapturePattern.BIDIR:
        return kcos
    if pattern == CapturePattern.EIGHT:
        return kcos * kcos
    return jnp.ones_like(kcos)           # OMNI


class CaptureConfig(enum.Enum):
    """rt_capture_config_t (raytrace.h:60-67)."""
    MONO = "mono"
    XY = "xy"
    AB = "ab"
    ORTF = "ortf"
    MS = "ms"


@dataclass
class CaptureSettings:
    """One configured microphone: world position + look direction +
    pattern (rt_capture_settings_t with the matrix resolved)."""
    position: np.ndarray
    direction: np.ndarray
    pattern: CapturePattern = CapturePattern.OMNI
    radius: float = 0.022


@dataclass
class RoomCaptureConfig:
    """room_capture_config_t (raytrace.h:95-107)."""
    position: np.ndarray = field(
        default_factory=lambda: np.zeros(3, np.float64))
    yaw: float = 0.0
    pitch: float = 0.0
    roll: float = 0.0
    capsule: float = 2.2          # capsule size [cm]
    config: CaptureConfig = CaptureConfig.MONO
    angle: float = 90.0           # XY/ORTF angle between mics [deg]
    distance: float = 2.0         # AB mic distance [m]
    direction: CapturePattern = CapturePattern.CARDIO
    side: CapturePattern = CapturePattern.EIGHT   # MS side mic


def configure_capture(cfg: RoomCaptureConfig) -> List[CaptureSettings]:
    """rt_configure_capture (raytrace.cpp:777-870): expand a room
    capture config into 1-2 concrete microphones.

    The local frame looks along +x; each mic is offset by ``dp`` and
    rotated about z by its ``a[i]`` before the rig's yaw/pitch/roll and
    translation are applied — the same matrix composition as the
    reference.
    """
    r = cfg.capsule * 0.01
    dp = [np.zeros(3), np.zeros(3)]
    if cfg.config == CaptureConfig.MONO:
        n, a = 1, [0.0, 0.0]
        types = [cfg.direction, cfg.direction]
    elif cfg.config == CaptureConfig.XY:
        n, a = 2, [45.0 + (cfg.angle - 90.0) * 0.5,
                   -45.0 - (cfg.angle - 90.0) * 0.5]
        dp[0][1] -= r
        dp[1][1] += r
        types = [cfg.direction, cfg.direction]
    elif cfg.config == CaptureConfig.AB:
        n, a = 2, [0.0, 0.0]
        dp[0][1] += cfg.distance * 0.5
        dp[1][1] -= cfg.distance * 0.5
        types = [cfg.direction, cfg.direction]
    elif cfg.config == CaptureConfig.ORTF:
        n, a = 2, [45.0 + (cfg.angle - 90.0) * 0.5,
                   -45.0 - (cfg.angle - 90.0) * 0.5]
        dp[0][1] += 0.075        # half of human's head width
        dp[1][1] -= 0.075
        types = [cfg.direction, cfg.direction]
    elif cfg.config == CaptureConfig.MS:
        n, a = 2, [0.0, 90.0]
        dp[0][2] += r
        dp[1][2] -= r
        types = [cfg.direction, cfg.side]
    else:
        raise ValueError(f"unknown capture config {cfg.config}")

    rig = _rotation(cfg.yaw, cfg.pitch, cfg.roll)
    pos = np.asarray(cfg.position, np.float64)
    out = []
    for i in range(n):
        mic = _rotation(a[i], 0.0, 0.0)      # local z-rotation
        look = rig @ (mic @ np.array([1.0, 0.0, 0.0]))
        out.append(CaptureSettings(
            position=(rig @ dp[i] + pos).astype(np.float32),
            direction=look.astype(np.float32),
            pattern=types[i], radius=r))
    return out


def bformat_captures(position, yaw: float = 0.0, pitch: float = 0.0,
                     roll: float = 0.0) -> List[CaptureSettings]:
    """First-order ambisonics B-format rig: W (omni) + X/Y/Z
    bidirectional mics along the rotated axes, coincident at
    ``position``.  Channel order W, X, Y, Z.

    The dipole gain convention is kcos = propagation . capture_dir
    (reference RayTrace3D.cpp:845,863 — NEGATIVE for a frontal
    arrival), so the B-format dipoles point along the NEGATED axes:
    a source in front (+x of the rig) then produces X = +W as every
    FuMa/AmbiX decoder expects."""
    rig = _rotation(yaw, pitch, roll)
    pos = np.asarray(position, np.float32)
    axes = [np.array([1.0, 0, 0]), np.array([0, 1.0, 0]),
            np.array([0, 0, 1.0])]
    out = [CaptureSettings(position=pos,
                           direction=np.array([1, 0, 0], np.float32),
                           pattern=CapturePattern.OMNI)]
    for ax in axes:
        out.append(CaptureSettings(
            position=pos, direction=(-(rig @ ax)).astype(np.float32),
            pattern=CapturePattern.BIDIR))
    return out
