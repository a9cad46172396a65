"""Spectral envelopes for noise colors on linear/log frequency grids
(reference: src/main/misc/envelope.cpp, include/.../misc/envelope.h:34-48).
"""

from __future__ import annotations

import enum

import numpy as np

PLUS_4_5_DB_CONST = 4.5 / (20.0 * np.log10(2.0))
MINUS_4_5_DB_CONST = -4.5 / (20.0 * np.log10(2.0))
BLUE_CONST = 0.5
VIOLET_CONST = 1.0
BROWN_CONST = -1.0
PINK_CONST = -0.5


class Envelope(enum.Enum):
    VIOLET = "violet"
    BLUE = "blue"
    WHITE = "white"
    PINK = "pink"
    BROWN = "brown"
    PLUS_4_5_DB = "plus_4_5_db"
    MINUS_4_5_DB = "minus_4_5_db"


_EXP = {
    Envelope.WHITE: None,
    Envelope.PINK: PINK_CONST,
    Envelope.BROWN: BROWN_CONST,
    Envelope.BLUE: BLUE_CONST,
    Envelope.VIOLET: VIOLET_CONST,
    Envelope.PLUS_4_5_DB: PLUS_4_5_DB_CONST,
    Envelope.MINUS_4_5_DB: MINUS_4_5_DB_CONST,
}

_REVERSE = {
    Envelope.WHITE: Envelope.WHITE,
    Envelope.PINK: Envelope.BLUE,
    Envelope.BROWN: Envelope.VIOLET,
    Envelope.BLUE: Envelope.PINK,
    Envelope.VIOLET: Envelope.BROWN,
    Envelope.PLUS_4_5_DB: Envelope.MINUS_4_5_DB,
    Envelope.MINUS_4_5_DB: Envelope.PLUS_4_5_DB,
}


def noise_lin(first: float, last: float, center: float, n: int,
              kind: Envelope) -> np.ndarray:
    """Envelope over a linear frequency grid first..last, normalized to 1
    at ``center`` (reference envelope.cpp basic_noise_lin)."""
    k = _EXP[kind]
    if k is None:
        return np.ones(n)
    if n <= 1:
        return np.ones(n)
    f = (first + (last - first) * np.arange(n) / (n - 1)) / center
    if f[0] <= 0.0:
        f[0] = f[1]
    return np.power(f, k)


def noise_log(first: float, last: float, center: float, n: int,
              kind: Envelope) -> np.ndarray:
    """Envelope over a log frequency grid (reference basic_noise_log)."""
    k = _EXP[kind]
    if k is None:
        return np.ones(n)
    if n <= 1:
        return np.ones(n)
    kf = 1.0 / center
    a = first * kf
    b = last * kf
    f = a * np.exp(np.log(b / a) * np.arange(n) / (n - 1))
    return np.power(f, k)


def reverse_noise_lin(first, last, center, n, kind: Envelope) -> np.ndarray:
    return noise_lin(first, last, center, n, _REVERSE[kind])


def reverse_noise_log(first, last, center, n, kind: Envelope) -> np.ndarray:
    return noise_log(first, last, center, n, _REVERSE[kind])
