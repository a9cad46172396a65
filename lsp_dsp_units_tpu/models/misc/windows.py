"""FFT window functions (reference: src/main/misc/windows.cpp,
include/.../misc/windows.h:65-152).

Windows are design-time constants: generated in float64 numpy on the host
and baked into processor params as float32 device arrays.  Shapes match the
reference definitions exactly (periodic/symmetric conventions included).
"""

from __future__ import annotations

import enum

import numpy as np


class Window(enum.Enum):
    HANN = "hann"
    HAMMING = "hamming"
    BLACKMAN = "blackman"
    LANCZOS = "lanczos"
    GAUSSIAN = "gaussian"
    POISSON = "poisson"
    PARZEN = "parzen"
    TUKEY = "tukey"
    WELCH = "welch"
    NUTTALL = "nuttall"
    BLACKMAN_NUTTALL = "blackman_nuttall"
    BLACKMAN_HARRIS = "blackman_harris"
    HANN_POISSON = "hann_poisson"
    BARTLETT_HANN = "bartlett_hann"
    BARTLETT_FEJER = "bartlett_fejer"
    TRIANGULAR = "triangular"
    RECTANGULAR = "rectangular"
    FLAT_TOP = "flat_top"
    COSINE = "cosine"
    SQR_COSINE = "sqr_cosine"
    CUBIC = "cubic"


def rectangular(n: int) -> np.ndarray:
    return np.ones(n, np.float64)


def triangular_general(n: int, dn: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0)
    ell = n + 1 if dn > 0 else (n - 1 if dn < 0 else n)
    if ell == 0:
        return np.zeros(n)
    i = np.arange(n, dtype=np.float64)
    c = (n - 1) * 0.5
    return 1.0 - np.abs((i - c) * (2.0 / ell))


def triangular(n: int) -> np.ndarray:
    return triangular_general(n, 0)


def bartlett_fejer(n: int) -> np.ndarray:
    return triangular_general(n, -1)


def parzen(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    n_2 = 0.5 * n
    x = np.abs(i - n_2)
    k = x / n_2
    p = 1.0 - k
    return np.where(x <= 0.25 * n, 1.0 - 6.0 * k * k * p, 2.0 * p ** 3)


def welch(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    c = (n - 1) * 0.5
    t = (i - c) / c
    return 1.0 - t * t


def hamming_general(n: int, a: float, b: float) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return a - b * np.cos(i * (2.0 * np.pi / (n - 1)))


def hann(n: int) -> np.ndarray:
    return hamming_general(n, 0.5, 0.5)


def hamming(n: int) -> np.ndarray:
    return hamming_general(n, 0.54, 0.46)


def blackman_general(n: int, a: float) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    a2 = a * 0.5
    f1 = 2.0 * np.pi / (n - 1)
    return (0.5 - a2) - 0.5 * np.cos(i * f1) + a2 * np.cos(i * 2 * f1)


def blackman(n: int) -> np.ndarray:
    return blackman_general(n, 0.16)


def nuttall_general(n: int, a0, a1, a2, a3) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    f1 = 2.0 * np.pi / (n - 1)
    return (a0 - a1 * np.cos(i * f1) + a2 * np.cos(i * 2 * f1)
            - a3 * np.cos(i * 3 * f1))


def nuttall(n: int) -> np.ndarray:
    return nuttall_general(n, 0.355768, 0.487396, 0.144232, 0.012604)


def blackman_nuttall(n: int) -> np.ndarray:
    return nuttall_general(n, 0.3635819, 0.4891775, 0.1365995, 0.0106411)


def blackman_harris(n: int) -> np.ndarray:
    return nuttall_general(n, 0.35875, 0.48829, 0.14128, 0.01168)


def flat_top_general(n: int, a0, a1, a2, a3, a4) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    f1 = 2.0 * np.pi / (n - 1)
    mid = n * 0.5
    norm = 1.0 / (a0 - a1 * np.cos(mid * f1) + a2 * np.cos(mid * 2 * f1)
                  - a3 * np.cos(mid * 3 * f1) + a4 * np.cos(mid * 4 * f1))
    return norm * (a0 - a1 * np.cos(i * f1) + a2 * np.cos(i * 2 * f1)
                   - a3 * np.cos(i * 3 * f1) + a4 * np.cos(i * 4 * f1))


def flat_top(n: int) -> np.ndarray:
    return flat_top_general(n, 1.0, 1.93, 1.29, 0.388, 0.028)


def cosine(n: int) -> np.ndarray:
    """Half-sine analysis window (periodic; COLA at 50% overlap when
    squared — used by SpectralProcessor, reference windows.cpp cosine)."""
    return np.sin(np.arange(n, dtype=np.float64) * (np.pi / n))


def sqr_cosine(n: int) -> np.ndarray:
    """sin^2 window — COLA at 50% overlap (SPM equalizer mode)."""
    a = cosine(n)
    return a * a


def cubic(n: int) -> np.ndarray:
    if n <= 1:
        return np.ones(n)
    out = np.zeros(n, np.float64)
    middle = n >> 1
    kx = 1.0 / middle
    i = np.arange(middle, dtype=np.float64)
    x = i * kx
    out[:middle] = x * x * (3.0 - 2.0 * x)
    idx = np.arange(middle, n)
    out[idx] = 1.0 - out[n - 1 - idx]
    return out


def gaussian_general(n: int, s: float) -> np.ndarray:
    c = (n - 1) * 0.5
    v = (np.arange(n, dtype=np.float64) - c) / (c * s)
    return np.exp(-0.5 * v * v)


def gaussian(n: int) -> np.ndarray:
    return gaussian_general(n, 0.4)


def poisson_general(n: int, t: float) -> np.ndarray:
    c = (n - 1) * 0.5
    return np.exp(-np.abs(np.arange(n, dtype=np.float64) - c) / t)


def poisson(n: int) -> np.ndarray:
    return poisson_general(n, n * 0.5)


def bartlett_hann_general(n: int, a0, a1, a2) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    k1 = 1.0 / (n - 1)
    return (a0 - a1 * np.abs(i * k1 - 0.5)
            - a2 * np.cos(i * 2.0 * np.pi * k1))


def bartlett_hann(n: int) -> np.ndarray:
    return bartlett_hann_general(n, 0.62, 0.48, 0.38)


def hann_poisson_general(n: int, a: float) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    f = 2.0 * np.pi / (n - 1)
    k1 = (n - 1) * 0.5
    return (0.5 - 0.5 * np.cos(i * f)) * np.exp(-(a / k1) * np.abs(k1 - i))


def hann_poisson(n: int) -> np.ndarray:
    return hann_poisson_general(n, 2.0)


def lanczos(n: int) -> np.ndarray:
    x = np.arange(n, dtype=np.float64) * (2.0 * np.pi / (n - 1)) - np.pi
    return np.where(x == 0.0, 1.0, np.sin(x) / np.where(x == 0.0, 1.0, x))


def tukey_general(n: int, a: float) -> np.ndarray:
    if a == 0.0:
        return rectangular(n)
    last = n - 1
    b1 = int(0.5 * a * last)
    b2 = last - b1
    k = 2.0 * np.pi / (a * last)
    x = np.pi - 2.0 * np.pi / a
    i = np.arange(n, dtype=np.float64)
    head = 0.5 + 0.5 * np.cos(k * i - np.pi)
    tail = 0.5 + 0.5 * np.cos(k * i + x)
    return np.where(i <= b1, head, np.where(i > b2, tail, 1.0))


def tukey(n: int) -> np.ndarray:
    return tukey_general(n, 0.5)


_TABLE = {
    Window.HANN: hann,
    Window.HAMMING: hamming,
    Window.BLACKMAN: blackman,
    Window.LANCZOS: lanczos,
    Window.GAUSSIAN: gaussian,
    Window.POISSON: poisson,
    Window.PARZEN: parzen,
    Window.TUKEY: tukey,
    Window.WELCH: welch,
    Window.NUTTALL: nuttall,
    Window.BLACKMAN_NUTTALL: blackman_nuttall,
    Window.BLACKMAN_HARRIS: blackman_harris,
    Window.HANN_POISSON: hann_poisson,
    Window.BARTLETT_HANN: bartlett_hann,
    Window.BARTLETT_FEJER: bartlett_fejer,
    Window.TRIANGULAR: triangular,
    Window.RECTANGULAR: rectangular,
    Window.FLAT_TOP: flat_top,
    Window.COSINE: cosine,
    Window.SQR_COSINE: sqr_cosine,
    Window.CUBIC: cubic,
}


def window(n: int, kind: Window) -> np.ndarray:
    """Generate a window of the given kind (reference windows.cpp:32-60)."""
    return _TABLE[kind](n)
