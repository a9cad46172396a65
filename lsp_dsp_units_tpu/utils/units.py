"""Unit conversions and small math helpers (dB/gain, SNR measurement)."""

from __future__ import annotations

import numpy as np


def db_to_gain(db):
    return np.power(10.0, np.asarray(db) / 20.0)


def gain_to_db(gain):
    return 20.0 * np.log10(np.asarray(gain))


def snr_db(test, ref) -> float:
    """SNR of ``test`` against ``ref`` in dB (higher = closer).

    The driver north star requires >=95 dB vs the reference chain output
    (BASELINE.md)."""
    test = np.asarray(test, np.float64).ravel()
    ref = np.asarray(ref, np.float64).ravel()
    n = min(test.size, ref.size)
    test, ref = test[:n], ref[:n]
    err = test - ref
    p_sig = float(np.sum(ref * ref))
    p_err = float(np.sum(err * err))
    if p_err == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_err)


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p
