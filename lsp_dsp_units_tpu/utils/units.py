"""Unit conversions and small math helpers (dB/gain/LUFS/neper/note,
SNR measurement).

Mirrors the reference's conversion vocabulary
(include/lsp-plug.in/dsp-units/units.h:34-393 and const.h) as plain
numpy-friendly functions: everything accepts scalars or arrays.  The
reference's EBU-R128 offset (0.691 dB) and LU anchor (22.309 dB) are
kept bit-for-bit so loudness meters agree numerically.
"""

from __future__ import annotations

import numpy as np

# units.h:34-36
NEPER_PER_DB = 0.1151277918
DB_PER_NEPER = 8.6860000037
NOTE_OUT_OF_RANGE = -1e6

# const.h physical constants (LSP_DSP_UNITS_*)
AIR_ADIABATIC_INDEX = 1.4
AIR_MOLAR_MASS = 28.98          # g/mol
GAS_CONSTANT = 8.3144598        # J/(mol*K)
TEMP_ABS_ZERO = -273.15         # degC
SPEC_FREQ_MIN = 10.0
SPEC_FREQ_MAX = 24000.0
SPEC_FREQ_CENTER = 100.0
SOUND_SPEED_M_S = 340.29


def db_to_gain(db):
    return np.power(10.0, np.asarray(db) / 20.0)


def gain_to_db(gain):
    # zero gain maps to -inf dB without tripping a RuntimeWarning
    with np.errstate(divide="ignore"):
        return 20.0 * np.log10(np.asarray(gain))


def db_to_power(db):
    return np.power(10.0, np.asarray(db) / 10.0)


def power_to_db(pwr):
    with np.errstate(divide="ignore"):
        return 10.0 * np.log10(np.asarray(pwr))


# --- LUFS / LU (EBU R128 anchors, units.h:167-264) ---------------------

def db_to_lufs(db):
    return np.asarray(db) - 0.691


def lufs_to_db(lufs):
    return np.asarray(lufs) + 0.691


def gain_to_lufs(gain):
    return gain_to_db(gain) - 0.691


def lufs_to_gain(lufs):
    return db_to_gain(np.asarray(lufs) + 0.691)


def lufs_to_power(lufs):
    return db_to_power(np.asarray(lufs) + 0.691)


def gain_to_lu(gain):
    return gain_to_db(gain) + 22.309


def lu_to_gain(lu):
    return db_to_gain(np.asarray(lu) - 22.309)


# --- nepers (units.h:157, 267-324) -------------------------------------

def db_to_neper(db):
    return np.asarray(db) * NEPER_PER_DB


def neper_to_db(neper):
    return np.asarray(neper) * DB_PER_NEPER


def neper_to_gain(neper):
    return db_to_gain(neper_to_db(neper))


def neper_to_power(neper):
    return db_to_power(neper_to_db(neper))


def gain_to_neper(gain):
    return db_to_neper(gain_to_db(gain))


def power_to_neper(pwr):
    return db_to_neper(power_to_db(pwr))


def lufs_to_neper(lufs):
    return db_to_neper(np.asarray(lufs) + 0.691)


def neper_to_lufs(neper):
    return neper_to_db(neper) - 0.691


# --- musical pitch (units.h:327-375) -----------------------------------

def semitones_to_frequency_shift(pitch):
    """Relative pitch in semitones -> frequency multiplier."""
    return np.exp2(np.asarray(pitch) / 12.0)


def frequency_shift_to_semitones(shift):
    return 12.0 * np.log2(np.asarray(shift))


def midi_note_to_frequency(note, a4: float = 440.0):
    """MIDI note number -> frequency (A4 = note 69)."""
    return a4 * semitones_to_frequency_shift(np.asarray(note) - 69.0)


def frequency_to_note(f, a4: float = 440.0):
    """Frequency -> fractional MIDI note, NOTE_OUT_OF_RANGE outside
    [10 Hz, 24 kHz] (units.h:364-371)."""
    f = np.asarray(f, np.float64)
    note = frequency_shift_to_semitones(np.maximum(f, 1e-12) / a4) + 69.0
    return np.where((f < SPEC_FREQ_MIN) | (f > SPEC_FREQ_MAX),
                    NOTE_OUT_OF_RANGE, note)


# --- tempo / time signature (units.h:378-392) --------------------------

def time_signature_to_frequency(fraction, tempo):
    return np.asarray(tempo) / (240.0 * np.asarray(fraction))


def time_signature_to_period(fraction, tempo):
    return (240.0 * np.asarray(fraction)) / np.asarray(tempo)


# --- time / distance (units.h:43-134) ----------------------------------

def sound_speed(temp_celsius):
    """Air temperature [degC] -> sound speed [m/s] (units.h:43-51)."""
    return np.sqrt(AIR_ADIABATIC_INDEX * GAS_CONSTANT *
                   (np.asarray(temp_celsius) - TEMP_ABS_ZERO) * 1000.0 /
                   AIR_MOLAR_MASS)


def samples_to_seconds(sr, samples):
    return np.asarray(samples) / sr


def seconds_to_samples(sr, time_s):
    return np.asarray(time_s) * sr


def samples_to_millis(sr, samples):
    return np.asarray(samples) * (1000.0 / sr)


def millis_to_samples(sr, time_ms):
    return np.asarray(time_ms) * (sr / 1000.0)


def hz_to_samples(sr, freq):
    return sr / np.asarray(freq)


def samples_to_meters(sr, speed, samples):
    return np.asarray(samples) * speed / sr


def samples_to_centimeters(sr, speed, samples):
    return np.asarray(samples) * speed * 100.0 / sr


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
