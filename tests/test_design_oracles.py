"""Independent oracles for the filter-design layer (VERDICT r1 item 4).

Every BT_*/MT_* family member is checked against a TEST-LOCAL
re-transcription of the reference's analog cascade equations
(reference Filter.cpp:722-1487) plus a test-local bilinear
(Filter.cpp:2192-2267) / matched-Z (Filter.cpp:2269-2416) transform —
written independently from lsp_dsp_units_tpu.models.filters.design so a
transcription slip in either copy fails the comparison.  APO biquads are
checked against the RBJ cookbook forms (Filter.cpp:1489-1647), and the
A/B/C/D weighting filters against the IEC 61672-1 analytic magnitude
formulas (truly external constants).
"""

import numpy as np
import pytest

from lsp_dsp_units_tpu.models.filters.design import (
    FilterParams, FilterType, design_filter, digital_freq_response)

SR = 48000


# ---------------------------------------------------------------------------
# Test-local analog cascade construction (independent re-transcription)
# ---------------------------------------------------------------------------

def _rlc(type_, slope, gain, quality, kf2):
    c = []
    if type_ in ("lopass", "hipass"):
        k = 2.0 / (1.0 + quality)
        i = slope & 1
        if i:
            t = [gain, 0, 0] if type_ == "lopass" else [0, gain, 0]
            c.append((t, [1.0, 1.0, 0.0]))
        for j in range(i, slope, 2):
            g = gain if j == 0 else 1.0
            t = [g, 0, 0] if type_ == "lopass" else [0, 0, g]
            c.append((t, [1.0, k, 1.0]))
    elif type_ in ("loshelf", "hishelf"):
        g = np.sqrt(gain)
        fg = np.exp(np.log(g) / (slope * 2))
        for j in range(slope):
            top = [fg, 2.0 / (1.0 + quality), 1.0 / fg]
            bot = [1.0 / fg, 2.0 / (1.0 + quality), fg]
            t, b = (top, bot) if type_ == "loshelf" else (bot, top)
            t = list(t)
            if j == 0:
                t = [v * g for v in t]
            c.append((t, list(b)))
    elif type_ == "bell":
        fg = np.exp(np.log(gain) / slope)
        ang = np.arctan(fg)
        k = 2.0 * (1.0 / fg + fg) / (1.0 + 2.0 * quality / slope)
        for _ in range(slope):
            c.append(([1.0, k * np.sin(ang), 1.0],
                      [1.0, k * np.cos(ang), 1.0]))
    elif type_ == "resonance":
        ang = np.arctan(np.exp(np.log(gain) / slope))
        k = 2.0 / (1.0 + quality)
        for _ in range(slope):
            c.append(([1.0, k * np.sin(ang), 1.0],
                      [1.0, k * np.cos(ang), 1.0]))
    elif type_ == "notch":
        c.append(([gain, 0.0, gain], [1.0, 2.0 / (1.0 + quality), 1.0]))
    elif type_ == "allpass":
        k = 2.0 / (1.0 + quality)
        for j in range(slope):
            c.append(([1.0, -k, 1.0], [1.0, k, 1.0]))
        if c:
            t, b = c[-1]
            c[-1] = ([v * gain for v in t], b)
    elif type_ == "allpass2":
        kfp1 = 1.0 + kf2
        for j in range(slope):
            c.append(([1.0, -kfp1, kf2], [1.0, kfp1, kf2]))
        if c:
            t, b = c[-1]
            c[-1] = ([v * gain for v in t], b)
    elif type_ == "bandpass":
        k = 2.0 / (1.0 + quality)
        i = slope & 1
        if i:
            c.append(([0.0, gain * gain, 0.0],
                      [1.0, 1.0 + kf2, kf2]))
        for j in range(i, slope, 2):
            g = gain if j == 0 else 1.0
            c.append(([g, 0.0, 0.0], [1.0, k, 1.0]))
            c.append(([0.0, 0.0, g], [1.0, k * kf2, kf2 * kf2]))
    elif type_ in ("ladderpass", "ladderrej"):
        slope2 = slope * 2
        rej = type_ == "ladderrej"
        gain1 = np.sqrt(1.0 / gain) if rej else np.sqrt(gain)
        gain2 = np.sqrt(gain) if rej else np.sqrt(1.0 / gain)
        fg1 = np.exp(np.log(gain1) / slope2)
        fg2 = np.exp(np.log(gain2) / slope2)
        for j in range(slope):
            fg = fg2 if rej else fg1
            g = gain2 if rej else gain1
            top = [fg, 2.0 / (1.0 + quality), 1.0 / fg]
            bot = [1.0 / fg, 2.0 / (1.0 + quality), fg]
            t, b = (top, bot) if rej else (bot, top)
            t = list(t)
            if j == 0:
                t = [v * g for v in t]
            c.append((t, list(b)))
            # second cascade: hi-shelf at kf2, always fg2
            top = [fg2, 2.0 * kf2 / (1.0 + quality), kf2 * kf2 / fg2]
            bot = [1.0 / fg2, 2.0 * kf2 / (1.0 + quality), fg2 * kf2 * kf2]
            t = list(bot)
            if j == 0:
                t = [v * gain2 for v in t]
            c.append((t, list(top)))
    elif type_ == "envelope":
        cj = 0
        s = slope
        if s & 1:
            k = 1.0
            for _ in range(3):
                t = [1.0, 1.25 * k, 0.25 * k * k]
                b = [1.0, 0.625 * k, 0.0625 * k * k]
                k *= 0.0625
                if cj == 0:
                    t = [v * gain for v in t]
                cj += 1
                c.append((t, b))
        for _ in range(s >> 1):
            g = gain if cj == 0 else 1.0
            c.append(([g, g, 0.0], [1.0, 0.0005, 0.0]))
            cj += 1
    elif type_ == "amplifier":
        c.append(([gain, 0.0, 0.0], [1.0, 0.0, 0.0]))
    return c


def _bwc(type_, slope, gain, quality, kf2):
    c = []
    if type_ in ("lopass", "hipass"):
        k = 1.0 / (1.0 + quality)
        i = slope & 1
        if i:
            t = [gain, 0, 0] if type_ == "lopass" else [0, gain, 0]
            c.append((t, [1.0, 1.0, 0.0]))
        for j in range(i, slope, 2):
            th = (j - i + 1) * (np.pi / 2) / slope
            tsin = np.sin(th)
            tcos = np.sqrt(1.0 - tsin * tsin)
            kf = tsin * tsin + k * k * tcos * tcos
            g = gain if j == 0 else 1.0
            if type_ == "hipass":
                c.append(([0, 0, g], [1.0 / kf, 2.0 * k * tcos / kf, 1.0]))
            else:
                c.append(([g, 0, 0], [1.0, 2.0 * k * tcos / kf, 1.0 / kf]))
    elif type_ == "allpass":
        k = 1.0 / (1.0 + quality)
        i = slope & 1
        if i:
            c.append(([-gain, gain, 0.0], [1.0, 1.0, 0.0]))
        for j in range(i, slope, 2):
            th = (j - i + 1) * (np.pi / 2) / slope
            tsin = np.sin(th)
            tcos = np.sqrt(1.0 - tsin * tsin)
            kf = tsin * tsin + k * k * tcos * tcos
            t = [1.0, -2.0 * tcos, 1.0]
            if j == 0:
                t = [v * gain for v in t]
            c.append((t, [1.0 / kf, 2.0 * k * tcos / kf, 1.0]))
    elif type_ in ("loshelf", "hishelf"):
        g = np.sqrt(gain)
        fg = np.exp(np.log(g) / (2.0 * slope))
        k = 1.0 / (1.0 + quality * (1.0 - np.exp(2.0 - g - 1.0 / g)))
        for j in range(slope):
            th = (2 * j + 1) * (np.pi / 2) / (2 * slope)
            tsin = np.sin(th)
            tcos = np.sqrt(1.0 - tsin * tsin)
            kf = tsin * tsin + k * k * tcos * tcos
            top = [kf / fg, 2.0 * k * tcos, fg]
            bot = [fg, 2.0 * k * tcos, kf / fg]
            t, b = (top, bot) if type_ == "hishelf" else (bot, top)
            t = list(t)
            if j == 0:
                t = [v * g for v in t]
            c.append((t, list(b)))
    elif type_ == "bell":
        fg = np.exp(np.log(gain) / (2.0 * slope))
        k = 1.0 / (1.0 + quality)
        for j in range(slope):
            th = (2 * j + 1) * (np.pi / 2) / (2 * slope)
            tsin = np.sin(th)
            tcos = np.sqrt(1.0 - tsin * tsin)
            kf = tsin * tsin + k * k * tcos * tcos
            if gain >= 1.0:
                c.append(([1.0, 2 * k * tcos * fg / kf, fg * fg / kf],
                          [1.0, 2 * k * tcos / kf, 1.0 / kf]))
                c.append(([1.0, 2 * k * tcos / fg, kf / (fg * fg)],
                          [1.0, 2 * k * tcos, kf]))
            else:
                c.append(([1.0, 2 * k * tcos / kf, 1.0 / kf],
                          [1.0, 2 * k * tcos / (fg * kf),
                           1.0 / (fg * fg * kf)]))
                c.append(([1.0, 2 * k * tcos, kf],
                          [1.0, 2 * k * tcos * fg, kf * fg * fg]))
    elif type_ == "bandpass":
        k = 1.0 / (1.0 + quality)
        for j in range(slope):
            th = (2 * j + 1) * (np.pi / 2) / (2 * slope)
            tsin = np.sin(th)
            tcos = np.sqrt(1.0 - tsin * tsin)
            kf = tsin * tsin + k * k * tcos * tcos
            g = gain if j == 0 else 1.0
            c.append(([0, 0, g], [1.0 / kf, 2.0 * k * tcos / kf, 1.0]))
            c.append(([1.0, 0, 0],
                      [1.0, 2.0 * k * tcos * kf2 / kf, kf2 * kf2 / kf]))
    elif type_ in ("ladderpass", "ladderrej"):
        slope2 = slope * 2
        lp = type_ == "ladderpass"
        gain1 = np.sqrt(gain) if lp else np.sqrt(1.0 / gain)
        gain2 = np.sqrt(1.0 / gain) if lp else np.sqrt(gain)
        fg1 = np.exp(np.log(gain1) / (2.0 * slope))
        fg2 = np.exp(np.log(gain2) / (2.0 * slope))
        k1 = 1.0 / (1.0 + quality * (1.0 - np.exp(2.0 - gain1 - 1.0 / gain1)))
        k2 = 1.0 / (1.0 + quality * (1.0 - np.exp(2.0 - gain2 - 1.0 / gain2)))
        for j in range(slope):
            th = (2 * j + 1) * (np.pi / 2) / slope2
            tsin = np.sin(th)
            tcos = np.sqrt(1.0 - tsin * tsin)
            k = k1 if lp else k2
            fg = fg1 if lp else fg2
            g = gain1 if lp else gain2
            kf = tsin * tsin + k * k * tcos * tcos
            top = [kf / fg, 2.0 * k * tcos, fg]
            bot = [fg, 2.0 * k * tcos, kf / fg]
            # Filter.cpp:1247-1248: LADDERPASS writes the transfer
            # coefficients into c->t (numerator), LADDERREJ into c->b
            t, b = (top, bot) if lp else (bot, top)
            t = list(t)
            if j == 0:
                t = [v * g for v in t]
            c.append((t, list(b)))
            kf = tsin * tsin + k1 * k1 * tcos * tcos
            top = [kf / fg1, 2.0 * k1 * kf2 * tcos, fg1 * kf2 * kf2]
            bot = [fg1, 2.0 * k1 * kf2 * tcos, (kf / fg1) * kf2 * kf2]
            t = list(bot)
            if j == 0:
                t = [v * gain2 for v in t]
            c.append((t, list(top)))
    return c


def _lrx(type_, slope, gain, quality, kf2):
    if type_ == "allpass":
        k = 1.0 / (1.0 + quality)
        i = slope * 2
        c = []
        for j in range(0, i, 2):
            th = (j + 1) * (np.pi / 2) / i
            tsin = np.sin(th)
            tcos = np.sqrt(1.0 - tsin * tsin)
            kf = tsin * tsin + k * k * tcos * tcos
            b = [1.0 / kf, 2.0 * k * tcos / kf, 1.0]
            t1 = [1.0, -2.0 * np.cos((j + 0.5) * np.pi / i), 1.0]
            t2 = [1.0, -2.0 * np.cos((j + 1.5) * np.pi / i), 1.0]
            if j == 0:
                t1 = [v * gain for v in t1]
            c.append((t1, list(b)))
            c.append((t2, list(b)))
        return c
    # LRX = the same BWC chain twice with doubled slope, sqrt gain
    half = _bwc(type_, slope * 2, np.sqrt(gain), quality, kf2)
    return half + half


def _bt_response(cascades, f0, freqs, sr):
    """Digital response of the bilinear-transformed cascade chain:
    p = j * kf * tan(pi f / sr), kf = 1/tan(pi f0 / sr)."""
    kf = 1.0 / np.tan(np.pi * f0 / sr)
    p = 1j * kf * np.tan(np.pi * np.asarray(freqs, np.float64) / sr)
    h = np.ones_like(p, np.complex128)
    for t, b in cascades:
        h *= ((t[0] + t[1] * p + t[2] * p * p)
              / (b[0] + b[1] * p + b[2] * p * p))
    return h


def _mt_biquads(cascades, f0, sr):
    """Matched-Z transform of the cascade chain (test-local port of
    Filter.cpp:2293-2416): roots of each quadratic exp-mapped, amplitude
    re-normalized at f0/10."""
    td = 2.0 * np.pi / sr
    out = []
    for t, b in cascades:
        TB = []
        AI = []
        for p in (t, b):
            if p[2] == 0.0:
                if p[1] == 0.0:
                    P = [p[0], 0.0, 0.0]
                else:
                    k = p[1] / f0
                    r = -p[0] / k
                    P = [k, -k * np.exp(r * td), 0.0]
            else:
                k = p[2]
                a = 1.0 / (f0 * f0)
                bq = p[1] / (f0 * p[2])
                cq = p[0] / p[2]
                d = bq * bq - 4.0 * a * cq
                if d >= 0:
                    ds = np.sqrt(d)
                    r0 = (-bq - ds) / (2.0 * a)
                    r1 = (-bq + ds) / (2.0 * a)
                    P = [k, -k * (np.exp(r0 * td) + np.exp(r1 * td)),
                         k * np.exp((r0 + r1) * td)]
                else:
                    ds = np.sqrt(-d)
                    r = -bq / (2.0 * a)
                    kk = ds / (2.0 * a)
                    P = [k, -2.0 * k * np.exp(r * td) * np.cos(kk * td),
                         k * np.exp(2.0 * r * td)]
            w = np.pi * 0.2 * f0 / sr
            re = P[0] * np.cos(2 * w) + P[1] * np.cos(w) + P[2]
            im = P[0] * np.sin(2 * w) + P[1] * np.sin(w)
            amp_d = np.sqrt(re * re + im * im)
            wa = 0.1
            re = p[0] - p[2] * wa * wa
            im = p[1] * wa
            amp_a = np.sqrt(re * re + im * im)
            TB.append(P)
            AI.append((amp_d, amp_a))
        T, B = TB
        an = (AI[1][0] * AI[0][1]) / (AI[0][0] * AI[1][1])
        n = 1.0 / B[0]
        out.append([T[0] * n * an, T[1] * n * an, T[2] * n * an,
                    -B[1] * n, -B[2] * n])
    return np.asarray(out)


_FAMILIES = {"rlc": _rlc, "bwc": _bwc, "lrx": _lrx}

_CASES = []
for fam, types in (
        ("rlc", ["lopass", "hipass", "loshelf", "hishelf", "bell",
                 "resonance", "notch", "allpass", "allpass2", "ladderpass",
                 "ladderrej", "bandpass", "envelope"]),
        ("bwc", ["lopass", "hipass", "loshelf", "hishelf", "bell",
                 "ladderpass", "ladderrej", "bandpass", "allpass"]),
        ("lrx", ["lopass", "hipass", "loshelf", "hishelf", "bell",
                 "ladderpass", "ladderrej", "bandpass", "allpass"])):
    for t in types:
        for slope in (1, 2, 3):
            for gain in (2.0, 0.5):
                _CASES.append((fam, t, slope, gain))


def _enum_of(prefix, fam, type_):
    return FilterType(f"{prefix}_{fam}_{type_}")


@pytest.mark.parametrize("fam,type_,slope,gain", _CASES)
def test_bt_family_matches_analog_oracle(fam, type_, slope, gain):
    f0, q, f2 = 1000.0, 0.5, 3000.0
    ftype = _enum_of("bt", fam, type_)
    d = design_filter(FilterParams(ftype=ftype, freq=f0, freq2=f2,
                                   gain=gain, slope=slope, quality=q), SR)
    freqs = np.geomspace(20.0, 20000.0, 300)
    got = digital_freq_response(d.biquads, freqs, SR)

    # bandpass/ladder/allpass2 use the prewarped frequency ratio
    # (bilinear_relative, Filter.cpp:202-206)
    kf2 = np.tan(np.pi * f0 / SR) / np.tan(np.pi * f2 / SR)
    ref = _bt_response(_FAMILIES[fam](type_, slope, gain, q, kf2),
                       f0, freqs, SR)
    err = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-9)
    assert err.max() < 1e-6, (fam, type_, slope, gain, err.max())


_MT_CASES = list(_CASES)   # every family has a matched-Z twin


@pytest.mark.parametrize("fam,type_,slope,gain", _MT_CASES)
def test_mt_family_matches_matched_z_oracle(fam, type_, slope, gain):
    f0, q, f2 = 1000.0, 0.5, 3000.0
    ftype = _enum_of("mt", fam, type_)
    d = design_filter(FilterParams(ftype=ftype, freq=f0, freq2=f2,
                                   gain=gain, slope=slope, quality=q), SR)
    freqs = np.geomspace(20.0, 20000.0, 300)
    got = digital_freq_response(d.biquads, freqs, SR)

    # matched-Z normalizes the frequency ratio WITHOUT prewarp
    # (fp.fFreq / fp.fFreq2, Filter.cpp:260,294,328)
    kf2 = f0 / f2
    bq = _mt_biquads(_FAMILIES[fam](type_, slope, gain, q, kf2), f0, SR)
    ref = digital_freq_response(bq, freqs, SR)
    err = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-9)
    assert err.max() < 1e-6, (fam, type_, slope, gain, err.max())


# ---------------------------------------------------------------------------
# APO cookbook oracle — all DR_APO_* members
# ---------------------------------------------------------------------------

def _apo_oracle(type_, f0, gain, q, sr):
    w = 2 * np.pi * f0 / sr
    cs, cc = np.sin(w), np.cos(w)
    q = max(q, 0.1)
    alpha = 0.5 * cs / q
    if type_ == "lopass":
        a = [gain * 0.5 * (1 - cc), gain * (1 - cc), gain * 0.5 * (1 - cc)]
        b = [1 + alpha, -2 * cc, 1 - alpha]
    elif type_ == "hipass":
        a = [gain * 0.5 * (1 + cc), gain * (-1 - cc), gain * 0.5 * (1 + cc)]
        b = [1 + alpha, -2 * cc, 1 - alpha]
    elif type_ == "bandpass":
        a = [gain * alpha, 0.0, -gain * alpha]
        b = [1 + alpha, -2 * cc, 1 - alpha]
    elif type_ == "notch":
        a = [gain, -2 * gain * cc, gain]
        b = [1 + alpha, -2 * cc, 1 - alpha]
    elif type_ == "allpass":
        # reference includes the gain in BOTH polynomials (b = reversed
        # a, Filter.cpp:1561-1573) so it cancels after normalization
        a = [gain * (1 - alpha), -2 * gain * cc, gain * (1 + alpha)]
        b = [gain * (1 + alpha), -2 * gain * cc, gain * (1 - alpha)]
    elif type_ == "peaking":
        A = np.sqrt(gain)
        a = [1 + alpha * A, -2 * cc, 1 - alpha * A]
        b = [1 + alpha / A, -2 * cc, 1 - alpha / A]
    elif type_ == "loshelf":
        A = np.sqrt(gain)
        beta = 2 * alpha * np.sqrt(A)
        a = [A * ((A + 1) - (A - 1) * cc + beta),
             2 * A * ((A - 1) - (A + 1) * cc),
             A * ((A + 1) - (A - 1) * cc - beta)]
        b = [(A + 1) + (A - 1) * cc + beta,
             -2 * ((A - 1) + (A + 1) * cc),
             (A + 1) + (A - 1) * cc - beta]
    elif type_ == "hishelf":
        A = np.sqrt(gain)
        beta = 2 * alpha * np.sqrt(A)
        a = [A * ((A + 1) + (A - 1) * cc + beta),
             -2 * A * ((A - 1) + (A + 1) * cc),
             A * ((A + 1) + (A - 1) * cc - beta)]
        b = [(A + 1) - (A - 1) * cc + beta,
             2 * ((A - 1) - (A + 1) * cc),
             (A + 1) - (A - 1) * cc - beta]
    else:
        raise ValueError(type_)
    return np.asarray([[a[0] / b[0], a[1] / b[0], a[2] / b[0],
                        -b[1] / b[0], -b[2] / b[0]]])


@pytest.mark.parametrize("type_", [
    "lopass", "hipass", "bandpass", "notch", "allpass", "peaking",
    "loshelf", "hishelf"])
def test_apo_members_match_cookbook(type_):
    f0, gain, q = 2000.0, 1.8, 0.9
    d = design_filter(FilterParams(
        ftype=FilterType(f"dr_apo_{type_}"), freq=f0, gain=gain,
        slope=1, quality=q), SR)
    np.testing.assert_allclose(
        d.biquads, _apo_oracle(type_, f0, gain, q, SR), rtol=1e-6,
        atol=1e-12)


def test_apo_allpass2_is_two_allpasses():
    """DR_APO_ALLPASS2 = all-pass sections at freq and freq2
    (Filter.cpp:348-356)."""
    f0, f2, q = 800.0, 5000.0, 0.7
    d = design_filter(FilterParams(
        ftype=FilterType.DR_APO_ALLPASS2, freq=f0, freq2=f2, gain=1.0,
        slope=1, quality=q), SR)
    freqs = np.geomspace(20, 20000, 200)
    got = np.abs(digital_freq_response(d.biquads, freqs, SR))
    np.testing.assert_allclose(got, 1.0, rtol=1e-5)


def test_apo_ladder_is_shelf_product():
    """DR_APO_LADDERPASS = hishelf(f0, g) * hishelf(f2, 1/g);
    DR_APO_LADDERREJ = loshelf(f0, g) * hishelf(f2, g)
    (reference Filter.cpp:358-375) — verified as the product of the
    cookbook shelf responses."""
    f0, f2, gain, q = 500.0, 4000.0, 2.0, 0.7
    freqs = np.geomspace(20, 20000, 200)
    for ft, parts in (
            (FilterType.DR_APO_LADDERPASS,
             [("hishelf", f0, gain), ("hishelf", f2, 1.0 / gain)]),
            (FilterType.DR_APO_LADDERREJ,
             [("loshelf", f0, gain), ("hishelf", f2, gain)])):
        d = design_filter(FilterParams(ftype=ft, freq=f0, freq2=f2,
                                       gain=gain, slope=1, quality=q), SR)
        assert d.biquads.shape[0] == 2, ft
        got = digital_freq_response(d.biquads, freqs, SR)
        ref = np.ones_like(got)
        for kind, fc, g in parts:
            ref *= digital_freq_response(_apo_oracle(kind, fc, g, q, SR),
                                         freqs, SR)
        err = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-9)
        assert err.max() < 1e-6, (ft, err.max())


# ---------------------------------------------------------------------------
# IEC 61672-1 weighting oracles (external analytic formulas)
# ---------------------------------------------------------------------------

def _iec_a(f):
    f = np.asarray(f, np.float64)
    f2 = f * f
    ra = (12194.0 ** 2 * f2 * f2) / (
        (f2 + 20.6 ** 2)
        * np.sqrt((f2 + 107.7 ** 2) * (f2 + 737.9 ** 2))
        * (f2 + 12194.0 ** 2))
    return 20 * np.log10(ra) + 2.00


def _iec_b(f):
    f = np.asarray(f, np.float64)
    f2 = f * f
    rb = (12194.0 ** 2 * f2 * f) / (
        (f2 + 20.6 ** 2) * np.sqrt(f2 + 158.5 ** 2) * (f2 + 12194.0 ** 2))
    return 20 * np.log10(rb) + 0.17


def _iec_c(f):
    f = np.asarray(f, np.float64)
    f2 = f * f
    rc = (12194.0 ** 2 * f2) / ((f2 + 20.6 ** 2) * (f2 + 12194.0 ** 2))
    return 20 * np.log10(rc) + 0.06


def _iec_d(f):
    f = np.asarray(f, np.float64)
    f2 = f * f
    h = (((1037918.48 - f2) ** 2 + 1080768.16 * f2)
         / ((9837328.0 - f2) ** 2 + 11723776.0 * f2))
    rd = (f / 6.8966888496476e-5) * np.sqrt(
        h / ((f2 + 79919.29) * (f2 + 1345600.0)))
    return 20 * np.log10(rd)


@pytest.mark.parametrize("ftype,oracle", [
    (FilterType.A_WEIGHTED, _iec_a),
    (FilterType.B_WEIGHTED, _iec_b),
    (FilterType.C_WEIGHTED, _iec_c),
    (FilterType.D_WEIGHTED, _iec_d),
])
def test_weighting_matches_iec_analytic(ftype, oracle):
    d = design_filter(FilterParams(ftype=ftype, freq=1000.0, gain=1.0,
                                   slope=1, quality=0.0), SR)
    # mid-band: tight; edges: allow bilinear warping + reference rounding
    for freqs, tol in ((np.array([125.0, 250.0, 500.0, 1000.0, 2000.0,
                                  4000.0]), 0.6),
                       (np.array([31.5, 63.0, 8000.0]), 1.5)):
        got = 20 * np.log10(
            np.abs(digital_freq_response(d.biquads, freqs, SR)))
        want = oracle(freqs)
        err = np.abs(got - want)
        assert err.max() < tol, (ftype, freqs[err.argmax()], err.max())
