"""SyncChirpProcessor — synchronized (Farina/Novak) exponential sine
sweep measurement (reference: src/main/util/SyncChirpProcessor.cpp).

Covers the reference's full surface:

* **synchronized parameter optimisation** (update_settings,
  SyncChirpProcessor.cpp:1996-2090): the final frequency is forced to an
  integer harmonic ``order`` of the initial frequency and the duration
  is rounded UP to the next multiple of ``ln(order)/f1`` so that
  ``gamma = n/f1`` — with this choice every harmonic's time lag
  ``gamma*ln(k)`` lands phase-synchronously and the Hammerstein
  identification below is exact;
* **three synthesis methods** (reconfigure, :1135-1240): SIMPLE (pure
  math), CHIRP_BANDLIMITED (chirp synthesised at an oversampled rate and
  decimated through the package Oversampler), BANDLIMITED (chirp and
  inverse filter both);
* **raised-cosine fades** (calculate_fading_window_sample :776-822);
* **deconvolution** via device FFT convolution with the analytic
  inverse filter ``x(t) e^{t/gamma} 2 beta/(pi gamma)``
  (calculate_inverse_filter_sample :771-774);
* **post-processing**: background-noise profiling (:824-849), windowed
  backwards-integration limit calibration (:851-922), reverberation
  time with the five scp_rtcalc_t regression windows (:924-1045);
* **nonlinear identification**: windowing of the higher-order responses
  with fractional-delay compensation (:559-760), the binomial
  Chebyshev coefficient matrix (:321-420 fillCoefficientsMatrices),
  the per-bin triangular solve (:421-532) and DC blocking (:534-557),
  yielding Hammerstein model kernels;
* **persistence**: linear IR save/load via Sample (WAV) and a full
  profile save/load (npz) mirroring save_to_lspc/load_from_lspc.

TPU notes: sweep synthesis and bookkeeping are host float64 (done once
per configuration); the heavy deconvolution runs as a single batched
FFT convolution on device; the per-bin triangular solves vectorise over
all frequency bins at once (numpy broadcasting).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from math import comb
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops.cplx import cmul, rfft_sc, irfft_sc, sc_mul
from lsp_dsp_units_tpu.models.sampling.sample import Sample
from lsp_dsp_units_tpu.utils.units import next_pow2

# reference constants (SyncChirpProcessor.cpp:33-48)
MIN_AMPLITUDE = 1.0e-6
DFL_DURATION = 5.0
LIM_DURATION = 50.0
LIM_LAG = 1 << 7
DFL_INITIAL_FREQ = 1.0
DFL_FINAL_FREQ = 8000.0
FADEIN_FRACTION = 0.3
FADEOUT_FRACTION = 0.3
BG_NOISE_LIMIT = -10.0


class ChirpMethod(enum.Enum):
    """scp_method_t (SyncChirpProcessor.h:38-43)."""
    SIMPLE = "simple"
    CHIRP_BANDLIMITED = "chirp_bandlimited"
    BANDLIMITED = "bandlimited"


class FadeMethod(enum.Enum):
    """scp_fade_t (SyncChirpProcessor.h:45-49)."""
    NONE = "none"
    RAISED_COSINES = "raised_cosines"


class RTCalc(enum.Enum):
    """scp_rtcalc_t with (decay threshold, high, low) regression levels
    (SyncChirpProcessor.cpp:1028-1045)."""
    EDT_0 = (-60.0, 0.0, -10.0)
    EDT_1 = (-60.0, -1.0, -10.0)
    T_10 = (-60.0, -5.0, -15.0)
    T_20 = (-60.0, -5.0, -25.0)
    T_30 = (-60.0, -5.0, -35.0)


@dataclass
class RTResult:
    """Reverberation-time post-processing results (sCRPostProc)."""
    rt_seconds: float
    rt_samples: int
    correlation: float
    noise_level_norm: float
    low_noise: bool


class SyncChirpProcessor:
    def __init__(self, sample_rate: int = 48000, duration_s: float = 2.0,
                 f_start: float = 20.0, f_end: float = 20000.0,
                 amplitude: float = 0.5, fade_in_s: float = 0.02,
                 fade_out_s: float = 0.02,
                 method: ChirpMethod = ChirpMethod.SIMPLE,
                 fade_method: FadeMethod = FadeMethod.RAISED_COSINES,
                 oversampling: int = 4):
        self.sample_rate = int(sample_rate)
        self.method = method
        self.fade_method = fade_method
        self.oversampling = int(oversampling)
        self._dirty = True
        self._requested_duration = float(duration_s)
        self._f_start_req = float(f_start)
        self._f_end_req = float(f_end)
        self.amplitude = max(abs(float(amplitude)), MIN_AMPLITUDE)
        self._fade_in_s = float(fade_in_s)
        self._fade_out_s = float(fade_out_s)
        self._sweep: Optional[np.ndarray] = None
        self._inverse: Optional[np.ndarray] = None
        # background-noise fields are zero-initialized like the
        # reference's crpostproc_t (SyncChirpProcessor.cpp:117-118) so
        # calibrate_backwards_integration_limit works without a prior
        # profile_background_noise call
        self.noise_level = 0.0
        self.noise_value = 0.0
        self.update_settings()

    # -- setters (reference SyncChirpProcessor.h:513-633) -------------------
    def set_sample_rate(self, sr: int) -> None:
        self.sample_rate = int(sr)
        self._dirty = True

    def set_chirp_synthesis_method(self, method: ChirpMethod) -> None:
        self.method = method
        self._dirty = True

    def set_chirp_initial_frequency(self, f: float) -> None:
        self._f_start_req = float(f)
        self._dirty = True

    def set_chirp_final_frequency(self, f: float) -> None:
        self._f_end_req = float(f)
        self._dirty = True

    def set_chirp_duration(self, seconds: float) -> None:
        self._requested_duration = float(seconds)
        self._dirty = True

    def set_chirp_amplitude(self, amplitude: float) -> None:
        self.amplitude = max(abs(float(amplitude)), MIN_AMPLITUDE)
        self._dirty = True

    def set_fader_fading_method(self, method: FadeMethod) -> None:
        self.fade_method = method
        self._dirty = True

    def set_fader_fadein(self, seconds: float) -> None:
        self._fade_in_s = float(seconds)
        self._dirty = True

    def set_fader_fadeout(self, seconds: float) -> None:
        self._fade_out_s = float(seconds)
        self._dirty = True

    # -- synchronized parameter optimisation --------------------------------
    def update_settings(self) -> None:
        """The reference's update_settings parameter optimisation
        (SyncChirpProcessor.cpp:2007-2062)."""
        f2 = self._f_end_req if self._f_end_req > 0.0 else DFL_FINAL_FREQ
        f2 = min(f2, self.sample_rate / 2.0)
        f1 = (self._f_start_req if self._f_start_req > 0.0
              else DFL_INITIAL_FREQ)
        if f1 >= f2:
            f1 = DFL_INITIAL_FREQ
        if f1 == f2:
            f1, f2 = DFL_INITIAL_FREQ, DFL_FINAL_FREQ

        # final frequency becomes an integer harmonic of the initial;
        # clamped to >= 2: with f2 < 2*f1 the reference's integer
        # division yields order 1, making min_duration = ln(1)/f1 = 0
        # and its rounding loop below non-terminating
        # (SyncChirpProcessor.cpp:2026-2046) — we take the first usable
        # harmonic instead of hanging
        self.order = max(int(f2 / f1), 2)
        self.f_start = f2 / self.order
        self.f_end = f2
        self.beta = 2.0 * np.pi * self.f_start

        dur = self._requested_duration
        if dur <= 0.0:
            dur = DFL_DURATION
        self.duration_coarse = dur
        # NOTE reference-verbatim: the LIM_DURATION clamp is applied to
        # the pre-rounding value only; the rounding loop compares
        # against the UNCLAMPED coarse duration and therefore overrides
        # the cap (SyncChirpProcessor.cpp:2034-2046 has the identical
        # structure) — kept for parity
        dur = min(dur, LIM_DURATION)
        # duration rounds UP to a multiple of ln(order)/f1 so that
        # gamma = n / f1 (the synchronization condition)
        min_duration = np.log(self.order) / self.f_start
        # closed form of the reference's round-up loop (smallest n >= 1
        # with n*min_duration > duration_coarse; the entry value is
        # always <= duration_coarse so the loop body always runs) — the
        # iterative form is O(duration/min_duration) Python steps,
        # ~720k for a 50 s sweep at f_start 10 kHz.  The +-1 correction
        # loops replicate the iterative float comparisons exactly at
        # quotient boundaries.
        n = max(1.0, np.floor(self.duration_coarse / min_duration) + 1.0)
        while n * min_duration <= self.duration_coarse:
            n += 1.0
        while n > 1.0 and (n - 1.0) * min_duration > self.duration_coarse:
            n -= 1.0
        self.duration = n * min_duration
        self.gamma = n / self.f_start
        self.n = int(round(self.sample_rate * self.duration))
        self.delta = self.beta * self.gamma
        self.n_time_lags = min(self.order, LIM_LAG)

        fi = min(max(self._fade_in_s, 0.0),
                 self.duration * FADEIN_FRACTION)
        fo = min(max(self._fade_out_s, 0.0),
                 self.duration * FADEOUT_FRACTION)
        self._fade_in = int(round(self.sample_rate * fi))
        self._fade_out = int(round(self.sample_rate * fo))
        self._sweep = None
        self._inverse = None
        self._dirty = False

    @property
    def L(self) -> float:
        """Exponential time constant (gamma) — legacy name."""
        return self.gamma

    # -- synthesis ----------------------------------------------------------
    def _chirp_values(self, sample_rate: int, idx: np.ndarray,
                      ) -> np.ndarray:
        """sin(delta*(e^{t/gamma}-1)), phase wrapped
        (calculate_chirp_sample, SyncChirpProcessor.cpp:764-769)."""
        phase = self.delta * (np.exp(idx / (sample_rate * self.gamma))
                              - 1.0)
        phase -= 2.0 * np.pi * np.floor(phase / (2.0 * np.pi))
        return np.sin(phase)

    def _inverse_values(self, sample_rate: int, chirp: np.ndarray,
                        idx: np.ndarray) -> np.ndarray:
        """chirp * e^{t/gamma} * 2 beta / (pi gamma)
        (calculate_inverse_filter_sample :771-774)."""
        return (chirp * np.exp(idx / (sample_rate * self.gamma))
                * 2.0 * self.beta / (np.pi * self.gamma)
                / sample_rate)

    def _fade_window(self, n_total: int, fade_in: int, fade_out: int,
                     ) -> np.ndarray:
        w = np.ones(n_total, np.float64)
        if self.fade_method == FadeMethod.NONE:
            return w
        # raised cosines (calculate_fading_window_sample :782-818)
        if fade_in > 0:
            i = np.arange(fade_in, dtype=np.float64)
            w[:fade_in] = 0.5 * (np.sin(np.pi * (i / fade_in - 0.5))
                                 + 1.0)
        if fade_out > 0:
            # 0.5*(1 - cos(pi*(D - idx)/fo)) for idx in (D-fo, D)
            # == 0.5*(1 + cos(pi*i/fo)) at i = idx - (D - fo)
            # (calculate_fading_window_sample :812-813; i = 0 gives 1.0,
            # matching the strict > boundary)
            i = np.arange(fade_out, dtype=np.float64)
            w[n_total - fade_out:] = 0.5 * (1.0 + np.cos(
                np.pi * i / fade_out))
        return w

    def _synthesize(self) -> None:
        if not self._dirty and self._sweep is not None:
            return
        if self._dirty:
            self.update_settings()
        idx = np.arange(self.n, dtype=np.float64)
        if self.method == ChirpMethod.SIMPLE:
            v = self._chirp_values(self.sample_rate, idx)
            sw = v * self._fade_window(self.n, self._fade_in,
                                       self._fade_out)
            inv = self._inverse_values(self.sample_rate, v, idx)[::-1]
        else:
            # band-limited synthesis: generate at oversampling*sr and
            # decimate through the package Oversampler's AA filter
            # (reconfigure, SyncChirpProcessor.cpp:1153-1240)
            from lsp_dsp_units_tpu.models.util.oversampler import (
                Oversampler)
            os_ratio = self.oversampling
            hi_sr = os_ratio * self.sample_rate
            hi_idx = np.arange(self.n * os_ratio, dtype=np.float64)
            v_hi = self._chirp_values(hi_sr, hi_idx)
            sw_hi = v_hi * self._fade_window(
                self.n * os_ratio, self._fade_in * os_ratio,
                self._fade_out * os_ratio)
            ovs = Oversampler(self.sample_rate, ratio=os_ratio,
                              quality="24bit", filtering=True)
            st = ovs.init_state(())
            _, sw_j = ovs.downsample(st, jnp.asarray(
                sw_hi.astype(np.float32)))
            sw = np.asarray(sw_j, np.float64)
            if self.method == ChirpMethod.BANDLIMITED:
                inv_hi = self._inverse_values(hi_sr, v_hi, hi_idx)[::-1]
                st2 = ovs.init_state(())
                _, inv_j = ovs.downsample(st2, jnp.asarray(
                    (inv_hi * os_ratio).astype(np.float32)))
                inv = np.asarray(inv_j, np.float64)
            else:      # CHIRP_BANDLIMITED: pure-math inverse filter
                v = self._chirp_values(self.sample_rate, idx)
                inv = self._inverse_values(self.sample_rate, v, idx)[::-1]
        # unit normalization: the reference's partitioned-convolution
        # pipeline carries its own FFT scaling; here the equivalent
        # contract is enforced directly — conv(unit sweep, inverse) has
        # unit SPECTRAL gain across the sweep band (one FFT, done once
        # per configuration).  Normalizing by the time-domain peak
        # instead would bias every measured frequency response upward
        # by ~1-2 dB, because a band-limited delta's peak is below its
        # in-band magnitude (out-of-band energy is missing by design).
        nfft = next_pow2(2 * self.n)
        REF = np.fft.rfft(sw, nfft) * np.fft.rfft(inv, nfft)
        freqs = np.fft.rfftfreq(nfft, 1.0 / self.sample_rate)
        band = (freqs >= 1.5 * self.f_start) & (freqs <= 0.75 * self.f_end)
        if not band.any():
            band = slice(None)
        inv = inv / np.median(np.abs(REF[band]))
        ref = np.fft.irfft(REF, nfft)
        # measured deconvolution origin: the band-limited methods pass
        # the sweep (and for BANDLIMITED the inverse too) through the
        # Oversampler's AA filter, whose group delay shifts the
        # deconvolved peak a few samples past the analytic n-1 (the
        # reference has the same uncompensated shift,
        # SyncChirpProcessor.cpp:1153-1240); analysis methods anchor on
        # the measured origin so harmonic windows stay centered
        self._deconv_offset = int(np.argmax(np.abs(ref[: 2 * self.n]))
                                  ) - (self.n - 1)
        self._sweep = (self.amplitude * sw).astype(np.float32)
        self._inverse = inv.astype(np.float32)

    def sweep(self) -> np.ndarray:
        self._synthesize()
        return self._sweep

    def inverse_filter(self) -> np.ndarray:
        """Time-reversed analytically-scaled inverse filter; convolving
        sweep (at unit amplitude) with it gives a band-limited impulse
        at ``deconv_origin`` with unit spectral gain across the sweep
        band."""
        self._synthesize()
        return self._inverse

    def chirp_sample(self) -> Sample:
        s = Sample(1, self.n, self.sample_rate)
        s.data[0] = self.sweep()
        return s

    # -- analysis -----------------------------------------------------------
    def deconvolve(self, response: np.ndarray) -> np.ndarray:
        """Full deconvolved response scaled by 1/amplitude (the
        reference fConvScale): linear IR begins at ``self.deconv_origin``
        (n-1 plus the synthesis method's measured AA group delay);
        harmonic k's IR is centered ``harmonic_offset(k)`` samples
        earlier."""
        response = np.asarray(response, np.float32)
        inv = self.inverse_filter()
        n = response.size + inv.size
        nfft = next_pow2(n)
        xs = rfft_sc(jnp.asarray(response), nfft)
        ins = rfft_sc(jnp.asarray(inv), nfft)
        out = irfft_sc(sc_mul(xs, ins), nfft)
        return np.asarray(out)[: n] / self.amplitude

    @property
    def deconv_origin(self) -> int:
        """Time zero of the linear response within deconvolve() output:
        n-1 plus the measured AA-filter group delay of the band-limited
        synthesis methods (0 for CHIRP_SIMPLE)."""
        self._synthesize()
        return self.n - 1 + self._deconv_offset

    def linear_ir(self, response: np.ndarray,
                  length: Optional[int] = None,
                  pre: int = 8) -> np.ndarray:
        """Extract the linear impulse response.

        The window starts ``pre`` samples before time zero: the
        measurement kernel (a band-limited delta with a fractional-
        sample peak) carries real in-band energy just before the
        origin, and dropping it biases every measured magnitude
        response ~1 dB low.  Index ``pre`` of the returned array is
        lag 0; a system with pure delay d peaks at index ``pre + d``.
        Pass ``pre=0`` for the strictly-causal window.
        """
        full = self.deconvolve(response)
        start = max(0, self.deconv_origin - pre)
        length = length or (full.size - start)
        return full[start: start + length]

    def harmonic_offset(self, k: int) -> int:
        """Samples BEFORE the linear IR where harmonic k's IR sits
        (Farina: dt = gamma ln k)."""
        return int(round(self.gamma * np.log(k) * self.sample_rate))

    def nonlinear_ir(self, response: np.ndarray, k: int,
                     length: int) -> np.ndarray:
        full = self.deconvolve(response)
        center = self.deconv_origin - self.harmonic_offset(k)
        start = max(0, center - length // 2)
        return full[start: start + length]

    # -- post-processing: noise / integration limit / RT --------------------
    def profile_background_noise(self, data: np.ndarray, head: int = 0,
                                 count: Optional[int] = None) -> float:
        """Noise level = ceil(dB peak) over [head, head+count)
        (SyncChirpProcessor.cpp:824-849).  Stores noise_level /
        noise_value; returns the level in dB."""
        data = np.asarray(data, np.float64)
        count = count if count is not None else data.size - head
        peak = np.abs(data[head: head + count]).max()
        self.noise_level = float(np.ceil(20.0 * np.log10(
            max(peak, 1e-30))))
        self.noise_value = 10.0 ** (0.05 * self.noise_level)
        return self.noise_level

    def calibrate_backwards_integration_limit(
            self, data: np.ndarray, head: int = 0,
            window_size: int = 1024, tolerance: float = 3.0) -> int:
        """Find where the windowed envelope after the strongest peak
        first falls to the background noise value, repeating while a
        later peak still exceeds noise + tolerance dB
        (SyncChirpProcessor.cpp:851-922 — the sequential envelope
        follower becomes a vectorized sliding maximum).  Returns (and
        stores) the integration limit in samples relative to head."""
        x = np.abs(np.asarray(data, np.float64))[head:]
        samples = x.size
        limit = samples
        peak_idx = int(np.argmax(x))
        # sliding max over trailing window (the reference's ring buffer)
        from numpy.lib.stride_tricks import sliding_window_view
        while (20.0 * np.log10(max(x[peak_idx], 1e-30))
               > self.noise_level + tolerance):
            seg = x[peak_idx:]
            if seg.size <= window_size:
                break
            win = min(window_size, seg.size)
            env = sliding_window_view(seg, win).max(axis=-1)
            below = np.nonzero(env <= self.noise_value)[0]
            if below.size == 0:
                break
            # env[i] covers seg[i : i+win]; the crossing sample is the
            # window's trailing edge like the reference's follower
            limit = peak_idx + int(below[0]) + win - 1
            if limit >= samples - 1:
                limit = samples
                break
            peak_idx = limit + int(np.argmax(x[limit:]))
        self.ir_limit = int(limit)
        self.ir_limit_s = limit / self.sample_rate
        return self.ir_limit

    def calculate_reverberation_time(
            self, data: np.ndarray, head: int = 0,
            rt_calc: RTCalc = RTCalc.T_20,
            limit: Optional[int] = None) -> RTResult:
        """Backwards-integrated energy decay + linear regression
        between the rt_calc levels, extrapolated to the decay threshold
        (SyncChirpProcessor.cpp:924-1045, vectorized)."""
        decay_thr, high, low = rt_calc.value
        x = np.asarray(data, np.float64)[head:]
        if limit is not None:
            x = x[:limit]
        e = x * x
        total = e.sum()
        # EDC value BEFORE removing sample m-1 matches the reference's
        # online loop: edc[m] = sum_{n>=m} e[n]
        edc = total - np.concatenate([[0.0], np.cumsum(e)[:-1]])
        lvl = 10.0 * np.log10(np.maximum(edc / max(total, 1e-300),
                                         1e-30))
        m = np.arange(x.size, dtype=np.float64)
        sel = (lvl <= high) & (lvl >= low)
        # the reference's online loop also stops at the first sample
        # below the low level — mask everything after it
        first_below = np.nonzero(lvl < low)[0]
        if first_below.size:
            sel &= m < first_below[0]
        if sel.sum() < 2:
            return RTResult(0.0, 0, 0.0, 0.0, False)
        mm, ll = m[sel], lvl[sel]
        mv = mm - mm.mean()
        lv = ll - ll.mean()
        slope = (mv * lv).sum() / max((mv * mv).sum(), 1e-300)
        intercept = ll.mean() - slope * mm.mean()
        denom = np.sqrt((mv * mv).sum() * (lv * lv).sum())
        corr = float((mv * lv).sum() / denom) if denom > 0 else 0.0
        nrt = (decay_thr - intercept) / slope if slope < 0 else 0.0
        conv_norm = np.sqrt(self.sample_rate / max(total, 1e-300))
        noise_value = getattr(self, "noise_value", 0.0)
        noise_norm_v = conv_norm * noise_value
        noise_norm = 20.0 * np.log10(max(noise_norm_v, 1e-30))
        res = RTResult(
            rt_seconds=float(nrt) / self.sample_rate,
            rt_samples=int(nrt), correlation=corr,
            noise_level_norm=float(noise_norm),
            low_noise=bool(noise_norm < low + BG_NOISE_LIMIT))
        self.rt_result = res
        return res

    @staticmethod
    def energy_decay(ir: np.ndarray) -> np.ndarray:
        """Schroeder backward-integrated energy decay curve in dB."""
        e = np.asarray(ir, np.float64) ** 2
        edc = np.cumsum(e[::-1])[::-1]
        edc /= max(edc[0], 1e-30)
        return 10.0 * np.log10(np.maximum(edc, 1e-30))

    @staticmethod
    def rt60(edc_db: np.ndarray, sample_rate: int,
             lo_db: float = -5.0, hi_db: float = -35.0) -> float:
        """RT60 from a linear fit of the EDC between lo_db and hi_db
        (T30 extrapolated), like the reference's decay-line analysis."""
        idx = np.where((edc_db <= lo_db) & (edc_db >= hi_db))[0]
        if idx.size < 2:
            return 0.0
        t = idx / sample_rate
        a, b = np.polyfit(t, edc_db[idx], 1)
        if a >= 0:
            return 0.0
        return float(-60.0 / a)

    # -- nonlinear (Hammerstein) identification -----------------------------
    def window_higher_order_responses(
            self, conv_result: np.ndarray, order: int, win_rank: int,
            window_fn=None, inner_smoothing: bool = True,
            fade_in: int = 16, fade_out: int = 16) -> np.ndarray:
        """Extract the windowed higher-order responses as frequency
        rows [order, nfft] complex (windowHigherOrderResponses,
        SyncChirpProcessor.cpp:559-760): harmonic m is cut around
        ``origin - gamma ln(m)`` with half-gaps to its log-spaced
        neighbours, faded, windowed, FFT'd, and compensated for the
        fractional-sample cut position."""
        win = 1 << win_rank
        half = win / 2.0
        x = np.asarray(conv_result, np.float64)
        origin = self.deconv_origin  # time zero of the linear response
        out = np.zeros((order, win), np.complex128)
        if window_fn is None:
            from lsp_dsp_units_tpu.models.misc import windows as W
            window_fn = W.blackman
        wfull = np.asarray(window_fn(win), np.float64)
        gap2prev = float(x.size - origin)
        sr = self.sample_rate
        for m in range(1, order + 1):
            h_origin = origin - sr * self.gamma * np.log(m)
            gap2next = sr * self.gamma * np.log(1.0 + 1.0 / m)
            if m > 1:
                gap2prev = sr * self.gamma * np.log(m / (m - 1.0))
            head_gap = min(0.5 * gap2next, half)
            tail_gap = min(0.5 * gap2prev, half)
            d_copy = h_origin - head_gap
            if d_copy < 0:
                break
            n_copy = int(d_copy)
            count = int(head_gap + tail_gap)
            d_whead = half - head_gap
            n_whead = int(d_whead)
            buf = np.zeros(win, np.float64)
            count = min(count, x.size - n_copy, win - n_whead)
            buf[n_whead: n_whead + count] = x[n_copy: n_copy + count]
            if inner_smoothing and count > 0:
                # clamp both ramps to the actually-copied span: count
                # may have been clipped by the conv-result tail above,
                # and an unclamped fo would place the fade-out ramp
                # before n_whead (negative slice -> silently empty)
                fi = int(min(fade_in, head_gap, count))
                fo = int(min(fade_out, tail_gap, count))
                if fi > 0:
                    i = np.arange(fi, dtype=np.float64)
                    buf[n_whead: n_whead + fi] *= 0.5 * (
                        np.sin(np.pi * (i / fi - 0.5)) + 1.0)
                if fo > 0:
                    i = np.arange(1, fo + 1, dtype=np.float64)
                    buf[n_whead + count - fo - 1 + 1:
                        n_whead + count] *= 0.5 * (
                        np.sin(-np.pi * (i / fo - 0.5)) + 1.0)
            buf *= wfull
            spec = np.fft.fft(buf)
            # fractional-delay compensation for the integer cut
            shift = (n_copy - d_copy) + (d_whead - n_whead)
            k = np.fft.fftfreq(win) * win
            spec *= np.exp(-2j * np.pi * shift * k / win)
            out[m - 1] = spec
        return out

    def coefficients_matrix(self, order: int) -> np.ndarray:
        """Upper-triangular complex Chebyshev/binomial matrix mapping
        Hammerstein kernels to measured harmonic responses
        (fillCoefficientsMatrices, SyncChirpProcessor.cpp:321-420).
        Row r, column c (0-based; m=c+1, n=r+1) is nonzero only for
        even m+n:  alpha^c * 2^(1-m) * C(m,(m-n)/2) * (-1)^(2m-(n-1)/2)
        — complex when n-1 is odd."""
        C = np.zeros((order, order), np.complex128)
        for c in range(order):
            col = self.amplitude ** c
            for r in range(c + 1):
                m = c + 1
                n = r + 1
                if (m + n) % 2 != 0:
                    continue
                re = col * 2.0 ** (1.0 - m) * comb(m, (m - n) >> 1)
                if (n - 1) % 2 == 0:
                    exponent = 2 * m
                    if n != 1:
                        exponent -= (n - 1) >> 1
                    C[r, c] = re if exponent % 2 == 0 else -re
                else:
                    exponent = 2.0 * m - 0.5 * (n - 1.0)
                    ang = np.pi * (exponent - 2.0 * np.floor(
                        0.5 * exponent))
                    C[r, c] = re * (np.cos(ang) + 1j * np.sin(ang))
        return C

    def hammerstein_kernels(self, response: np.ndarray, order: int,
                            win_rank: int = 12,
                            window_fn=None,
                            inner_smoothing: bool = True,
                            dc_block: bool = True) -> np.ndarray:
        """Identify a Hammerstein model from a measured chirp response:
        branch m is a static power ``x^m`` followed by the returned
        kernel (postprocess_nonlinear_convolution,
        SyncChirpProcessor.cpp:1582-1698).  Returns time-domain kernels
        [order, 2^win_rank], each centered at win/2.

        Solves ``C @ G = H`` per frequency bin (solve(), :421-532;
        vectorized np.linalg triangular solve over all bins), then
        optionally zeroes the bins below the chirp start frequency
        (force_kernels_DC_block, :534-557)."""
        full = self.deconvolve(response)
        H = self.window_higher_order_responses(
            full, order, win_rank, window_fn, inner_smoothing)
        C = self.coefficients_matrix(order)
        win = 1 << win_rank
        # per-bin solve: C [order,order] constant over bins; positive
        # bins use C, negative bins its conjugate (Hermitian symmetry)
        nyq = win // 2
        G = np.zeros_like(H)
        G[:, :nyq + 1] = np.linalg.solve(C, H[:, :nyq + 1])
        G[:, nyq + 1:] = np.linalg.solve(np.conj(C), H[:, nyq + 1:])
        if dc_block:
            dc = max(int(2.0 * nyq * self.f_start / self.sample_rate), 1)
            G[:, :dc] = 0.0
            G[:, win - dc + 1:] = 0.0
        kernels = np.real(np.fft.ifft(G, axis=-1))
        return kernels.astype(np.float32)

    # -- persistence (reference save/load; save_to_lspc analogue) -----------
    def save_ir(self, path: str, ir: np.ndarray) -> None:
        s = Sample(1, len(ir), self.sample_rate)
        s.data[0] = np.asarray(ir, np.float32)
        s.save(path)

    def load_ir(self, path: str) -> np.ndarray:
        return Sample.load(path).data[0]

    def save_linear_convolution(self, path: str, ir: np.ndarray,
                                head: int = 0,
                                count: Optional[int] = None) -> None:
        """Windowed linear-IR save (save_linear_convolution overloads,
        SyncChirpProcessor.cpp:1700-1800)."""
        ir = np.asarray(ir)
        count = count if count is not None else ir.size - head
        self.save_ir(path, ir[head: head + count])

    def save_profile(self, path: str, conv_result: np.ndarray) -> None:
        """Full measurement profile (the save_to_lspc analogue): chirp
        configuration + deconvolved result, npz container."""
        np.savez(
            path, sample_rate=self.sample_rate,
            f_start=self.f_start, f_end=self.f_end, order=self.order,
            duration=self.duration, gamma=self.gamma, beta=self.beta,
            delta=self.delta, amplitude=self.amplitude,
            method=self.method.value, fade_method=self.fade_method.value,
            fade_in_s=self._fade_in_s, fade_out_s=self._fade_out_s,
            oversampling=self.oversampling,
            conv_result=np.asarray(conv_result, np.float32))

    @classmethod
    def load_profile(cls, path: str,
                     ) -> Tuple["SyncChirpProcessor", np.ndarray]:
        """Restore a processor (matching chirp parameters) and the
        stored deconvolved result (load_from_lspc analogue)."""
        with np.load(path) as d:
            kw = {}
            if "fade_in_s" in d:        # absent in older profiles
                kw = dict(fade_in_s=float(d["fade_in_s"]),
                          fade_out_s=float(d["fade_out_s"]),
                          oversampling=int(d["oversampling"]),
                          fade_method=FadeMethod(str(d["fade_method"])))
            scp = cls(int(d["sample_rate"]),
                      duration_s=float(d["duration"]),
                      f_start=float(d["f_start"]),
                      f_end=float(d["f_end"]),
                      amplitude=float(d["amplitude"]),
                      method=ChirpMethod(str(d["method"])), **kw)
            # restore the EXACT saved chirp parameters rather than
            # trusting update_settings to re-derive them: int(f2/f1)
            # truncates to order-1 for about half of the non-exact
            # f2/f1 ratios, and the stored conv_result is only
            # meaningful against the chirp it was measured with
            scp.order = int(d["order"])
            scp.f_start = float(d["f_start"])
            scp.f_end = float(d["f_end"])
            scp.beta = float(d["beta"])
            scp.gamma = float(d["gamma"])
            scp.delta = float(d["delta"])
            scp.duration = float(d["duration"])
            scp.duration_coarse = scp.duration
            scp.n = int(round(scp.sample_rate * scp.duration))
            scp.n_time_lags = min(scp.order, LIM_LAG)
            fi = min(max(scp._fade_in_s, 0.0),
                     scp.duration * FADEIN_FRACTION)
            fo = min(max(scp._fade_out_s, 0.0),
                     scp.duration * FADEOUT_FRACTION)
            scp._fade_in = int(round(scp.sample_rate * fi))
            scp._fade_out = int(round(scp.sample_rate * fo))
            scp._sweep = None
            scp._inverse = None
            conv = np.asarray(d["conv_result"])
        return scp, conv
