"""Equalizer — N parametric filters with IIR / linear-phase FIR / FFT /
SPM processing modes (reference: src/main/filters/Equalizer.cpp,
include/.../filters/Equalizer.h:35-42).

Mode semantics (matching the reference):

* ``IIR``  — all filters' biquads run as one serial cascade; latency 0
  (Equalizer.cpp:262-267, 466-470).
* ``FIR``  — linear phase: take the bank impulse response (length N),
  window with the tail half of a 2N Blackman-Nuttall, FFT magnitude,
  zero-phase resynthesis (fftshift + Blackman-Nuttall window), then block
  convolution with frame N / FFT 2N; latency N + N/2
  (Equalizer.cpp:281-347).
* ``FFT``  — same resynthesis but the magnitude is sampled from the
  analytic frequency charts instead of the IR (Equalizer.cpp:290-324).
* ``SPM``  — direct zero-phase spectrum multiply per frame with
  rectangular analysis and squared-cosine synthesis at 50% overlap;
  latency N (Equalizer.cpp:350-357, 523-562).

TPU design notes: frames inside one ``process`` call are FFT'd as one
batch and overlap-add is closed-form across frames (no scan) because the
hop equals (FIR) or halves (SPM) the frame; coefficient crossfade on
reconfigure is the explicit :meth:`Equalizer.process_xfade` step — the
host knows when params changed, replacing the reference's EF_XFADE flag
(Equalizer.cpp:486-501).
"""

from __future__ import annotations

import enum
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops import biquad as biquad_ops
from lsp_dsp_units_tpu.ops.cplx import (cmul, crmul, rfft_sc,
                                        irfft_sc, sc_mul)
from lsp_dsp_units_tpu.models.filters.design import (
    FilterParams, design_filter, freq_chart)
from lsp_dsp_units_tpu.models.misc import windows as win

Array = jax.Array


class EqMode(enum.Enum):
    BYPASS = "bypass"
    IIR = "iir"
    FIR = "fir"
    FFT = "fft"
    SPM = "spm"


class EqParams(NamedTuple):
    """Traced equalizer parameters."""
    coeffs: Array         # [K, 5] cascade biquads (IIR mode; else [0, 5])
    conv_re: Array        # FIR/FFT: rfft of the 2N-padded FIR [N+1],
    conv_im: Array        #   SPLIT-COMPLEX (no complex64 on the device
    #                         path — ops/cplx.py tunnel contract)
    spm_gain: Array       # SPM: real zero-phase bin gains [N/2+1]
    fused: Optional[object] = None   # FusedCascadeParams when iir_block set


class EqState(NamedTuple):
    iir: Array            # [..., K, 2]
    fir_tail: Array       # [..., N] overlap-add tail (FIR/FFT)
    fir_pending: Array    # [..., N] computed-but-not-yet-emitted frame
    spm_hist: Array       # [..., N/2] input history (SPM)
    spm_tail: Array       # [..., N/2] synthesis overlap tail (SPM)
    spm_pending: Array    # [..., N/2] pending output hop (SPM)


class Equalizer:
    """Static config: mode, FIR rank, sample rate, filter slots."""

    def __init__(self, sample_rate: int = 48000, filters: int = 8,
                 mode: EqMode = EqMode.IIR, fir_rank: int = 12,
                 iir_block: Optional[int] = 256):
        """``iir_block``: block size of the fused whole-cascade kernel
        (ops.biquad_block) that IIR mode uses BY DEFAULT — one FFT conv
        + MXU matmuls instead of a sequential scan, and ~40-70 dB MORE
        accurate than the reference's own f32 recurrence (NUMERICS.md;
        the ≥95 dB north star holds through this path).  Inputs that
        are not block-multiples run the aligned head through the fused
        kernel and the remainder through the sequential scan.  Pass
        ``iir_block=None`` to disable and use the sequential scan only
        (the reference's numerical behavior class)."""
        self.sample_rate = int(sample_rate)
        self.mode = mode
        self.fir_rank = int(fir_rank)
        self.fir_size = 1 << self.fir_rank
        self.iir_block = None if iir_block is None else int(iir_block)
        self.filters: List[Optional[FilterParams]] = [None] * filters

    # -- configuration ------------------------------------------------------
    def set_params(self, idx: int, params: Optional[FilterParams]) -> None:
        self.filters[idx] = params

    def latency(self) -> int:
        """Reference latency contract (Equalizer.cpp:347,355,467)."""
        if self.mode in (EqMode.FIR, EqMode.FFT):
            return self.fir_size + self.fir_size // 2
        if self.mode == EqMode.SPM:
            return self.fir_size
        return 0

    @property
    def block(self) -> int:
        """Internal processing granularity for process()."""
        if self.mode in (EqMode.FIR, EqMode.FFT):
            return self.fir_size
        if self.mode == EqMode.SPM:
            return self.fir_size // 2
        return 1

    def _active_designs(self):
        return [design_filter(p, self.sample_rate)
                for p in self.filters
                if p is not None and p.ftype.value != "none"]

    def freq_chart(self, freqs, idx: Optional[int] = None):
        """Complex frequency response at ``freqs`` [Hz] — of filter
        ``idx`` alone, or of the whole equalizer when ``idx`` is None
        (reference Equalizer.h:197-224)."""
        freqs = np.asarray(freqs, np.float64)
        if idx is not None:
            p = self.filters[idx]
            if p is None or p.ftype.value == "none":
                return np.ones_like(freqs, np.complex128)
            return freq_chart(design_filter(p, self.sample_rate), freqs)
        h = np.ones_like(freqs, np.complex128)
        for d in self._active_designs():
            h = h * freq_chart(d, freqs)
        return h

    def build(self) -> EqParams:
        """Design all filters and build mode-specific parameters
        (the analog of reconfigure(), Equalizer.cpp:243-358)."""
        designs = self._active_designs()
        n = self.fir_size
        coeffs = np.zeros((0, 5), np.float64)
        conv_spec = np.zeros(n + 1, np.complex64)
        spm_gain = np.zeros(n // 2 + 1, np.float32)

        if self.mode in (EqMode.IIR, EqMode.BYPASS):
            if designs:
                coeffs = np.concatenate([d.biquads for d in designs], 0)
        else:
            # magnitude over the full FFT circle [n]
            if self.mode == EqMode.FIR:
                if designs:
                    coeffs_all = np.concatenate(
                        [d.biquads for d in designs], 0)
                    ir = np.asarray(biquad_ops.impulse_response(
                        jnp.asarray(coeffs_all, jnp.float32), n))
                else:
                    ir = np.zeros(n, np.float32)
                    ir[0] = 1.0
                w2 = win.blackman_nuttall(2 * n)
                mag = np.abs(np.fft.fft(ir * w2[n:]))
            else:  # FFT / SPM: product of analytic charts
                freqs = np.linspace(0.0, 0.5 * self.sample_rate,
                                    n // 2 + 1)
                h = np.ones(n // 2 + 1, np.complex128)
                for d in designs:
                    h *= freq_chart(d, freqs)
                half = np.abs(h)
                mag = np.concatenate([half, half[1:-1][::-1]])

            if self.mode == EqMode.SPM:
                spm_gain = mag[: n // 2 + 1].astype(np.float32)
            else:
                # zero-phase resynthesis (Equalizer.cpp:331-336):
                # ifft of the real magnitude, fftshift, window
                fir = np.real(np.fft.ifft(mag))
                fir = np.concatenate([fir[n // 2:], fir[: n // 2]])
                fir *= win.blackman_nuttall(n)
                conv_spec = np.fft.rfft(fir, 2 * n).astype(np.complex64)

        fused = None
        if (self.mode == EqMode.IIR and self.iir_block
                and coeffs.shape[0] > 0):
            from lsp_dsp_units_tpu.ops import biquad_block
            fused = biquad_block.precompute_fused(coeffs, self.iir_block)
        return EqParams(
            coeffs=jnp.asarray(coeffs, jnp.float32),
            conv_re=jnp.asarray(conv_spec.real, jnp.float32),
            conv_im=jnp.asarray(conv_spec.imag, jnp.float32),
            spm_gain=jnp.asarray(spm_gain),
            fused=fused)

    # -- state ---------------------------------------------------------------
    def init_state(self, params: EqParams,
                   batch_shape: Tuple[int, ...] = ()) -> EqState:
        n = self.fir_size
        return EqState(
            iir=biquad_ops.init_state(params.coeffs.shape[0], batch_shape),
            fir_tail=jnp.zeros(batch_shape + (n,), jnp.float32),
            fir_pending=jnp.zeros(batch_shape + (n,), jnp.float32),
            spm_hist=jnp.zeros(batch_shape + (n // 2,), jnp.float32),
            spm_tail=jnp.zeros(batch_shape + (n // 2,), jnp.float32),
            spm_pending=jnp.zeros(batch_shape + (n // 2,), jnp.float32))

    # -- processing ------------------------------------------------------------
    def process(self, params: EqParams, state: EqState, x: Array,
                ) -> Tuple[EqState, Array]:
        if self.mode == EqMode.BYPASS:
            return state, x
        if self.mode == EqMode.IIR:
            if params.coeffs.shape[0] == 0:
                return state, x
            if params.fused is not None:
                from lsp_dsp_units_tpu.ops import biquad_block
                # state.iir is carried in the fused (balanced) basis
                # whenever a fused kernel exists — see FusedCascadeParams
                t = x.shape[-1]
                n_full = t // self.iir_block
                head = n_full * self.iir_block
                iir = state.iir
                parts = []
                if head:
                    y_h, iir = biquad_block.cascade_block_fused(
                        params.fused, iir, x[..., :head])
                    parts.append(y_h)
                if head < t:
                    # remainder: per-sample scan IN the balanced basis
                    # (no t_mat/t_inv round-trip — misaligned streams
                    # stay in one basis, so no per-call conversion
                    # drift)
                    y_t, iir = biquad_block.cascade_seq_fused(
                        params.fused, iir, x[..., head:])
                    parts.append(y_t)
                y = parts[0] if len(parts) == 1 else jnp.concatenate(
                    parts, axis=-1)
                return state._replace(iir=iir), y
            # sequential scan: multi-band cascades can include low
            # frequency poles where the f32 assoc scan loses ~40 dB
            y, iir = biquad_ops.biquad_cascade_seq(params.coeffs,
                                                   state.iir, x)
            return state._replace(iir=iir), y
        if self.mode in (EqMode.FIR, EqMode.FFT):
            return self._process_fir((params.conv_re, params.conv_im),
                                     state, x)
        return self._process_spm(params, state, x)

    def _process_fir(self, conv_sc, state: EqState, x: Array,
                     ) -> Tuple[EqState, Array]:
        """Frame-N block convolution with 2N FFT, overlap-add across
        frames in closed form (Equalizer.cpp:477-518)."""
        n = self.fir_size
        t = x.shape[-1]
        assert t % n == 0, f"FIR mode needs multiples of {n}, got {t}"
        m = t // n
        frames = x.reshape(x.shape[:-1] + (m, n))
        # split-complex through rfft_sc/irfft_sc: rides the packed
        # Pallas FFT on TPU and keeps complex arithmetic off the
        # tunnel (ops/cplx.py)
        sr, si = rfft_sc(frames, 2 * n, axis=-1)
        pr, pi = sc_mul((sr, si), conv_sc)
        y2 = irfft_sc((pr, pi), 2 * n, axis=-1)      # [..., M, 2N]
        heads = y2[..., :n]
        tails = y2[..., n:]
        prev = jnp.concatenate(
            [state.fir_tail[..., None, :], tails[..., :-1, :]], axis=-2)
        computed = heads + prev                        # [..., M, N]
        # one frame of output buffering: the reference emits the previous
        # frame while accumulating the current one (Equalizer.cpp:477-518)
        # -> total latency N (buffer) + N/2 (linear-phase center)
        emitted = jnp.concatenate(
            [state.fir_pending[..., None, :], computed[..., :-1, :]],
            axis=-2)
        out = emitted.reshape(x.shape).astype(x.dtype)
        return state._replace(fir_tail=tails[..., -1, :],
                              fir_pending=computed[..., -1, :]), out

    def process_xfade(self, old: EqParams, new: EqParams, state: EqState,
                      x: Array) -> Tuple[EqState, Array]:
        """First FIR/FFT frame after a coefficient change: run both
        convolutions and linear-ramp mix from old to new across
        [N/2, 3N/2) of the frame (Equalizer.cpp:486-501)."""
        n = self.fir_size
        assert x.shape[-1] == n, "xfade step processes exactly one frame"
        # old convolution with the carried overlap-add tail folded in —
        # the reference's vOutBuffer after fastconv_parse_apply
        st_old, y_old = self._process_fir((old.conv_re, old.conv_im),
                                          state, x)
        # new convolution over a ZERO base (reference's vFft: no previous
        # tail), Equalizer.cpp:491-493
        st_new, _ = self._process_fir(
            (new.conv_re, new.conv_im),
            state._replace(fir_tail=jnp.zeros_like(state.fir_tail)), x)
        # linear ramp old->new across [N/2, 3N/2) of the 2N result
        # buffer; beyond 3N/2 the tail is pure new (Equalizer.cpp:496-498)
        j = jnp.arange(2 * n, dtype=x.dtype)
        r = jnp.clip((j - (n // 2)) / jnp.asarray(n, x.dtype), 0.0, 1.0)
        obuf = jnp.concatenate([st_old.fir_pending, st_old.fir_tail],
                               axis=-1)
        nbuf = jnp.concatenate([st_new.fir_pending, st_new.fir_tail],
                               axis=-1)
        mixed = obuf * (1.0 - r) + nbuf * r
        # emitted now: the pre-change pending frame (one-frame output
        # buffering); the blended frame is emitted on the next call
        return state._replace(fir_pending=mixed[..., :n],
                              fir_tail=mixed[..., n:]), y_old

    def _process_spm(self, params: EqParams, state: EqState, x: Array,
                     ) -> Tuple[EqState, Array]:
        """50%-overlap zero-phase spectral multiply with squared-cosine
        synthesis window (Equalizer.cpp:523-562)."""
        n = self.fir_size
        half = n // 2
        t = x.shape[-1]
        assert t % half == 0, f"SPM mode needs multiples of {half}, got {t}"
        m = t // half
        hops = x.reshape(x.shape[:-1] + (m, half))
        prev = jnp.concatenate(
            [state.spm_hist[..., None, :], hops[..., :-1, :]], axis=-2)
        frames = jnp.concatenate([prev, hops], axis=-1)     # [..., M, N]
        sr, si = rfft_sc(frames, axis=-1)
        y = irfft_sc((sr * params.spm_gain, si * params.spm_gain),
                     n, axis=-1)
        w = jnp.asarray(win.sqr_cosine(n), x.dtype)
        y = y * w
        heads = y[..., :half]
        tails = y[..., half:]
        prev_t = jnp.concatenate(
            [state.spm_tail[..., None, :], tails[..., :-1, :]], axis=-2)
        computed = heads + prev_t                      # [..., M, half]
        # one hop of output buffering (reference Equalizer.cpp:523-562)
        # -> total latency N (half buffering + half frame overlap)
        emitted = jnp.concatenate(
            [state.spm_pending[..., None, :], computed[..., :-1, :]],
            axis=-2)
        out = emitted.reshape(x.shape).astype(x.dtype)
        return state._replace(spm_hist=hops[..., -1, :],
                              spm_tail=tails[..., -1, :],
                              spm_pending=computed[..., -1, :]), out
