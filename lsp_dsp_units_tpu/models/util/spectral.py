"""Spectral frame engines — generic FFT-domain processing hooks
(reference: src/main/util/SpectralProcessor.cpp,
MultiSpectralProcessor.cpp, SpectralSplitter.cpp).

All three share the 50%-overlap frame pipeline: cosine (half-sine)
analysis and synthesis windows, so the squared-cosine product is COLA at
hop N/2 (reference SpectralProcessor.cpp:147-200).  Latency = frame size.
The user hook is a traced JAX function over the one-sided rfft spectrum
(complex64) instead of the reference's packed-complex callback.

Frames within one call are batched through a single rfft/irfft; the
overlap-add across frames is closed-form (hop = N/2), so no scan is
needed — the whole engine is two batched FFTs plus elementwise work.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.models.misc import windows as win
from lsp_dsp_units_tpu.ops.cplx import SC, rfft_sc, irfft_sc

Array = jax.Array
SpectrumFn = Callable[[Array], Array]
# split-complex hook: fn_sc((re, im)) -> (re, im).  On the TPU tunnel
# complex64 arithmetic outside the FFT boundary is UNIMPLEMENTED
# (ops/cplx.py), so device-side hooks use this form; the complex-hook
# API stays for CPU/compat.  The FFTs themselves ride the packed
# Pallas path on TPU via rfft_sc/irfft_sc.
SpectrumFnSC = Callable[[SC], SC]


def _apply_hook(sr: Array, si: Array, fn, fn_sc):
    if fn_sc is not None:
        return fn_sc((sr, si))
    if fn is not None:
        spec = fn(jax.lax.complex(sr, si))
        return jnp.real(spec), jnp.imag(spec)
    return sr, si


class SpectralState(NamedTuple):
    hist: Array      # [..., N/2] input history (analysis overlap)
    tail: Array      # [..., N/2] synthesis overlap tail
    pending: Array   # [..., N/2] output hop delayed for latency parity


class SpectralProcessor:
    """Generic FFT-domain hook, one channel batch
    (reference SpectralProcessor.cpp)."""

    def __init__(self, rank: int = 12):
        self.rank = int(rank)
        self.frame = 1 << self.rank
        self.hop = self.frame // 2
        w = win.cosine(self.frame)
        self._win = jnp.asarray(w, jnp.float32)

    def latency(self) -> int:
        """Reference contract: latency == frame size."""
        return self.frame

    @property
    def block(self) -> int:
        return self.hop

    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> SpectralState:
        h = self.hop
        z = lambda: jnp.zeros(batch_shape + (h,), jnp.float32)
        return SpectralState(hist=z(), tail=z(), pending=z())

    def _frames_from_hist(self, hist: Array, x: Array):
        h = self.hop
        t = x.shape[-1]
        if t % h != 0:
            raise ValueError(
                f"input length {t} must be a multiple of the hop size "
                f"({h} samples = 2**(rank-1)); use utils.blocks."
                f"BlockStream for arbitrary chunk sizes")
        m = t // h
        hops = x.reshape(x.shape[:-1] + (m, h))
        prev = jnp.concatenate(
            [hist[..., None, :], hops[..., :-1, :]], axis=-2)
        return jnp.concatenate([prev, hops], axis=-1), hops, m

    def _frames(self, state: SpectralState, x: Array):
        return self._frames_from_hist(state.hist, x)

    def process(self, state: SpectralState, x: Array,
                fn: Optional[SpectrumFn] = None,
                fn_sc: Optional[SpectrumFnSC] = None,
                ) -> Tuple[SpectralState, Array]:
        """x [..., T] (T multiple of N/2) -> windowed-analysis spectrum
        through ``fn`` (complex) or ``fn_sc`` (split-complex) ->
        windowed overlap-add resynthesis."""
        frames, hops, m = self._frames(state, x)
        sr, si = rfft_sc(frames * self._win, axis=-1)
        sr, si = _apply_hook(sr, si, fn, fn_sc)
        y = irfft_sc((sr, si), self.frame, axis=-1) * self._win
        h = self.hop
        heads = y[..., :h]
        tails = y[..., h:]
        prev_t = jnp.concatenate(
            [state.tail[..., None, :], tails[..., :-1, :]], axis=-2)
        computed = heads + prev_t
        emitted = jnp.concatenate(
            [state.pending[..., None, :], computed[..., :-1, :]], axis=-2)
        out = emitted.reshape(x.shape).astype(x.dtype)
        return SpectralState(hist=hops[..., -1, :],
                             tail=tails[..., -1, :],
                             pending=computed[..., -1, :]), out

    def analyze(self, state: SpectralState, x: Array,
                fn: Optional[SpectrumFn] = None,
                fn_sc: Optional[SpectrumFnSC] = None) -> SpectralState:
        """Analysis-only pass: the hook observes each frame's spectrum,
        no output is produced (reference SpectralProcessor.cpp:201-246)."""
        frames, hops, m = self._frames(state, x)
        sr, si = rfft_sc(frames * self._win, axis=-1)
        _apply_hook(sr, si, fn, fn_sc)
        return state._replace(hist=hops[..., -1, :])


class MultiSpectralProcessor(SpectralProcessor):
    """N channels with one shared handler over all channel spectra at
    once (reference MultiSpectralProcessor.cpp:146-186): the hook sees
    [..., C, M, F] and may mix across channels."""

    def __init__(self, channels: int, rank: int = 12):
        super().__init__(rank)
        self.channels = int(channels)

    def init_state(self) -> SpectralState:
        return super().init_state((self.channels,))


class SplitterState(NamedTuple):
    hist: Array      # [..., N - hop] input history (sliding analysis)
    tails: Array     # [..., H, hop] per-handler synthesis carry
    pending: Array   # [..., H, hop] emission delay hop


class SpectralSplitter:
    """One forward FFT fanned out to H handlers, each with its own
    inverse FFT + windowed overlap-add sink
    (reference SpectralSplitter.cpp:250-387).

    Mechanics (matching the reference): sliding rectangular analysis of
    the last N samples advancing by ``hop = 2**(chunk_rank-1)``; each
    handler takes the LAST 2*hop samples of its filtered inverse FFT,
    windows them with sqr_cosine(2*hop) (COLA at 50%), and overlap-adds.
    Latency = 2*hop = chunk (reference SpectralSplitter::latency).
    ``chunk_rank < rank`` is the zero-... low-latency mode: the FFT span
    stays N while the hop shrinks.
    """

    def __init__(self, rank: int = 12, handlers: int = 1,
                 chunk_rank: Optional[int] = None):
        self.rank = int(rank)
        self.frame = 1 << self.rank
        self.chunk_rank = int(chunk_rank if chunk_rank is not None
                              else rank)
        assert 5 <= self.chunk_rank <= self.rank
        self.hop = 1 << (self.chunk_rank - 1)
        self.handlers = int(handlers)
        self._win = jnp.asarray(win.sqr_cosine(2 * self.hop), jnp.float32)

    def latency(self) -> int:
        return 1 << self.chunk_rank

    @property
    def block(self) -> int:
        return self.hop

    def init_state(self, batch_shape: Tuple[int, ...] = ()) -> SplitterState:
        h = self.hop
        return SplitterState(
            hist=jnp.zeros(batch_shape + (self.frame - h,), jnp.float32),
            tails=jnp.zeros(batch_shape + (self.handlers, h), jnp.float32),
            pending=jnp.zeros(batch_shape + (self.handlers, h),
                              jnp.float32))

    def process(self, state: SplitterState, x: Array,
                fns: Sequence[Optional[SpectrumFn]] = None,
                fns_sc: Sequence[Optional["SpectrumFnSC"]] = None,
                ) -> Tuple[SplitterState, Array]:
        """x [..., T] (T multiple of hop) -> [..., H, T] band outputs.
        ``fns`` are complex hooks, ``fns_sc`` split-complex ones."""
        if fns is None:
            fns = [None] * self.handlers
        if fns_sc is None:
            fns_sc = [None] * self.handlers
        assert len(fns) == self.handlers
        assert len(fns_sc) == self.handlers
        h = self.hop
        n = self.frame
        t = x.shape[-1]
        if t % h != 0:
            raise ValueError(
                f"input length {t} must be a multiple of the hop size "
                f"({h} samples = 2**(chunk_rank-1)); use utils.blocks."
                f"BlockStream for arbitrary chunk sizes")
        m = t // h
        full = jnp.concatenate([state.hist, x], axis=-1)
        idx = (jnp.arange(m)[:, None] * h + jnp.arange(n)[None, :])
        frames = full[..., idx]                        # [..., M, N]
        sr, si = rfft_sc(frames, axis=-1)

        outs = []
        new_tails = []
        new_pending = []
        for hi, fn in enumerate(fns):
            fn_sc = fns_sc[hi]
            if fn is None and fn_sc is None:
                y2 = frames[..., -2 * h:]
            else:
                br, bi = _apply_hook(sr, si, fn, fn_sc)
                y2 = irfft_sc((br, bi), n, axis=-1)[..., -2 * h:]
            y2 = y2 * self._win
            heads = y2[..., :h]
            tails = y2[..., h:]
            prev = jnp.concatenate(
                [state.tails[..., hi, None, :], tails[..., :-1, :]],
                axis=-2)
            computed = heads + prev                    # [..., M, h]
            emitted = jnp.concatenate(
                [state.pending[..., hi, None, :], computed[..., :-1, :]],
                axis=-2)
            outs.append(emitted.reshape(x.shape))
            new_tails.append(tails[..., -1, :])
            new_pending.append(computed[..., -1, :])
        out = jnp.stack(outs, axis=-2).astype(x.dtype)   # [..., H, T]
        return SplitterState(hist=full[..., -(n - h):],
                             tails=jnp.stack(new_tails, axis=-2),
                             pending=jnp.stack(new_pending, axis=-2)), out
