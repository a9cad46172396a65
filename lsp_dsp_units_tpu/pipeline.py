"""Flagship processing chain — the BASELINE measurement graph.

``FilterConvChain`` is the driver metric chain (BASELINE.json: "samples/s
per chip on 64-ch filter+convolver chain"): an 8-filter IIR equalizer
cascade feeding a 1 s partitioned-FFT convolver, extended with a sidechain
compressor stage (BASELINE config 4) — all as one jitted step over
``[channels, time]`` blocks with explicit state.

Sharded execution (``sharded_step``) runs the same math inside a
``shard_map`` over a ('chan','time') mesh: channels data-parallel, the
IIR cascade exact across time shards via affine-summary exchange
(parallel.time_iir), the convolver via ppermute halo FIR (parallel.halo),
and the envelope stage over a time-gathered detector (envelope recurrences
are genuinely sequential in time; channel parallelism carries them —
SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from lsp_dsp_units_tpu.ops import biquad as biquad_ops
from lsp_dsp_units_tpu.ops import biquad_block
from lsp_dsp_units_tpu.ops import fftconv
from lsp_dsp_units_tpu.ops import dynamics as dyn
from lsp_dsp_units_tpu.models.filters.design import (
    FilterParams, FilterType, design_filter)
from lsp_dsp_units_tpu.models.dynamics.compressor import (
    Compressor, CompressorParams)
from lsp_dsp_units_tpu.models.util.sidechain import (
    Sidechain, SidechainMode, SidechainState)
from lsp_dsp_units_tpu.parallel import mesh as pmesh
from lsp_dsp_units_tpu.parallel.halo import fir_conv_time_sharded
from lsp_dsp_units_tpu.parallel.time_iir import biquad_cascade_time_sharded
from lsp_dsp_units_tpu.parallel.fused_iir import fused_cascade_time_sharded

Array = jax.Array


def default_eq_params(sample_rate: int):
    """8-band cut/boost curve built from the reference filter families
    (BASELINE config 2 shape: biquad cascade equalizer)."""
    bands = [
        (FilterType.BT_BWC_HIPASS, 40.0, 1.0, 2),
        (FilterType.BT_RLC_LOSHELF, 120.0, 1.25, 1),
        (FilterType.BT_RLC_BELL, 250.0, 0.7, 1),
        (FilterType.BT_RLC_BELL, 800.0, 1.5, 1),
        (FilterType.BT_RLC_BELL, 2000.0, 0.8, 1),
        (FilterType.BT_RLC_BELL, 5000.0, 1.3, 1),
        (FilterType.BT_BWC_HISHELF, 8000.0, 1.12, 2),
        (FilterType.BT_BWC_LOPASS, 18000.0, 1.0, 2),
    ]
    return [FilterParams(ftype=t, freq=f, gain=g, slope=s, quality=0.5)
            for (t, f, g, s) in bands]


# eager-call memo for step_ring's per-block spectrum packing: under
# jit the pack_spectra/gather glue is traced once per compile, but an
# EAGER streaming caller would repack the (constant) EQ cascade and all
# P IR spectra every block.  Keyed on array identity; tracers are never
# cached (each trace context owns its tracers).  Strong refs keep the
# ids valid; the cache is tiny (a few [P, F] planes) and bounded.
_PACK_CACHE: dict = {}


def _pack_cached(re: Array, im: Array, nfft: int):
    from lsp_dsp_units_tpu.ops import pallas_fft as pfft
    if isinstance(re, jax.core.Tracer) or isinstance(im, jax.core.Tracer):
        return pfft.pack_spectra(re, im, nfft)
    key = (id(re), id(im), nfft)
    hit = _PACK_CACHE.get(key)
    if hit is not None and hit[0] is re and hit[1] is im:
        return hit[2]
    packed = pfft.pack_spectra(re, im, nfft)
    # inputs may be concrete CONSTANTS closed over inside a trace — the
    # packed result is then a tracer and must never be cached (it would
    # leak into later traces); only eager, concrete results are kept
    if any(isinstance(p, jax.core.Tracer) for p in packed):
        return packed
    if len(_PACK_CACHE) >= 16:
        _PACK_CACHE.clear()
    _PACK_CACHE[key] = (re, im, packed)
    return packed


class ChainParams(NamedTuple):
    eq_coeffs: Array                 # [K, 5] (raw biquads, for analysis)
    eq_block: biquad_block.FusedCascadeParams
    h_spectra: fftconv.Spectra       # [P, F] split-complex
    comp: CompressorParams


class ChainState(NamedTuple):
    eq: Array                        # [..., K, 2]
    fdl: fftconv.FDLState
    sc: SidechainState
    env: dyn.EnvState


class ChainRingState(NamedTuple):
    """State of :meth:`FilterConvChain.step_ring` — identical to
    ChainState except the convolver keeps its spectra in a ring
    (fftconv.RingFDLState): the per-block [P, F] shift register is the
    dominant HBM traffic of the streaming chain (2 x ~98 MB/block at
    rank 14); the ring writes one slot and rotates the small IR
    spectra instead."""
    eq: Array
    fdl: fftconv.RingFDLState
    sc: SidechainState
    env: dyn.EnvState


class ChainBulkState(NamedTuple):
    """State of :meth:`FilterConvChain.bulk_step` — identical to
    ChainState except the convolver carries one super-block of
    time-domain history (big-FFT overlap-save) instead of FDL
    spectra."""
    eq: Array
    conv: fftconv.OLSBulkState
    sc: SidechainState
    env: dyn.EnvState


class FilterConvChain:
    """64-channel EQ -> convolver -> sidechain compressor chain."""

    def __init__(self, sample_rate: int = 48000, channels: int = 64,
                 ir: Optional[np.ndarray] = None, rank: int = 14,
                 ir_seconds: float = 1.0):
        self.sample_rate = int(sample_rate)
        self.channels = int(channels)
        self.rank = int(rank)
        self.block = 1 << (rank - 1)
        if ir is None:
            # synthetic exponentially-decaying room-like IR (1 s)
            n = int(ir_seconds * sample_rate)
            rng = np.random.default_rng(1234)
            t = np.arange(n) / sample_rate
            ir = (rng.standard_normal(n)
                  * np.exp(-3.0 * t)).astype(np.float32)
            ir[0] = 1.0
            ir *= 0.25
        self.ir = np.asarray(ir, np.float32)
        self.sidechain = Sidechain(sample_rate, SidechainMode.RMS,
                                   reactivity_ms=10.0)
        self.compressor = Compressor(sample_rate, attack_thresh=0.25,
                                     release_thresh=0.125,
                                     attack_ms=10.0, release_ms=80.0,
                                     knee=0.7071, ratio=4.0)

    def build(self) -> ChainParams:
        eq = np.concatenate(
            [design_filter(p, self.sample_rate).biquads
             for p in default_eq_params(self.sample_rate)], axis=0)
        return ChainParams(
            eq_coeffs=jnp.asarray(eq, jnp.float32),
            eq_block=biquad_block.precompute_fused(eq, self.block),
            h_spectra=fftconv.parse_ir(jnp.asarray(self.ir), self.block),
            comp=self.compressor.build())

    def init_state(self, params: ChainParams,
                   channels: Optional[int] = None) -> ChainState:
        c = self.channels if channels is None else channels
        return ChainState(
            eq=biquad_ops.init_state(params.eq_coeffs.shape[0], (c,)),
            fdl=fftconv.init_fdl(params.h_spectra, (c,)),
            sc=self.sidechain.init_state((c,)),
            env=dyn.env_init((c,)))

    # -- ring-FDL streaming step ----------------------------------------
    def init_ring_state(self, params: ChainParams,
                        channels: Optional[int] = None) -> ChainRingState:
        c = self.channels if channels is None else channels
        # scrambled-packed ring (ops.pallas_fft): the whole FDL —
        # rfft, ring MAC, irfft — runs as Pallas kernels on TPU (the
        # backend's native FFT is 15-20x off HBM speed-of-light,
        # NUMERICS round-4 anatomy); elsewhere the natural-order ring
        # with the XLA step is the fast path
        from lsp_dsp_units_tpu.ops import pallas_fft
        packed = (jax.default_backend() == "tpu"
                  and pallas_fft.supported(2 * self.block))
        return ChainRingState(
            eq=biquad_ops.init_state(params.eq_coeffs.shape[0], (c,)),
            fdl=fftconv.init_ring_fdl(params.h_spectra, (c,),
                                      packed=packed),
            sc=self.sidechain.init_state((c,)),
            env=dyn.env_init((c,)))

    def step_ring(self, params: ChainParams, state: ChainRingState,
                  x: Array) -> Tuple[ChainRingState, Array]:
        """One block through the chain with the ring-FDL convolver —
        bit-identical products/summation to :meth:`step` (see
        ops.fftconv.fdl_ring_step), minus the shift-register traffic.
        The bench's scan super-step uses this path."""
        assert x.shape[-1] == self.block, (x.shape, self.block)
        b = self.block
        packed_ring = (state.fdl.spec_re.ndim == 3
                       and state.fdl.spec_re.shape[-1] == b)
        if (jax.default_backend() == "tpu" and packed_ring
                and x.ndim == 2 and params.h_spectra.re.ndim == 2):
            # the chain's whole LINEAR path — EQ zero-state convolution
            # AND the ring-FDL convolver — as ONE Mosaic kernel
            # (ops.pallas_fdl_fused.eqfdl_fused_pallas): the EQ inverse
            # emits packed z-rows, which are exactly the second half of
            # the FDL frame, so nothing round-trips through HBM between
            # the two convolutions.  Only the EQ's skinny state
            # coupling (G/M/W matmuls) stays in XLA.
            from lsp_dsp_units_tpu.ops import pallas_fft as pfft
            from lsp_dsp_units_tpu.ops.pallas_fdl_fused import \
                eqfdl_fused_pallas
            eqp = params.eq_block
            k2 = eqp.m_mat.shape[0]
            sv = state.eq.reshape(state.eq.shape[:-2] + (k2,))
            corr = jnp.einsum("bk,...k->...b", eqp.g_mat, sv,
                              precision=jax.lax.Precision.HIGH)
            nfft = 2 * b
            heq_r, heq_i = _pack_cached(eqp.h_re, eqp.h_im, nfft)
            p_n = params.h_spectra.re.shape[-2]
            w = (state.fdl.pos + 1) % p_n
            rot = (w - jnp.arange(p_n)) % p_n
            hre_p, him_p = _pack_cached(params.h_spectra.re,
                                        params.h_spectra.im, nfft)
            y, u, buf_re, buf_im = eqfdl_fused_pallas(
                state.fdl.spec_re, state.fdl.spec_im,
                jnp.take(hre_p, rot, axis=-2),
                jnp.take(him_p, rot, axis=-2),
                heq_r, heq_i, x, corr, state.fdl.history, w, nfft,
                x3=pfft.X3)
            sv2 = (jnp.einsum("kj,...j->...k", eqp.m_mat, sv,
                              precision=jax.lax.Precision.HIGH)
                   + jnp.einsum("kb,...b->...k", eqp.w_mat, x,
                                precision=jax.lax.Precision.HIGH))
            eq_st = sv2.reshape(state.eq.shape)
            fdl_st = fftconv.RingFDLState(
                spec_re=buf_re, spec_im=buf_im, history=u, pos=w)
        else:
            y, eq_st = biquad_block.cascade_block_fused(params.eq_block,
                                                        state.eq, x)
            fdl_st, y = fftconv.fdl_ring_step(params.h_spectra,
                                              state.fdl, y)
        # Mosaic fast path: sliding-RMS sidechain + compressor envelope
        # + two-knee gain + apply, fused into ONE kernel (the rolling
        # sum and the envelope recurrence are both serial in t and
        # share one loop; the separate-kernel form pays two [C,T]
        # transposes and a level/env HBM round trip).  Same gate as
        # the individual kernels; CPU tests drive the fused kernel in
        # interpret mode (tests/test_e2e_chain.py).
        n_sc = self.sidechain.reactivity
        t = y.shape[-1]
        c_pad = -(-y.shape[0] // 128) * 128 if y.ndim == 2 else 0
        if (jax.default_backend() == "tpu" and y.ndim == 2
                and y.dtype == jnp.float32
                and self.sidechain.mode == SidechainMode.RMS
                and t >= n_sc and t % 8 == 0 and n_sc % 8 == 0
                and (2 * t + 2 * n_sc) * c_pad * 4 <= (9 << 20)):
            # (the _ct variant with in-kernel transposes measured
            # SLOWER on-chip — 155 vs 134 us: Mosaic's [T,C]<->[C,T]
            # transpose lowers worse than XLA's HBM transpose — so the
            # [T, C_pad] XLA-transposed form stays the production path)
            from lsp_dsp_units_tpu.ops.pallas_env import chain_dyn_pallas
            win, env_st, y = chain_dyn_pallas(
                state.sc.window, state.env, y, n_sc,
                self.sidechain.gain, params.comp.tau_attack,
                params.comp.tau_release, params.comp.release_thresh,
                params.comp.hold, params.comp.knees)
            sc_st = state.sc._replace(window=win)
        else:
            sc_st, level = self.sidechain.process(state.sc, y)
            env_st, gain, _ = self.compressor.process(params.comp,
                                                      state.env, level)
            y = y * gain
        return ChainRingState(eq=eq_st, fdl=fdl_st, sc=sc_st,
                              env=env_st), y

    # -- bulk super-block step ----------------------------------------------
    def build_bulk(self, t_super: int) -> fftconv.Spectra:
        """Whole-IR spectrum for :meth:`bulk_step` at super-block size
        ``t_super`` (a multiple of self.block, >= len(ir) - 1)."""
        assert t_super % self.block == 0
        return fftconv.ols_bulk_spectra(jnp.asarray(self.ir), t_super)

    def init_bulk_state(self, params: ChainParams, t_super: int,
                        channels: Optional[int] = None) -> ChainBulkState:
        c = self.channels if channels is None else channels
        return ChainBulkState(
            eq=biquad_ops.init_state(params.eq_coeffs.shape[0], (c,)),
            conv=fftconv.init_ols_bulk(t_super, (c,)),
            sc=self.sidechain.init_state((c,)),
            env=dyn.env_init((c,)))

    def bulk_step(self, params: ChainParams, h_bulk: fftconv.Spectra,
                  state: ChainBulkState, x: Array,
                  ) -> Tuple[ChainBulkState, Array]:
        """One super-block through the chain: identical math to
        :meth:`step` (same EQ cascade, exact convolution, same
        dynamics) with the convolver as ONE big-FFT overlap-save
        (ops.fftconv.ols_bulk_process) — the bulk/offline serving
        form: per-block FDL partition MACs re-stream the history
        spectra for every block; one FFT of 2T streams it once."""
        y, eq_st = biquad_block.cascade_block_fused(params.eq_block,
                                                    state.eq, x)
        conv_st, y = fftconv.ols_bulk_process(h_bulk, state.conv, y)
        sc_st, level = self.sidechain.process(state.sc, y)
        env_st, gain, _ = self.compressor.process(params.comp, state.env,
                                                  level)
        y = y * gain
        return ChainBulkState(eq=eq_st, conv=conv_st, sc=sc_st,
                              env=env_st), y

    # -- single-device step -------------------------------------------------
    def step(self, params: ChainParams, state: ChainState, x: Array,
             ) -> Tuple[ChainState, Array]:
        """x: [C, T], T a multiple of self.block."""
        y, eq_st = biquad_block.cascade_block_fused(params.eq_block,
                                                    state.eq, x)
        fdl_st, y = fftconv.fdl_process(params.h_spectra, state.fdl, y)
        sc_st, level = self.sidechain.process(state.sc, y)
        env_st, gain, _ = self.compressor.process(params.comp, state.env,
                                                  level)
        y = y * gain
        return ChainState(eq=eq_st, fdl=fdl_st, sc=sc_st, env=env_st), y

    # -- sharded step ---------------------------------------------------------
    def sharded_step(self, mesh, params: ChainParams):
        """Build a jitted shard_map step over a ('chan','time') mesh.

        Returns ``fn(state, x) -> (state, y)`` with x [C, T] sharded
        (chan, time); carried state sharded over chan only.
        """
        chain = self

        def local_step(state: ChainState, x: Array):
            # EQ: exact IIR across time shards via the fused block kernel
            # (f64-precomputed transitions; ~120 dB like the local path)
            y, eq_st = fused_cascade_time_sharded(
                params.eq_block, state.eq, x, pmesh.TIME_AXIS)
            # Convolver: halo FIR over the time axis; the carried FDL
            # state supplies history older than the super-block so the
            # reverb tail survives call boundaries (matches step())
            y, fdl_st = fir_conv_time_sharded(params.h_spectra, chain.block,
                                              y, pmesh.TIME_AXIS,
                                              carry=state.fdl)
            # Dynamics: sequential in time — gather the time axis for the
            # detector scan (channels stay parallel)
            y_full = jax.lax.all_gather(y, pmesh.TIME_AXIS, axis=-1,
                                        tiled=True)
            sc_st, level = chain.sidechain.process(state.sc, y_full)
            env_st, gain, _ = chain.compressor.process(
                params.comp, state.env, level)
            n = jax.lax.axis_size(pmesh.TIME_AXIS)
            idx = jax.lax.axis_index(pmesh.TIME_AXIS)
            t_loc = x.shape[-1]
            gain_loc = jax.lax.dynamic_slice_in_dim(
                gain, idx * t_loc, t_loc, axis=-1)
            y = y * gain_loc
            new_state = ChainState(eq=eq_st, fdl=fdl_st, sc=sc_st,
                                   env=env_st)
            return new_state, y

        state_specs = ChainState(
            eq=P(pmesh.CHAN_AXIS),
            fdl=fftconv.FDLState(spec_re=P(pmesh.CHAN_AXIS),
                                 spec_im=P(pmesh.CHAN_AXIS),
                                 history=P(pmesh.CHAN_AXIS)),
            sc=SidechainState(window=P(pmesh.CHAN_AXIS),
                              rms=P(pmesh.CHAN_AXIS)),
            env=dyn.EnvState(envelope=P(pmesh.CHAN_AXIS),
                             peak=P(pmesh.CHAN_AXIS),
                             hold=P(pmesh.CHAN_AXIS)))

        fn = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(state_specs, P(pmesh.CHAN_AXIS, pmesh.TIME_AXIS)),
            out_specs=(state_specs, P(pmesh.CHAN_AXIS, pmesh.TIME_AXIS)),
            check_vma=False)
        return jax.jit(fn)
