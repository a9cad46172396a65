"""Halo exchange along a time-sharded axis.

The TPU equivalent of the reference's streaming tail buffers: overlap-save
FFT convolution needs the previous ``K-1`` input samples at each block
boundary (reference Convolver.cpp:304-311 keeps a sliding data buffer);
when time is sharded across devices, those samples live on the left
neighbor and are fetched with ``jax.lax.ppermute`` over ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def left_halo(x: jax.Array, overlap: int, axis_name: str) -> jax.Array:
    """Fetch the last ``overlap`` samples of the left neighbor's shard.

    ``x``: [..., T_local].  Returns [..., overlap]; the first device gets
    zeros (stream start).  Must be called inside shard_map with
    ``axis_name`` bound to the time mesh axis.
    """
    tail = x[..., -overlap:]
    n = jax.lax.axis_size(axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    return jax.lax.ppermute(tail, axis_name, perm)


def fir_conv_time_sharded(h_spectra, block: int,
                          x: jax.Array, axis_name: str) -> jax.Array:
    """Exact FIR convolution of a time-sharded signal, local FDL + halo.

    Each device pulls ``(P-1)*block`` halo samples (plus ``block`` history
    for overlap-save) from its left neighbor(s); with partitions P the
    halo spans P blocks, so for long IRs relative to the local shard this
    gathers from further neighbors by chaining ppermutes.

    Args:
      h_spectra: split-complex [P, F] IR spectra (ops.fftconv.parse_ir).
      block: partition block size B (F == B+1).
      x: [..., T_local], T_local divisible by ``block``.
      axis_name: time mesh axis name.

    Returns y [..., T_local] — the device's shard of the full causal
    convolution.
    """
    from lsp_dsp_units_tpu.ops import fftconv
    from lsp_dsp_units_tpu.ops.cplx import rfft_sc

    p = h_spectra.re.shape[-2]
    # history needed: P tail blocks for the FDL spectra, plus one more
    # block of overlap-save history for the OLDEST of those spectra
    halo = (p + 1) * block
    t_local = x.shape[-1]
    n = jax.lax.axis_size(axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]

    if halo <= t_local:
        hist = jax.lax.ppermute(x[..., -halo:], axis_name, perm)
    else:
        # chain ppermutes to accumulate enough history from further left;
        # ppermute yields zeros where no source exists (stream start)
        carries = []
        need = halo
        carry = x
        while need > 0:
            carry = jax.lax.ppermute(carry, axis_name, perm)
            carries.insert(0, carry)
            need -= t_local
        hist = jnp.concatenate(carries, axis=-1)[..., -halo:]

    # warm the FDL with the P halo blocks (newest at index 0), then
    # process the local shard
    warm = hist.reshape(hist.shape[:-1] + (p + 1, block))
    frames = jnp.concatenate([warm[..., :-1, :], warm[..., 1:, :]],
                             axis=-1)                       # [..., P, 2B]
    sre, sim = rfft_sc(frames)
    st = fftconv.FDLState(spec_re=sre[..., ::-1, :],
                          spec_im=sim[..., ::-1, :],
                          history=warm[..., -1, :])
    _, y = fftconv.fdl_process(h_spectra, st, x)
    return y
