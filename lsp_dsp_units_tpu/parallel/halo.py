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
    """Fetch the last ``overlap`` samples of the left neighbor(s)' shards.

    ``x``: [..., T_local].  Returns [..., overlap]; devices near the
    stream start get zeros for the part reaching before sample 0.  Must
    be called inside shard_map with ``axis_name`` bound to the time mesh
    axis.  When ``overlap > T_local`` the halo spans several shards and
    is assembled by chaining ppermute hops (same discipline as
    fir_conv_time_sharded) instead of silently truncating.
    """
    n = jax.lax.axis_size(axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    t_local = x.shape[-1]
    if overlap <= t_local:
        return jax.lax.ppermute(x[..., -overlap:], axis_name, perm)
    # chain hops: piece k (k=1 nearest) comes from the k-th left
    # neighbor; shards beyond the stream start contribute zeros
    hops = -(-overlap // t_local)
    pieces = []
    shard = x
    got = 0
    for _ in range(hops):
        shard = jax.lax.ppermute(shard, axis_name, perm)
        take = min(t_local, overlap - got)
        pieces.append(shard[..., -take:])
        got += take
    return jnp.concatenate(pieces[::-1], axis=-1)


def fir_conv_time_sharded(h_spectra, block: int,
                          x: jax.Array, axis_name: str, carry=None):
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
      carry: optional ``fftconv.FDLState`` holding the stream state at the
        end of the PREVIOUS super-block (identical on every time shard).
        Without it, halo slots reaching past the super-block start are
        zeros — correct only at true stream start (the reference keeps the
        equivalent sliding history in Convolver.cpp:304-311).

    Returns y [..., T_local] (the device's shard of the full causal
    convolution); with ``carry`` given, returns ``(y, new_carry)`` where
    ``new_carry`` is the stream state after this super-block, replicated
    across time shards.
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
        chunks = []
        need = halo
        chunk = x
        while need > 0:
            chunk = jax.lax.ppermute(chunk, axis_name, perm)
            chunks.insert(0, chunk)
            need -= t_local
        hist = jnp.concatenate(chunks, axis=-1)[..., -halo:]

    # warm the FDL with the P halo blocks (newest at index 0), then
    # process the local shard
    warm = hist.reshape(hist.shape[:-1] + (p + 1, block))

    if carry is not None:
        # Everything is block-aligned.  With shard i starting shift=i*L
        # blocks into the super-block (L = local blocks), warm index k
        # holds absolute block start-1-P+k; ppermute filled blocks that
        # precede the super-block with zeros.  The newest such block
        # (M-1, at k = P-shift) is the carried time-domain history —
        # patch it so the boundary-straddling frame (M-1 || M) is right.
        i = jax.lax.axis_index(axis_name)
        shift = i * (t_local // block)
        k_patch = p - shift
        cond = (jnp.arange(p + 1) == k_patch)[:, None]     # [P+1, 1]
        warm = jnp.where(cond, carry.history[..., None, :], warm)

    frames = jnp.concatenate([warm[..., :-1, :], warm[..., 1:, :]],
                             axis=-1)                       # [..., P, 2B]
    sre, sim = rfft_sc(frames)
    st = fftconv.FDLState(spec_re=sre[..., ::-1, :],
                          spec_im=sim[..., ::-1, :],
                          history=warm[..., -1, :])

    if carry is not None:
        # FDL slot q (frame of block start-1-q, touching blocks
        # start-2-q) reaches frames entirely BEFORE the super-block when
        # q >= shift — those spectra come verbatim from the carried
        # stream state (slot q - shift holds the same absolute frame).
        def overlay(w, c):
            rolled = jnp.roll(c, shift, axis=-2)
            keep = jnp.arange(p)[:, None] >= shift
            return jnp.where(keep, rolled, w)

        st = fftconv.FDLState(
            spec_re=overlay(st.spec_re, carry.spec_re),
            spec_im=overlay(st.spec_im, carry.spec_im),
            history=st.history)

    fin, y = fftconv.fdl_process(h_spectra, st, x)
    if carry is None:
        return y
    # the last time shard's final FDL is the stream state after this
    # super-block; psum-mask it so the carry is provably replicated
    idx = jax.lax.axis_index(axis_name)
    new_carry = jax.tree_util.tree_map(
        lambda leaf: jax.lax.psum(
            jnp.where(idx == n - 1, leaf, jnp.zeros_like(leaf)), axis_name),
        fin)
    return y, new_carry
