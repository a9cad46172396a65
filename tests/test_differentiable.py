"""Differentiable DSP — a capability the reference architecture cannot
offer: every kernel is a pure jnp function, so gradients flow through
filters, convolution, and dynamics.  These tests pin that property so a
refactor can't silently break it (e.g. by introducing host callbacks or
non-differentiable ops into the compute path).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lsp_dsp_units_tpu.ops import biquad as biquad_ops

SR = 48000


def _mag_response(coeffs, n=512):
    """Differentiable magnitude response via the cascade's impulse
    response (pure jnp path through the associative-scan kernel)."""
    imp = jnp.zeros((n,), jnp.float32).at[0].set(1.0)
    state = biquad_ops.init_state(coeffs.shape[0], ())
    y, _ = biquad_ops.biquad_cascade(coeffs, state, imp)
    re, im = jnp.real(jnp.fft.rfft(y)), jnp.imag(jnp.fft.rfft(y))
    return jnp.sqrt(re * re + im * im + 1e-12)


def test_gradient_fit_biquad_to_target_response():
    """Fit one raw biquad stage by Adam to match a designed peaking
    filter's magnitude response — loss must fall >100x and the fitted
    response must sit within 0.2 dB of the target in-band."""
    from lsp_dsp_units_tpu.models.filters import Filter, FilterParams
    from lsp_dsp_units_tpu.models.filters.design import FilterType
    import optax

    target_flt = Filter(SR, FilterParams(
        ftype=FilterType.DR_APO_PEAKING, freq=3000.0, gain=2.0, quality=2.0))
    target = _mag_response(target_flt.coefficients())

    def loss_fn(c):
        return jnp.mean((jnp.log(_mag_response(c)) - jnp.log(target)) ** 2)

    c0 = jnp.asarray([[1.0, 0.0, 0.0, 0.0, 0.0]], jnp.float32)  # identity
    opt = optax.adam(3e-2)
    opt_state = opt.init(c0)

    @jax.jit
    def step(c, s):
        l, g = jax.value_and_grad(loss_fn)(c)
        updates, s = opt.update(g, s)
        return optax.apply_updates(c, updates), s, l

    c, l0 = c0, float(loss_fn(c0))
    for _ in range(1000):
        c, opt_state, l = step(c, opt_state)
    l = float(l)
    assert np.isfinite(l) and l < l0 / 1000, (l0, l)

    fitted = np.asarray(_mag_response(c))
    tgt = np.asarray(target)
    band = slice(4, 200)           # skip DC bin and extreme highs
    err_db = 20 * np.abs(np.log10(fitted[band]) - np.log10(tgt[band]))
    assert err_db.max() < 0.2, err_db.max()


def test_gradient_flows_through_flagship_chain():
    """jax.grad through the full FilterConvChain step (EQ cascade ->
    partitioned convolution -> sidechain compressor) is finite and
    nonzero — no host callbacks or gradient-stopping ops on the path."""
    from lsp_dsp_units_tpu.pipeline import FilterConvChain

    chain = FilterConvChain(SR, channels=4, rank=9, ir_seconds=0.02)
    params = chain.build()
    state = chain.init_state(params)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(
        (4, chain.block)).astype(np.float32) * 0.25)

    def energy(xin):
        _, y = chain.step(params, state, xin)
        return jnp.sum(y * y)

    g = jax.jit(jax.grad(energy))(x)
    g = np.asarray(g)
    assert g.shape == x.shape
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0.0


def test_gradient_through_compressor_params():
    """Gain-curve parameters (threshold/ratio knees) are differentiable:
    d(output)/d(threshold) is finite and nonzero, enabling learned
    dynamics settings."""
    from lsp_dsp_units_tpu.models.dynamics.compressor import Compressor

    u = Compressor(SR)
    p = u.build()
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32) * 0.5)
    st = u.init_state((2,))

    leaves, treedef = jax.tree_util.tree_flatten(p)

    def out_energy(leaves):
        params = jax.tree_util.tree_unflatten(treedef, leaves)
        _, y, _ = u.process(params, st, x)
        return jnp.sum(y * y)

    grads = jax.jit(jax.grad(out_energy))(
        [jnp.asarray(l, jnp.float32) for l in leaves])
    flat = np.concatenate([np.ravel(np.asarray(g)) for g in grads])
    assert np.all(np.isfinite(flat))
    assert np.abs(flat).max() > 0.0
