"""Float64 ideal of the bench chain (FilterConvChain.step_ring math)
computed in numpy — the arbiter for the TPU/CPU implementations'
distance from the mathematical chain (the capstone ``ref_floor``
pattern of tests/test_reference_oracle_chain.py applied to the bench
graph).

The ideal executes the same DESIGNED constants (biquad coefficients,
IR, tau/knee values — all f32-rounded once, exactly the values the
device paths consume) with float64 arithmetic and exact convolution.
"""

from __future__ import annotations

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def golden_chain_f64(chain, params, xs):
    """xs: list of [C, B] float32 blocks.  Returns list of [C, B]
    float64 outputs of the ideal chain."""
    eq = np.asarray(params.eq_coeffs, np.float64)        # [K, 5]
    ir = np.asarray(chain.ir, np.float64)
    comp = params.comp
    ta = float(np.float32(comp.tau_attack))
    tr = float(np.float32(comp.tau_release))
    rt = float(np.float32(comp.release_thresh))
    nh = float(np.asarray(comp.hold))
    k0 = [float(np.float32(v)) for v in comp.knees[0]]
    k1 = [float(np.float32(v)) for v in comp.knees[1]]
    n_win = chain.sidechain.reactivity
    g_sc = float(chain.sidechain.gain)

    x = np.concatenate([np.asarray(b, np.float64) for b in xs], axis=-1)
    c, t_total = x.shape

    # 1) EQ: biquad cascade, f64 direct form
    y = x
    for b0, b1, b2, a1, a2 in eq:
        out = np.empty_like(y)
        x1 = np.zeros(c)
        x2 = np.zeros(c)
        y1 = np.zeros(c)
        y2 = np.zeros(c)
        for t in range(t_total):
            v = (b0 * y[:, t] + b1 * x1 + b2 * x2
                 + a1 * y1 + a2 * y2)
            x2, x1 = x1, y[:, t]
            y2, y1 = y1, v
            out[:, t] = v
        y = out

    # 2) convolution with the chain IR (exact, zero initial history)
    n_fft = 1 << int(np.ceil(np.log2(t_total + ir.shape[-1])))
    yf = np.fft.rfft(y, n_fft, axis=-1) * np.fft.rfft(ir, n_fft)
    y = np.fft.irfft(yf, n_fft, axis=-1)[:, :t_total]

    # 3) sidechain sliding-RMS level (window starts at zeros)
    sq = (np.abs(y) * g_sc) ** 2
    csum = np.cumsum(np.concatenate(
        [np.zeros((c, n_win)), sq], axis=-1), axis=-1)
    win = csum[:, n_win:] - csum[:, :-n_win]
    level = np.sqrt(np.maximum(win / n_win, 0.0))

    # 4) compressor envelope (ops.dynamics._env_step semantics, f64)
    e = np.zeros(c)
    peak = np.zeros(c)
    hold = np.zeros(c)
    env = np.empty_like(level)
    for t in range(t_total):
        xt = level[:, t]
        d = xt - e
        falling = d < 0.0
        holding = hold > 0.0
        tau_dn = np.where(e > rt, tr, ta)
        e_fall = e + tau_dn * d
        e_rise = e + ta * d
        new_e = np.where(falling, np.where(holding, e, e_fall), e_rise)
        rise_peaked = np.logical_and(~falling, e_rise >= peak)
        peak = np.where(falling, np.where(holding, peak, e_fall),
                        np.where(rise_peaked, e_rise, peak))
        hold = np.where(falling, np.where(holding, hold - 1.0, hold),
                        np.where(rise_peaked, nh, hold))
        e = new_e
        env[:, t] = e

    # 5) two-knee gain + apply
    def knee_gain(k, ax, lx):
        start, end, gain, t0, t1, h0, h1, h2 = k
        line = np.exp(lx * t0 + t1)
        herm = np.exp((h0 * lx + h1) * lx + h2)
        return np.where(ax <= start, gain,
                        np.where(ax >= end, line, herm))

    ax = np.abs(env)
    lx = np.log(np.maximum(ax, 1e-36))
    gain = knee_gain(k0, ax, lx) * knee_gain(k1, ax, lx)
    y = y * gain

    b = xs[0].shape[-1]
    return [y[:, i * b:(i + 1) * b] for i in range(len(xs))]


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from lsp_dsp_units_tpu.pipeline import FilterConvChain

    chain = FilterConvChain(sample_rate=48000, channels=64, rank=14,
                            ir_seconds=1.0)
    params = chain.build()
    rng = np.random.default_rng(42)
    n_blocks = 10
    xs = [rng.standard_normal((64, chain.block)).astype(np.float32)
          * 0.25 for _ in range(n_blocks)]

    ys64 = golden_chain_f64(chain, params, xs)
    np.save("/tmp/chain_ideal64.npy", np.stack(ys64))

    st = chain.init_ring_state(params)
    step = jax.jit(chain.step_ring)
    for k in range(n_blocks):
        st, y = step(params, st, jnp.asarray(xs[k]))
        y = np.asarray(y, np.float64)
        g = ys64[k]
        err = y - g
        snr = 10 * np.log10(np.sum(g ** 2) / max(np.sum(err ** 2),
                                                 1e-30))
        print(f"block {k}: CPU chain vs f64 ideal {snr:.1f} dB",
              flush=True)


if __name__ == "__main__":
    main()
