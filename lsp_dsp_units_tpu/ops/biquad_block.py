"""Block-FFT biquad cascade execution — the high-precision, high-throughput
TPU path for IIR cascades.

Exact per-block decomposition of one biquad stage (DF2T state s = (s1,s2),
``s[n] = A s[n-1] + u x[n]``, ``y[n] = b0 x[n] + s1[n-1]``):

    y_block = conv(x_block, h)[0:B]  +  P1 @ s_in        (zero-state + zero-input)
    s_out   = A^B @ s_in             +  U @ x_block       (exact carry)

where ``h`` (stage impulse response over the block), ``P1[n] = (A^(n-1))``
row 0, ``U[:, n] = A^(B-1-n) u`` and ``A^B`` are all precomputed in
float64 on the host and rounded ONCE to float32 — so unlike a float32
associative scan (whose compounded prefix products cost ~36 dB of SNR for
low-frequency poles; see tests), the only runtime rounding is one FFT
convolution and two small matmuls.  Measured: >= 100 dB SNR vs the
float64 sequential golden on a 40 Hz slope-2 Butterworth high-pass, while
being pure batched FFT + MXU work with no per-sample recurrence.

This replaces the reference's per-sample SIMD biquad recurrence
(dsp::biquad_process_x*, reference src/main/filters/FilterBank.cpp:256-291)
with the TPU-shaped equivalent.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.ops.cplx import rfft_sc, irfft_sc, sc_mul
from lsp_dsp_units_tpu.ops.unroll import unrolled_scan

# device-path contractions run at HIGH precision (bf16_3x, f32-class
# accuracy): the TPU default (1-pass bf16) rounds f32 operands to ~8
# mantissa bits — measured as a ~6 dB chain-level SNR loss — while
# HIGHEST (6-pass) doubles the MXU passes for accuracy far below the
# chain's own f32 floor (NUMERICS.md round-4 late)
_PREC = jax.lax.Precision.HIGH

Array = jax.Array


def _run_stage(x: np.ndarray, stage) -> np.ndarray:
    """One biquad stage over a float64 buffer (scipy lfilter when
    available, else a python loop)."""
    b0, b1, b2, a1, a2 = (float(v) for v in stage)
    try:
        from scipy.signal import lfilter
        return lfilter([b0, b1, b2], [1.0, -a1, -a2],
                       np.asarray(x, np.float64))
    except Exception:
        out = np.empty(len(x))
        s1 = s2 = 0.0
        for n, xn in enumerate(np.asarray(x, np.float64)):
            y = b0 * xn + s1
            s1 = b1 * xn + a1 * y + s2
            s2 = b2 * xn + a2 * y
            out[n] = y
        return out


def init_state(num_stages: int, batch_shape: Tuple[int, ...] = (),
               dtype=jnp.float32) -> Array:
    return jnp.zeros(batch_shape + (num_stages, 2), dtype)


# ---------------------------------------------------------------------------
# Fused whole-cascade block execution: ONE FFT convolution + MXU matmuls
# ---------------------------------------------------------------------------


class FusedCascadeParams(NamedTuple):
    """Whole-cascade block kernels: the serial K-stage cascade collapses
    into one composite FFT convolution plus linear state coupling.

    Derivation: within a block every signal is linear in (x, s_in), so
      y     = conv(x, h_total)[:B] + G @ vec(s_in)
      s_out = M @ vec(s_in)        + W @ x
    with h_total the composite cascade IR over the block, G the
    state->output responses propagated through downstream stages, W the
    input->state responses through upstream stages, and M the 2Kx2K
    inter-stage state coupling — ALL precomputed in float64 on the host.
    Runtime cost per block: one rfft/irfft pair + two matmuls (vs K FFT
    pairs for the per-stage path).

    The state basis is BALANCED, not raw DF2T: the f64 (M, W, G) system
    is similarity-transformed to its (diagonally) balanced realization
    before the single f64->f32 rounding.  Raw DF2T states of
    low-frequency stages are large and nearly cancelling (G columns of
    norm ~80 against outputs of ~0.1), which floors the f32 path at
    ~66 dB for small blocks; balancing makes every matrix entry O(1) and
    restores ~130 dB (measured, 16-stage 40 Hz-HP cascade at block 128).
    Zero states are valid in either basis; use :func:`state_to_fused` /
    :func:`state_from_fused` to exchange streams with the sequential
    DF2T kernels (ops.biquad)."""
    h_re: Array       # [F] composite spectrum (split-complex)
    h_im: Array       # [F]
    g_mat: Array      # [B, 2K] state -> output (balanced basis)
    w_mat: Array      # [2K, B] input -> state (balanced basis)
    m_mat: Array      # [2K, 2K] state -> state (balanced basis)
    t_mat: Array      # [2K, 2K] DF2T -> balanced state basis
    t_inv: Array      # [2K, 2K] balanced -> DF2T
    # one-SAMPLE composite state-space in the same balanced basis, for
    # remainder chunks shorter than the block (cascade_seq_fused): a
    # stream of misaligned calls then never leaves the balanced basis,
    # avoiding the t_mat/t_inv f32 round-trip per call (t@t_inv != I
    # exactly in f32, so repeated conversion random-walks the state)
    a1_mat: Array     # [2K, 2K] per-sample state transition
    b1_vec: Array     # [2K] input -> state
    c1_vec: Array     # [2K] state -> output
    d1: Array         # [] input feedthrough


def _balance_f64(g: np.ndarray, w: np.ndarray, m: np.ndarray):
    """Balanced-realization similarity of the block system (f64).

    Returns (g_b, w_b, m_b, t, t_inv) with s_bal = t @ s_df2t.  Falls
    back to the identity transform when the system is not safely
    balanceable (unstable M, singular Gramian factors, no scipy)."""
    n = m.shape[0]
    ident = np.eye(n)
    try:
        import scipy.linalg as sla
        if n == 0 or np.max(np.abs(np.linalg.eigvals(m))) >= 1.0 - 1e-12:
            return g, w, m, ident, ident
        p = sla.solve_discrete_lyapunov(m, w @ w.T)
        q = sla.solve_discrete_lyapunov(m.T, g.T @ g)
        reg = 1e-12
        lp = np.linalg.cholesky(p + reg * (np.trace(p) / n) * ident)
        lq = np.linalg.cholesky(q + reg * (np.trace(q) / n) * ident)
        u, sv, vt = np.linalg.svd(lq.T @ lp)
        if sv[-1] <= 0 or not np.all(np.isfinite(sv)):
            return g, w, m, ident, ident
        s = sv ** -0.5
        t_inv = lp @ vt.T * s
        t = (s[:, None] * u.T) @ lq.T
        if np.abs(t @ t_inv - ident).max() > 1e-6:
            return g, w, m, ident, ident
        return g @ t_inv, t @ w, t @ m @ t_inv, t, t_inv
    except Exception:
        return g, w, m, ident, ident


def _fused_mats_f64(coeffs: np.ndarray, block: int):
    """Float64 (h_total, G, W, M) of the fused block decomposition."""
    coeffs = np.asarray(coeffs, np.float64)
    k = coeffs.shape[0]
    b = int(block)

    def run_cascade(x, stages):
        y = np.asarray(x, np.float64)
        for stage in stages:
            y = _run_stage(y, stage)
        return y

    delta = np.zeros(b)
    delta[0] = 1.0
    # prefix composite IRs: h_prefix[j] = IR of stages 0..j-1
    h_prefix = [delta.copy()]
    for j in range(k):
        h_prefix.append(run_cascade(h_prefix[-1], [coeffs[j]]))
    h_total = h_prefix[k]
    # mid IRs between stages (h_{a..b-1}) derived on demand via
    # deconvolution-free recomputation: IR of stages a..c =
    # run stages a..c on delta
    mid_cache = {}

    def h_mid(a, c):  # IR of stages a..c inclusive; a > c -> delta
        if a > c:
            return delta
        key = (a, c)
        if key not in mid_cache:
            mid_cache[key] = run_cascade(delta, list(coeffs[a:c + 1]))
        return mid_cache[key]

    # per-stage power tables
    p1 = np.zeros((k, b, 2))
    v_ker = np.zeros((k, b, 2))
    a_pow = np.zeros((k, 2, 2))
    for i, (b0, b1, b2, a1, a2) in enumerate(coeffs):
        A = np.array([[a1, 1.0], [a2, 0.0]])
        u = np.array([b1 + a1 * b0, b2 + a2 * b0])
        powers = np.zeros((b + 1, 2, 2))
        powers[0] = np.eye(2)
        for n in range(1, b + 1):
            powers[n] = A @ powers[n - 1]
        p1[i] = powers[:b, 0, :]
        v_ker[i] = np.einsum("nij,j->ni", powers[b - 1::-1], u)
        a_pow[i] = powers[b]

    def corr_with(v2, h):
        """[B,2] kernel correlated with IR h: out[:, n] = sum_m
        v2[m] * h[m - n]  -> [2, B]."""
        out = np.zeros((2, b))
        for c in range(2):
            out[c] = np.convolve(v2[:, c][::-1], h)[:b][::-1]
        return out

    # G: state of stage j -> output through stages j+1..K-1
    g_mat = np.zeros((b, 2 * k))
    for j in range(k):
        h_down = h_mid(j + 1, k - 1)
        for c in range(2):
            g_mat[:, 2 * j + c] = np.convolve(p1[j][:, c], h_down)[:b]
    # W: input -> state of stage i through stages 0..i-1
    w_mat = np.zeros((2 * k, b))
    for i in range(k):
        w_mat[2 * i: 2 * i + 2, :] = corr_with(v_ker[i], h_prefix[i])
    # M: state couplings
    m_mat = np.zeros((2 * k, 2 * k))
    for i in range(k):
        m_mat[2 * i: 2 * i + 2, 2 * i: 2 * i + 2] = a_pow[i]
        for j in range(i):
            # s_j,in -> y_zi_j -> through stages j+1..i-1 -> state i
            h_m = h_mid(j + 1, i - 1)
            for c in range(2):
                gj = np.convolve(p1[j][:, c], h_m)[:b]   # signal at stage i in
                contrib = v_ker[i].T @ gj                 # [2]
                m_mat[2 * i: 2 * i + 2, 2 * j + c] = contrib

    return h_total, g_mat, w_mat, m_mat


def _sample_ss_f64(coeffs: np.ndarray):
    """Composite ONE-sample state-space (A1, B1, C1, D1) of the DF2T
    cascade in f64, stage-major state layout [s1_0, s2_0, s1_1, ...]
    (the same vec layout as _fused_mats_f64).  Per stage
    (_run_stage recurrence): y = b0 x + s1; s1' = b1 x + a1 y + s2;
    s2' = b2 x + a2 y."""
    coeffs = np.asarray(coeffs, np.float64)
    k = coeffs.shape[0]
    a1m = np.zeros((2 * k, 2 * k))
    b1v = np.zeros(2 * k)
    # output of stages 0..i-1 as a function of (full state, input):
    # y_prefix = c_pre @ s + d_pre * x
    c_pre = np.zeros(2 * k)
    d_pre = 1.0
    for i, (b0, b1, b2, a1, a2) in enumerate(coeffs):
        A = np.array([[a1, 1.0], [a2, 0.0]])
        B = np.array([b1 + a1 * b0, b2 + a2 * b0])
        sl = slice(2 * i, 2 * i + 2)
        a1m[sl, :] += np.outer(B, c_pre)
        a1m[sl, sl] += A
        b1v[sl] = B * d_pre
        # y_i = b0 * (stage input) + s1_i
        c_new = b0 * c_pre
        c_new[2 * i] += 1.0
        c_pre, d_pre = c_new, b0 * d_pre
    return a1m, b1v, c_pre, d_pre


def precompute_fused(coeffs: np.ndarray, block: int,
                     balance: bool = True) -> FusedCascadeParams:
    b = int(block)
    h_total, g_mat, w_mat, m_mat = _fused_mats_f64(coeffs, b)
    a1m, b1v, c1v, d1 = _sample_ss_f64(coeffs)
    if balance:
        g_mat, w_mat, m_mat, t, t_inv = _balance_f64(g_mat, w_mat, m_mat)
    else:
        t = t_inv = np.eye(m_mat.shape[0])
    # the one-sample system rides the same similarity transform so the
    # block and per-sample paths share one carried-state basis
    a1m = t @ a1m @ t_inv
    b1v = t @ b1v
    c1v = c1v @ t_inv
    hs = np.fft.rfft(h_total, 2 * b)
    return FusedCascadeParams(
        h_re=jnp.asarray(hs.real, jnp.float32),
        h_im=jnp.asarray(hs.imag, jnp.float32),
        g_mat=jnp.asarray(g_mat, jnp.float32),
        w_mat=jnp.asarray(w_mat, jnp.float32),
        m_mat=jnp.asarray(m_mat, jnp.float32),
        t_mat=jnp.asarray(t, jnp.float32),
        t_inv=jnp.asarray(t_inv, jnp.float32),
        a1_mat=jnp.asarray(a1m, jnp.float32),
        b1_vec=jnp.asarray(b1v, jnp.float32),
        c1_vec=jnp.asarray(c1v, jnp.float32),
        d1=jnp.asarray(d1, jnp.float32))


def state_to_fused(params: FusedCascadeParams, state: Array) -> Array:
    """DF2T per-stage state [..., K, 2] -> fused (balanced) basis."""
    k2 = params.m_mat.shape[0]
    sv = state.reshape(state.shape[:-2] + (k2,))
    sv = jnp.einsum("ij,...j->...i", params.t_mat, sv,
                    precision=_PREC)
    return sv.reshape(state.shape)


def state_from_fused(params: FusedCascadeParams, state: Array) -> Array:
    """Fused (balanced) basis state [..., K, 2] -> DF2T per-stage."""
    k2 = params.m_mat.shape[0]
    sv = state.reshape(state.shape[:-2] + (k2,))
    sv = jnp.einsum("ij,...j->...i", params.t_inv, sv,
                    precision=_PREC)
    return sv.reshape(state.shape)


def fused_block_size(params: FusedCascadeParams) -> int:
    return params.h_re.shape[-1] - 1


def cascade_seq_fused(params: FusedCascadeParams, state: Array,
                      x: Array) -> Tuple[Array, Array]:
    """Per-sample cascade execution IN the balanced basis: x [..., T]
    (any T, no block alignment), state [..., K, 2] -> (y, state').

    For remainder chunks shorter than the fused block size — keeps the
    carried state in the one balanced basis instead of round-tripping
    through t_mat/t_inv every call."""
    k2 = params.m_mat.shape[0]
    sv = state.reshape(state.shape[:-2] + (k2,))

    def step(s, xn):
        y = jnp.einsum("k,...k->...", params.c1_vec, s,
                       precision=_PREC) + params.d1 * xn
        s2 = (jnp.einsum("kj,...j->...k", params.a1_mat, s,
                         precision=_PREC)
              + params.b1_vec * xn[..., None])
        return s2, y

    # fuse as many iterations per scan step as the length allows
    # (per-step dispatch dominates short bodies on TPU; same harness
    # as the other sequential kernels)
    t = x.shape[-1]
    u = next((u for u in (16, 8, 4, 2) if t % u == 0), 1)
    sv2, ys = unrolled_scan(step, sv, jnp.moveaxis(x, -1, 0), t, u)
    y = jnp.moveaxis(ys, 0, -1).astype(x.dtype)
    return y, sv2.reshape(state.shape)


def cascade_block_fused(params: FusedCascadeParams, state: Array,
                        x: Array) -> Tuple[Array, Array]:
    """Fused cascade execution: x [..., T] (T multiple of B), state
    [..., K, 2] -> (y, state')."""
    b = fused_block_size(params)
    k = params.g_mat.shape[-1] // 2
    t = x.shape[-1]
    assert t % b == 0, (t, b)
    m = t // b
    sv = state.reshape(state.shape[:-2] + (2 * k,))

    if m == 1:
        from lsp_dsp_units_tpu.ops import pallas_fft as pfft
        if (jax.default_backend() == "tpu" and x.ndim == 2
                and pfft.supported(2 * b)):
            # packed Pallas FFT path: the backend's native pair costs
            # ~160 us at the production shape (measured STREAMING —
            # with loop-varying input; a constant-input scan lets XLA
            # hoist this whole convolution, which hid its cost from
            # every earlier bench — NUMERICS.md round-4 late)
            sr, si = pfft.rfft_packed_zeropad(x)
            hre_p, him_p = pfft.pack_spectra(params.h_re, params.h_im,
                                             2 * b)
            y_zs = pfft.irfft_packed(
                pfft.mul_packed(sr, si, hre_p, him_p), 2 * b,
                half="first")
        else:
            spec = sc_mul(rfft_sc(x, 2 * b), (params.h_re, params.h_im))
            y_zs = irfft_sc(spec, 2 * b)[..., :b]
        y = y_zs + jnp.einsum("bk,...k->...b", params.g_mat, sv,
                          precision=_PREC)
        sv2 = (jnp.einsum("kj,...j->...k", params.m_mat, sv,
                      precision=_PREC)
           + jnp.einsum("kb,...b->...k", params.w_mat, x,
                        precision=_PREC))
        return y.astype(x.dtype), sv2.reshape(state.shape)

    blocks = jnp.moveaxis(x.reshape(x.shape[:-1] + (m, b)), -2, 0)
    from lsp_dsp_units_tpu.ops import pallas_fft as pfft
    if (jax.default_backend() == "tpu" and blocks.ndim == 3
            and pfft.supported(2 * b)):
        # packed Pallas FFT for the batched per-block zero-state convs
        # (the bulk super-step path): all M x C rows through the
        # zero-pad forward / packed product / first-half inverse
        m_b, c_b = blocks.shape[0], blocks.shape[1]
        rows = blocks.reshape(m_b * c_b, b)
        sr, si = pfft.rfft_packed_zeropad(rows)
        hre_p, him_p = pfft.pack_spectra(params.h_re, params.h_im,
                                         2 * b)
        y_zs = pfft.irfft_packed(
            pfft.mul_packed(sr, si, hre_p, him_p), 2 * b,
            half="first").reshape(m_b, c_b, b)
    else:
        spec = sc_mul(rfft_sc(blocks, 2 * b),
                      (params.h_re, params.h_im))
        y_zs = irfft_sc(spec, 2 * b)[..., :b]             # [M, ..., B]
    wx = jnp.einsum("kb,m...b->m...k", params.w_mat, blocks,
                    precision=_PREC)

    def step(s, inp):
        zs, wxi = inp
        y_blk = zs + jnp.einsum("bk,...k->...b", params.g_mat, s,
                                precision=_PREC)
        s2 = jnp.einsum("kj,...j->...k", params.m_mat, s,
                        precision=_PREC) + wxi
        return s2, y_blk

    sv2, y_out = jax.lax.scan(step, sv, (y_zs, wx))
    y = jnp.moveaxis(y_out, 0, -2).reshape(x.shape).astype(x.dtype)
    return y, sv2.reshape(state.shape)
