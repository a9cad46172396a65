"""Validate: f64 precompute -> f64 balancing -> single f32 rounding."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import scipy.linalg as sla
from lsp_dsp_units_tpu.pipeline import FilterConvChain, default_eq_params
from lsp_dsp_units_tpu.models.filters.design import design_filter
from lsp_dsp_units_tpu.ops import biquad_block as bb

fs = 48000
eq = np.concatenate([design_filter(p, fs).biquads
                     for p in default_eq_params(fs)], axis=0).astype(np.float64)

def fused_mats_f64(coeffs, b):
    """Rebuild precompute_fused's f64 intermediates (copy of its math)."""
    coeffs = np.asarray(coeffs, np.float64)
    k = coeffs.shape[0]
    def run_cascade(x, stages):
        y = np.asarray(x, np.float64)
        for stage in stages:
            y = bb._run_stage(y, stage)
        return y
    delta = np.zeros(b); delta[0] = 1.0
    h_prefix = [delta.copy()]
    for j in range(k):
        h_prefix.append(run_cascade(h_prefix[-1], [coeffs[j]]))
    h_total = h_prefix[k]
    mid_cache = {}
    def h_mid(a, c):
        if a > c: return delta
        if (a, c) not in mid_cache:
            mid_cache[(a, c)] = run_cascade(delta, list(coeffs[a:c+1]))
        return mid_cache[(a, c)]
    p1 = np.zeros((k, b, 2)); v_ker = np.zeros((k, b, 2)); a_pow = np.zeros((k, 2, 2))
    for i, (b0, b1, b2, a1, a2) in enumerate(coeffs):
        A = np.array([[a1, 1.0], [a2, 0.0]])
        u = np.array([b1 + a1*b0, b2 + a2*b0])
        powers = np.zeros((b+1, 2, 2)); powers[0] = np.eye(2)
        for n in range(1, b+1): powers[n] = A @ powers[n-1]
        p1[i] = powers[:b, 0, :]
        v_ker[i] = np.einsum("nij,j->ni", powers[b-1::-1], u)
        a_pow[i] = powers[b]
    def corr_with(v2, h):
        out = np.zeros((2, b))
        for c in range(2):
            out[c] = np.convolve(v2[:, c][::-1], h)[:b][::-1]
        return out
    g_mat = np.zeros((b, 2*k))
    for j in range(k):
        h_down = h_mid(j+1, k-1)
        for c in range(2):
            g_mat[:, 2*j+c] = np.convolve(p1[j][:, c], h_down)[:b]
    w_mat = np.zeros((2*k, b))
    for i in range(k):
        w_mat[2*i:2*i+2, :] = corr_with(v_ker[i], h_prefix[i])
    m_mat = np.zeros((2*k, 2*k))
    for i in range(k):
        m_mat[2*i:2*i+2, 2*i:2*i+2] = a_pow[i]
        for j in range(i):
            h_m = h_mid(j+1, i-1)
            for c in range(2):
                gj = np.convolve(p1[j][:, c], h_m)[:b]
                m_mat[2*i:2*i+2, 2*j+c] = v_ker[i].T @ gj
    return h_total, g_mat, w_mat, m_mat

B = 128; M_BLK = 4; T = B*M_BLK
h_total, G, W, M = fused_mats_f64(eq, B)
h = np.fft.rfft(h_total, 2*B)

x64 = np.tile(np.ones(T)*0.1, (4, 1))
def golden(xn):
    y = xn.copy()
    for c in range(y.shape[0]):
        row = y[c]
        for st in eq: row = bb._run_stage(row, st)
        y[c] = row
    return y
y_gold = golden(x64)
def snr(a):
    e = np.asarray(a, np.float64) - y_gold
    return 10*np.log10(np.sum(y_gold*y_gold)/max(np.sum(e*e), 1e-300))

def run(h_, G_, W_, M_, dt):
    cplx = np.complex64 if dt == np.float32 else np.complex128
    y = np.zeros_like(x64); s = np.zeros((4, M.shape[0]), dt)
    for m in range(M_BLK):
        blk = x64[:, m*B:(m+1)*B].astype(dt)
        spec = np.fft.rfft(blk, 2*B).astype(cplx)
        y_zs = np.fft.irfft((spec*h_.astype(cplx)).astype(cplx), 2*B)[:, :B].astype(dt)
        y[:, m*B:(m+1)*B] = y_zs + s @ G_.T.astype(dt)
        s = s @ M_.T.astype(dt) + blk @ W_.T.astype(dt)
    return y

# sanity: pure f64 decomposition should be near-exact
print("pure f64 decomposition :", f"{snr(run(h, G, W, M, np.float64)):7.1f} dB")
# unbalanced, rounded once, f32 runtime
print("unbal f32              :", f"{snr(run(h.astype(np.complex64), G.astype(np.float32), W.astype(np.float32), M.astype(np.float32), np.float32)):7.1f} dB")

# balance in f64 then round
n = len(M)
P = sla.solve_discrete_lyapunov(M, W @ W.T)
Q = sla.solve_discrete_lyapunov(M.T, G.T @ G)
reg = 1e-12
Lp = np.linalg.cholesky(P + reg*np.trace(P)/n*np.eye(n))
Lq = np.linalg.cholesky(Q + reg*np.trace(Q)/n*np.eye(n))
U, sv, Vt = np.linalg.svd(Lq.T @ Lp)
S = sv ** -0.5
Tinv = Lp @ Vt.T * S
Tm = (S[:, None] * U.T) @ Lq.T
Mb, Wb, Gb = Tm @ M @ Tinv, Tm @ W, G @ Tinv
print("similarity check |T Tinv - I|:", np.abs(Tm @ Tinv - np.eye(n)).max())
print("bal f64 (exactness)    :", f"{snr(run(h, Gb, Wb, Mb, np.float64)):7.1f} dB")
print("bal f32                :", f"{snr(run(h.astype(np.complex64), Gb.astype(np.float32), Wb.astype(np.float32), Mb.astype(np.float32), np.float32)):7.1f} dB")
print("|Gb|max", np.abs(Gb).max(), "|Wb|max", np.abs(Wb).max(), "|Mb|max", np.abs(Mb).max())

# also with white-noise input (more representative than DC)
rng = np.random.default_rng(3)
x64 = rng.standard_normal((4, T)) * 0.25
y_gold = golden(x64)
print("-- white noise --")
print("unbal f32              :", f"{snr(run(h.astype(np.complex64), G.astype(np.float32), W.astype(np.float32), M.astype(np.float32), np.float32)):7.1f} dB")
print("bal f32                :", f"{snr(run(h.astype(np.complex64), Gb.astype(np.float32), Wb.astype(np.float32), Mb.astype(np.float32), np.float32)):7.1f} dB")
