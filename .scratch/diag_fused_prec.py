"""Isolate the f32 error sources in cascade_block_fused at block 128."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from lsp_dsp_units_tpu.pipeline import FilterConvChain, default_eq_params
from lsp_dsp_units_tpu.models.filters.design import design_filter
from lsp_dsp_units_tpu.ops import biquad_block as bb

fs = 48000
chain = FilterConvChain(sample_rate=fs, channels=4, rank=8, ir_seconds=0.02)
eq = np.concatenate([design_filter(p, fs).biquads
                     for p in default_eq_params(fs)], axis=0).astype(np.float64)
B = chain.block  # 128
M_BLK = 4
T = B * M_BLK
rng = np.random.default_rng(7)
x64 = np.tile((np.ones(T) * 0.1), (4, 1))  # same input as dryrun
params = bb.precompute_fused(eq, B)

def golden(xn):
    y = xn.copy()
    for c in range(y.shape[0]):
        row = y[c]
        for st in eq:
            row = bb._run_stage(row, st)
        y[c] = row
    return y

y_gold = golden(x64)

# numpy emulation of the fused path with configurable precision
h = np.asarray(params.h_re, np.float64) + 1j*np.asarray(params.h_im, np.float64)
G = np.asarray(params.g_mat, np.float64)
W = np.asarray(params.w_mat, np.float64)
M = np.asarray(params.m_mat, np.float64)

def run_fused(dt, params_in_f32=True):
    """Emulate: states/arith in dtype dt, params rounded to f32 or kept f64."""
    Hc, Gc, Wc, Mc = h, G, W, M
    y = np.zeros_like(x64)
    s = np.zeros((4, M.shape[0]))
    for m in range(M_BLK):
        blk = x64[:, m*B:(m+1)*B].astype(dt)
        spec = np.fft.rfft(blk, 2*B).astype(np.complex64 if dt == np.float32 else np.complex128)
        spec = (spec * Hc.astype(spec.dtype))
        y_zs = np.fft.irfft(spec, 2*B)[:, :B].astype(dt)
        y_blk = y_zs + (s.astype(dt) @ Gc.T.astype(dt)).astype(dt)
        s = (s.astype(dt) @ Mc.T.astype(dt) + blk @ Wc.T.astype(dt)).astype(dt)
        y[:, m*B:(m+1)*B] = y_blk
    return y

def snr(a, b=y_gold):
    e = np.asarray(a, np.float64) - b
    return 10*np.log10(np.sum(b*b) / max(np.sum(e*e), 1e-300))

# 1. all-f64 arithmetic with f32-rounded params: isolates PARAM rounding
print("f64 arith + f32 params :", f"{snr(run_fused(np.float64)):6.1f} dB")
# 2. f32 arithmetic with f32 params (what the kernel does)
print("f32 arith + f32 params :", f"{snr(run_fused(np.float32)):6.1f} dB")
# 3. actual jax kernel
y_jax, _ = bb.cascade_block_fused(params, jnp.zeros((4, params.m_mat.shape[0] // 2, 2)), jnp.asarray(x64, jnp.float32))
print("jax kernel             :", f"{snr(np.asarray(y_jax, np.float64)):6.1f} dB")

# magnitude diagnostics
print("|y_zs| single block max:", np.abs(np.fft.irfft(np.fft.rfft(x64[:, :B], 2*B)*h, 2*B)[:, :B]).max())
print("|G s| contributions max:", np.abs((np.ones(M.shape[0])*0.01) @ G.T).max())
print("|h_total spectrum| max :", np.abs(h).max())
ht = np.fft.irfft(h, 2*B)
print("|h_total IR| max, tail :", np.abs(ht).max(), np.abs(ht[B:]).max())

# 4. split-param (hi+lo f32 pairs), f32 arithmetic
def split32(a):
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo

def run_split(dt=np.float32):
    Hhi, Hlo = split32(h.view(np.float64).reshape(h.shape + (2,))) if False else (None, None)
    hr_hi, hr_lo = split32(h.real); hi_hi, hi_lo = split32(h.imag)
    G_hi, G_lo = split32(G); W_hi, W_lo = split32(W); M_hi, M_lo = split32(M)
    y = np.zeros_like(x64)
    s = np.zeros((4, M.shape[0]), dt)
    for m in range(M_BLK):
        blk = x64[:, m*B:(m+1)*B].astype(dt)
        spec = np.fft.rfft(blk, 2*B).astype(np.complex64)
        sp = spec*(hr_hi.astype(np.complex64)) + spec*(hr_lo.astype(np.complex64)) \
             + 1j*(spec*hi_hi.astype(np.complex64) + spec*hi_lo.astype(np.complex64))
        # do it split-complex properly: (xr+jxi)(hr+jhi)
        xr, xi = spec.real.astype(dt), spec.imag.astype(dt)
        hr = hr_hi.astype(dt); hrl = hr_lo.astype(dt)
        hii = hi_hi.astype(dt); hil = hi_lo.astype(dt)
        re = (xr*hr - xi*hii) + (xr*hrl - xi*hil)
        im = (xr*hii + xi*hr) + (xr*hil + xi*hrl)
        y_zs = np.fft.irfft((re.astype(np.float64) + 1j*im.astype(np.float64)).astype(np.complex64), 2*B)[:, :B].astype(dt)
        y_blk = y_zs + ((s @ G_hi.T.astype(dt)) + (s @ G_lo.T.astype(dt)))
        s = (s @ M_hi.T + s @ M_lo.T) + (blk @ W_hi.T + blk @ W_lo.T)
        y[:, m*B:(m+1)*B] = y_blk
    return y

print("split params + f32 arith:", f"{snr(run_split()):6.1f} dB")

# 5. balanced realization: similarity T on the block system (M, W, G)
import scipy.linalg as sla
P = sla.solve_discrete_lyapunov(M, W @ W.T)        # controllability
Q = sla.solve_discrete_lyapunov(M.T, G.T @ G)      # observability
# balancing transform (square-root method)
Lp = np.linalg.cholesky(P + 1e-30*np.eye(len(M)))
Lq = np.linalg.cholesky(Q + 1e-30*np.eye(len(M)))
U, sv, Vt = np.linalg.svd(Lq.T @ Lp)
S = np.diag(sv ** -0.5)
Tinv = Lp @ Vt.T @ S        # x = Tinv @ x_bal
T = S @ U.T @ Lq.T          # x_bal = T @ x
Mb = T @ M @ Tinv
Wb = T @ W
Gb = G @ Tinv
print("balanced sv:", np.array2string(sv, precision=2, max_line_width=100))
print("|Gb| max:", np.abs(Gb).max(), " |Wb| max:", np.abs(Wb).max(), " |Mb| max:", np.abs(Mb).max())

def run_bal(dt=np.float32):
    Gc = Gb.astype(dt); Wc = Wb.astype(dt); Mc = Mb.astype(dt)
    hr = h.real.astype(dt); hii = h.imag.astype(dt)
    y = np.zeros_like(x64)
    s = np.zeros((4, M.shape[0]), dt)
    for m in range(M_BLK):
        blk = x64[:, m*B:(m+1)*B].astype(dt)
        spec = np.fft.rfft(blk, 2*B).astype(np.complex64)
        xr, xi = spec.real.astype(dt), spec.imag.astype(dt)
        re = xr*hr - xi*hii; im = xr*hii + xi*hr
        y_zs = np.fft.irfft((re.astype(np.float64)+1j*im.astype(np.float64)).astype(np.complex64), 2*B)[:, :B].astype(dt)
        y_blk = y_zs + s @ Gc.T
        s = s @ Mc.T + blk @ Wc.T
        y[:, m*B:(m+1)*B] = y_blk
    return y

print("balanced + f32 arith   :", f"{snr(run_bal()):6.1f} dB")

# 6. isolate: y_zs via f32 FFT vs f64 FFT (params f64, states f64)
def run_mixed(zs_f32, state_f32):
    y = np.zeros_like(x64)
    s = np.zeros((4, M.shape[0]))
    for m in range(M_BLK):
        blk = x64[:, m*B:(m+1)*B]
        if zs_f32:
            spec = np.fft.rfft(blk.astype(np.float32), 2*B).astype(np.complex64)
            prod = (spec * h.astype(np.complex64)).astype(np.complex64)
            y_zs = np.fft.irfft(prod, 2*B)[:, :B].astype(np.float32).astype(np.float64)
        else:
            y_zs = np.fft.irfft(np.fft.rfft(blk, 2*B) * h, 2*B)[:, :B]
        if state_f32:
            gs = (s.astype(np.float32) @ Gb.T.astype(np.float32)).astype(np.float64)
            # states in balanced coords
            y_blk = y_zs + gs
            s = ((s.astype(np.float32) @ Mb.T.astype(np.float32)).astype(np.float64)
                 + (blk.astype(np.float32) @ Wb.T.astype(np.float32)).astype(np.float64))
        else:
            y_blk = y_zs + s @ Gb.T
            s = s @ Mb.T + blk @ Wb.T
        y[:, m*B:(m+1)*B] = y_blk
    return y

print("zs_f32 only            :", f"{snr(run_mixed(True, False)):6.1f} dB")
print("state_f32 only (bal)   :", f"{snr(run_mixed(False, True)):6.1f} dB")
print("all f64 (sanity)       :", f"{snr(run_mixed(False, False)):6.1f} dB")
