import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax; jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from lsp_dsp_units_tpu.utils.wavio import write_wav, read_wav
from lsp_dsp_units_tpu.models.filters import Filter, FilterParams, FilterType
from lsp_dsp_units_tpu.utils.blocks import BlockStream
from lsp_dsp_units_tpu.pipeline import FilterConvChain

SR = 48000
rng = np.random.default_rng(0)
x = (rng.standard_normal((1, SR)) * 0.1).astype(np.float32)
write_wav('.scratch/v_in.wav', x, SR)
x2, sr2 = read_wav('.scratch/v_in.wav')
assert sr2 == SR and x2.shape == x.shape

# +6 dB hi-shelf through the public Filter surface, streamed in odd chunks
flt = Filter(SR, FilterParams(ftype=FilterType.BT_RLC_HISHELF, freq=2000.0,
                          gain=2.0, slope=1, quality=0.0))
st = flt.init_state()
bs = BlockStream(flt.block if hasattr(flt, 'block') else 512,
                 lambda s, b: flt.process(s, b), st, channels=1) \
     if False else None
st, y = flt.process(st, jnp.asarray(x2))
y = np.asarray(y)
write_wav('.scratch/v_out.wav', y, SR)

X = np.fft.rfft(x2[0]); Y = np.fft.rfft(y[0])
f = np.fft.rfftfreq(SR, 1/SR)
lo = (f > 50) & (f < 200); hi = (f > 12000) & (f < 20000)
g_lo = 20*np.log10(np.abs(Y[lo]).sum()/np.abs(X[lo]).sum())
g_hi = 20*np.log10(np.abs(Y[hi]).sum()/np.abs(X[hi]).sum())
print(f"lo {g_lo:.2f} dB (expect ~0), hi {g_hi:.2f} dB (expect ~6)")
assert abs(g_lo) < 0.5 and abs(g_hi - 6.0) < 0.5

# chain step through the pipeline surface
chain = FilterConvChain(sample_rate=SR, channels=4, rank=11, ir_seconds=0.1)
p = chain.build(); s = chain.init_state(p)
xb = jnp.asarray(rng.standard_normal((4, chain.block)).astype(np.float32)*0.1)
s, yb = chain.step(p, s, xb)
yb = np.asarray(yb)
assert yb.shape == (4, chain.block) and np.isfinite(yb).all() and np.abs(yb).max() > 0
print("chain step ok", yb.shape, float(np.abs(yb).max()))
