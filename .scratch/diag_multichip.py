"""Diagnose dryrun_multichip mismatch: where does the error come from?"""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from lsp_dsp_units_tpu.parallel import mesh as pmesh
from lsp_dsp_units_tpu.pipeline import FilterConvChain
from lsp_dsp_units_tpu.ops import biquad_block as bb
from lsp_dsp_units_tpu.parallel.fused_iir import fused_cascade_time_sharded

n_devices = 8
devs = jax.devices()[:n_devices]
time = 2
chan = n_devices // time
mesh = pmesh.make_mesh(chan=chan, time=time, devices=devs)

channels = max(chan * 2, 4)
chain = FilterConvChain(sample_rate=48000, channels=channels, rank=8,
                        ir_seconds=0.02)
params = chain.build()
state = chain.init_state(params)
t = chain.block * 2 * time
x = jnp.ones((channels, t), jnp.float32) * 0.1

step = chain.sharded_step(mesh, params)
state0 = state
st_sh, y_sh = step(state, x)
st_ref, y_ref = chain.step(params, state0, x)
err = float(jnp.abs(y_sh - y_ref).max())
ref = float(jnp.abs(y_ref).max())
print(f"full chain: max|dy|={err:.3e} max|y|={ref:.3e} rel={err/ref:.3e}")

# --- EQ stage alone: sharded vs unsharded vs f64 golden ---
eq = np.asarray(params.eq_coeffs, np.float64)
xn = np.asarray(x, np.float64)

def golden_eq(xn):
    from lsp_dsp_units_tpu.ops.biquad_block import _run_stage
    y = xn.copy()
    for c in range(y.shape[0]):
        row = y[c]
        for stage in eq:
            row = _run_stage(row, stage)
        y[c] = row
    return y

y_gold = golden_eq(xn)
y_eq_local, _ = bb.cascade_block_fused(params.eq_block, state0.eq, x)
y_eq_local = np.asarray(y_eq_local, np.float64)

# sharded EQ alone via shard_map
from jax.sharding import PartitionSpec as P
def eq_local_step(st, xx):
    y, st2 = fused_cascade_time_sharded(params.eq_block, st, xx,
                                        pmesh.TIME_AXIS)
    return st2, y
fn = jax.shard_map(eq_local_step, mesh=mesh,
                   in_specs=(P(pmesh.CHAN_AXIS), P(pmesh.CHAN_AXIS, pmesh.TIME_AXIS)),
                   out_specs=(P(pmesh.CHAN_AXIS), P(pmesh.CHAN_AXIS, pmesh.TIME_AXIS)),
                   check_vma=False)
_, y_eq_sh = jax.jit(fn)(state0.eq, x)
y_eq_sh = np.asarray(y_eq_sh, np.float64)

def snr(a, b):
    e = a - b
    return 10*np.log10(np.sum(b*b) / max(np.sum(e*e), 1e-300))

print(f"EQ local  vs gold: snr={snr(y_eq_local, y_gold):6.1f} dB  max|d|={np.abs(y_eq_local-y_gold).max():.3e}")
print(f"EQ shard  vs gold: snr={snr(y_eq_sh, y_gold):6.1f} dB  max|d|={np.abs(y_eq_sh-y_gold).max():.3e}")
print(f"EQ shard vs local: snr={snr(y_eq_sh, y_eq_local):6.1f} dB  max|d|={np.abs(y_eq_sh-y_eq_local).max():.3e}")
print(f"max|y_gold|={np.abs(y_gold).max():.3e}")

# state magnitudes: how big do the fused states get?
_, st_f = bb.cascade_block_fused(params.eq_block, state0.eq, x)
print("state magnitude per stage:", np.abs(np.asarray(st_f)).max(axis=(0, 2)))
print("G norm cols:", np.abs(np.asarray(params.eq_block.g_mat)).max(axis=0))
