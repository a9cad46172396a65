import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from lsp_dsp_units_tpu.models.meters.true_peak import TruePeakMeter
from lsp_dsp_units_tpu.models.meters.loudness import LoudnessMeter
from lsp_dsp_units_tpu.models.misc import broadcast as bs
SR=48000
t = np.arange(SR*4)/SR
x = np.stack([0.5*np.sin(2*np.pi*997.0*t)]*2).astype(np.float32)
lm = LoudnessMeter(SR, channels=2, period_ms=bs.LUFS_SHORT_TERM_PERIOD,
                   designations=[bs.Channel.LEFT, bs.Channel.RIGHT])
st = lm.init_state()
st, loud = lm.process(st, jnp.asarray(x))
loud = np.asarray(loud)
print("loud tail", loud[-5:], "amp expect 0.5")
tpm = TruePeakMeter(SR)
ts = tpm.init_state((2,))
ts, pk = tpm.process(ts, jnp.asarray(x))
print("peak tail", np.asarray(pk)[:, -5:])
print("weights", lm.weights)
