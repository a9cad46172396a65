"""Room-acoustics demo: trace a reverb impulse response of a box room
with the batched ray tracer, then convolve a source WAV with it (the
reference's RayTrace3D -> Sample -> Convolver pipeline, mtest style).

Usage: python examples/room_demo.py in.wav out.wav [ir.wav]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")   # demo runs anywhere
import jax.numpy as jnp

from lsp_dsp_units_tpu.models.threed.scene import box_room, Material
from lsp_dsp_units_tpu.models.threed.raytrace import (RayTrace3D, Source,
                                                      Capture, MicPattern)
from lsp_dsp_units_tpu.models.util.convolver import Convolver
from lsp_dsp_units_tpu.utils.wavio import read_wav, write_wav


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    ir_path = sys.argv[3] if len(sys.argv) > 3 else None
    x, sr = read_wav(src)
    print(f"{src}: {x.shape[0]} ch, {x.shape[1]} samples @ {sr} Hz")

    # a 6 x 4 x 3 m room with moderately absorbent walls; diffusion
    # follows the reference's virtual-source pullback convention
    # (1.0 = exact mirror, larger values spread the reflection)
    scene = box_room(size=(6.0, 4.0, 3.0),
                     material=Material(absorption=0.25, diffusion=3.0))
    rt = RayTrace3D(scene, sample_rate=sr, ir_length_s=0.7, rays=8192,
                    max_bounces=40)
    rt.add_source(Source(position=np.array([1.5, 1.2, 1.4])))
    rt.add_capture(Capture(position=np.array([4.5, 2.8, 1.6]),
                           pattern=MicPattern.CARDIOID,
                           direction=np.array([-1.0, 0.0, 0.0])))
    ir_sample = rt.process()
    print(f"traced {rt.stats['rays_traced']} rays, "
          f"{rt.stats['captured']} arrivals")
    # the tracer emits a SIGNED pressure IR (polarity-inverted
    # reflections included) — use it directly
    ir = np.asarray(ir_sample.data[0], np.float32)
    peak = np.abs(ir).max()
    if peak > 0:
        ir *= 0.5 / peak
    if ir_path:
        write_wav(ir_path, ir[None, :], sr)
        print(f"wrote {ir_path} ({ir.size} taps)")

    conv = Convolver(ir, rank=12)
    t = (x.shape[1] // conv.block) * conv.block
    outs = []
    for c in range(x.shape[0]):
        st = conv.init_state()
        st, y = conv.process(st, jnp.asarray(x[c, :t]))
        outs.append(np.asarray(y))
    y = np.stack(outs)
    y *= 0.9 / max(np.abs(y).max(), 1e-9)
    write_wav(dst, y, sr)
    print(f"wrote {dst}: peak {np.abs(y).max():.3f}")


if __name__ == "__main__":
    main()
