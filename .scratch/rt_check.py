import numpy as np
from lsp_dsp_units_tpu.models.threed.scene import Scene3D, Object3D, Material
from lsp_dsp_units_tpu.models.threed.raytrace import RayTrace3D, Source, Capture, SPEED_OF_SOUND

SR = 48000
v = np.array([[-40, -40, 0], [40, -40, 0], [40, 40, 0], [-40, 40, 0]], np.float32)
for rays in (20000, 80000, 320000):
    sc = Scene3D()
    sc.add_object(Object3D("floor", v, np.asarray([(0,1,2),(0,2,3)], np.int32),
                           Material(absorption=0.0, transparency=0.0)))
    rt = RayTrace3D(sc, SR, ir_length_s=0.1, rays=rays, max_bounces=2,
                    air_absorption=0.0)
    rt.add_source(Source(np.array([0.0, 0.0, 2.0], np.float32)))
    rt.add_capture(Capture(np.array([3.0, 0.0, 2.0], np.float32)))
    ir = rt.process().data[0]
    db = int(3.0 / SPEED_OF_SOUND * SR); rb = int(5.0 / SPEED_OF_SOUND * SR)
    w = 4
    direct = ir[db-w:db+w+1].sum(); refl = ir[rb-w:rb+w+1].sum()
    print(f"rays={rays}: direct={direct:+.4f} (want +0.3333)  refl={refl:+.4f} (want -0.2000)")
