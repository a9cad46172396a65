from lsp_dsp_units_tpu.models.threed.scene import (  # noqa: F401
    Scene3D, Object3D, Material, box_room)
from lsp_dsp_units_tpu.models.threed.raytrace import (  # noqa: F401
    RayTrace3D, Source, Capture, MicPattern)
