from lsp_dsp_units_tpu.models.threed.scene import (  # noqa: F401
    Scene3D, Object3D, Material, box_room)
from lsp_dsp_units_tpu.models.threed.raytrace import (  # noqa: F401
    RayTrace3D, Source, Capture, MicPattern)
from lsp_dsp_units_tpu.models.threed.sources import (  # noqa: F401
    SourceShape, SourceSettings, source_groups, source_rays)
from lsp_dsp_units_tpu.models.threed.captures import (  # noqa: F401
    CapturePattern, CaptureConfig, CaptureSettings, RoomCaptureConfig,
    configure_capture, bformat_captures, pattern_gain)
from lsp_dsp_units_tpu.models.threed.bsp import (  # noqa: F401
    BspContext)
