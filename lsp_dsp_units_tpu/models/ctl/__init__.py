from lsp_dsp_units_tpu.models.ctl.bypass import Bypass  # noqa: F401
from lsp_dsp_units_tpu.models.ctl.control import (  # noqa: F401
    Counter, Toggle, Blink)
from lsp_dsp_units_tpu.models.ctl.crossfade import Crossfade  # noqa: F401
