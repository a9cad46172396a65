from lsp_dsp_units_tpu.models.dynamics.compressor import (  # noqa: F401
    Compressor, CompressorMode)
from lsp_dsp_units_tpu.models.dynamics.expander import (  # noqa: F401
    Expander, ExpanderMode)
from lsp_dsp_units_tpu.models.dynamics.gate import Gate  # noqa: F401
