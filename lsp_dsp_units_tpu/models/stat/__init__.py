from lsp_dsp_units_tpu.models.stat.quantized_counter import (  # noqa: F401
    QuantizedCounter, QuantizedCounterState)
