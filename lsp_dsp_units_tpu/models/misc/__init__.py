from lsp_dsp_units_tpu.models.misc import (  # noqa: F401
    windows, interpolation, sigmoid, lfo, fade, broadcast, envelope,
    fft_crossover, quickmath)
