"""DSP unit layer — one module per reference processor family
(SURVEY.md §2)."""

from lsp_dsp_units_tpu.models import (  # noqa: F401
    filters, misc, dynamics, meters, util, sampling, noise, ctl, stat,
    threed)
