"""DSP unit layer — one module per reference processor family
(SURVEY.md §2)."""

from lsp_dsp_units_tpu.models import filters, misc  # noqa: F401
