"""Kernel layer — TPU replacement for the reference's lsp-dsp-lib SIMD
primitives (SURVEY.md §1 L0)."""

from lsp_dsp_units_tpu.ops import biquad  # noqa: F401
