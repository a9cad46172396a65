from lsp_dsp_units_tpu.models.filters.design import (  # noqa: F401
    FilterParams, FilterType, FilterDesign, design_filter, freq_chart,
    digital_freq_response)
from lsp_dsp_units_tpu.models.filters.filter import Filter  # noqa: F401
from lsp_dsp_units_tpu.models.filters.filter_bank import (  # noqa: F401
    FilterBank, process_cascade)
from lsp_dsp_units_tpu.models.filters.butterworth import (  # noqa: F401
    ButterworthFilter, BWFilterType)
from lsp_dsp_units_tpu.models.filters.spectral_tilt import (  # noqa: F401
    SpectralTilt, SlopeUnit, TiltNorm)
from lsp_dsp_units_tpu.models.filters.equalizer import Equalizer, EqMode  # noqa: F401
from lsp_dsp_units_tpu.models.filters.dynamic_filters import DynamicFilters  # noqa: F401
