from lsp_dsp_units_tpu.models.meters.loudness import (  # noqa: F401
    LoudnessMeter, ILUFSMeter, Weighting)
from lsp_dsp_units_tpu.models.meters.true_peak import TruePeakMeter  # noqa: F401
from lsp_dsp_units_tpu.models.meters.correlometer import Correlometer  # noqa: F401
from lsp_dsp_units_tpu.models.meters.peak import (  # noqa: F401
    PeakMeter, Panometer, PanLaw)
