from lsp_dsp_units_tpu.utils import units, wavio  # noqa: F401
from lsp_dsp_units_tpu.utils.units import snr_db, db_to_gain, gain_to_db  # noqa: F401
