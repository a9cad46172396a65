from lsp_dsp_units_tpu.models.noise.mls import MLS  # noqa: F401
from lsp_dsp_units_tpu.models.noise.lcg import (  # noqa: F401
    LCG, LCGDistribution, lcg_device)
from lsp_dsp_units_tpu.models.noise.velvet import (  # noqa: F401
    Velvet, VelvetType, VelvetCore)
from lsp_dsp_units_tpu.models.noise.generator import (  # noqa: F401
    NoiseGenerator, NoiseCore, NoiseColor)
