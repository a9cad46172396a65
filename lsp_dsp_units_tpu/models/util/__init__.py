from lsp_dsp_units_tpu.models.util.convolver import (  # noqa: F401
    Convolver, convolve_oneshot)
from lsp_dsp_units_tpu.models.util.oversampler import Oversampler  # noqa: F401
from lsp_dsp_units_tpu.models.util.sidechain import (  # noqa: F401
    Sidechain, SidechainMode, SidechainSource, select_source)
from lsp_dsp_units_tpu.models.util.delay import Delay, DynamicDelay  # noqa: F401
from lsp_dsp_units_tpu.models.util.randomizer import (  # noqa: F401
    Randomizer, RandomFunction)
