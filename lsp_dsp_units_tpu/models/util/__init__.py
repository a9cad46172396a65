from lsp_dsp_units_tpu.models.util.convolver import (  # noqa: F401
    Convolver, convolve_oneshot)
from lsp_dsp_units_tpu.models.util.oversampler import Oversampler  # noqa: F401
from lsp_dsp_units_tpu.models.util.sidechain import (  # noqa: F401
    Sidechain, SidechainMode, SidechainSource, select_source)
from lsp_dsp_units_tpu.models.util.delay import Delay, DynamicDelay  # noqa: F401
from lsp_dsp_units_tpu.models.util.randomizer import (  # noqa: F401
    Randomizer, RandomFunction)
from lsp_dsp_units_tpu.models.util.spectral import (  # noqa: F401
    SpectralProcessor, MultiSpectralProcessor, SpectralSplitter)
from lsp_dsp_units_tpu.models.util.crossover import (  # noqa: F401
    Crossover, CrossMode, CrossoverSlope)
from lsp_dsp_units_tpu.models.util.fft_crossover_unit import (  # noqa: F401
    FFTCrossover, FFTCrossoverBand)
from lsp_dsp_units_tpu.models.util.trigger import (  # noqa: F401
    Trigger, TriggerMode, TriggerType)
from lsp_dsp_units_tpu.models.util.oscillator import (  # noqa: F401
    Oscillator, FunctionGenerator)
from lsp_dsp_units_tpu.models.util.adsr import ADSREnvelope, ADSRFunction  # noqa: F401
from lsp_dsp_units_tpu.models.util.dither import Dither, dither_device  # noqa: F401
from lsp_dsp_units_tpu.models.util.buffers import (  # noqa: F401
    RingBuffer, RawRingBuffer, ShiftBuffer, MeterGraph, ScaledMeterGraph,
    MeterMethod)
from lsp_dsp_units_tpu.models.util.depopper import Depopper, DepopperMode  # noqa: F401
from lsp_dsp_units_tpu.models.util.analyzer import Analyzer  # noqa: F401
from lsp_dsp_units_tpu.models.util.latency_detector import LatencyDetector  # noqa: F401
from lsp_dsp_units_tpu.models.util.response_taker import ResponseTaker  # noqa: F401
from lsp_dsp_units_tpu.models.util.sync_chirp import SyncChirpProcessor  # noqa: F401
