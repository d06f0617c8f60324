"""Utilities: logging/metrics, profiling, relay-safe device timing."""

from dsp_tpu.utils.logging import RunMetrics, get_logger
from dsp_tpu.utils.profiling import StageTimer, stage, trace
from dsp_tpu.utils.timing import chained_timeit, token_mix

__all__ = ["get_logger", "RunMetrics", "trace", "stage", "StageTimer",
           "chained_timeit", "token_mix"]
