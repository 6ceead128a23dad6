"""Observability utilities: structured metrics, logging, profiling
(SURVEY.md §5.1 / §5.5)."""

from epcnet_tpu.utils.compile_cache import enable_compilation_cache
from epcnet_tpu.utils.logging import MetricsLogger, log_string
from epcnet_tpu.utils.profiling import profile_region, maybe_start_trace

__all__ = [
    "MetricsLogger",
    "enable_compilation_cache",
    "log_string",
    "profile_region",
    "maybe_start_trace",
]
