"""Observability utilities: structured metrics, logging, profiling
(SURVEY.md §5.1 / §5.5)."""

from epcnet_tpu.utils.logging import MetricsLogger, log_string
from epcnet_tpu.utils.profiling import profile_region, maybe_start_trace

__all__ = ["MetricsLogger", "log_string", "profile_region", "maybe_start_trace"]
