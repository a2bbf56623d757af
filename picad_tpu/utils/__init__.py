"""Utilities: metric logging, profiling, throughput meters."""

from picad_tpu.utils.logging import MetricLogger
from picad_tpu.utils.profiling import StepTimer, trace_context
