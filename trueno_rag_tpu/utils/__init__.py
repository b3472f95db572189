"""Utilities: profiling/tracing and stage timing."""

from trueno_rag_tpu.utils.profiling import StageTimer, device_trace

__all__ = ["StageTimer", "device_trace"]
