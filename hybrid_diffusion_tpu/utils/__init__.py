"""Shared utilities: profiling/tracing and timing helpers."""

from .profiling import profile_trace, timed_block

__all__ = ["profile_trace", "timed_block"]
