"""Shared utilities: profiling/tracing, timing, and params persistence."""

from .params_io import (
    flatten_params,
    load_params_npz,
    save_params_npz,
    unflatten_params,
)
from .profiling import profile_trace, timed_block

__all__ = [
    "flatten_params",
    "load_params_npz",
    "save_params_npz",
    "unflatten_params",
    "profile_trace",
    "timed_block",
]
