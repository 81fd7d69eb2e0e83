"""Tracing/profiling hooks (SURVEY.md §5.1).

The reference's only instrumentation is wall-clock prints around sampling
(utils/rotinas.py:906-910). Here the same points carry real TPU traces:

  - `profile_trace(dir)` wraps a region in a jax.profiler trace (TensorBoard
    / xprof format). Enabled product-wide by setting HDT_PROFILE=<dir>;
    a no-op otherwise, so the hot loops carry zero overhead by default.
  - `timed_block(name)` is the wall-clock print, made honest for async
    dispatch: the caller passes the result to `.block(x)` so the timer
    stops at device completion, not dispatch.

Usage:
    with profile_trace():            # respects HDT_PROFILE
        out = sampler(batch, rng)

    with timed_block("sampling") as tb:
        out = tb.block(sampler(batch, rng))
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(trace_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace of the enclosed region; no-op unless enabled.

    trace_dir: output directory; defaults to $HDT_PROFILE (the hook is
    disabled when neither is set).
    """
    trace_dir = trace_dir or os.environ.get("HDT_PROFILE")
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


class _Timer:
    def __init__(self, name: str):
        self.name = name
        self.start = time.perf_counter()
        self.elapsed: Optional[float] = None

    def block(self, x):
        """Block until `x`'s device computation finishes; returns x."""
        return jax.block_until_ready(x)


@contextlib.contextmanager
def timed_block(name: str, verbose: bool = True) -> Iterator[_Timer]:
    t = _Timer(name)
    try:
        yield t
    finally:
        t.elapsed = time.perf_counter() - t.start
        if verbose:
            print(f"[{name}] time cost: {t.elapsed:.3f}s")
