"""Profiling / tracing hooks (aux subsystem, SURVEY.md §5.1).

The reference has no profiler integration — only wall-clock loops. TPU-native
equivalent: ``jax.profiler`` traces viewable in TensorBoard/Perfetto, plus a
tiny wall-clock section timer for the pruning pipelines.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax profiler trace when a directory is given (or via the
    SSP_X_VIT_TRACE_DIR env var); no-op otherwise."""
    log_dir = log_dir or os.environ.get("SSP_X_VIT_TRACE_DIR")
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"[TRACE] profiler trace written to {log_dir}")


class SectionTimer:
    """Named wall-clock sections with a summary line (pruning-time reporting,
    reference main.py:164,197-198 style)."""

    def __init__(self):
        self.sections: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name] = self.sections.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> str:
        return " | ".join(f"{k}={v:.2f}s" for k, v in self.sections.items())
