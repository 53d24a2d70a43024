"""Structured metrics / observability (SURVEY.md §5).

The reference's only instrumentation is one chrono timer printed to stdout
(simple_raytracer.cpp:781-791).  Here: a JSONL metrics sink + timers +
optional jax.profiler traces, shared by bench.py, the animation driver and
the training loop.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from typing import Optional


class Metrics:
    """Append-only JSONL metrics writer that also echoes to stdout."""

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._f = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")

    def emit(self, **record) -> None:
        record.setdefault("ts", round(time.time(), 3))
        line = json.dumps(record)
        if self.echo:
            print(line, flush=True)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()

    def close(self) -> None:
        if self._f:
            self._f.close()
            self._f = None

    @contextlib.contextmanager
    def timer(self, event: str, **extra):
        t0 = time.time()
        yield
        self.emit(event=event, seconds=round(time.time() - t0, 4), **extra)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"# profiler trace written to {log_dir}", file=sys.stderr)
