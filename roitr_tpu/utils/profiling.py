"""Profiling helpers: XLA trace capture + named annotations.

The reference has only a wall-clock Timer (lib/utils.py:645-671, unused in
its live loops). Here profiling is first-class: `trace()` captures a
TensorBoard-compatible XLA trace and `annotate()` marks named regions that
show up in the trace timeline.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str = "profiles"):
    """Capture a jax.profiler trace of the enclosed block.

    View with: tensorboard --logdir <log_dir>  (or xprof).
    """
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region context manager visible in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def log_elapsed(label: str, printer=print):
    import time

    t0 = time.perf_counter()
    yield
    printer(f"{label}: {(time.perf_counter() - t0) * 1e3:.1f}ms")
