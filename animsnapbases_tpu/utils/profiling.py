"""Profiling: jax.profiler traces + the phase wall-clock timers.

The reference created cProfile objects it never dumped (SURVEY §5.1); the
TPU-native observability story is (a) per-phase host timers
(:mod:`animsnapbases_tpu.utils.timing`), and (b) device traces viewable in
TensorBoard/Perfetto via ``jax.profiler``, wrapped here so pipelines can
opt in with one context manager or config flag."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def device_trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace into ``log_dir`` for the enclosed block.

    Usage:
        with device_trace("traces/step"):
            solver.run_steps(f, 1000)
    """
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up in device traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
