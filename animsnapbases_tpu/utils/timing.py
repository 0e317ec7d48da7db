"""Phase timing: wall-clock per pipeline stage, appended to a
``function_timings.txt`` in the same line format the reference emits
(``utils/utils.py:207-237``) so downstream tooling keeps working.

Unlike the reference decorator (which captures its output path at decoration
time — the ``log_time("")`` quirk noted in SURVEY §5.1), the timer's target
directory is set at runtime.
"""

from __future__ import annotations

import functools
import os
import time


class PhaseTimer:
    """Collects named phase durations and writes the reference-format log."""

    def __init__(self, directory: str = ""):
        self.directory = directory
        self.records: list[tuple[str, float]] = []

    def path(self) -> str:
        return os.path.join(self.directory, "function_timings.txt")

    def record(self, name: str, seconds: float) -> None:
        self.records.append((name, seconds))

    def flush(self) -> None:
        if not self.records:
            return
        os.makedirs(self.directory or ".", exist_ok=True)
        with open(self.path(), "w") as f:
            for name, seconds in self.records:
                f.write(f"Function '{name}' executed in {seconds:.4f} seconds.\n")

    def phase(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                timer.record(name, time.perf_counter() - self.t0)
                return False

        return _Ctx()


_GLOBAL_TIMER = PhaseTimer()


def global_timer() -> PhaseTimer:
    return _GLOBAL_TIMER


def log_time(func=None):
    """Decorator recording wall-clock into the global timer under the
    function's name."""

    def deco(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            t0 = time.perf_counter()
            out = f(*args, **kwargs)
            _GLOBAL_TIMER.record(f.__name__, time.perf_counter() - t0)
            return out
        return wrapper

    if func is not None:
        return deco(func)
    return deco
