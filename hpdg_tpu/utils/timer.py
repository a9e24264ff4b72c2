"""Timers and profiling helpers.

The reference only has ad-hoc Dune::Timer prints in tests (SURVEY.md §5.1);
here profiling is first-class: wall-clock timers that force device
completion, and a context manager that emits jax.profiler trace regions
(viewable in TensorBoard/XProf when a trace is active).
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


class Timer:
    """Wall-clock timer that blocks on device work (Dune::Timer analog)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()

    def elapsed(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        return time.perf_counter() - self._t0


@contextmanager
def profile_region(name: str):
    """Named trace region: shows up in jax.profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_trace(logdir: str):
    jax.profiler.start_trace(logdir)


def stop_trace():
    jax.profiler.stop_trace()
