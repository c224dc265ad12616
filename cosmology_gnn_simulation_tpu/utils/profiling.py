"""Tracing / profiling / debugging utilities.

The reference has no profiling at all (SURVEY.md §5: tqdm + prints only).
Here tracing is a first-class module:

* ``trace(logdir)`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device execution;
* ``StepTimer`` — lightweight wall-clock phase timers with p50/p95 summaries
  (forces completion via ``block_until_ready`` when given outputs);
* ``annotate`` — ``TraceAnnotation`` for named regions inside traces;
* ``enable_nan_debugging`` — flips ``jax_debug_nans`` (the TPU-era
  equivalent of a sanitizer for this workload — SURVEY.md §5 "race
  detection: N/A beyond NaN checks").
"""

from __future__ import annotations

import contextlib
import statistics
import time
from collections import defaultdict
from typing import Any, Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates wall-clock timings per phase.

    Usage::

        timer = StepTimer()
        with timer.phase("train_step", block_on=outputs):
            outputs = step(...)
        print(timer.summary())
    """

    def __init__(self):
        self._samples: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, block_on: Any = None):
        start = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self._samples[name].append(time.perf_counter() - start)

    def record(self, name: str, seconds: float) -> None:
        self._samples[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._samples.items():
            xs_sorted = sorted(xs)
            out[name] = {
                "count": len(xs),
                "mean_s": statistics.fmean(xs),
                "p50_s": xs_sorted[len(xs) // 2],
                "p95_s": xs_sorted[min(len(xs) - 1, int(len(xs) * 0.95))],
                "total_s": sum(xs),
            }
        return out

    def reset(self) -> None:
        self._samples.clear()


def enable_nan_debugging(enable: bool = True) -> None:
    """Raise on NaN production inside jitted code (debug runs only — it
    disables some fusions)."""
    jax.config.update("jax_debug_nans", enable)
