"""Profiling/tracing: jax.profiler traces + per-step timing statistics.

The reference has NO profiling subsystem (only tqdm bars and wall-clock
prints, SURVEY.md section 5); this is a first-class addition for production
TPU runs:

* `trace(logdir)` — context manager around `jax.profiler` emitting a
  TensorBoard-loadable XPlane trace (op-level TPU timeline),
* `StepTimer` — ring-buffer step timing with p50/p95/mean and steps/sec,
  blocking on device completion so times are honest,
* `annotate` — TraceAnnotation wrapper so custom regions show in the trace.
"""
import contextlib
import time
from collections import deque

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Honest per-step timing: blocks on the step's outputs before stamping.

    Usage:
        timer = StepTimer()
        for batch in loader:
            with timer.step():
                state, metrics = train_step(state, batch)
                timer.block_on(metrics)
        print(timer.summary())
    """

    def __init__(self, window: int = 200):
        self._times = deque(maxlen=window)
        self._t0 = None

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        self._times.append(time.perf_counter() - t0)

    def block_on(self, tree):
        jax.block_until_ready(tree)

    @property
    def num_steps(self):
        return len(self._times)

    def summary(self) -> dict:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }
