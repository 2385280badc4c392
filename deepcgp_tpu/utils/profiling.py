"""Tracing / profiling (SURVEY.md §5.1).

The reference's only profiling hook is gpflow's (disabled) TF timeline dump
(`gpflowrc:13-18`); throughput had to be reconstructed from TensorBoard
wall-clock pairs.  Here profiling is first-class:

* ``trace(log_dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-viewable device trace of everything inside;
* ``annotate(name)`` — named region inside a trace;
* ``StepTimer`` — wall-clock steps/sec tracking fed to the CSV log by
  ``StepsPerSecLogger`` so every run records its own throughput (what the
  reference's notebooks had to derive after the fact).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Device+host trace viewable in TensorBoard's profile plugin."""
    import jax
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (context manager), usable around jitted calls."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Tracks wall-clock optimizer throughput across train chunks."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._last_time = None
        self._last_step = None
        self.steps_per_sec = float('nan')

    def update(self, global_step: int) -> float:
        now = time.time()
        if self._last_time is not None and global_step > self._last_step:
            self.steps_per_sec = ((global_step - self._last_step)
                                  / (now - self._last_time))
        self._last_time = now
        self._last_step = global_step
        return self.steps_per_sec


class StepsPerSecLogger:
    """CSV column: optimizer steps/sec since the previous log entry."""

    title = 'steps_per_sec'

    def __init__(self):
        self.timer = StepTimer()

    def __call__(self, experiment) -> float:
        return round(self.timer.update(experiment.global_step), 3)
