"""Profiling / tracing hooks (jax.profiler).

The reference has no profiler (SURVEY.md §5: wall-clock only); on TPU the
right tool is a jax.profiler trace viewable in TensorBoard/XProf. Usage:

    with trace_if(enabled, logdir):
        run_steps()

or start/stop around a step range via ``StepProfiler`` which captures steps
[start, stop) of a training loop.
"""
from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace_if(enabled: bool, logdir: str):
    if not enabled:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        yield


class StepProfiler:
    """Captures a window of training steps into a profiler trace."""

    def __init__(self, logdir: str, start_step: int = 10, num_steps: int = 5):
        self.logdir = logdir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def on_step(self, step: int) -> None:
        if step == self.start_step and not self._active:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True
        elif step >= self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def annotate(name: str):
    """Named trace span for host-side phases (shows up in the trace viewer)."""
    return jax.profiler.TraceAnnotation(name)
