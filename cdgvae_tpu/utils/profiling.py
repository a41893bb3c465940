"""Tracing / profiling hooks.

The reference's only observability is tqdm progress bars
(modules/train.py:21; SURVEY.md §5 'Tracing/profiling: No'). Here:

* :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-loadable trace (XLA op-level timeline).
* :class:`StepTimer` — lightweight wall-clock step timing with imgs/sec.
"""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str | None):
    """Profile the enclosed block with the JAX/XLA profiler (no-op when
    logdir is None)."""
    if not logdir:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield


class StepTimer:
    """Accumulates step wall times; report() returns steps/sec + imgs/sec."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.reset()

    def reset(self):
        self._t0 = None
        self._steps = 0
        self._elapsed = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_steps: int = 1):
        self._elapsed += time.perf_counter() - self._t0
        self._steps += n_steps

    def report(self) -> dict:
        if self._elapsed == 0:
            return {}
        sps = self._steps / self._elapsed
        return {"steps_per_sec": sps,
                "images_per_sec": sps * self.batch_size}
