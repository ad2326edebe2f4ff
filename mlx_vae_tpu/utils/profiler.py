"""Tracing / profiling utilities.

The reference's only observability is tqdm + per-epoch prints (SURVEY.md §5).
TPU-native equivalents:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace.
* ``StepTimer`` — steady-state step-time / tokens-per-second counter with
  warmup skipping, used by ``bench.py`` and available to the trainer.
* ``debug_nans(enable)`` — toggles ``jax_debug_nans`` (the jit-native analog
  of the reference's host-side NaN checks in ``losses/stable.py:9-65``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Capture a jax.profiler trace into ``logdir`` (no-op when None)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Tokens/sec counter. ``tick(tokens)`` per step; warmup steps ignored."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.steps = 0
        self.tokens = 0
        self._t0 = None

    def tick(self, tokens: int) -> None:
        self.steps += 1
        if self.steps == self.warmup:
            self._t0 = time.perf_counter()
            self.tokens = 0
        elif self.steps > self.warmup:
            self.tokens += tokens

    @property
    def tokens_per_sec(self) -> float:
        if self._t0 is None or self.tokens == 0:
            return 0.0
        return self.tokens / (time.perf_counter() - self._t0)
