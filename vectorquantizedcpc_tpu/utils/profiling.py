"""Profiling / observability helpers.

TPU equivalents of the reference's profiling hooks (SURVEY.md §5.1: the
reference only passes a Lightning profiler flag, train_vocoder.py:19-21,88)
and safety nets (§5.2):

- :func:`trace` — context manager around training sections producing an
  xprof/TensorBoard trace (``jax.profiler``), enabled by the config's
  ``runtime.profile_dir`` / ``training_vocoder.trainer.profiler``.
- :func:`enable_nan_checks` — ``jax.debug_nans`` mode, the JAX analogue of
  a sanitizer for numerics.
- :class:`StepTimer` — lightweight wall-clock stats for steps/s reporting.
"""

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace into ``profile_dir`` (no-op when None)."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True) -> None:
    """Raise on NaNs produced by any jitted computation (debug runs)."""
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Rolling steps/s meter (host wall clock)."""

    def __init__(self):
        self.t0 = time.time()
        self.count = 0

    def tick(self, n: int = 1) -> None:
        self.count += n

    def rate(self, reset: bool = True) -> float:
        dt = time.time() - self.t0
        r = self.count / dt if dt > 0 else 0.0
        if reset:
            self.t0, self.count = time.time(), 0
        return r
