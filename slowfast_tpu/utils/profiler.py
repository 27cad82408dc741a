"""Profiling utilities.

The reference has no profiler integration (SURVEY.md §5) — timing is manual
Timer triplets. Here we add first-class `jax.profiler` traces plus honest
per-step host timing with forced completion.
"""

import contextlib
import time

import jax

from . import logging as logging_utils

logger = logging_utils.get_logger(__name__)


@contextlib.contextmanager
def trace(log_dir, enabled=True):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Profiler trace written to %s", log_dir)


class StepTimer:
    """Wall-clock step timing with forced device sync.

    `block_until_ready` can be unreliable through remote device tunnels;
    syncing via a scalar readback of a step output is always honest.
    """

    def __init__(self, warmup=3):
        self.warmup = warmup
        self.times = []
        self._count = 0
        self._t0 = None

    def start(self):
        self._t0 = time.time()

    def stop(self, sync_value=None):
        if sync_value is not None:
            float(sync_value)  # force completion
        dt = time.time() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    def summary(self):
        import numpy as np

        if not self.times:
            return {}
        return {
            "steps": len(self.times),
            "mean_s": float(np.mean(self.times)),
            "p50_s": float(np.median(self.times)),
            "p90_s": float(np.percentile(self.times, 90)),
        }
