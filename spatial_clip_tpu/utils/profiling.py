"""Profiling helpers (ref: AverageMeter open_clip_train/train.py:22-38,
Lightning profiler presets configs/debug/profiler.yaml, SURVEY.md §5 tracing).
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

log = logging.getLogger(__name__)


class AverageMeter:
    """Running average meter (ref: train.py:22-38)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


@contextlib.contextmanager
def jax_trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto
    (the jax analogue of Lightning's profiler presets)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("jax trace written to %s", log_dir)


@contextlib.contextmanager
def step_timer(meter: Optional[AverageMeter] = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if meter is not None:
        meter.update(dt)
