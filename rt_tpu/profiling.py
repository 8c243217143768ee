"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md §5: vsync pacing only).
Here: wall-clock render timers with Mrays/s (the north-star metric),
optional jax.profiler trace capture, and a tiny counter registry.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["RenderTimer", "trace", "counters", "mrays_per_sec"]

counters: dict[str, float] = {}


def mrays_per_sec(size: tuple[int, int], spp: int, seconds: float) -> float:
    """Camera rays per second in millions (rays = W*H*spp)."""
    w, h = size
    return w * h * spp / seconds / 1e6


class RenderTimer:
    """Context manager timing a render; blocks on the result.

    >>> with RenderTimer((800, 600), spp=4) as t:
    ...     img = render(...)
    ...     t.result = img
    >>> t.mrays
    """

    def __init__(self, size: tuple[int, int], spp: int, name: str = "render"):
        self.size = size
        self.spp = spp
        self.name = name
        self.result = None
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.result is not None:
            jax.block_until_ready(self.result)
        self.seconds = time.perf_counter() - self._t0
        counters[f"{self.name}.seconds"] = self.seconds
        counters[f"{self.name}.mrays"] = self.mrays
        return False

    @property
    def mrays(self) -> float:
        return mrays_per_sec(self.size, self.spp, max(self.seconds, 1e-12))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rt_tpu_trace"):
    """Capture a jax.profiler trace around a block (view with XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
