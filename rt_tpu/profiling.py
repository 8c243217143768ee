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

__all__ = ["RenderTimer", "trace", "counters", "mrays_per_sec", "sustained",
           "interleaved"]

counters: dict[str, float] = {}


def sustained(step, iters: int = 32, windows: int = 5,
              warmup_windows: int = 1) -> dict:
    """THE benchmark measurement — shared by bench.py and
    tools/bench_table.py so every published number means the same thing
    (round-2 VERDICT item 5: one methodology, with dispersion).

    Runs ``step(i)`` in ``windows`` async-pipelined windows of ``iters``
    calls (blocked once per window — the steady serving/training shape;
    single blocked calls additionally pay the ~25-50 ms host->TPU tunnel
    round trip).  After ``warmup_windows`` discarded warm-up windows,
    reports the MEDIAN per-step seconds plus min/max across windows.

    Returns {"median": s, "min": s, "max": s, "windows": [s...]}.
    """
    out = step(0)
    jax.block_until_ready(out)
    ws = []
    for w in range(warmup_windows + windows):
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(i)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        if w >= warmup_windows:
            ws.append(dt)
    ws.sort()
    return {
        "median": ws[len(ws) // 2],
        "min": ws[0],
        "max": ws[-1],
        "windows": ws,
    }


def interleaved(steps, iters=32, windows: int = 9,
                warmup_windows: int = 1) -> list[dict]:
    """Same-chip-state ratio measurement: N steps, ROUND-ROBIN windows.

    The chip's absolute rate drifts enough WITHIN one session to invert a
    ratio computed from two sequential measurement blocks (round-4 CO job:
    the forward anchor measured 647 then 496 Mrays/s minutes apart in one
    process while the step under test went the other way).  Alternating
    the windows samples the same chip state for every step, so the ratios
    between the returned medians are trustworthy — this is the bench.py
    fwd_ref pattern (bench.py round-4 fix), factored out so
    tools/bench_table.py's anchor rows use the identical discipline.

    ``steps``: list of ``fn(i)`` callables, or ``(fn, iters)`` pairs when a
    slow step needs a smaller window.  Returns one dict per step:
    ``{"median": s, "min": s, "max": s, "windows": [s...]}`` with medians
    taken across its ``windows`` interleaved windows.
    """
    norm = [(s, iters) if callable(s) else tuple(s) for s in steps]
    for fn, _ in norm:
        jax.block_until_ready(fn(0))

    def window(fn, n):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(i)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n

    for _ in range(warmup_windows):
        for fn, n in norm:
            window(fn, n)
    ws: list[list[float]] = [[] for _ in norm]
    for _ in range(windows):
        for k, (fn, n) in enumerate(norm):
            ws[k].append(window(fn, n))
    out = []
    for w in ws:
        w = sorted(w)
        out.append({"median": w[len(w) // 2], "min": w[0], "max": w[-1],
                    "windows": w})
    return out


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
