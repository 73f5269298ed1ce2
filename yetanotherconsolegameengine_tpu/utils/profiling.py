"""Tracing & frame telemetry.

The reference's observability is Stopwatch frame timing in the HUD and
build-time stopwatches (SURVEY.md §5 "Tracing / profiling"). The TPU build
adds what that section prescribes: ``jax.profiler`` device traces plus a
rolling frame-time statistics aggregator feeding the same HUD line.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque, Dict, Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/yacge_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / Perfetto).

    Usage: ``with device_trace(): render frames``; or wire through
    ``program.py --profile``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class FrameStats:
    """Rolling frame statistics for the HUD (Terminal.cs:163-175 role)."""

    def __init__(self, window: int = 120):
        self._times: Deque[float] = deque(maxlen=window)
        self._marks: Dict[str, float] = {}
        self._stage_ms: Dict[str, Deque[float]] = {}
        self._t0: Optional[float] = None

    def begin_frame(self):
        self._t0 = time.perf_counter()

    def end_frame(self):
        if self._t0 is not None:
            self._times.append(time.perf_counter() - self._t0)
            self._t0 = None

    @contextlib.contextmanager
    def stage(self, name: str):
        """Time a named stage within the frame."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            d = self._stage_ms.setdefault(name, deque(maxlen=60))
            d.append((time.perf_counter() - t0) * 1000.0)

    @property
    def fps(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / max(1e-9, sum(self._times))

    @property
    def frame_ms(self) -> float:
        if not self._times:
            return 0.0
        return 1000.0 * sum(self._times) / len(self._times)

    def p99_ms(self) -> float:
        if not self._times:
            return 0.0
        s = sorted(self._times)
        return 1000.0 * s[min(len(s) - 1, int(0.99 * len(s)))]

    def summary(self) -> str:
        parts = [f"{self.fps:5.1f} fps {self.frame_ms:6.2f} ms "
                 f"(p99 {self.p99_ms():.2f})"]
        for name, d in self._stage_ms.items():
            parts.append(f"{name} {sum(d) / len(d):.2f}ms")
        return " | ".join(parts)
