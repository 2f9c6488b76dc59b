"""Profiling / tracing hooks (new subsystem; the reference has none —
SURVEY §5: only wall-clock epoch timing and tqdm bars).

Two tools:
  * :class:`StepTimer` — cheap rolling per-step wall-time stats for the
    training loop (steps/sec, mel-frames/sec),
  * :func:`trace` — a context manager around ``jax.profiler`` producing a
    TensorBoard-loadable XPlane trace of device execution.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque, Dict, Optional


class StepTimer:
    """Rolling wall-clock stats over the last ``window`` steps."""

    def __init__(self, window: int = 50):
        self._durations: Deque[float] = deque(maxlen=window)
        self._last: Optional[float] = None
        self.total_steps = 0

    def tick(self) -> None:
        """Call once per completed step."""
        now = time.perf_counter()
        if self._last is not None:
            self._durations.append(now - self._last)
        self._last = now
        self.total_steps += 1

    @property
    def mean_step_time(self) -> float:
        if not self._durations:
            return float("nan")
        return sum(self._durations) / len(self._durations)

    def stats(self, frames_per_step: Optional[int] = None
              ) -> Dict[str, float]:
        mean = self.mean_step_time
        out = {"step_time_s": mean,
               "steps_per_sec": (1.0 / mean) if mean == mean and mean > 0
               else float("nan")}
        if frames_per_step and mean == mean and mean > 0:
            out["mel_frames_per_sec"] = frames_per_step / mean
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into ``log_dir``
    (view with TensorBoard's profile plugin or xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
