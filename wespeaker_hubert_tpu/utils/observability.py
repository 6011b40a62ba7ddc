"""Tracing, profiling, and throughput accounting.

The reference has almost no observability (SURVEY §5: a C++ wall-clock
Timer printing RTF at runtime/core/utils/timer.h:22 and tqdm bars); this
module is the richer TPU-native replacement:

  * `profile_trace(logdir)` — context manager around jax.profiler.trace
    (XPlane dumps viewable in TensorBoard/xprof);
  * `ThroughputMeter` — windowed audio-seconds/s + steps/s (the BASELINE
    metric) with RTF accessor;
  * `MetricsLogger` — append-only JSONL metrics stream per experiment
    (replaces tableprint rows at utils/executor.py:80-86 with something
    machine-readable).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import deque
from typing import Dict

__all__ = ["profile_trace", "ThroughputMeter", "MetricsLogger", "Timer"]


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """Capture a device trace for the enclosed block."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer (reference runtime/core/utils/timer.h:22)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._t0


class ThroughputMeter:
    """Windowed throughput: call update(audio_seconds, steps) per batch."""

    def __init__(self, window: int = 50):
        self.window = window
        self._events = deque(maxlen=window)
        self._total_audio = 0.0
        self._total_steps = 0
        self._start = time.perf_counter()
        self._last = self._start

    def update(self, audio_seconds: float, steps: int = 1):
        now = time.perf_counter()
        self._events.append((now - self._last, audio_seconds, steps))
        self._last = now
        self._total_audio += audio_seconds
        self._total_steps += steps

    @property
    def audio_seconds_per_s(self) -> float:
        dt = sum(e[0] for e in self._events)
        audio = sum(e[1] for e in self._events)
        return audio / dt if dt > 0 else 0.0

    @property
    def steps_per_s(self) -> float:
        dt = sum(e[0] for e in self._events)
        steps = sum(e[2] for e in self._events)
        return steps / dt if dt > 0 else 0.0

    @property
    def rtf(self) -> float:
        """Real-time factor (processing_time / audio_time), the reference's
        deployment metric (extract_emb_main.cc:61-66)."""
        tput = self.audio_seconds_per_s
        return 1.0 / tput if tput > 0 else float("inf")

    def totals(self) -> Dict[str, float]:
        wall = time.perf_counter() - self._start
        return {
            "total_audio_seconds": self._total_audio,
            "total_steps": self._total_steps,
            "wall_seconds": wall,
            "avg_audio_seconds_per_s": self._total_audio / max(wall, 1e-9),
        }


class MetricsLogger:
    """Append-only JSONL metrics stream."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()
