"""Phase timers — the `start_timer!` / `end_timer!` equivalent.

The reference brackets finalize/inline/outline with ark-std timer macros
(constraint_system.rs:692-706). Same ergonomics here, plus a context
manager; enable output with SNARK_TPU_TIMERS=1 (off by default, like
ark-std's `print-trace` feature).
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field


def _enabled() -> bool:
    return os.environ.get("SNARK_TPU_TIMERS", "0") == "1"


@dataclass
class Timer:
    label: str
    start: float = field(default_factory=time.perf_counter)
    elapsed: float | None = None


_DEPTH = 0


def start_timer(label: str) -> Timer:
    global _DEPTH
    if _enabled():
        print(f"{'  ' * _DEPTH}Start: {label}", flush=True)
    _DEPTH += 1
    return Timer(label)


def end_timer(timer: Timer) -> float:
    global _DEPTH
    timer.elapsed = time.perf_counter() - timer.start
    _DEPTH = max(0, _DEPTH - 1)
    if _enabled():
        print(
            f"{'  ' * _DEPTH}End:   {timer.label} "
            f"{timer.elapsed * 1000:.3f} ms",
            flush=True,
        )
    return timer.elapsed


@contextlib.contextmanager
def timed(label: str):
    t = start_timer(label)
    try:
        yield t
    finally:
        end_timer(t)
