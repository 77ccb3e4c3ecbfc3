"""Cross-cutting utilities: phase timers, reproducible RNG (the ark-std
surface — SURVEY.md §2.3 "RNG plumbing, timer/profiling macros")."""

from .timing import end_timer, start_timer, timed
from .rng import test_rng

__all__ = ["end_timer", "start_timer", "test_rng", "timed"]
