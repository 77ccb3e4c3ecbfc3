"""SNARK trait layer (the ark-snark surface, snark/src/lib.rs)."""

from .api import (
    SNARK,
    CircuitSpecificSetupSNARK,
    NeedLargerBound,
    UniversalSetupIndexError,
    UniversalSetupSNARK,
)
from . import serialize

__all__ = [
    "SNARK",
    "CircuitSpecificSetupSNARK",
    "NeedLargerBound",
    "UniversalSetupIndexError",
    "UniversalSetupSNARK",
    "serialize",
]
