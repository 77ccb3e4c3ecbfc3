"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(shape: tuple[int, ...], axis_names: tuple[str, ...]) -> Mesh:
    """Mesh over the first prod(shape) visible devices."""
    n = int(np.prod(shape))
    devices = np.asarray(jax.devices()[:n]).reshape(shape)
    return Mesh(devices, axis_names)


def local_mesh(axis_name: str = "shard", n: int | None = None) -> Mesh:
    """1-D mesh over all (or n) visible devices."""
    devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.asarray(devices), (axis_name,))
