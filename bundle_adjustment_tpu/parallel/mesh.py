"""Device-mesh helpers.

Axes for this workload (SURVEY §2.5 mapping):
- ``win``: independent keyframe windows / frames — the data/sequence-parallel
  axis (DP + SP/CP analog: partitioned keyframe windows).
- ``pt``: map-point shards within one BA problem — the tensor/model-parallel
  axis (per-shard point Hessians, camera system psum-reduced over ICI).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(win: int = 1, pt: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = win * pt
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(win, pt)
    return Mesh(grid, ("win", "pt"))


def default_mesh(devices=None) -> Mesh:
    """All devices on the ``pt`` axis (single-window distributed BA)."""
    devices = devices if devices is not None else jax.devices()
    return make_mesh(1, len(devices), devices)
