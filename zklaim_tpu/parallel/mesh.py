"""Device-mesh helpers for multi-chip execution.

The reference has NO distributed execution (single-process CPU library,
optional OpenMP; SURVEY.md §2.6 last row) -- this subsystem is new,
constrained only by the semantics "sharded result == single-device
result".  Meshes are 1-D ('shards') for the point/constraint dimension;
batched proving adds a 'batch' axis on top (dist design per SURVEY.md
§7 step 7).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "shards") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis,))
