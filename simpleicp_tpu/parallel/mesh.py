"""Device-mesh helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

POINTS_AXIS = "points"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = POINTS_AXIS) -> jax.sharding.Mesh:
    """A 1-D mesh over the first `n_devices` devices.

    Point-cloud registration has a single first-class parallelism dimension —
    spatial data parallelism over points (SURVEY.md §5) — so the mesh is 1-D;
    on a multi-host pod slice the same axis simply spans all chips and XLA
    routes the collectives over ICI within a slice and DCN across slices.
    """
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} available")
    return jax.sharding.Mesh(np.array(devices[:n]), (axis_name,))
