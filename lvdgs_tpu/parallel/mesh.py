"""Device-mesh helpers.

The reference is single-GPU (SURVEY.md §2.6); multi-chip scaling here is a
new capability built on jax.sharding: a 2D mesh with a `data` axis (cameras
/ frames) and a `gauss` axis (the Gaussian map's capacity dimension).
Collectives ride ICI: the map is reduce-scattered/all-gathered along
`gauss`, gradients psum along `data`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_data: Optional[int] = None,
    n_gauss: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_gauss
    assert n_data * n_gauss == len(devices), (
        f"mesh {n_data}x{n_gauss} != {len(devices)} devices"
    )
    arr = np.array(devices).reshape(n_data, n_gauss)
    return Mesh(arr, axis_names=("data", "gauss"))
