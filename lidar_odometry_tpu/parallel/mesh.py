"""Device-mesh helpers for the sharded map and distributed PGO.

The reference's only "parallelism" is three CPU threads (SURVEY.md §2.3);
distribution here is a new design mandated by the north star: a `Mesh`
with a `map` axis (spatial key-range shards of the voxel tables — the
tensor-parallel analog) and a `data` axis (independent sequences for
throughput — the data-parallel analog). Collectives ride ICI via
psum/all_gather inside shard_map.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "P", "Mesh", "NamedSharding"]


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data", "map")) -> Mesh:
    """Build a mesh over the first n devices. With two axes the device
    count is factored as evenly as possible (data-major)."""
    devices = jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devices)
    if len(axis_names) == 1:
        return Mesh(np.asarray(devices), axis_names)
    d = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            d = cand
            break
    shape = (d, n // d)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)
