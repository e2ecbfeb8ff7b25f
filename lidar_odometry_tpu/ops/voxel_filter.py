"""Scan downsampling: stride skip + voxel-grid centroid, fixed shapes.

TPU-native redesign of the reference FastVoxelFilter (reference
src/database/VoxelMap.h:53-140): instead of a Robin-Hood hash accumulate,
points are keyed, sorted by voxel key, and reduced with a segmented mean —
sort + segment ops are the canonical XLA formulation of hash-grouping and
run fully vectorized. Output is a fixed-capacity padded array + mask
(voxel count is data dependent; shapes are not).

Semantics preserved: stride-n subsampling from index 0
(VoxelMap.h:82), non-finite rejection (VoxelMap.h:84), floor voxel
binning with per-voxel arithmetic-mean centroid (VoxelMap.h:86-103).
Output ordering differs (sorted by packed key vs hash iteration order) —
order is semantically irrelevant downstream.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import keys as K

__all__ = ["voxel_filter"]


@partial(jax.jit, static_argnames=("stride", "out_capacity"))
def voxel_filter(points: jax.Array, n_points: jax.Array, *, voxel_size,
                 stride: int, out_capacity: int):
    """Args:
      points: (N, 3) float32, padded raw scan.
      n_points: scalar int32, number of valid leading entries.
      voxel_size: float (traced or static).
      stride: static int, process every stride-th point.
      out_capacity: static int, padded output size.

    Returns (centroids (out_capacity, 3), mask (out_capacity,), count).
    """
    pts = points[::stride]
    n = pts.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32) * stride
    valid = (idx < n_points) & jnp.all(jnp.isfinite(pts), axis=-1)

    inv = 1.0 / voxel_size
    coords = K.voxel_coords(pts, inv)
    hi, lo = K.pack_key(coords)
    hi = jnp.where(valid, hi, K.INVALID_HI)
    lo = jnp.where(valid, lo, K.INVALID_LO)

    hi_s, lo_s, idx_s = K.sort_by_key(hi, lo, jnp.arange(n, dtype=jnp.int32))
    pts_s = pts[idx_s]
    valid_s = ~K.key_eq(hi_s, lo_s, K.INVALID_HI, K.INVALID_LO)

    is_start, seg_id = K.segment_starts(hi_s, lo_s, valid_s)
    w = valid_s.astype(pts.dtype)
    num_segments = min(out_capacity, n)
    # seg_id is monotonic (cumsum over sorted keys): declaring it sorted
    # lets XLA skip the sort-based scatter-add lowering (~0.3 ms/frame
    # on v5e at 16k points)
    sums = jax.ops.segment_sum(pts_s * w[:, None], seg_id,
                               num_segments=num_segments,
                               indices_are_sorted=True)
    counts = jax.ops.segment_sum(w, seg_id, num_segments=num_segments,
                                 indices_are_sorted=True)
    n_voxels = jnp.sum(is_start.astype(jnp.int32))

    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    mask = jnp.arange(num_segments, dtype=jnp.int32) < n_voxels
    if num_segments < out_capacity:
        pad = out_capacity - num_segments
        centroids = jnp.concatenate([centroids, jnp.zeros((pad, 3), centroids.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
    return centroids, mask, n_voxels
