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

Two key paths (static choice):
  * generic — 64-bit-equivalent (hi, lo) uint32 key pair, unlimited
    coordinate range, 3-operand 2-key sort;
  * compact (`compact_keys=True`) — ONE uint32 key of 10 bits/axis.
    Covers voxel coords in [-512, 512) — ±256 m at 0.5 m voxels, beyond
    any LiDAR return (sensor-frame scans; KITTI HDL-64E tops out ~120 m)
    — and drops the rare out-of-envelope point like a non-finite one.
    The sort halves its operand count (2-operand 1-key), which is the
    filter's dominant cost: measured 0.65 -> ~0.45 ms/frame on v5e at
    16k points in the fused pipeline.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils import keys as K

__all__ = ["voxel_filter", "compact_keys_ok"]

_COMPACT_BITS = 10
_COMPACT_HALF = 1 << (_COMPACT_BITS - 1)       # 512 voxels per half-axis
_INVALID32 = jnp.uint32(0xFFFFFFFF)


def compact_keys_ok(voxel_size: float, sensor_range: float) -> bool:
    """True when the compact 10-bit/axis key envelope covers every point a
    sensor with the given max return range can produce (static decision —
    voxel_size must be a Python float here)."""
    return float(voxel_size) * _COMPACT_HALF >= float(sensor_range)


@partial(jax.jit, static_argnames=("stride", "out_capacity", "compact_keys"))
def voxel_filter(points: jax.Array, n_points: jax.Array, *, voxel_size,
                 stride: int, out_capacity: int, compact_keys: bool = False):
    """Args:
      points: (N, 3) float32, padded raw scan (sensor frame).
      n_points: scalar int32, number of valid leading entries.
      voxel_size: float (traced or static).
      stride: static int, process every stride-th point.
      out_capacity: static int, padded output size.
      compact_keys: static; single-u32 key fast path (see module doc).

    Returns (centroids (out_capacity, 3), mask (out_capacity,), count).
    """
    pts = points[::stride]
    n = pts.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32) * stride
    valid = (idx < n_points) & jnp.all(jnp.isfinite(pts), axis=-1)

    inv = 1.0 / voxel_size
    coords = K.voxel_coords(pts, inv)
    pos = jnp.arange(n, dtype=jnp.int32)
    if compact_keys:
        biased = coords + _COMPACT_HALF
        valid = valid & jnp.all(
            (biased >= 0) & (biased < 2 * _COMPACT_HALF), axis=-1)
        b = biased.astype(jnp.uint32)
        key = ((b[:, 0] << jnp.uint32(2 * _COMPACT_BITS))
               | (b[:, 1] << jnp.uint32(_COMPACT_BITS)) | b[:, 2])
        key = jnp.where(valid, key, _INVALID32)
        key_s, idx_s = jax.lax.sort((key, pos), num_keys=1)
        valid_s = key_s != _INVALID32
        prev = jnp.concatenate([key_s[:1] ^ jnp.uint32(1), key_s[:-1]])
        is_start = (key_s != prev) & valid_s
        seg_id = jnp.maximum(jnp.cumsum(is_start.astype(jnp.int32)) - 1, 0)
    else:
        hi, lo = K.pack_key(coords)
        hi = jnp.where(valid, hi, K.INVALID_HI)
        lo = jnp.where(valid, lo, K.INVALID_LO)
        hi_s, lo_s, idx_s = K.sort_by_key(hi, lo, pos)
        valid_s = ~K.key_eq(hi_s, lo_s, K.INVALID_HI, K.INVALID_LO)
        is_start, seg_id = K.segment_starts(hi_s, lo_s, valid_s)

    # Zero (not just weight-mask) invalid rows: padding is NaN in padded
    # scans and NaN * 0 = NaN — one poisoned trailing segment otherwise
    # reaches ICP's normal equations as a masked-True NaN centroid and
    # freezes the pose (delta_x goes NaN -> finite-guard -> zero step).
    pts_s = jnp.where(valid_s[:, None], pts[idx_s], 0.0)
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
