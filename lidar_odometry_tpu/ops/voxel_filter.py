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
    num_segments = min(out_capacity, n)
    n_voxels = jnp.sum(is_start.astype(jnp.int32))

    # Per-segment reduction WITHOUT scatter-add: the two
    # jax.ops.segment_sum calls (even with indices_are_sorted) were 82%
    # of the whole filter's device time (measured 263 of 320 us/frame on
    # v5e at 16k points). Segments tile the valid prefix of the sorted
    # array contiguously (invalid keys sort to the end), so:
    #   * segment START positions in slot order are one cheap sort of
    #     where(is_start, position, n);
    #   * segment s spans [start_s, start_{s+1}); counts are EXACT
    #     integer differences (the old float accumulate, made exact);
    #   * segment sums are prefix-cumsum differences, and since
    #     end_s = start_{s+1}-1, the lower prefix of segment s is the
    #     upper prefix of segment s-1 — ONE gather of the cumsum at the
    #     segment ends covers both sides.
    # Precision: the cumsum runs over VOXEL-CORNER-RELATIVE coordinates
    # (p - corner is exact — Sterbenz — and lives in [0, voxel_size)),
    # so prefix magnitudes stay ~n*voxel_size/2 instead of random-walking
    # with world coordinates; the reconstructed centroid is within
    # ~1e-5 m of the direct per-voxel sum — below the reference's own
    # f32 sequential-accumulate error (~3e-4 at 100 m ranges).
    start_pos = jax.lax.sort(
        jnp.where(is_start, pos, jnp.int32(n)))[:num_segments]
    has = start_pos < n
    n_valid = jnp.sum(valid_s.astype(jnp.int32))
    next_start = jnp.concatenate(
        [start_pos[1:], jnp.full((1,), n, jnp.int32)])
    end_pos = jnp.minimum(next_start, n_valid) - 1
    counts = jnp.where(has, end_pos - jnp.minimum(start_pos, n - 1) + 1,
                       0).astype(pts.dtype)
    coords_s = jnp.floor(pts_s * inv)
    p_rel = jnp.where(valid_s[:, None], pts_s - coords_s * voxel_size, 0.0)
    csum = jnp.cumsum(p_rel, axis=0)
    end_c = jnp.clip(end_pos, 0, n - 1)
    up = csum[end_c]
    corner = coords_s[end_c] * voxel_size     # constant within a segment
    lo_prev = jnp.concatenate([jnp.zeros((1, 3), pts.dtype), up[:-1]])
    sums_rel = jnp.where(has[:, None], up - lo_prev, 0.0)

    centroids = corner + sums_rel / jnp.maximum(counts, 1.0)[:, None]
    centroids = jnp.where(has[:, None], centroids, 0.0)
    mask = jnp.arange(num_segments, dtype=jnp.int32) < n_voxels
    if num_segments < out_capacity:
        pad = out_capacity - num_segments
        centroids = jnp.concatenate([centroids, jnp.zeros((pad, 3), centroids.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
    return centroids, mask, n_voxels
