"""2-level hierarchical voxel surfel map as fixed-capacity sorted device
tables — the TPU-native redesign of the reference VoxelMap
(reference src/database/VoxelMap.{h,cpp}).

Reference semantics preserved:
  * L0 leaf voxels store a running centroid (kept here as sum+count so
    parallel merges are exact; centroid = sum/count) — VoxelMap.cpp:99-120.
  * L1 parents (hierarchy_factor=3 => 3x3x3 children, Estimator.cpp:79)
    cache a surfel (normal from PCA of child centroids, centroid,
    planarity = sigma2/sigma0) — VoxelMap.cpp:187-261.
  * Per-keyframe update: radius eviction of voxels beyond max_distance
    from the sensor (VoxelMap.cpp:146-158), insert new points, recompute
    surfels only for AFFECTED L1 cells (touched by new points); an
    affected cell with unchanged child count keeps its cached surfel
    (the `last_child_count` incremental skip, VoxelMap.cpp:203); a
    non-planar affected cell is DELETED together with its L0 children
    (VoxelMap.cpp:244-253); unaffected cells keep stale surfels unless
    eviction drops them below 5 children (UnregisterFromParent,
    VoxelMap.cpp:82-97).
  * O(1) surfel query per point (VoxelMap.cpp:368-386) becomes one
    batched binary search over the sorted L1 key table.
  * ApplyTransformAndRehash: transform all L0 centroids, merge collisions
    by weighted centroid, recompute ALL surfels without deletion
    (VoxelMap.cpp:264-366).

Design notes (TPU): hash maps are replaced by sorted key tables +
searchsorted (utils/keys.py); "insert" is concat+sort+segment-reduce;
all shapes static, data-dependent sizes carried as masks + counts.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import keys as K
from ..utils import eigh3

__all__ = ["VoxelMapState", "empty_map", "update_map", "lookup_surfels",
           "transform_and_rehash", "l0_points", "MIN_OCCUPIED_CHILDREN"]

MIN_OCCUPIED_CHILDREN = 5  # reference VoxelMap.cpp:188


class VoxelMapState(NamedTuple):
    # L0 leaf table (sorted by packed voxel key; padding = INVALID)
    l0_hi: jax.Array        # (C0,) uint32
    l0_lo: jax.Array        # (C0,) uint32
    l0_sum: jax.Array       # (C0, 3) f32 — running point-sum
    l0_count: jax.Array     # (C0,) i32  — 0 marks an empty slot
    n_l0: jax.Array         # () i32
    # L1 surfel table (sorted by packed parent key)
    l1_hi: jax.Array        # (C1,) uint32
    l1_lo: jax.Array        # (C1,) uint32
    l1_normal: jax.Array    # (C1, 3) f32
    l1_centroid: jax.Array  # (C1, 3) f32
    l1_planarity: jax.Array  # (C1,) f32
    l1_has_surfel: jax.Array  # (C1,) bool
    l1_child_count: jax.Array  # (C1,) i32 — last_child_count at surfel time
    n_l1: jax.Array         # () i32


def empty_map(c0: int, c1: int) -> VoxelMapState:
    u = jnp.uint32
    return VoxelMapState(
        l0_hi=jnp.full((c0,), K.INVALID_HI, dtype=u),
        l0_lo=jnp.full((c0,), K.INVALID_LO, dtype=u),
        l0_sum=jnp.zeros((c0, 3), jnp.float32),
        l0_count=jnp.zeros((c0,), jnp.int32),
        n_l0=jnp.int32(0),
        l1_hi=jnp.full((c1,), K.INVALID_HI, dtype=u),
        l1_lo=jnp.full((c1,), K.INVALID_LO, dtype=u),
        l1_normal=jnp.zeros((c1, 3), jnp.float32),
        l1_centroid=jnp.zeros((c1, 3), jnp.float32),
        l1_planarity=jnp.ones((c1,), jnp.float32),
        l1_has_surfel=jnp.zeros((c1,), bool),
        l1_child_count=jnp.zeros((c1,), jnp.int32),
        n_l1=jnp.int32(0),
    )


def _merge_l0(hi, lo, sums, counts, c0: int):
    """Sort entries by key and merge duplicates (sum of sums/counts).
    Returns compacted (hi, lo, sum, count, n) of capacity c0."""
    n_in = hi.shape[0]
    hi_s, lo_s, idx = K.sort_by_key(hi, lo, jnp.arange(n_in, dtype=jnp.int32))
    sums_s = sums[idx]
    counts_s = counts[idx]
    valid_s = ~K.key_eq(hi_s, lo_s, K.INVALID_HI, K.INVALID_LO)
    is_start, seg = K.segment_starts(hi_s, lo_s, valid_s)
    w = valid_s.astype(sums.dtype)
    seg_sum = jax.ops.segment_sum(sums_s * w[:, None], seg, num_segments=c0)
    seg_cnt = jax.ops.segment_sum(counts_s * valid_s.astype(jnp.int32), seg, num_segments=c0)
    # representative key per segment
    seg_hi = jnp.full((c0,), K.INVALID_HI, dtype=jnp.uint32).at[jnp.where(is_start, seg, c0 - 1)].min(
        jnp.where(is_start, hi_s, K.INVALID_HI), mode="drop")
    seg_lo = jnp.full((c0,), K.INVALID_LO, dtype=jnp.uint32).at[jnp.where(is_start, seg, c0 - 1)].min(
        jnp.where(is_start, lo_s, K.INVALID_LO), mode="drop")
    n = jnp.minimum(jnp.sum(is_start.astype(jnp.int32)), c0)
    slot_valid = jnp.arange(c0, dtype=jnp.int32) < n
    seg_hi = jnp.where(slot_valid, seg_hi, K.INVALID_HI)
    seg_lo = jnp.where(slot_valid, seg_lo, K.INVALID_LO)
    seg_cnt = jnp.where(slot_valid, seg_cnt, 0)
    return seg_hi, seg_lo, seg_sum, seg_cnt, n


def _l1_stats(l0_hi, l0_lo, l0_sum, l0_count, c1: int, hierarchy_factor: int):
    """Aggregate L0 centroids per parent cell: returns sorted L1 keys plus
    per-cell child_count, mean, covariance (PCA inputs, VoxelMap.cpp:223-236)."""
    c0 = l0_hi.shape[0]
    valid = l0_count > 0
    coords = K.unpack_key(l0_hi, l0_lo)
    pc = K.parent_coords(coords, hierarchy_factor)
    phi, plo = K.pack_key(pc)
    phi = jnp.where(valid, phi, K.INVALID_HI)
    plo = jnp.where(valid, plo, K.INVALID_LO)
    centroid = l0_sum / jnp.maximum(l0_count, 1)[:, None].astype(l0_sum.dtype)

    phi_s, plo_s, idx = K.sort_by_key(phi, plo, jnp.arange(c0, dtype=jnp.int32))
    cen_s = centroid[idx]
    valid_s = ~K.key_eq(phi_s, plo_s, K.INVALID_HI, K.INVALID_LO)
    is_start, seg = K.segment_starts(phi_s, plo_s, valid_s)
    w = valid_s.astype(cen_s.dtype)

    cnt = jax.ops.segment_sum(valid_s.astype(jnp.int32), seg, num_segments=c1)
    s1 = jax.ops.segment_sum(cen_s * w[:, None], seg, num_segments=c1)
    outer = cen_s[:, :, None] * cen_s[:, None, :] * w[:, None, None]
    s2 = jax.ops.segment_sum(outer.reshape(c0, 9), seg, num_segments=c1).reshape(c1, 3, 3)

    seg_hi = jnp.full((c1,), K.INVALID_HI, dtype=jnp.uint32).at[jnp.where(is_start, seg, c1 - 1)].min(
        jnp.where(is_start, phi_s, K.INVALID_HI), mode="drop")
    seg_lo = jnp.full((c1,), K.INVALID_LO, dtype=jnp.uint32).at[jnp.where(is_start, seg, c1 - 1)].min(
        jnp.where(is_start, plo_s, K.INVALID_LO), mode="drop")
    n = jnp.minimum(jnp.sum(is_start.astype(jnp.int32)), c1)
    slot_valid = jnp.arange(c1, dtype=jnp.int32) < n
    seg_hi = jnp.where(slot_valid, seg_hi, K.INVALID_HI)
    seg_lo = jnp.where(slot_valid, seg_lo, K.INVALID_LO)
    cnt = jnp.where(slot_valid, cnt, 0)

    cntf = jnp.maximum(cnt, 1).astype(s1.dtype)[:, None]
    mean = s1 / cntf
    cov = s2 / cntf[:, :, None] - mean[:, :, None] * mean[:, None, :]
    return seg_hi, seg_lo, cnt, mean, cov, n


def _surfel_from_cov(mean, cov):
    """PCA surfel: normal = smallest-eigenvalue direction, planarity =
    lam_min/(lam_max + 1e-6) (reference VoxelMap.cpp:239-242)."""
    lam, normal = eigh3.eigh3(cov)
    planarity = lam[:, 0] / (lam[:, 2] + 1e-6)
    return normal, mean, planarity


@partial(jax.jit, static_argnames=("hierarchy_factor", "compute_surfels"))
def update_map(state: VoxelMapState, new_pts: jax.Array, new_mask: jax.Array,
               sensor_pos: jax.Array, max_distance, *, voxel_size,
               planarity_threshold, hierarchy_factor: int = 3,
               compute_surfels: bool = True) -> VoxelMapState:
    """Per-keyframe map update (reference VoxelMap::UpdateVoxelMap,
    VoxelMap.cpp:128-262). `new_pts` are world-frame feature points."""
    c0 = state.l0_hi.shape[0]
    c1 = state.l1_hi.shape[0]
    f32 = jnp.float32

    # --- Step 1: radius eviction (VoxelMap.cpp:146-158) ---
    centroid = state.l0_sum / jnp.maximum(state.l0_count, 1)[:, None].astype(f32)
    valid = state.l0_count > 0
    dist_sq = jnp.sum((centroid - sensor_pos[None, :]) ** 2, axis=-1)
    keep = valid & (dist_sq <= max_distance * max_distance)
    hi = jnp.where(keep, state.l0_hi, K.INVALID_HI)
    lo = jnp.where(keep, state.l0_lo, K.INVALID_LO)
    sums = jnp.where(keep[:, None], state.l0_sum, 0.0)
    counts = jnp.where(keep, state.l0_count, 0)

    # --- Step 2: insert new points (AddPoint, VoxelMap.cpp:99-120) ---
    inv = 1.0 / voxel_size
    pcoords = K.voxel_coords(new_pts, inv)
    nhi, nlo = K.pack_key(pcoords)
    nhi = jnp.where(new_mask, nhi, K.INVALID_HI)
    nlo = jnp.where(new_mask, nlo, K.INVALID_LO)
    all_hi = jnp.concatenate([hi, nhi])
    all_lo = jnp.concatenate([lo, nlo])
    all_sum = jnp.concatenate([sums, jnp.where(new_mask[:, None], new_pts, 0.0)])
    all_cnt = jnp.concatenate([counts, new_mask.astype(jnp.int32)])
    l0_hi, l0_lo, l0_sum, l0_cnt, n_l0 = _merge_l0(all_hi, all_lo, all_sum, all_cnt, c0)

    # --- Step 3: L1 aggregation over the merged table ---
    l1_hi, l1_lo, child_cnt, mean, cov, n_l1 = _l1_stats(
        l0_hi, l0_lo, l0_sum, l0_cnt, c1, hierarchy_factor)

    if not compute_surfels:
        # KDTree-correspondence mode skips surfels (VoxelMap.cpp:182-185).
        return VoxelMapState(
            l0_hi=l0_hi, l0_lo=l0_lo, l0_sum=l0_sum, l0_count=l0_cnt, n_l0=n_l0,
            l1_hi=l1_hi, l1_lo=l1_lo,
            l1_normal=jnp.zeros((c1, 3), f32), l1_centroid=mean,
            l1_planarity=jnp.ones((c1,), f32),
            l1_has_surfel=jnp.zeros((c1,), bool),
            l1_child_count=child_cnt, n_l1=n_l1)

    # --- Step 4: affected set = L1 cells containing any new point ---
    np_parent = K.parent_coords(pcoords, hierarchy_factor)
    aphi, aplo = K.pack_key(np_parent)
    pos = K.searchsorted2(l1_hi, l1_lo, aphi, aplo)
    pos_c = jnp.minimum(pos, c1 - 1)
    hit = K.key_eq(l1_hi[pos_c], l1_lo[pos_c], aphi, aplo) & new_mask
    affected = jnp.zeros((c1,), bool).at[jnp.where(hit, pos_c, c1 - 1)].max(hit, mode="drop")

    # --- Step 5: carry over previous surfels by key lookup ---
    ppos = K.searchsorted2(state.l1_hi, state.l1_lo, l1_hi, l1_lo)
    ppos_c = jnp.minimum(ppos, c1 - 1)
    prev_hit = K.key_eq(state.l1_hi[ppos_c], state.l1_lo[ppos_c], l1_hi, l1_lo)
    prev_has = jnp.where(prev_hit, state.l1_has_surfel[ppos_c], False)
    prev_normal = jnp.where(prev_hit[:, None], state.l1_normal[ppos_c], 0.0)
    prev_centroid = jnp.where(prev_hit[:, None], state.l1_centroid[ppos_c], 0.0)
    prev_planarity = jnp.where(prev_hit, state.l1_planarity[ppos_c], 1.0)
    prev_ccount = jnp.where(prev_hit, state.l1_child_count[ppos_c], 0)

    # --- Step 6: surfel decisions (VoxelMap.cpp:187-261) ---
    new_normal, new_cen, new_plan = _surfel_from_cov(mean, cov)
    enough = child_cnt >= MIN_OCCUPIED_CHILDREN
    skip_recompute = prev_has & (prev_ccount == child_cnt)  # VoxelMap.cpp:203
    recompute = affected & enough & ~skip_recompute
    non_planar = recompute & (new_plan > planarity_threshold)

    # Unaffected: keep stale surfel while >= 5 children (UnregisterFromParent).
    has = jnp.where(affected,
                    jnp.where(enough, skip_recompute | (recompute & ~non_planar), False),
                    prev_has & enough)
    use_new = recompute & ~non_planar
    normal = jnp.where(use_new[:, None], new_normal, prev_normal)
    centroidL1 = jnp.where(use_new[:, None], new_cen, prev_centroid)
    planarity = jnp.where(use_new, new_plan, prev_planarity)
    ccount_out = jnp.where(use_new, child_cnt, prev_ccount)

    # --- Step 7: delete non-planar affected cells + their children
    # (VoxelMap.cpp:244-253) ---
    any_deleted = jnp.any(non_planar)

    def do_delete(args):
        l0_hi, l0_lo, l0_sum, l0_cnt, l1_hi, l1_lo, has, normal, centroidL1, planarity, ccount_out = args
        coords0 = K.unpack_key(l0_hi, l0_lo)
        par0 = K.parent_coords(coords0, hierarchy_factor)
        p0hi, p0lo = K.pack_key(par0)
        q = K.searchsorted2(l1_hi, l1_lo, p0hi, p0lo)
        q_c = jnp.minimum(q, c1 - 1)
        parent_deleted = K.key_eq(l1_hi[q_c], l1_lo[q_c], p0hi, p0lo) & non_planar[q_c]
        keep0 = (l0_cnt > 0) & ~parent_deleted
        d_hi = jnp.where(keep0, l0_hi, K.INVALID_HI)
        d_lo = jnp.where(keep0, l0_lo, K.INVALID_LO)
        d_sum = jnp.where(keep0[:, None], l0_sum, 0.0)
        d_cnt = jnp.where(keep0, l0_cnt, 0)
        d_hi, d_lo, d_sum, d_cnt, d_n = _merge_l0(d_hi, d_lo, d_sum, d_cnt, c0)
        # Remove deleted L1 cells and re-sort the L1 table.
        keep1 = ~non_planar & ~K.key_eq(l1_hi, l1_lo, K.INVALID_HI, K.INVALID_LO)
        s_hi = jnp.where(keep1, l1_hi, K.INVALID_HI)
        s_lo = jnp.where(keep1, l1_lo, K.INVALID_LO)
        s_hi, s_lo, idx1 = K.sort_by_key(s_hi, s_lo, jnp.arange(c1, dtype=jnp.int32))
        return (d_hi, d_lo, d_sum, d_cnt, d_n,
                s_hi, s_lo, has[idx1] & keep1[idx1], normal[idx1], centroidL1[idx1],
                planarity[idx1], ccount_out[idx1],
                jnp.sum(keep1.astype(jnp.int32)))

    def no_delete(args):
        l0_hi, l0_lo, l0_sum, l0_cnt, l1_hi, l1_lo, has, normal, centroidL1, planarity, ccount_out = args
        return (l0_hi, l0_lo, l0_sum, l0_cnt, n_l0,
                l1_hi, l1_lo, has, normal, centroidL1, planarity, ccount_out, n_l1)

    (l0_hi, l0_lo, l0_sum, l0_cnt, n_l0_f,
     l1_hi, l1_lo, has, normal, centroidL1, planarity, ccount_out, n_l1_f) = jax.lax.cond(
        any_deleted, do_delete, no_delete,
        (l0_hi, l0_lo, l0_sum, l0_cnt, l1_hi, l1_lo, has, normal,
         centroidL1, planarity, ccount_out))

    return VoxelMapState(
        l0_hi=l0_hi, l0_lo=l0_lo, l0_sum=l0_sum, l0_count=l0_cnt, n_l0=n_l0_f,
        l1_hi=l1_hi, l1_lo=l1_lo, l1_normal=normal, l1_centroid=centroidL1,
        l1_planarity=planarity, l1_has_surfel=has, l1_child_count=ccount_out,
        n_l1=n_l1_f)


@partial(jax.jit, static_argnames=("hierarchy_factor",))
def lookup_surfels(state: VoxelMapState, pts: jax.Array, *, voxel_size,
                   hierarchy_factor: int = 3):
    """Batched O(log C) surfel query (reference GetSurfelAtPoint,
    VoxelMap.cpp:368-386): L1 key of each point -> sorted-table search.
    Returns (normal (N,3), centroid (N,3), valid (N,))."""
    inv = 1.0 / (voxel_size * hierarchy_factor)
    coords = K.voxel_coords(pts, inv)
    qhi, qlo = K.pack_key(coords)
    pos = K.searchsorted2(state.l1_hi, state.l1_lo, qhi, qlo)
    c1 = state.l1_hi.shape[0]
    pos_c = jnp.minimum(pos, c1 - 1)
    hit = K.key_eq(state.l1_hi[pos_c], state.l1_lo[pos_c], qhi, qlo)
    valid = hit & state.l1_has_surfel[pos_c]
    return state.l1_normal[pos_c], state.l1_centroid[pos_c], valid


@partial(jax.jit, static_argnames=("hierarchy_factor",))
def transform_and_rehash(state: VoxelMapState, T: jax.Array, *, voxel_size,
                         planarity_threshold,
                         hierarchy_factor: int = 3) -> VoxelMapState:
    """PGO correction: transform every L0 centroid, re-key, merge collisions
    by weighted centroid, recompute all surfels (reference
    ApplyTransformAndRehash + RecomputeAllSurfels, VoxelMap.cpp:264-366;
    no child deletion in the recompute-all path)."""
    c0 = state.l0_hi.shape[0]
    c1 = state.l1_hi.shape[0]
    f32 = jnp.float32
    valid = state.l0_count > 0
    cnt = jnp.maximum(state.l0_count, 1)[:, None].astype(f32)
    centroid = state.l0_sum / cnt
    R = T[:3, :3]
    t = T[:3, 3]
    new_centroid = centroid @ R.T + t[None, :]
    new_sum = new_centroid * state.l0_count[:, None].astype(f32)
    inv = 1.0 / voxel_size
    coords = K.voxel_coords(new_centroid, inv)
    hi, lo = K.pack_key(coords)
    hi = jnp.where(valid, hi, K.INVALID_HI)
    lo = jnp.where(valid, lo, K.INVALID_LO)
    l0_hi, l0_lo, l0_sum, l0_cnt, n_l0 = _merge_l0(
        hi, lo, jnp.where(valid[:, None], new_sum, 0.0),
        jnp.where(valid, state.l0_count, 0), c0)

    l1_hi, l1_lo, child_cnt, mean, cov, n_l1 = _l1_stats(
        l0_hi, l0_lo, l0_sum, l0_cnt, c1, hierarchy_factor)
    normal, cen, plan = _surfel_from_cov(mean, cov)
    has = (child_cnt >= MIN_OCCUPIED_CHILDREN) & (plan <= planarity_threshold)
    return VoxelMapState(
        l0_hi=l0_hi, l0_lo=l0_lo, l0_sum=l0_sum, l0_count=l0_cnt, n_l0=n_l0,
        l1_hi=l1_hi, l1_lo=l1_lo, l1_normal=normal, l1_centroid=cen,
        l1_planarity=plan, l1_has_surfel=has, l1_child_count=child_cnt,
        n_l1=n_l1)


def l0_points(state: VoxelMapState):
    """All L0 centroids + validity mask (reference GetPointCloud,
    VoxelMap.cpp:388-403)."""
    valid = state.l0_count > 0
    centroid = state.l0_sum / jnp.maximum(state.l0_count, 1)[:, None].astype(jnp.float32)
    return centroid, valid
