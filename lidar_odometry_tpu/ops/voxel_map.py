"""2-level hierarchical voxel surfel map — parent-relative child store +
bucketed exact hash index over parents (TPU-native redesign of the
reference VoxelMap, reference src/database/VoxelMap.{h,cpp}).

Reference semantics preserved:
  * L0 leaf voxels hold a running centroid (kept as sum+count so merges
    are exact) — VoxelMap.cpp:99-120.
  * L1 parents (hierarchy_factor=3 => 3x3x3 children, Estimator.cpp:79)
    cache a surfel (normal from PCA of child centroids, centroid,
    planarity = sigma_min/sigma_max) — VoxelMap.cpp:187-261.
  * Per-keyframe update: radius eviction beyond max_distance by L0
    centroid (VoxelMap.cpp:146-158), point insertion, surfel recompute
    only for L1 cells whose CHILD SET changed (new-child registration or
    eviction); unchanged-child-count cells keep cached surfels
    (VoxelMap.cpp:203); non-planar recomputed cells are DELETED with
    their children (VoxelMap.cpp:244-253); eviction-only cells drop
    surfels below 5 children (UnregisterFromParent, VoxelMap.cpp:82-97).
  * O(1) surfel query (VoxelMap.cpp:368-386): ONE bucket-row gather +
    ONE payload-row gather.
  * ApplyTransformAndRehash merges re-keyed centroids by weighted
    centroid and recomputes all surfels (VoxelMap.cpp:264-366) — here a
    sort-based bulk rebuild.

Design (TPU, v5 — profiled against v4 on v5e):
  * THE key layout idea: an L0 voxel's address is fully determined by
    its parent — row = parent_slot * 27 + child_offset of l0_data
    (C1*27, 4) f32 [count | sum xyz]. One hash index (over L1 parents)
    serves both levels; there is no L0 index, no L0 slot allocation, no
    free-stack and no parent/child pointer bookkeeping (v4 spent ~1 ms
    per update on the L0 claim rounds + l1_children maintenance).
    Occupancy is implicit: count > 0. Invariant: a free parent slot's
    27 rows are all-zero (eviction/deletion zero rows synchronously).
  * Child stats for surfel recompute gather ONE CONTIGUOUS 432 B row
    per cell — l0_data viewed as (C1, 108) — instead of 27 random
    16 B rows per cell (v4 paid ~0.6 ms/update for those gathers;
    random-row gathers on v5e are latency-bound at ~20 ns/row).
  * The parent hash index is one wide row per BUCKET of 8 cells:
    (B, 32) i32 = [slot x8 | key_hi x8 | key_lo x8 | pad]. A lookup is
    ONE row gather + 8 in-register compares. The index is EXACT (each
    slot records its cell; erase is synchronous). Keys that cannot be
    placed (full bucket / no free slot) are dropped and counted.
  * Eviction runs the exact per-child radius test as one divide-free
    bandwidth-bound pass over the child table, any-reduces to parents,
    compacts actually-evicting parents to EVICT_LIST, and zeroes their
    evicted children (bounded by CH_CAP). Parents beyond the cap defer
    to the next update (the mask is recomputed from live centroids
    every update: delayed, never lost). A cheaper key-based parent
    prefilter was tried and rejected: never-evicting margin-band
    parents saturate the candidate list and stall real evictions.
  * Every scatter whose targets are unique by construction carries
    unique_indices=True — without it XLA lowers masked scatters to
    sort-based combines (one full sort per column; the dominant cost
    in the v5.0 device trace). The only sort-backed scatters left are
    small: per-parent child-count increments at new_cap.
  * All data-dependent set sizes (new children, affected parents,
    recompute list, evictions, deletions) are compacted to fixed caps
    by sort (a 16k sort is ~10 us on v5e); two size tiers (lax.cond on
    the exact new-child count) keep the steady-state program small
    while first keyframes / teleports take full-size caps.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import keys as K
from ..utils import eigh3

__all__ = ["VoxelMapState", "empty_map", "update_map", "lookup_surfels",
           "transform_and_rehash", "bulk_build", "l0_points", "l0_records",
           "voxel_occupied", "grid_knn_neighbors", "MIN_OCCUPIED_CHILDREN"]

MIN_OCCUPIED_CHILDREN = 5  # reference VoxelMap.cpp:188

BUCKET = 8                  # cells per hash bucket (one row gather probes all)
ROW = 32                    # i32 columns per index row: slot x8, hi x8, lo x8, pad
NCH = 27                    # children per parent (hierarchy_factor**3)
EVICT_LIST = 2048           # eviction-candidate PARENTS per update (excess defers)
CH_CAP = 8192               # child rows zeroed (evict) per update (excess defers)
SMALL_CAP = 4096            # steady-state tier: new-key/affected/delete caps
_VIEW_GATHER_MAX_C1 = 16384  # (c1, NCH*4)-view child gathers only below this
INVALID_I32 = -1            # bitcast of K.INVALID_HI / K.INVALID_LO


def _scaled_caps(c1: int, p: int):
    """Bounded-set caps scaled to the map/scan shapes. At full single-chip
    shapes (c1=65536, p>=14k) these equal the module constants; per-shard
    maps (parallel/sharded_map.py: c1/S cells, O(scan/S) points) get
    proportionally smaller compaction/scatter programs — with fixed caps
    an S=8 shard paid full-scan-sized sorts and scatters per update,
    capping strong-scaling efficiency at ~30% (SCALING.json round 2.0).
    Overflow semantics are unchanged: evictions/deletions defer, dropped
    inserts count into n_dropped."""
    evict_cap = max(256, min(EVICT_LIST, c1 // 32))
    zero_cap = max(1024, min(CH_CAP, c1 // 8))
    # Floor grows with p: a blocked multi-lane update (fast_pipeline
    # make_blocked_runner, p = block*B*scan_capacity) lands B keyframes'
    # worth of novelty per call (~2k voxels each), and a fixed 4096 cap
    # pushed EVERY steady block into the bulk tier whose machinery
    # scales with p itself — measured 92 vs 541 scans/s at B=4. At
    # single-chip scan shapes (p=14k) the floor keeps today's 4096.
    small_cap = max(256, min(max(SMALL_CAP, p // 8),
                             max(c1 // 16, p // 4)))
    return evict_cap, zero_cap, small_cap


def _n_buckets(capacity: int) -> int:
    n = max(capacity // 4, 8)   # avg load <= 2 keys per 8-cell bucket at 50% use
    p = 1
    while p < n:
        p *= 2
    return p


def _hash_bucket(hi: jax.Array, lo: jax.Array, mask: int):
    h = hi * jnp.uint32(0x9E3779B1) ^ lo * jnp.uint32(0x85EBCA77)
    h = (h ^ (h >> jnp.uint32(15))) * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(13))
    return (h & jnp.uint32(mask)).astype(jnp.int32)


_CHILD_OFFS = np.stack(np.meshgrid(*([np.arange(3)] * 3), indexing="ij"),
                       axis=-1).reshape(NCH, 3).astype(np.int32)
_NB_OFFS = _CHILD_OFFS - 1  # -1..1 cube for grid kNN


class VoxelMapState(NamedTuple):
    # L0 children, parent-relative: row parent_slot*27 + child_offset
    l0_data: jax.Array    # (C1*27, 4) f32 [count | sum_x | sum_y | sum_z]
    # L1 parents
    l1_index: jax.Array   # (B1, ROW) i32 bucket rows
    l1_meta: jax.Array    # (C1, 4) i32 [key_hi | key_lo | child_count | cellpos]
    l1_last: jax.Array    # (C1,) i32 child count at last surfel compute
    l1_surfel: jax.Array  # (C1, 8) f32 [normal(3) | centroid(3) | planarity | has]
    l1_free: jax.Array    # (C1,) i32 free-slot stack
    l1_free_top: jax.Array  # () i32
    n_l0: jax.Array       # () i32 live child voxels (explicit counter)
    n_l1: jax.Array       # () i32 == C1 - l1_free_top
    n_dropped: jax.Array  # () i32 — keys lost to full buckets / caps


def empty_map(c0: int, c1: int) -> VoxelMapState:
    """c1 = parent-cell capacity (child capacity is c1*27). c0 is kept
    for API compatibility (v4's independent L0 slot capacity); it only
    bounds the merge stage of bulk_build."""
    del c0
    return VoxelMapState(
        l0_data=jnp.zeros((c1 * NCH, 4), jnp.float32),
        l1_index=jnp.full((_n_buckets(c1), ROW), -1, jnp.int32),
        l1_meta=jnp.full((c1, 4), INVALID_I32, jnp.int32),
        l1_last=jnp.zeros((c1,), jnp.int32),
        l1_surfel=jnp.zeros((c1, 8), jnp.float32),
        l1_free=jnp.arange(c1, dtype=jnp.int32),
        l1_free_top=jnp.int32(c1),
        n_l0=jnp.int32(0),
        n_l1=jnp.int32(0),
        n_dropped=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# index primitives
# ---------------------------------------------------------------------------

def _bucket_find(index, qhi, qlo):
    """One-gather bucket probe. Returns (slot (N,), hit (N,), bucket (N,),
    empty (N, BUCKET) bool)."""
    bmask = index.shape[0] - 1
    b = _hash_bucket(qhi, qlo, bmask)
    row = index[b]                                   # (N, ROW)
    qh_i = jax.lax.bitcast_convert_type(qhi, jnp.int32)
    ql_i = jax.lax.bitcast_convert_type(qlo, jnp.int32)
    slots = row[:, 0:BUCKET]
    occ = slots >= 0
    hit_c = occ & (row[:, BUCKET:2 * BUCKET] == qh_i[:, None]) \
        & (row[:, 2 * BUCKET:3 * BUCKET] == ql_i[:, None])
    hit = jnp.any(hit_c, axis=1)
    slot = jnp.sum(jnp.where(hit_c, slots, 0), axis=1)  # <=1 cell matches
    slot = jnp.where(hit, slot, -1)
    return slot, hit, b, ~occ


def _compact(mask: jax.Array, cap: int):
    """Indices of True positions, compacted to (cap,) (-1 padded).
    Sort-based: a 16k sort is ~10 us on v5e while an equivalent scatter
    costs 0.1-1 ms."""
    n = mask.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(mask, idx, jnp.int32(n))
    s = jax.lax.sort(key)
    out = s[:min(cap, n)]
    if cap > n:
        out = jnp.concatenate([out, jnp.full((cap - n,), n, jnp.int32)])
    return jnp.where(out < n, out, -1), jnp.sum(mask.astype(jnp.int32))


def _claim_round(index, meta, free, top, qhi, qlo, want,
                 col2_init: int = -1):
    """Allocate slots + index cells for wanted keys (all arrays (M,)).
    Keys are deduped (sort), ranked per bucket (sort), and claim the
    rank-th empty cell of their bucket. Wanted keys that already exist
    resolve as hits. Returns (index, meta, top, slot (M,), claimed (M,),
    allocated (M,), n_failed)."""
    m = qhi.shape[0]
    c = meta.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    slot0, hit, b, empty = _bucket_find(index, qhi, qlo)
    resolved = hit & want
    slot = jnp.where(resolved, slot0, -1)
    cand = want & ~resolved

    # --- dedupe identical keys: sort by (hi, lo); leader = first of group
    skey_hi = jnp.where(cand, qhi, jnp.uint32(0xFFFFFFFF))
    skey_lo = jnp.where(cand, qlo, jnp.uint32(0xFFFFFFFF))
    s_hi, s_lo, s_idx = jax.lax.sort((skey_hi, skey_lo, idx), num_keys=2)
    first = jnp.concatenate([jnp.ones((1,), bool),
                             ~((s_hi[1:] == s_hi[:-1]) & (s_lo[1:] == s_lo[:-1]))])
    s_cand = cand[s_idx]
    leader_s = first & s_cand
    leader = jnp.zeros((m,), bool).at[s_idx].set(
        leader_s, unique_indices=True)

    # --- rank leaders within their bucket: sort by (bucket, idx)
    bkey = jnp.where(leader, b, jnp.int32(index.shape[0]))
    b_s, bidx = jax.lax.sort((bkey, idx), num_keys=1)
    bfirst = jnp.concatenate([jnp.ones((1,), bool), b_s[1:] != b_s[:-1]])
    pos_in = jnp.arange(m, dtype=jnp.int32)
    start = jax.lax.cummax(jnp.where(bfirst, pos_in, 0))
    brank_s = pos_in - start
    brank = jnp.zeros((m,), jnp.int32).at[bidx].set(
        brank_s, unique_indices=True)

    # --- cell = brank-th empty cell of the bucket
    ecnt = jnp.cumsum(empty.astype(jnp.int32), axis=1)
    sel = empty & (ecnt == (brank + 1)[:, None])
    has_cell = leader & jnp.any(sel, axis=1)
    cell = jnp.argmax(sel, axis=1).astype(jnp.int32)

    # --- pop free slots
    arank = jnp.cumsum(has_cell.astype(jnp.int32)) - 1
    can = has_cell & (arank < top)
    new_slot = free[jnp.clip(top - 1 - arank, 0, free.shape[0] - 1)]
    new_slot = jnp.where(can, new_slot, -1)
    n_alloc = jnp.sum(can.astype(jnp.int32))

    # --- writes. Index cells / meta rows are unique by construction;
    # unique_indices=True matters: without it XLA lowers every masked
    # scatter to a sort-based combine (one full sort PER COLUMN — the
    # dominant cost in the v5.0 trace).
    qh_i = jax.lax.bitcast_convert_type(qhi, jnp.int32)
    ql_i = jax.lax.bitcast_convert_type(qlo, jnp.int32)
    flat = index.reshape(-1)
    base = b * ROW + cell
    tgt = jnp.where(can, base, flat.shape[0])
    flat = flat.at[tgt].set(new_slot, mode="drop", unique_indices=True)
    flat = flat.at[jnp.where(can, base + BUCKET, flat.shape[0])].set(
        qh_i, mode="drop", unique_indices=True)
    flat = flat.at[jnp.where(can, base + 2 * BUCKET, flat.shape[0])].set(
        ql_i, mode="drop", unique_indices=True)
    index = flat.reshape(index.shape)
    mt = jnp.where(can, new_slot, c)
    mrow = jnp.stack([qh_i, ql_i,
                      jnp.full_like(qh_i, col2_init), b * BUCKET + cell],
                     axis=1)
    meta = meta.at[mt].set(mrow, mode="drop", unique_indices=True)

    slot = jnp.where(can, new_slot, slot)
    claimed = resolved | can
    n_failed = jnp.sum((cand & leader & ~can).astype(jnp.int32))
    return index, meta, top - n_alloc, slot, claimed, can, n_failed


def _resolve_parents(index, meta, free, top, qhi, qlo, want, cap2: int,
                     find0):
    """Resolve-or-allocate PARENT slots for (N,) keys. Round 1 is
    find-only (reuses the precomputed probe — in steady state nearly
    every parent already exists, and a claim pass over all N keys pays
    ~7 masked N-sized scatters for nothing). Unresolved keys compact to
    cap2 for one claim round; duplicate losers re-find their winner on
    the updated index. Returns (index, meta, top, slot (N,),
    allocated_mask_over_cap2 (cap2,), alloc_slots (cap2,))."""
    n = qhi.shape[0]
    slot0, hit, _, _ = find0
    slot = jnp.where(hit & want, slot0, -1)

    rem_idx, _ = _compact(want & ~hit, cap2)
    rem_ok = rem_idx >= 0
    ri = jnp.clip(rem_idx, 0, n - 1)
    r_hi = jnp.where(rem_ok, qhi[ri], K.INVALID_HI)
    r_lo = jnp.where(rem_ok, qlo[ri], K.INVALID_LO)
    index, meta, top, slot2, claimed2, alloc2, _f = _claim_round(
        index, meta, free, top, r_hi, r_lo, rem_ok, col2_init=0)
    # duplicate losers find their group's winner on the updated index
    slot3, hit3, _, _ = _bucket_find(index, r_hi, r_lo)
    slot2 = jnp.where(claimed2, slot2, jnp.where(hit3, slot3, -1))
    wr = jnp.where(rem_ok & (slot2 >= 0), ri, n)
    slot = slot.at[wr].set(slot2, mode="drop", unique_indices=True)
    return index, meta, top, slot, alloc2, jnp.where(alloc2, slot2, -1)


def _child_offset_of(coords: jax.Array) -> jax.Array:
    """Position of an L0 voxel inside its 3x3x3 parent (0..26), floor-mod."""
    m = coords - 3 * jnp.floor_divide(coords, 3)
    return (m[..., 0] * 3 + m[..., 1]) * 3 + m[..., 2]


def _erase_cells(index, cellpos, ok):
    """Erase the slot column of the given cells (index stays exact)."""
    flat = index.reshape(-1)
    tgt = jnp.where(ok, (cellpos >> 3) * ROW + (cellpos & 7), flat.shape[0])
    return flat.at[tgt].set(-1, mode="drop",
                            unique_indices=True).reshape(index.shape)


def _zero_child_rows(l0_data, addrs, ok):
    """Zero the given child rows (one unique whole-row scatter)."""
    t = jnp.where(ok, addrs, l0_data.shape[0])
    z = jnp.zeros((addrs.shape[0], 4), l0_data.dtype)
    return l0_data.at[t].set(z, mode="drop", unique_indices=True)


# ---------------------------------------------------------------------------
# surfel math
# ---------------------------------------------------------------------------

def _block_stats(blk):
    """(A, 27, 4) child blocks -> (count, mean, cov, kids_ok) per cell
    (reference VoxelMap.cpp:207-236). A live child is count > 0; rows of
    free/absent children are all-zero by the store invariant."""
    ok = blk[..., 0] > 0.0
    cnt = jnp.sum(ok.astype(jnp.int32), axis=1)
    cen = blk[..., 1:4] / jnp.maximum(blk[..., 0:1], 1.0)
    w = ok.astype(jnp.float32)[..., None]
    denom = jnp.maximum(cnt, 1)[:, None].astype(jnp.float32)
    mean = jnp.sum(cen * w, axis=1) / denom
    d = (cen - mean[:, None, :]) * w
    cov = jnp.einsum("aky,akz->ayz", d, d) / denom[..., None]
    return cnt, mean, cov, ok


# ---------------------------------------------------------------------------
# update
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("hierarchy_factor", "compute_surfels"))
def update_map(state: VoxelMapState, new_pts: jax.Array, new_mask: jax.Array,
               sensor_pos: jax.Array, max_distance, *, voxel_size,
               planarity_threshold, hierarchy_factor: int = 3,
               compute_surfels: bool = True,
               evict_enabled=None) -> VoxelMapState:
    """Per-keyframe map update (reference VoxelMap::UpdateVoxelMap,
    VoxelMap.cpp:128-262) as a sort+gather/scatter program.

    `sensor_pos` is (3,) — or (S, 3) for multi-sequence shared maps
    (models/fast_pipeline blocked runner): eviction then tests the MIN
    distance over the S sensors, which is exact per-lane semantics when
    the lanes' regions are separated by more than the eviction radius.

    `evict_enabled` (traced bool scalar, default on) gates the WHOLE
    radius-eviction stage including its full-table scan — high-rate
    callers (the blocked multi-sequence runner) stride it to every few
    updates, which only delays evictions the caps already defer."""
    c1 = state.l1_meta.shape[0]
    nrows = c1 * NCH
    p = new_pts.shape[0]
    f32 = jnp.float32
    evict_list, ch_cap, small_cap = _scaled_caps(c1, p)
    sensors = jnp.atleast_2d(sensor_pos)            # (S, 3)

    def min_d2cnt(sum3, cnt):
        """min_s |sum3 - cnt*s|^2 (divide-free squared distance x cnt^2)."""
        out = None
        for si in range(sensors.shape[0]):
            rv = sum3 - cnt[..., None] * sensors[si]
            d2 = jnp.sum(rv * rv, axis=-1)
            out = d2 if out is None else jnp.minimum(out, d2)
        return out

    l0_data = state.l0_data
    l1_index, l1_meta = state.l1_index, state.l1_meta
    l1_free, l1_top = state.l1_free, state.l1_free_top
    n_l0 = state.n_l0

    # ---- Step 1: radius eviction (VoxelMap.cpp:146-158). The exact
    # per-child test runs over the full child table (one bandwidth-bound
    # elementwise pass + a (C1, 27) any-reduce — ~0.1 ms at bench
    # capacity); parents with at least one evicting child compact to
    # evict_list and their child blocks are gathered for the bounded
    # masked zeroing. Parents beyond the cap defer to the next update
    # (the mask is recomputed from live centroids: delayed, never
    # lost). A cheaper key-based parent prefilter was tried and
    # rejected: never-evicting margin-band parents saturate the
    # candidate list and stall real evictions behind them. ----
    maxd2 = max_distance * max_distance

    # The compaction + block-gather + zeroing machinery below costs a
    # few ms even when NOTHING evicts (it is shape-bound, not
    # data-bound), while most updates on a bounded trajectory evict
    # nothing — so it runs under a cond on the exact candidate mask.
    # The no-evict branch's identity cost is one pass over the carried
    # buffers (~0.2 ms at bench capacity), 10x cheaper than the
    # machinery.
    def evict_stage(args):
        l0_data, l1_meta, n_l0 = args
        cnt_all = l0_data[:, 0]
        # no divide: |sum/cnt-s|^2 > d^2  <=>  |sum-cnt*s|^2 > d^2*cnt^2
        d2cnt = min_d2cnt(l0_data[:, 1:4], cnt_all)
        ev_row = (cnt_all > 0.0) & (d2cnt > maxd2 * cnt_all * cnt_all)
        cand_evict = jnp.any(ev_row.reshape(c1, NCH), axis=1)
        return jax.lax.cond(jnp.any(cand_evict),
                            partial(do_evict, cand_evict), no_evict, args)

    def do_evict(cand_evict, args):
        l0_data, l1_meta, n_l0 = args
        ev_list, _ = _compact(cand_evict, evict_list)
        ev_ok = ev_list >= 0
        evp = jnp.clip(ev_list, 0, c1 - 1)
        ev_rows = (evp[:, None] * NCH
                   + jnp.arange(NCH, dtype=jnp.int32)[None, :]).reshape(-1)
        # Per-parent child-block gather. Two lowerings, picked by table
        # size: the (c1, NCH*4) contiguous view wins on SMALL per-shard
        # tables (one 108-wide row per parent instead of 27 narrow
        # 4-wide rows, a top-5 op in the S=8 trace) — but materializing
        # that view relayouts the whole l0_data array, which at
        # single-chip capacity (c1=64k, 28 MB) costs ~3 ms per keyframe
        # update and was THE round-3 single-chip regression
        # (533 -> 377 scans/s). Row-addressed gathers touch only the
        # gathered rows and win whenever the table dwarfs the gather.
        if c1 <= _VIEW_GATHER_MAX_C1:
            blk = l0_data.reshape(c1, NCH * 4)[evp].reshape(
                evict_list, NCH, 4)
        else:
            blk = l0_data[ev_rows].reshape(evict_list, NCH, 4)
        bcnt = blk[..., 0]
        bd2c = min_d2cnt(blk[..., 1:4], bcnt)
        bev = ev_ok[:, None] & (bcnt > 0.0) & (bd2c > maxd2 * bcnt * bcnt)

        # zero evicted child rows via a compacted address list (bounded
        # by ch_cap; the per-parent decrement matches exactly what was
        # zeroed, so deferred children evict next update)
        bev_flat = bev.reshape(-1)
        kept_flat = bev_flat & (jnp.cumsum(bev_flat.astype(jnp.int32))
                                <= ch_cap)
        kept = kept_flat.reshape(evict_list, NCH)
        ch_idx, _ = _compact(kept_flat, ch_cap)
        ch_ok = ch_idx >= 0
        ch_addr = ev_rows[jnp.clip(ch_idx, 0, evict_list * NCH - 1)]
        l0_data = _zero_child_rows(l0_data, ch_addr, ch_ok)
        n_per_par = jnp.sum(kept.astype(jnp.int32), axis=1)
        l1_meta = l1_meta.at[jnp.where(ev_ok, evp, c1), 2].add(
            -n_per_par, mode="drop", unique_indices=True)
        n_l0 = n_l0 - jnp.sum(kept_flat.astype(jnp.int32))
        evpar = jnp.where(ev_ok & (n_per_par > 0), evp, -1)
        return l0_data, l1_meta, n_l0, evpar

    def no_evict(args):
        l0_data, l1_meta, n_l0 = args
        return (l0_data, l1_meta, n_l0,
                jnp.full((evict_list,), -1, jnp.int32))

    if evict_enabled is None:
        l0_data, l1_meta, n_l0, evpar = evict_stage(
            (l0_data, l1_meta, n_l0))
    else:
        # the gate skips even the full-table candidate scan
        l0_data, l1_meta, n_l0, evpar = jax.lax.cond(
            jnp.asarray(evict_enabled, bool), evict_stage, no_evict,
            (l0_data, l1_meta, n_l0))

    # ---- Step 2: keys of the incoming points ----
    inv = 1.0 / voxel_size
    pcoords = K.voxel_coords(new_pts, inv)
    par_c = jnp.floor_divide(pcoords, hierarchy_factor)
    ch_off = _child_offset_of(pcoords)
    phi, plo = K.pack_key(par_c)
    phi = jnp.where(new_mask, phi, K.INVALID_HI)
    plo = jnp.where(new_mask, plo, K.INVALID_LO)
    khi, klo = K.pack_key(pcoords)
    khi = jnp.where(new_mask, khi, K.INVALID_HI)
    klo = jnp.where(new_mask, klo, K.INVALID_LO)

    find0 = _bucket_find(l1_index, phi, plo)

    # one-per-voxel leaders (dedupe by L0 key; slot-independent)
    idx = jnp.arange(p, dtype=jnp.int32)
    s_hi, s_lo, s_idx = jax.lax.sort((khi, klo, idx), num_keys=2)
    firstk = jnp.concatenate([jnp.ones((1,), bool),
                              ~((s_hi[1:] == s_hi[:-1]) & (s_lo[1:] == s_lo[:-1]))])
    valid_s = new_mask[s_idx]
    firstv = firstk & valid_s
    leader = jnp.zeros((p,), bool).at[s_idx].set(
        firstv, unique_indices=True)

    # per-voxel [count | sum xyz] totals (sorted segment-sum over the
    # key-sorted order; exact per group, unlike a long prefix-sum
    # difference) — the whole accumulation then lands as ONE unique row
    # scatter-add instead of four sort-backed column scatter-adds
    pts_s = jnp.where(valid_s[:, None], new_pts[s_idx], 0.0)
    data4 = jnp.concatenate([valid_s.astype(f32)[:, None], pts_s], axis=1)
    gix = jnp.cumsum(firstk.astype(jnp.int32)) - 1    # monotonic group ids
    seg4 = jax.ops.segment_sum(data4, gix, num_segments=p,
                               indices_are_sorted=True)
    tot4 = seg4[gix]                  # group totals; valid at leaders

    # pre-insert occupancy: for points whose parent exists, gather the
    # child row count (post-eviction); fresh parents have all-zero rows
    # by the store invariant, so their children are new by definition.
    slot0, hit0 = find0[0], find0[1]
    addr0 = jnp.clip(slot0, 0, c1 - 1) * NCH + ch_off
    pre_cnt = jnp.where(hit0 & new_mask, l0_data[addr0, 0], 0.0)
    is_new_voxel = leader & (pre_cnt == 0.0)
    n_new = jnp.sum(is_new_voxel.astype(jnp.int32))
    # POINTS whose parent cell is missing from the index: _resolve_parents
    # compacts exactly these to cap2 and points beyond the cap are DROPPED,
    # so the small tier also requires n_unresolved <= its cap (new voxels
    # per parent can exceed 1, so n_new alone under-counts).
    n_unres = jnp.sum((new_mask & ~hit0).astype(jnp.int32))

    def tier(new_cap: int, aff_cap: int, r_cap: int, resolve_cap: int = 0):
        resolve = resolve_cap or new_cap

        def run(args):
            (l0_data, l1_index, l1_meta, l1_last, l1_surfel,
             l1_free, l1_top, n_l0, n_dropped) = args

            # ---- Step 3: resolve-or-alloc parent slots for all points
            # (AddPoint + RegisterToParent, VoxelMap.cpp:77-120).
            # resolve_cap sizes the unresolved-POINT compaction (points
            # past it are dropped) independently of the new-child caps.
            # ----
            l1_index, l1_meta, l1_top, pslot, l1_new_c, _ = _resolve_parents(
                l1_index, l1_meta, l1_free, l1_top, phi, plo, new_mask,
                cap2=resolve, find0=find0)
            placed = new_mask & (pslot >= 0)

            # ---- Step 4: accumulate — ONE unique row scatter-add of the
            # per-voxel totals at leader addresses ----
            placed_s = placed[s_idx]
            pslot_s = pslot[s_idx]
            off_s = ch_off[s_idx]
            lead_ok = firstk & placed_s
            tgt = jnp.where(lead_ok, pslot_s * NCH + off_s, nrows)
            l0_data = l0_data.at[tgt].add(tot4, mode="drop",
                                          unique_indices=True)

            # ---- Step 5: new children (count increments land after the
            # compaction below — duplicates per parent make them the one
            # legitimately sort-backed scatter, at new_cap size) ----
            new_child = is_new_voxel & placed
            n_l0 = n_l0 + jnp.sum(new_child.astype(jnp.int32))
            n_dropped = n_dropped + jnp.sum(
                (is_new_voxel & ~placed).astype(jnp.int32))

            # ---- Step 6: affected set = new-child parents + evicted
            # parents, deduped by sort (VoxelMap.cpp:161-185) ----
            new_idx, n_newc = _compact(new_child, new_cap)
            n_dropped = n_dropped + jnp.maximum(n_newc - new_cap, 0)
            new_ok = new_idx >= 0
            ni = jnp.clip(new_idx, 0, p - 1)
            l1_meta = l1_meta.at[
                jnp.where(new_ok, pslot[ni], c1), 2].add(1, mode="drop")
            cand_slot = jnp.concatenate(
                [jnp.where(new_ok, pslot[ni], c1),
                 jnp.where(evpar >= 0, evpar, c1)])
            cand_new = jnp.concatenate([jnp.ones((new_cap,), bool),
                                        jnp.zeros((evict_list,), bool)])
            m2 = cand_slot.shape[0]
            # sort by (slot, ~is_new) so each group's leader carries is_new
            skey2 = cand_slot * 2 + (1 - cand_new.astype(jnp.int32))
            s2, si2 = jax.lax.sort(
                (skey2, jnp.arange(m2, dtype=jnp.int32)), num_keys=1)
            s_slot = s2 >> 1
            lead2 = jnp.concatenate([jnp.ones((1,), bool),
                                     s_slot[1:] != s_slot[:-1]]) & (s_slot < c1)
            lead_pos, n_aff = _compact(lead2, aff_cap)
            # affected parents beyond the cap keep their child counts but
            # lose the surfel recompute — make the truncation VISIBLE
            # (and sized away in the bulk tier: a silently-capped first
            # update left whole regions surfel-less)
            n_dropped = n_dropped + jnp.maximum(n_aff - aff_cap, 0)
            aff_ok = lead_pos >= 0
            lp = jnp.clip(lead_pos, 0, m2 - 1)
            aff_slot = jnp.where(aff_ok, s_slot[lp], -1)
            aff_new = jnp.where(aff_ok, (s2[lp] & 1) == 0, False)

            # ---- Step 7: surfel decisions from the INCREMENTAL child
            # counter; child blocks gathered ONLY for recomputing cells
            # (VoxelMap.cpp:187-261, count-change skip at :203) ----
            aff_c = jnp.clip(aff_slot, 0, c1 - 1)
            cnt = jnp.where(aff_ok, l1_meta[aff_c, 2], 0)
            prev_has = aff_ok & (l1_surfel[aff_c, 7] > 0.5)
            prev_last = l1_last[aff_c]

            if compute_surfels:
                enough = cnt >= MIN_OCCUPIED_CHILDREN
                skip = prev_has & (prev_last == cnt)      # VoxelMap.cpp:203
                recompute = aff_new & aff_ok & enough & ~skip

                r_pos, n_rec = _compact(recompute, r_cap)
                n_dropped = n_dropped + jnp.maximum(n_rec - r_cap, 0)
                r_ok = r_pos >= 0
                rp = jnp.clip(r_pos, 0, aff_cap - 1)
                r_slot = jnp.where(r_ok, aff_slot[rp], -1)
                # size-picked gather lowering (see do_evict)
                if c1 <= _VIEW_GATHER_MAX_C1:
                    rblk = l0_data.reshape(c1, NCH * 4)[
                        jnp.clip(r_slot, 0, c1 - 1)].reshape(r_cap, NCH, 4)
                else:
                    r_rows = (jnp.clip(r_slot, 0, c1 - 1)[:, None] * NCH
                              + jnp.arange(NCH, dtype=jnp.int32)[None, :])
                    rblk = l0_data[r_rows.reshape(-1)].reshape(
                        r_cap, NCH, 4)
                rblk = jnp.where(r_ok[:, None, None], rblk, 0.0)
                _rcnt, mean, cov, kids_ok = _block_stats(rblk)
                lam, normal = eigh3.eigh3(cov)
                plan = lam[:, 0] / (lam[:, 2] + 1e-6)
                r_non_planar = r_ok & (plan > planarity_threshold)
                # bound deletions so every freed child is fully processed
                npr = jnp.cumsum(r_non_planar.astype(jnp.int32)) - 1
                r_defer = r_non_planar & (npr >= (NCH * r_cap) // NCH // 8)
                r_non_planar = r_non_planar & ~r_defer
                r_use = r_ok & ~r_non_planar & ~r_defer

                # map R verdicts back onto the affected list by RANK
                # GATHER, not scatter: _compact is order-preserving, so
                # the r-list position of affected row j is its prefix
                # rank among recompute rows (a bool scatter here lowered
                # to a ~0.7 us/row serial loop on v5e — the single
                # hottest op of the steady S=8 update trace)
                r_rank = jnp.cumsum(recompute.astype(jnp.int32)) - 1
                in_r = recompute & (r_rank < r_cap)
                rr = jnp.clip(r_rank, 0, r_cap - 1)
                non_planar = in_r & (r_non_planar.astype(jnp.int32)[rr] > 0)
                use_new = in_r & (r_use.astype(jnp.int32)[rr] > 0)
                has_out = jnp.where(aff_new,
                                    jnp.where(enough, skip | use_new, False),
                                    prev_has & enough)

                cnt_post = jnp.where(non_planar, 0, cnt)
                freed = aff_ok & (cnt_post == 0)

                # ---- non-planar deletion (VoxelMap.cpp:244-253):
                # zero all live children of deleted cells (bounded,
                # unconditional masked writes) ----
                delk = kids_ok & r_non_planar[:, None]
                dk_list, _ = _compact(delk.reshape(-1), NCH * (r_cap // 8))
                dk_ok = dk_list >= 0
                dki = jnp.clip(dk_list, 0, r_cap * NCH - 1)
                dk_par = jnp.where(dk_ok, r_slot[dki // NCH], c1)
                dk_addr = jnp.clip(dk_par, 0, c1 - 1) * NCH + (dki % NCH)
                l0_data = _zero_child_rows(
                    l0_data, dk_addr, dk_ok & (dk_par < c1))
                n_l0 = n_l0 - jnp.sum(
                    (dk_ok & (dk_par < c1)).astype(jnp.int32))
                dtgt = jnp.where(r_non_planar, r_slot, c1)
                l1_meta = l1_meta.at[dtgt, 2].set(0, mode="drop",
                                                  unique_indices=True)

                # free emptied L1 cells (deletion or eviction)
                fslot = jnp.where(freed, aff_slot, c1)
                fc = jnp.clip(fslot, 0, c1 - 1)
                l1_index = _erase_cells(l1_index, l1_meta[fc, 3], freed)
                l1_meta = l1_meta.at[fslot, 0].set(
                    INVALID_I32, mode="drop", unique_indices=True)
                l1_meta = l1_meta.at[fslot, 1].set(
                    INVALID_I32, mode="drop", unique_indices=True)
                frank = jnp.cumsum(freed.astype(jnp.int32)) - 1
                l1_free = l1_free.at[
                    jnp.where(freed, l1_top + frank, c1)].set(
                    jnp.where(freed, aff_slot, -1), mode="drop",
                    unique_indices=True)
                l1_top = l1_top + jnp.sum(freed.astype(jnp.int32))
                cnt = cnt_post
                has_out = has_out & ~non_planar
            else:
                r_slot = jnp.full((r_cap,), -1, jnp.int32)
                r_use = jnp.zeros((r_cap,), bool)
                normal = jnp.zeros((r_cap, 3), f32)
                mean = jnp.zeros((r_cap, 3), f32)
                plan = jnp.ones((r_cap,), f32)
                use_new = jnp.zeros((aff_cap,), bool)
                has_out = jnp.zeros((aff_cap,), bool)

                # still free cells emptied by eviction
                freed = aff_ok & (cnt == 0)
                fslot = jnp.where(freed, aff_slot, c1)
                fc = jnp.clip(fslot, 0, c1 - 1)
                l1_index = _erase_cells(l1_index, l1_meta[fc, 3], freed)
                l1_meta = l1_meta.at[fslot, 0].set(
                    INVALID_I32, mode="drop", unique_indices=True)
                l1_meta = l1_meta.at[fslot, 1].set(
                    INVALID_I32, mode="drop", unique_indices=True)
                frank = jnp.cumsum(freed.astype(jnp.int32)) - 1
                l1_free = l1_free.at[
                    jnp.where(freed, l1_top + frank, c1)].set(
                    jnp.where(freed, aff_slot, -1), mode="drop",
                    unique_indices=True)
                l1_top = l1_top + jnp.sum(freed.astype(jnp.int32))

            # ---- write back: new surfel payloads at recomputing cells,
            # has flags over the whole affected list ----
            # FULL 8-wide rows: a partial-row (1,7) scatter lowers to a
            # serial while loop (one dynamic-update-slice per row, ~4 us
            # each — it WAS the entire update budget); full-row and
            # single-column scatters both vectorize. r_use cells all have
            # has=1 (use_new implies has_out), and the column-7 pass
            # afterwards rewrites the same value consistently.
            wr = jnp.where(r_use, jnp.clip(r_slot, 0, c1 - 1), c1)
            srows = jnp.concatenate(
                [normal, mean, plan[:, None],
                 jnp.ones((normal.shape[0], 1), f32)], axis=-1)
            l1_surfel = l1_surfel.at[wr].set(
                srows, mode="drop", unique_indices=True)
            wslot = jnp.where(aff_ok, aff_slot, c1)
            l1_surfel = l1_surfel.at[wslot, 7].set(
                has_out.astype(f32), mode="drop", unique_indices=True)
            l1_last = l1_last.at[jnp.where(use_new, wslot, c1)].set(
                cnt, mode="drop", unique_indices=True)

            return (l0_data, l1_index, l1_meta, l1_last, l1_surfel,
                    l1_free, l1_top, n_l0, n_dropped)
        return run

    args = (l0_data, l1_index, l1_meta, state.l1_last, state.l1_surfel,
            l1_free, l1_top, n_l0, state.n_dropped)
    # Four size tiers (branch picked by the EXACT per-update counts, so
    # the steady state pays the smallest legal program):
    #   revisit — n_new and n_unresolved both <= 64 (keyframe over
    #            already-mapped territory: the dominant case on looping
    #            trajectories and the per-shard steady state);
    #   small  — n_new and n_unresolved both fit small_cap (typical
    #            steady keyframe);
    #   middle — identical caps but a 2x resolve compaction: keyframes
    #            whose fresh voxels cluster >1 point/parent flip here
    #            instead of to bulk (measured 3.1 ms vs 1.6 ms per
    #            keyframe on v5e — and widening small's resolve cap for
    #            everyone cost 30 fps, so the widening is its own tier);
    #   bulk   — first keyframes / teleports: full-size caps.
    # Caps never exceed what the input size can produce: at most p new
    # voxels, at most p + evict_list affected parents — so small scans
    # (e.g. O(scan/S) per-shard buffers in the sharded map) get
    # proportionally small update programs instead of paying the
    # full-scan tier constants.
    sc = min(small_cap, p)
    resolve_mid = min(2 * small_cap, p)
    r_small = max(min(small_cap * 3 // 8, p), 8)
    # Revisit tier: a keyframe over already-mapped territory creates at
    # most a handful of new voxels, but the small tier still pays its
    # FULL cap-sized claim/compaction/verdict machinery for them — at
    # per-shard shapes that machinery was most of the update. Tier R
    # caps novelty at 64 new children / unresolved points; its affected
    # list still covers every evicted parent (64 + evict_list), so
    # nothing is deferred that the small tier would have handled.
    t_cap = min(64, sc)
    aff_rev = min(t_cap + evict_list, c1)
    r_rev = t_cap
    branch = jnp.where(
        (n_new <= t_cap) & (n_unres <= t_cap), 0,
        jnp.where(
            (n_new <= sc) & (n_unres <= sc), 1,
            jnp.where((n_new <= sc) & (n_unres <= resolve_mid), 2, 3)))
    # Bulk-tier affected/recompute caps scale with p itself (bounded by
    # c1): a first keyframe can make EVERY point a new child of a new
    # parent, and capping the affected list at the steady-state constant
    # left whole regions without surfels on large batched inserts (the
    # blocked multi-sequence runner inserts block*B keyframes at once).
    aff_bulk = min(p + evict_list, c1)
    r_bulk = min(p, c1)
    (l0_data, l1_index, l1_meta, l1_last, l1_surfel, l1_free, l1_top,
     n_l0, n_dropped) = jax.lax.switch(
        branch,
        [tier(t_cap, aff_rev, r_rev),
         tier(sc, sc, r_small),
         tier(sc, sc, r_small, resolve_cap=resolve_mid),
         tier(p, aff_bulk, r_bulk, resolve_cap=p)],
        args)

    return VoxelMapState(
        l0_data=l0_data, l1_index=l1_index, l1_meta=l1_meta,
        l1_last=l1_last, l1_surfel=l1_surfel, l1_free=l1_free,
        l1_free_top=l1_top, n_l0=n_l0, n_l1=jnp.int32(c1) - l1_top,
        n_dropped=n_dropped)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

# XLA:TPU lowers row gathers from (rows, 8) f32 tables in a band of
# table sizes around 2^18 rows to a ~2x-slower strategy: measured on v5e
# with a built map and 90112 queries, the surfel-payload gather costs
# 1.42 ms at 262144 or 278528 rows vs ~0.70 ms at 131072, 327680 or
# 524288 rows — identical op, only the operand row count differs, and
# no index-side change (barrier / sort / split) affects it. Padding the
# gather OPERAND past the band (a ~2 MB concat inside the program,
# ~20 us) restores the fast lowering. This is exactly the dense-S=2
# sharded configuration (c1_total 524288 / 2 shards), the round-4
# SCALING.json S=2 anomaly.
_GATHER_BAD_LO, _GATHER_BAD_HI = 196608, 327680


def _degather_pad(table: jax.Array) -> jax.Array:
    rows = table.shape[0]
    if _GATHER_BAD_LO <= rows < _GATHER_BAD_HI:
        pad = _GATHER_BAD_HI - rows
        return jnp.concatenate(
            [table, jnp.zeros((pad,) + table.shape[1:], table.dtype)])
    return table


@partial(jax.jit, static_argnames=("hierarchy_factor",))
def lookup_surfels(state: VoxelMapState, pts: jax.Array, *, voxel_size,
                   hierarchy_factor: int = 3):
    """Batched surfel query (reference GetSurfelAtPoint,
    VoxelMap.cpp:368-386): ONE bucket gather + ONE payload row gather.
    Returns (normal (N,3), centroid (N,3), valid (N,))."""
    inv = 1.0 / (voxel_size * hierarchy_factor)
    coords = K.voxel_coords(pts, inv)
    qhi, qlo = K.pack_key(coords)
    slot, hit, _, _ = _bucket_find(state.l1_index, qhi, qlo)
    c1 = state.l1_meta.shape[0]
    row = _degather_pad(state.l1_surfel)[jnp.clip(slot, 0, c1 - 1)]
    valid = hit & (row[:, 7] > 0.5)
    return row[:, 0:3], row[:, 3:6], valid


@partial(jax.jit, static_argnames=("hierarchy_factor", "radius"))
def grid_knn_neighbors(state: VoxelMapState, pts: jax.Array, *, voxel_size,
                       hierarchy_factor: int = 3, radius: int = 1):
    """L0 centroids of each query's voxel neighborhood (KD-tree-mode
    candidates, replacing nanoflann 5-NN,
    IterativeClosestPointOptimizer.cpp:696-703). radius=1 probes the
    3x3x3 cube (27 candidates), radius=2 the 5x5x5 cube (125 — the
    reference's UNBOUNDED tree search finds 5-NN at any distance; on
    sparse/grazing geometry the 27-cube often has <5 occupied voxels,
    dropping the correspondence entirely).

    The (2r+1)^3 neighbor voxels share at most ceil((2r+1)/h)+... far
    fewer DISTINCT parents — 8 at radius 1, 27 at radius 2 — so the hash
    index is probed once per distinct parent and each neighbor voxel
    maps to its parent's probe by local index. The naive one-probe-per-
    voxel version gathered 125 full bucket rows per point per ICP
    iteration (the dominant cost of KD-tree mode, round-4 VERDICT weak
    item 5); this cuts index-gather traffic 4.6x at radius 2.
    Returns (neighbors (N, K, 3), valid (N, K))."""
    h = hierarchy_factor
    inv = 1.0 / voxel_size
    qc = K.voxel_coords(pts, inv)
    n = qc.shape[0]
    if radius == 1:
        offs = jnp.asarray(_NB_OFFS)
    else:
        r = np.arange(-radius, radius + 1)
        offs = jnp.asarray(np.stack(
            np.meshgrid(r, r, r, indexing="ij"),
            axis=-1).reshape(-1, 3).astype(np.int32))
    m = offs.shape[0]

    # distinct-parent probe window: parents of [qc-r, qc+r] span at most
    # floor(2r/h)+2 consecutive values per axis
    span = (2 * radius) // h + 2
    pq = jnp.floor_divide(qc, h)                        # (N, 3)
    lo_par = jnp.floor_divide(qc - radius, h)           # (N, 3)
    pr = np.arange(span, dtype=np.int32)
    poffs = jnp.asarray(np.stack(
        np.meshgrid(pr, pr, pr, indexing="ij"),
        axis=-1).reshape(-1, 3))                        # (S^3, 3)
    s3 = poffs.shape[0]
    pcoords = lo_par[:, None, :] + poffs[None, :, :]    # (N, S^3, 3)
    phi, plo = K.pack_key(pcoords)
    pslot, phit, _, _ = _bucket_find(state.l1_index, phi.reshape(-1),
                                     plo.reshape(-1))
    pslot = pslot.reshape(n, s3)
    phit = phit.reshape(n, s3)

    # Per-neighbor parent + child indices WITHOUT big-tensor integer
    # division: TPUs have no hardware int div, and floor_divide over the
    # (N, M, 3) neighbor tensor was ~75% of this whole query's device
    # time (measured 38 of 52 ms). With v = (qc mod h) + off in
    # [-r, h-1+r], the parent hop is d = -1/0/+1 by comparison and the
    # child offset is v - h*d — all vector selects; the only divisions
    # left are on the (N, 3) per-point coords.
    qm = qc - pq * h                                    # (N, 3) in [0, h)
    v = qm[:, None, :] + offs[None, :, :]               # (N, M, 3)
    d = jnp.where(v < 0, -1, jnp.where(v >= h, 1, 0))
    cloc = v - d * h                                    # child in [0, h)
    base = pq - lo_par                                  # (N, 3) in [0, span)
    rel = base[:, None, :] + d
    pidx = (rel[..., 0] * span + rel[..., 1]) * span + rel[..., 2]
    # neighbor -> parent-probe mapping as a one-hot MXU contraction:
    # jnp.take_along_axis (a batched (N, M) gather over (N, S^3)) lowers
    # to a slow path on TPU — measured 40 of the query's 52 ms; the
    # one-hot einsum runs on the systolic array in ~2 ms
    oh = jax.nn.one_hot(pidx, s3, dtype=jnp.float32)    # (N, M, S^3)
    slot = jnp.einsum("nmk,nk->nm", oh,
                      pslot.astype(jnp.float32)).astype(jnp.int32)
    hit = jnp.einsum("nmk,nk->nm", oh,
                     phit.astype(jnp.float32)) > 0.5

    off_c = (cloc[..., 0] * h + cloc[..., 1]) * h + cloc[..., 2]
    c1 = state.l1_meta.shape[0]
    addr = (jnp.clip(slot, 0, c1 - 1) * NCH + off_c).reshape(-1)
    data = state.l0_data[addr]
    ok = hit & (data[:, 0].reshape(n, m) > 0.0)
    cen = (data[:, 1:4] / jnp.maximum(data[:, 0:1], 1.0)).reshape(n, m, 3)
    return cen, ok


def l0_points(state: VoxelMapState):
    """All L0 centroids + validity mask (reference GetPointCloud,
    VoxelMap.cpp:388-403)."""
    valid = state.l0_data[:, 0] > 0.0
    centroid = state.l0_data[:, 1:4] / jnp.maximum(state.l0_data[:, 0], 1.0)[:, None]
    return centroid, valid


def l0_records(state: VoxelMapState):
    """All live L0 voxels as records: (key_hi, key_lo, count, centroid,
    live), each (C1*27,)-shaped. Child voxel coords are derived from the
    parent key + child offset (the v5 store keeps no per-child keys)."""
    c1 = state.l1_meta.shape[0]
    pc = K.unpack_key(
        jax.lax.bitcast_convert_type(state.l1_meta[:, 0], jnp.uint32),
        jax.lax.bitcast_convert_type(state.l1_meta[:, 1], jnp.uint32))
    coords = (pc[:, None, :] * 3 + jnp.asarray(_CHILD_OFFS)[None, :, :])
    hi, lo = K.pack_key(coords.reshape(-1, 3))
    cnt = state.l0_data[:, 0]
    live = (cnt > 0.0) & jnp.repeat(
        state.l1_meta[:, 0] != INVALID_I32, NCH)
    centroid = state.l0_data[:, 1:4] / jnp.maximum(cnt, 1.0)[:, None]
    return hi, lo, cnt, centroid, live


@partial(jax.jit, static_argnames=("hierarchy_factor",))
def voxel_occupied(state: VoxelMapState, pts: jax.Array, *, voxel_size,
                   hierarchy_factor: int = 3):
    """Whether each point's L0 voxel is live (test/diagnostic helper)."""
    inv = 1.0 / voxel_size
    coords = K.voxel_coords(pts, inv)
    par = jnp.floor_divide(coords, hierarchy_factor)
    off = _child_offset_of(coords)
    phi, plo = K.pack_key(par)
    slot, hit, _, _ = _bucket_find(state.l1_index, phi, plo)
    c1 = state.l1_meta.shape[0]
    addr = jnp.clip(slot, 0, c1 - 1) * NCH + off
    return hit & (state.l0_data[addr, 0] > 0.0)


def l1_surfels(state: VoxelMapState):
    """All cached L1 surfels: (normals (C1,3), centroids (C1,3),
    planarity (C1,), valid (C1,)) — the reference GetL1Surfels
    (VoxelMap.cpp:405-418), used by the viewer's surfel-disc rendering
    (PangolinViewer.h:131)."""
    s = state.l1_surfel
    valid = s[:, 7] > 0.0
    return s[:, 0:3], s[:, 3:6], s[:, 6], valid


# ---------------------------------------------------------------------------
# rehash (PGO correction)
# ---------------------------------------------------------------------------

def _bulk_index(keys_hi, keys_lo, live, n_buckets: int, slot_from_top: int):
    """Assign slots + bucket cells for a set of DISTINCT live keys
    (sort-based bulk build). Slots count down from slot_from_top-1 so the
    free stack stays the identity prefix. Returns (slot (N,), cellpos (N,),
    placed (N,))."""
    n = keys_hi.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    b = _hash_bucket(keys_hi, keys_lo, n_buckets - 1)
    bkey = jnp.where(live, b, jnp.int32(n_buckets))
    b_s, i_s = jax.lax.sort((bkey, idx), num_keys=1)
    first = jnp.concatenate([jnp.ones((1,), bool), b_s[1:] != b_s[:-1]])
    pos = jnp.arange(n, dtype=jnp.int32)
    start = jax.lax.cummax(jnp.where(first, pos, 0))
    cell_s = pos - start
    cell = jnp.zeros((n,), jnp.int32).at[i_s].set(cell_s)
    placed = live & (cell < BUCKET)
    rank = jnp.cumsum(placed.astype(jnp.int32)) - 1
    slot = jnp.where(placed & (rank < slot_from_top),
                     slot_from_top - 1 - rank, -1)
    placed = slot >= 0
    cellpos = jnp.where(placed, b * BUCKET + cell, -1)
    return slot, cellpos, placed


@partial(jax.jit, static_argnames=("hierarchy_factor",))
def transform_and_rehash(state: VoxelMapState, T: jax.Array, *, voxel_size,
                         planarity_threshold,
                         hierarchy_factor: int = 3) -> VoxelMapState:
    """PGO correction: transform every L0 centroid, re-key, merge
    collisions by weighted centroid, recompute ALL surfels (reference
    ApplyTransformAndRehash + RecomputeAllSurfels, VoxelMap.cpp:264-366).
    Rare op: sort-based bulk rebuild into a fresh map.

    Live records are COMPACTED to 4 children/parent-slot capacity before
    the rebuild: the child table has c1*27 rows but real maps occupy a
    few % of them, and every one of the ~15 indexed passes in bulk_build
    scales with the record count (the uncompacted rebuild measured
    276 ms per accepted loop on v5e — most of the loop-enabled
    throughput gap). Maps denser than 4 children/slot on average drop
    the excess VISIBLY into n_dropped."""
    c1 = state.l1_meta.shape[0]
    m = c1 * NCH
    cap = min(4 * c1, m)
    cnt = state.l0_data[:, 0]
    live = cnt > 0.0
    live_idx, n_live = _compact(live, cap)
    ok = live_idx >= 0
    li = jnp.clip(live_idx, 0, m - 1)
    rows = state.l0_data[li]
    c_cnt = jnp.where(ok, rows[:, 0], 0.0)
    c_cen = rows[:, 1:4] / jnp.maximum(c_cnt, 1.0)[:, None]
    R, t = T[:3, :3], T[:3, 3]
    new_centroid = c_cen @ R.T + t[None, :]
    return bulk_build(new_centroid, c_cnt, ok, cap, c1,
                      voxel_size=voxel_size,
                      planarity_threshold=planarity_threshold,
                      hierarchy_factor=hierarchy_factor,
                      n_dropped=state.n_dropped
                      + jnp.maximum(n_live - cap, 0))


@partial(jax.jit, static_argnames=("c0", "c1", "hierarchy_factor"))
def bulk_build(centroids: jax.Array, counts: jax.Array, live: jax.Array,
               c0: int, c1: int, *, voxel_size, planarity_threshold,
               hierarchy_factor: int = 3,
               n_dropped=jnp.int32(0)) -> VoxelMapState:
    """Build a fresh map from (M,) weighted centroid records: merge
    same-key records by weighted centroid (merge capacity c0), bulk-assign
    parent slots + bucket cells by sort, scatter children to their
    parent-relative rows, recompute all surfels. Used by
    transform_and_rehash and the sharded-map redistribution path."""
    m = counts.shape[0]
    f32 = jnp.float32
    cnt = jnp.where(live, counts, 0.0)

    inv = 1.0 / voxel_size
    coords = K.voxel_coords(centroids, inv)
    hi, lo = K.pack_key(coords)
    hi = jnp.where(live, hi, K.INVALID_HI)
    lo = jnp.where(live, lo, K.INVALID_LO)

    # merge same-key voxels: sort by key, segment-sum weighted centroids
    idx = jnp.arange(m, dtype=jnp.int32)
    s_hi, s_lo, s_idx = jax.lax.sort((hi, lo, idx), num_keys=2)
    s_live = live[s_idx]
    s_cnt = jnp.where(s_live, cnt[s_idx], 0.0)
    s_sum = jnp.where(s_live[:, None], centroids[s_idx] * s_cnt[:, None], 0.0)
    first = jnp.concatenate([jnp.ones((1,), bool),
                             ~((s_hi[1:] == s_hi[:-1]) & (s_lo[1:] == s_lo[:-1]))])
    first = first & s_live
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    nseg = seg[-1] + 1
    seg_t = jnp.where((seg >= 0) & (seg < c0) & s_live, seg, c0)
    m_cnt = jnp.zeros((c0,), f32).at[seg_t].add(s_cnt, mode="drop")
    m_sum = jnp.zeros((c0, 3), f32)
    for w in range(3):
        m_sum = m_sum.at[seg_t, w].add(s_sum[:, w], mode="drop")
    # representative key per segment
    m_hi = jnp.zeros((c0,), jnp.uint32).at[
        jnp.where(first, seg_t, c0)].max(s_hi, mode="drop", unique_indices=True)
    m_lo = jnp.zeros((c0,), jnp.uint32).at[
        jnp.where(first, seg_t, c0)].max(s_lo, mode="drop", unique_indices=True)
    m_live = jnp.arange(c0, dtype=jnp.int32) < jnp.minimum(nseg, c0)
    n_dropped = n_dropped + jnp.maximum(nseg - c0, 0)

    # ---- distinct parents of merged voxels -> bulk L1 index ----
    mcoords = K.unpack_key(m_hi, m_lo)
    par = jnp.floor_divide(mcoords, hierarchy_factor)
    par_hi, par_lo = K.pack_key(par)
    par_hi = jnp.where(m_live, par_hi, K.INVALID_HI)
    par_lo = jnp.where(m_live, par_lo, K.INVALID_LO)
    ps_hi, ps_lo, ps_idx = jax.lax.sort(
        (par_hi, par_lo, jnp.arange(c0, dtype=jnp.int32)), num_keys=2)
    ps_live = m_live[ps_idx]
    pfirst = jnp.concatenate([jnp.ones((1,), bool),
                              ~((ps_hi[1:] == ps_hi[:-1]) & (ps_lo[1:] == ps_lo[:-1]))])
    pfirst = pfirst & ps_live
    pseg = jnp.cumsum(pfirst.astype(jnp.int32)) - 1
    pseg_t = jnp.where((pseg >= 0) & (pseg < c1) & pfirst, pseg, c1)
    u_hi = jnp.zeros((c1,), jnp.uint32).at[pseg_t].max(ps_hi, mode="drop", unique_indices=True)
    u_lo = jnp.zeros((c1,), jnp.uint32).at[pseg_t].max(ps_lo, mode="drop", unique_indices=True)
    npar_u = pseg[-1] + 1
    u_live = jnp.arange(c1, dtype=jnp.int32) < jnp.minimum(npar_u, c1)
    slot1, cellpos1, placed1 = _bulk_index(
        jnp.where(u_live, u_hi, K.INVALID_HI),
        jnp.where(u_live, u_lo, K.INVALID_LO),
        u_live, _n_buckets(c1), c1)
    fresh = empty_map(0, c1)
    l1_index = _write_bulk(fresh.l1_index, slot1, cellpos1, placed1, u_hi, u_lo)
    st1 = jnp.where(placed1, slot1, c1)
    l1_meta = fresh.l1_meta
    l1_meta = l1_meta.at[st1, 0].set(
        jax.lax.bitcast_convert_type(u_hi, jnp.int32), mode="drop", unique_indices=True)
    l1_meta = l1_meta.at[st1, 1].set(
        jax.lax.bitcast_convert_type(u_lo, jnp.int32), mode="drop", unique_indices=True)
    l1_meta = l1_meta.at[st1, 3].set(cellpos1, mode="drop", unique_indices=True)

    # ---- scatter children into parent-relative rows ----
    pslot, phit, _, _ = _bucket_find(l1_index, par_hi, par_lo)
    placed0 = m_live & phit
    ch_off = _child_offset_of(mcoords)
    addr = jnp.where(placed0, jnp.clip(pslot, 0, c1 - 1) * NCH + ch_off,
                     c1 * NCH)
    l0_data = fresh.l0_data
    l0_data = l0_data.at[addr, 0].set(jnp.where(placed0, m_cnt, 0.0),
                                      mode="drop", unique_indices=True)
    for w in range(3):
        l0_data = l0_data.at[addr, w + 1].set(
            jnp.where(placed0, m_sum[:, w], 0.0), mode="drop", unique_indices=True)
    n0 = jnp.sum(placed0.astype(jnp.int32))
    n_dropped = n_dropped + jnp.sum((m_live & ~placed0).astype(jnp.int32))

    # ---- recompute ALL surfels (RecomputeAllSurfels, VoxelMap.cpp:304-366)
    occ = l1_meta[:, 0] != INVALID_I32
    blk = l0_data.reshape(c1, NCH, 4)
    ccnt, mean, cov, _ = _block_stats(blk)
    lam, normal = eigh3.eigh3(cov)
    plan = lam[:, 0] / (lam[:, 2] + 1e-6)
    has = occ & (ccnt >= MIN_OCCUPIED_CHILDREN) & (plan <= planarity_threshold)
    l1_surfel = jnp.concatenate(
        [normal, mean, plan[:, None], has.astype(f32)[:, None]], axis=-1)
    l1_meta = l1_meta.at[:, 2].set(jnp.where(occ, ccnt, l1_meta[:, 2]))
    n1 = jnp.sum(placed1.astype(jnp.int32))

    return VoxelMapState(
        l0_data=l0_data, l1_index=l1_index, l1_meta=l1_meta,
        l1_last=jnp.where(occ, ccnt, 0), l1_surfel=l1_surfel,
        l1_free=fresh.l1_free, l1_free_top=jnp.int32(c1) - n1,
        n_l0=n0, n_l1=n1, n_dropped=n_dropped)


def _write_bulk(index, slot, cellpos, placed, hi, lo):
    flat = index.reshape(-1)
    big = flat.shape[0]
    base = jnp.where(placed, (cellpos >> 3) * ROW + (cellpos & 7), big)
    flat = flat.at[base].set(slot, mode="drop", unique_indices=True)
    flat = flat.at[jnp.where(placed, base + BUCKET, big)].set(
        jax.lax.bitcast_convert_type(hi, jnp.int32), mode="drop", unique_indices=True)
    flat = flat.at[jnp.where(placed, base + 2 * BUCKET, big)].set(
        jax.lax.bitcast_convert_type(lo, jnp.int32), mode="drop", unique_indices=True)
    return flat.reshape(index.shape)
