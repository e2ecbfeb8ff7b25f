"""2-level hierarchical voxel surfel map — slot tables + compact hash
indices (TPU-native redesign of the reference VoxelMap,
reference src/database/VoxelMap.{h,cpp}).

Reference semantics preserved:
  * L0 leaf voxels hold a running centroid (kept as sum+count so parallel
    merges are exact) — VoxelMap.cpp:99-120.
  * L1 parents (hierarchy_factor=3 => 3x3x3 children, Estimator.cpp:79)
    cache a surfel (normal from PCA of child centroids, centroid,
    planarity = sigma2/sigma0) — VoxelMap.cpp:187-261; the reference's
    per-parent `occupied_children` set is a (C1, 27) child-slot array.
  * Per-keyframe update: radius eviction beyond max_distance
    (VoxelMap.cpp:146-158), point insertion, surfel recompute only for
    AFFECTED L1 cells; unchanged-child-count cells keep cached surfels
    (VoxelMap.cpp:203); non-planar affected cells are DELETED with their
    children (VoxelMap.cpp:244-253); eviction-only cells drop surfels
    below 5 children (UnregisterFromParent, VoxelMap.cpp:82-97).
  * O(1) surfel query (VoxelMap.cpp:368-386): bounded hash probe into a
    compact index + ONE packed row gather.
  * ApplyTransformAndRehash merges re-keyed centroids by weighted
    centroid and recomputes all surfels (VoxelMap.cpp:264-366).

Design (TPU, v3): measured gather throughput on TPU v5e falls ~7x once
tables exceed a few hundred thousand entries, so the voxel->slot index is
an open-addressing HASH table of 4x slot capacity (load <= 0.25, fixed
probe depth) rather than a dense spatial grid. Hot payloads are packed
into (C, 8) float32 rows ([normal|centroid|key]) so a lookup is: probe
gathers on small tables + 1 row gather. Updates are pure scatter
programs — leader election by scatter-min, free-slot allocation by
cumsum compaction, child registration into the (C1, 27) slot lists.

Staleness discipline: eviction/deletion NEVER touches the index — dead
cells are detected by key verification (freed slots carry INVALID keys)
and recycled by insertion (two-pass: find-existing across all probe
rounds, then claim the first dead-or-empty cell). Child lists verify each
entry's parent key, so slot reuse can never leak points across cells.
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
           "transform_and_rehash", "l0_points", "grid_knn_neighbors",
           "MIN_OCCUPIED_CHILDREN", "configure_grids"]

MIN_OCCUPIED_CHILDREN = 5  # reference VoxelMap.cpp:188

# Hash index sizing and fixed probe depth (insert and lookup MUST agree so
# every inserted key is findable). At INDEX_FACTOR=2 a FULL table probes at
# load 0.5 (miss ~6% worst case), but SLAM maps run the slot tables at
# ~30-50% occupancy, i.e. index load 0.15-0.25 (miss <1%); failed inserts
# drop the point (bounded, like every other capacity in this design). The
# index is also the largest per-frame cond-carried state, so smaller wins.
INDEX_FACTOR = 2
N_PROBES = 4
INSERT_RETRIES = 2

# Static caps for per-update candidate lists. AFFECTED_CAP must exceed
# the distinct parent cells of one scan insert (~5-6k for a fresh 16k-pt
# keyframe) — at 4096 early keyframes overflowed and lost surfels, which
# silently destroyed tracking.
AFFECTED_CAP = 8192
EVICT_CAP = 16384


def configure_grids(l0_dims=None, l1_dims=None):
    """Back-compat no-op (v2 used dense grids; v3 hash indices size
    themselves from slot capacities)."""
    del l0_dims, l1_dims


def _set_rows(tbl, idx, cols, mode="drop"):
    """Row scatter decomposed into per-column scatters: TPU XLA lowers
    multi-column row scatters to ~0.8 ms serial loops, while single-column
    (C,)-or-(C, W)-fixed-column scatters vectorize (~0.05 ms). `cols` is a
    list of (N,) columns."""
    for w, col in enumerate(cols):
        tbl = tbl.at[idx, w].set(col, mode=mode)
    return tbl


def _index_size(capacity: int) -> int:
    n = INDEX_FACTOR * capacity
    p = 1
    while p < n:
        p *= 2
    return p


def _hash_cell(hi: jax.Array, lo: jax.Array, mask: int, round_: int):
    """Multiplicative mixing of the packed key pair -> index cell; probe
    rounds use double hashing (odd step) to keep clusters short."""
    h = hi * jnp.uint32(0x9E3779B1) ^ lo * jnp.uint32(0x85EBCA77)
    h = (h ^ (h >> jnp.uint32(15))) * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(13))
    step = (lo * jnp.uint32(0x27D4EB2F)) | jnp.uint32(1)
    return ((h + jnp.uint32(round_) * step) & jnp.uint32(mask)).astype(jnp.int32)


_CHILD_OFFS = np.stack(np.meshgrid(*([np.arange(3)] * 3), indexing="ij"),
                       axis=-1).reshape(27, 3).astype(np.int32)
_NB_OFFS = _CHILD_OFFS - 1  # -1..1 cube for kNN


class VoxelMapState(NamedTuple):
    # L0 leaf slots (stable indices)
    l0_key: jax.Array       # (C0, 2) uint32 packed key (INVALID when free)
    l0_sum: jax.Array       # (C0, 3) f32 running point-sum
    l0_count: jax.Array     # (C0,) i32 — 0 marks a free slot
    l0_index: jax.Array     # (H0, 3) i32 [slot | key_hi | key_lo] — one
    #   row gather per probe round answers cell occupancy AND the key
    #   (keys bitcast to i32; the slot's uint32 key table stays the
    #   source of truth for dead-slot detection)
    n_l0: jax.Array         # () i32
    # L1 parent slots
    l1_key: jax.Array       # (C1, 2) uint32
    l1_surfel: jax.Array    # (C1, 8) f32 [normal(3) | centroid(3) |
    #   planarity | has_flag]. Keys must NOT be stored as bitcast floats:
    #   TPU float selects flush denormal/NaN bit patterns. The hash probe
    #   verifies keys from l1_key (uint32); col 7 > 0.5 marks a surfel.
    l1_planarity: jax.Array  # (C1,)
    l1_children: jax.Array  # (C1, 27) i32 child slot ids (-1 empty)
    l1_child_count: jax.Array  # (C1,) i32 (0 = free slot)
    l1_last_count: jax.Array   # (C1,) i32 last surfel-compute count
    l1_index: jax.Array     # (H1, 3) i32
    n_l1: jax.Array         # () i32


def empty_map(c0: int, c1: int) -> VoxelMapState:
    u = jnp.uint32
    inval = jnp.asarray([K.INVALID_HI, K.INVALID_LO], dtype=u)
    surfel = jnp.zeros((c1, 8), jnp.float32)
    return VoxelMapState(
        l0_key=jnp.broadcast_to(inval, (c0, 2)).copy(),
        l0_sum=jnp.zeros((c0, 3), jnp.float32),
        l0_count=jnp.zeros((c0,), jnp.int32),
        l0_index=jnp.full((_index_size(c0), 3), -1, jnp.int32),
        n_l0=jnp.int32(0),
        l1_key=jnp.broadcast_to(inval, (c1, 2)).copy(),
        l1_surfel=surfel,
        l1_planarity=jnp.ones((c1,), jnp.float32),
        l1_children=jnp.full((c1, 27), -1, jnp.int32),
        l1_child_count=jnp.zeros((c1,), jnp.int32),
        l1_last_count=jnp.zeros((c1,), jnp.int32),
        l1_index=jnp.full((_index_size(c1), 3), -1, jnp.int32),
        n_l1=jnp.int32(0),
    )


def _probe(index, key_tbl, qhi, qlo):
    """Find each query key's slot by fixed-depth double-hash probing.
    Index rows carry the key, so each round is ONE row gather; a final
    gather of the slot's key table entry rejects stale cells (the slot
    was freed/reused after the cell was written). Returns slot (N,)."""
    h1m = index.shape[0] - 1
    c = key_tbl.shape[0]
    n = qhi.shape[0]
    qh_i = jax.lax.bitcast_convert_type(qhi, jnp.int32)
    ql_i = jax.lax.bitcast_convert_type(qlo, jnp.int32)
    slot = jnp.full((n,), -1, jnp.int32)
    found = jnp.zeros((n,), bool)
    for r in range(N_PROBES):
        pos = _hash_cell(qhi, qlo, h1m, r)
        row = index[pos]
        ok = (row[:, 0] >= 0) & (row[:, 1] == qh_i) & (row[:, 2] == ql_i) & ~found
        slot = jnp.where(ok, row[:, 0], slot)
        found = found | ok
    k = key_tbl[jnp.clip(slot, 0, c - 1)]
    live = found & (k[:, 0] == qhi) & (k[:, 1] == qlo)
    return jnp.where(live, slot, -1)


def _insert_keys(index, key_tbl, slot_valid, qhi, qlo, cand_mask,
                 free_cap: int):
    """Resolve-or-allocate slots for candidate keys (AddPoint /
    RegisterToParent). Two-phase per retry: (1) full-depth probe for the
    existing key; (2) claim the first DEAD-or-empty index cell by
    scatter-min leader election (dead = cell's slot key is INVALID — how
    eviction/deletion recycle both cells and slots). Losers retry.
    Returns (index', key_tbl', slot (N,), newly_allocated (N,))."""
    h1m = index.shape[0] - 1
    c = key_tbl.shape[0]
    n = qhi.shape[0]
    idxs = jnp.arange(n, dtype=jnp.int32)
    BIG = jnp.iinfo(jnp.int32).max

    free_slots, n_free = _free_slot_list(slot_valid, free_cap)
    alloc_count = jnp.int32(0)
    qh_i = jax.lax.bitcast_convert_type(qhi, jnp.int32)
    ql_i = jax.lax.bitcast_convert_type(qlo, jnp.int32)
    slot = jnp.full((n,), -1, jnp.int32)
    resolved = ~cand_mask
    allocated = jnp.zeros((n,), bool)

    for _retry in range(INSERT_RETRIES):
        # fused scan over probe rounds: find the row matching this key AND
        # the first reusable cell (empty row, or row key marked INVALID)
        claim_pos = jnp.full((n,), -1, jnp.int32)
        hit_slot = jnp.full((n,), -1, jnp.int32)
        hit_found = jnp.zeros((n,), bool)
        for r in range(N_PROBES):
            pos = _hash_cell(qhi, qlo, h1m, r)
            row = index[pos]
            hit = (row[:, 0] >= 0) & (row[:, 1] == qh_i) & (row[:, 2] == ql_i) \
                & ~hit_found
            hit_slot = jnp.where(hit, row[:, 0], hit_slot)
            hit_found = hit_found | hit
            reusable = row[:, 0] < 0
            claim_pos = jnp.where(reusable & (claim_pos < 0), pos, claim_pos)
            # a row whose key matches but whose slot died IS this key's
            # reusable home (same probe sequence) — claim it
            claim_pos = jnp.where(hit & (claim_pos < 0), pos, claim_pos)

        # liveness check: the row's slot must still hold this key (slots
        # recycle; rows do not). Dead hits fall through to the claim.
        hs_c = jnp.clip(hit_slot, 0, c - 1)
        k = key_tbl[hs_c]
        live = hit_found & (k[:, 0] == qhi) & (k[:, 1] == qlo) & ~resolved
        slot = jnp.where(live, hit_slot, slot)
        resolved = resolved | live

        want = ~resolved & (claim_pos >= 0)
        marker = jnp.full((index.shape[0],), BIG, jnp.int32)
        marker = marker.at[jnp.where(want, claim_pos, index.shape[0])].min(
            idxs, mode="drop")
        leader = want & (marker[jnp.clip(claim_pos, 0, index.shape[0] - 1)] == idxs)
        lead_rank = jnp.cumsum(leader.astype(jnp.int32)) - 1 + alloc_count
        can = leader & (lead_rank < n_free) & (lead_rank < free_cap)
        new_slot = jnp.where(can, free_slots[jnp.clip(lead_rank, 0, free_cap - 1)], -1)
        tgt = jnp.where(can, new_slot, c)
        key_tbl = _set_rows(key_tbl, tgt, [qhi, qlo])
        ipos = jnp.where(can, claim_pos, index.shape[0])
        index = _set_rows(index, ipos, [new_slot, qh_i, ql_i])
        alloc_count = alloc_count + jnp.sum(can.astype(jnp.int32))
        slot = jnp.where(can, new_slot, slot)
        resolved = resolved | can
        allocated = allocated | can

        # same-cell recheck: duplicates of a just-allocated key re-read the
        # cell they contended for and resolve immediately
        cp_c = jnp.clip(claim_pos, 0, index.shape[0] - 1)
        row2 = index[cp_c]
        hit2 = (claim_pos >= 0) & (row2[:, 0] >= 0) \
            & (row2[:, 1] == qh_i) & (row2[:, 2] == ql_i) & ~resolved
        slot = jnp.where(hit2, row2[:, 0], slot)
        resolved = resolved | hit2

    return index, key_tbl, slot, allocated


def _free_slot_list(valid: jax.Array, cap_out: int):
    c = valid.shape[0]
    free = ~valid
    rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    out = jnp.full((cap_out,), -1, jnp.int32)
    pos = jnp.where(free & (rank < cap_out), rank, cap_out - 1)
    out = out.at[pos].max(jnp.where(free & (rank < cap_out),
                                    jnp.arange(c, dtype=jnp.int32), -1),
                          mode="drop")
    return out, jnp.sum(free.astype(jnp.int32))


def _compact_mask(mask: jax.Array, cap: int):
    """Compact the True positions of `mask` into a (cap,) index list."""
    n = mask.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    keep = mask & (rank < cap)
    out = jnp.full((cap,), -1, jnp.int32)
    pos = jnp.where(keep, rank, cap - 1)
    out = out.at[pos].max(jnp.where(keep, jnp.arange(n, dtype=jnp.int32), -1),
                          mode="drop")
    return out, jnp.minimum(jnp.sum(mask.astype(jnp.int32)), cap)


def _child_offset_of(coords: jax.Array) -> jax.Array:
    """Position of an L0 voxel inside its 3x3x3 parent (0..26), floor-mod."""
    m = coords - 3 * jnp.floor_divide(coords, 3)
    return (m[..., 0] * 3 + m[..., 1]) * 3 + m[..., 2]


def _surfel_stats_from_children(l0_key, l0_sum, l0_count, l1_children,
                                cell_key, aff_slot, aff_ok,
                                hierarchy_factor: int):
    """Gather the (A, 27) child slots of the given L1 slots and compute
    (count, mean, cov) over their centroids (reference VoxelMap.cpp:207-236).
    Every child entry is verified: its key's parent must equal the cell's
    key (slot reuse can leave stale entries; this makes them inert)."""
    c0 = l0_count.shape[0]
    kids = l1_children[jnp.clip(aff_slot, 0, l1_children.shape[0] - 1)]
    kids = jnp.where(aff_ok[:, None], kids, -1)
    kc = jnp.clip(kids, 0, c0 - 1)
    ck = l0_key[kc]                      # (A, 27, 2)
    ccoords = K.unpack_key(ck[..., 0], ck[..., 1])
    cpar = K.parent_coords(ccoords, hierarchy_factor)
    cphi, cplo = K.pack_key(cpar)
    ok = (kids >= 0) & (l0_count[kc] > 0) \
        & (cphi == cell_key[:, None, 0]) & (cplo == cell_key[:, None, 1])
    cnt = jnp.sum(ok.astype(jnp.int32), axis=1)
    cen = l0_sum[kc] / jnp.maximum(l0_count[kc], 1)[..., None].astype(jnp.float32)
    w = ok.astype(jnp.float32)[..., None]
    s1 = jnp.sum(cen * w, axis=1)
    mean = s1 / jnp.maximum(cnt, 1)[:, None].astype(jnp.float32)
    d = (cen - mean[:, None, :]) * w
    cov = jnp.einsum("aky,akz->ayz", d, d) / jnp.maximum(cnt, 1)[:, None, None].astype(jnp.float32)
    return cnt, mean, cov, kids, ok


@partial(jax.jit, static_argnames=("hierarchy_factor", "compute_surfels"))
def update_map(state: VoxelMapState, new_pts: jax.Array, new_mask: jax.Array,
               sensor_pos: jax.Array, max_distance, *, voxel_size,
               planarity_threshold, hierarchy_factor: int = 3,
               compute_surfels: bool = True) -> VoxelMapState:
    """Per-keyframe map update (reference VoxelMap::UpdateVoxelMap,
    VoxelMap.cpp:128-262) as a sort-free scatter program."""
    c0 = state.l0_count.shape[0]
    c1 = state.l1_child_count.shape[0]
    f32 = jnp.float32
    p = new_pts.shape[0]
    INVAL = jnp.asarray([K.INVALID_HI, K.INVALID_LO], jnp.uint32)

    # ---- Step 1: radius eviction (VoxelMap.cpp:146-158) ----
    centroid = state.l0_sum / jnp.maximum(state.l0_count, 1)[:, None].astype(f32)
    valid0 = state.l0_count > 0
    dist_sq = jnp.sum((centroid - sensor_pos[None, :]) ** 2, axis=-1)
    evict = valid0 & (dist_sq > max_distance * max_distance)
    keep = valid0 & ~evict

    # evicted voxels leave their parents' child lists (the parents appear
    # in the affected set below so their counts/surfels refresh). The whole
    # path is skipped when nothing evicts (scalar cond — common when the
    # sensor barely moved since the last keyframe).
    # cheap vector-masking of the evicted slots runs unconditionally (a
    # where over the tables costs ~0.05 ms; cond-copying them costs more);
    # only the probe/child-list surgery is conditional.
    l0_key = jnp.where(keep[:, None], state.l0_key, INVAL)
    l0_sum = jnp.where(keep[:, None], state.l0_sum, 0.0)
    l0_count = jnp.where(keep, state.l0_count, 0)

    def do_evict(_):
        ev_list, _n = _compact_mask(evict, EVICT_CAP)
        ev_ok = ev_list >= 0
        ev_slot = jnp.clip(ev_list, 0, c0 - 1)
        ekey = state.l0_key[ev_slot]
        ev_coords = K.unpack_key(ekey[:, 0], ekey[:, 1])
        ev_par = K.parent_coords(ev_coords, hierarchy_factor)
        ephi, eplo = K.pack_key(ev_par)
        ep_slot = _probe(state.l1_index, state.l1_key,
                         jnp.where(ev_ok, ephi, K.INVALID_HI),
                         jnp.where(ev_ok, eplo, K.INVALID_LO))
        ev_off = _child_offset_of(ev_coords)
        has_par = ev_ok & (ep_slot >= 0)
        ch = state.l1_children.at[
            jnp.where(has_par, ep_slot, c1), jnp.where(has_par, ev_off, 0)].set(
            -1, mode="drop")
        return ch, jnp.where(has_par, ep_slot, -1)

    def no_evict(_):
        return state.l1_children, jnp.full((EVICT_CAP,), -1, jnp.int32)

    l1_children, evpar_slots = jax.lax.cond(
        jnp.any(evict), do_evict, no_evict, None)

    # ---- Step 2: insert new points (AddPoint, VoxelMap.cpp:99-120) ----
    inv = 1.0 / voxel_size
    pcoords = K.voxel_coords(new_pts, inv)
    phi, plo = K.pack_key(pcoords)
    phi = jnp.where(new_mask, phi, K.INVALID_HI)
    plo = jnp.where(new_mask, plo, K.INVALID_LO)
    l0_index, l0_key, slot, l0_new = _insert_keys(
        state.l0_index, l0_key, l0_count > 0, phi, plo, new_mask, free_cap=p)
    placed = slot >= 0
    tgt = jnp.where(placed, slot, c0)
    for _w in range(3):
        l0_sum = l0_sum.at[tgt, _w].add(
            jnp.where(placed, new_pts[:, _w], 0.0), mode="drop")
    l0_count = l0_count.at[tgt].add(placed.astype(jnp.int32), mode="drop")
    n_l0 = jnp.sum((l0_count > 0).astype(jnp.int32))

    # ---- Step 3: parents of new points; register new children
    # (RegisterToParent, VoxelMap.cpp:77-80) ----
    npar = K.parent_coords(pcoords, hierarchy_factor)
    nphi, nplo = K.pack_key(npar)
    nphi = jnp.where(new_mask & placed, nphi, K.INVALID_HI)
    nplo = jnp.where(new_mask & placed, nplo, K.INVALID_LO)
    l1_index, l1_key, par_slot, l1_new = _insert_keys(
        state.l1_index, state.l1_key, state.l1_child_count > 0,
        nphi, nplo, new_mask & placed, free_cap=AFFECTED_CAP)
    l1_children = l1_children.at[jnp.where(l1_new, par_slot, c1)].set(
        -1, mode="drop")
    # a reallocated slot must not inherit the previous occupant's surfel
    l1_surfel_work = state.l1_surfel.at[
        jnp.where(l1_new, par_slot, c1), 7].set(0.0, mode="drop")
    ch_off = _child_offset_of(pcoords)
    reg = l0_new & (par_slot >= 0)
    l1_children = l1_children.at[
        jnp.where(reg, par_slot, c1), jnp.where(reg, ch_off, 0)].set(
        jnp.where(reg, slot, -1), mode="drop")

    # ---- Step 4: affected set = parents of new points + evicted parents ----
    cand_slot = jnp.concatenate([par_slot, evpar_slots])
    cand_isnew = jnp.concatenate([jnp.ones((p,), bool), jnp.zeros((EVICT_CAP,), bool)])
    cand_ok = cand_slot >= 0
    nidx = jnp.arange(cand_slot.shape[0], dtype=jnp.int32)
    BIG = jnp.iinfo(jnp.int32).max
    own = jnp.full((c1,), BIG, jnp.int32)
    own = own.at[jnp.where(cand_ok, cand_slot, c1)].min(nidx, mode="drop")
    leader = cand_ok & (own[jnp.clip(cand_slot, 0, c1 - 1)] == nidx)
    touched_new = jnp.zeros((c1,), bool).at[
        jnp.where(cand_ok & cand_isnew, cand_slot, c1)].max(True, mode="drop")
    lead_list, _ = _compact_mask(leader, AFFECTED_CAP)
    aff_ok = lead_list >= 0
    aff_slot = jnp.where(
        aff_ok, cand_slot[jnp.clip(lead_list, 0, cand_slot.shape[0] - 1)], -1)
    aff_slot_c = jnp.clip(aff_slot, 0, c1 - 1)
    aff_is_new = touched_new[aff_slot_c] & aff_ok

    # ---- Step 5: child stats + surfel decisions ----
    cell_key = l1_key[aff_slot_c]
    cnt, mean, cov, kids, kids_ok = _surfel_stats_from_children(
        l0_key, l0_sum, l0_count, l1_children, cell_key, aff_slot, aff_ok,
        hierarchy_factor)

    srow = l1_surfel_work[aff_slot_c]
    prev_has = aff_ok & (srow[:, 7] > 0.5)
    prev_last = state.l1_last_count[aff_slot_c]

    l1_surfel = l1_surfel_work
    l1_planarity = state.l1_planarity
    l1_last = state.l1_last_count

    if compute_surfels:
        lam, normal = eigh3.eigh3(cov)
        plan = lam[:, 0] / (lam[:, 2] + 1e-6)
        enough = cnt >= MIN_OCCUPIED_CHILDREN
        skip = prev_has & (prev_last == cnt)          # VoxelMap.cpp:203
        recompute = aff_is_new & aff_ok & enough & ~skip
        non_planar = recompute & (plan > planarity_threshold)
        use_new = recompute & ~non_planar
        has_out = jnp.where(aff_is_new,
                            jnp.where(enough, skip | use_new, False),
                            prev_has & enough)

        # ---- non-planar deletion (VoxelMap.cpp:244-253) ----
        del_children = kids_ok & non_planar[:, None]
        dslot = jnp.where(del_children, kids, c0).reshape(-1)
        l0_count = l0_count.at[dslot].set(0, mode="drop")
        l0_key = _set_rows(l0_key, dslot,
                           [jnp.full_like(dslot, K.INVALID_HI, dtype=jnp.uint32),
                            jnp.full_like(dslot, K.INVALID_LO, dtype=jnp.uint32)])
        l1_children = l1_children.at[jnp.where(non_planar, aff_slot, c1)].set(
            -1, mode="drop")
        n_l0 = jnp.sum((l0_count > 0).astype(jnp.int32))
        cnt = jnp.where(non_planar, 0, cnt)
        has_out = has_out & ~non_planar
    else:
        normal = jnp.zeros_like(mean)
        plan = jnp.ones((AFFECTED_CAP,), f32)
        use_new = jnp.zeros((AFFECTED_CAP,), bool)
        has_out = jnp.zeros((AFFECTED_CAP,), bool)

    # ---- Step 6: write back affected cells ----
    wslot = jnp.where(aff_ok, aff_slot, c1)
    l1_child_count = state.l1_child_count.at[wslot].set(cnt, mode="drop")
    keep_payload = jnp.where(use_new[:, None], jnp.concatenate([normal, mean], axis=-1),
                             srow[:, :6])
    rows = jnp.concatenate(
        [keep_payload[:, :6],
         jnp.where(use_new, plan, srow[:, 6])[:, None],
         has_out.astype(f32)[:, None]], axis=-1)
    l1_surfel = _set_rows(l1_surfel, wslot, [rows[:, _w] for _w in range(8)])
    l1_planarity = l1_planarity.at[jnp.where(use_new, wslot, c1)].set(
        plan, mode="drop")
    l1_last = l1_last.at[jnp.where(use_new, wslot, c1)].set(cnt, mode="drop")

    # free emptied cells: key -> INVALID recycles both slot and index cell
    freed = aff_ok & (cnt == 0)
    fpos = jnp.where(freed, wslot, c1)
    l1_key = _set_rows(l1_key, fpos,
                       [jnp.full_like(fpos, K.INVALID_HI, dtype=jnp.uint32),
                        jnp.full_like(fpos, K.INVALID_LO, dtype=jnp.uint32)])

    n_l1 = jnp.sum((l1_child_count > 0).astype(jnp.int32))
    return VoxelMapState(
        l0_key=l0_key, l0_sum=l0_sum, l0_count=l0_count, l0_index=l0_index,
        n_l0=n_l0,
        l1_key=l1_key, l1_surfel=l1_surfel, l1_planarity=l1_planarity,
        l1_children=l1_children, l1_child_count=l1_child_count,
        l1_last_count=l1_last, l1_index=l1_index, n_l1=n_l1)


@partial(jax.jit, static_argnames=("hierarchy_factor",))
def lookup_surfels(state: VoxelMapState, pts: jax.Array, *, voxel_size,
                   hierarchy_factor: int = 3):
    """Batched surfel query (reference GetSurfelAtPoint,
    VoxelMap.cpp:368-386): bounded hash probe + ONE packed row gather.
    Returns (normal (N,3), centroid (N,3), valid (N,))."""
    inv = 1.0 / (voxel_size * hierarchy_factor)
    coords = K.voxel_coords(pts, inv)
    qhi, qlo = K.pack_key(coords)
    slot = _probe(state.l1_index, state.l1_key, qhi, qlo)
    c1 = state.l1_child_count.shape[0]
    slot_c = jnp.clip(slot, 0, c1 - 1)
    row = state.l1_surfel[slot_c]
    valid = (slot >= 0) & (row[:, 7] > 0.5)
    return row[:, 0:3], row[:, 3:6], valid


@partial(jax.jit, static_argnames=())
def grid_knn_neighbors(state: VoxelMapState, pts: jax.Array, *, voxel_size):
    """L0 centroids of each query's 3x3x3 voxel neighborhood (KD-tree-mode
    candidates, replacing nanoflann 5-NN,
    IterativeClosestPointOptimizer.cpp:696-703).
    Returns (neighbors (N, 27, 3), valid (N, 27))."""
    inv = 1.0 / voxel_size
    qc = K.voxel_coords(pts, inv)
    nb = qc[:, None, :] + jnp.asarray(_NB_OFFS)[None, :, :]
    nhi, nlo = K.pack_key(nb)
    n, m = nhi.shape
    slot = _probe(state.l0_index, state.l0_key, nhi.reshape(-1), nlo.reshape(-1))
    c0 = state.l0_count.shape[0]
    slot_c = jnp.clip(slot, 0, c0 - 1).reshape(n, m)
    ok = (slot.reshape(n, m) >= 0) & (state.l0_count[slot_c] > 0)
    cen = state.l0_sum[slot_c] / jnp.maximum(
        state.l0_count[slot_c], 1)[..., None].astype(jnp.float32)
    return cen, ok


@partial(jax.jit, static_argnames=("hierarchy_factor",))
def transform_and_rehash(state: VoxelMapState, T: jax.Array, *, voxel_size,
                         planarity_threshold,
                         hierarchy_factor: int = 3) -> VoxelMapState:
    """PGO correction: transform every L0 centroid, re-key, merge
    collisions by weighted centroid, recompute ALL surfels (reference
    ApplyTransformAndRehash + RecomputeAllSurfels, VoxelMap.cpp:264-366).
    Rare op: full rebuild into a fresh map."""
    c0 = state.l0_count.shape[0]
    c1 = state.l1_child_count.shape[0]
    f32 = jnp.float32
    valid = state.l0_count > 0
    cnt_f = jnp.maximum(state.l0_count, 1)[:, None].astype(f32)
    centroid = state.l0_sum / cnt_f
    R = T[:3, :3]
    t = T[:3, 3]
    new_centroid = centroid @ R.T + t[None, :]
    new_sum = new_centroid * state.l0_count[:, None].astype(f32)

    inv = 1.0 / voxel_size
    coords = K.voxel_coords(new_centroid, inv)
    hi, lo = K.pack_key(coords)
    hi = jnp.where(valid, hi, K.INVALID_HI)
    lo = jnp.where(valid, lo, K.INVALID_LO)

    fresh = empty_map(c0, c1)
    l0_index, l0_key, slot, _ = _insert_keys(
        fresh.l0_index, fresh.l0_key, jnp.zeros((c0,), bool), hi, lo, valid,
        free_cap=c0)
    placed = slot >= 0
    tgt = jnp.where(placed, slot, c0)
    l0_sum = fresh.l0_sum
    for _w in range(3):
        l0_sum = l0_sum.at[tgt, _w].add(
            jnp.where(placed, new_sum[:, _w], 0.0), mode="drop")
    l0_count = fresh.l0_count.at[tgt].add(
        jnp.where(placed, state.l0_count, 0), mode="drop")
    n_l0 = jnp.sum((l0_count > 0).astype(jnp.int32))

    par = K.parent_coords(coords, hierarchy_factor)
    phi2, plo2 = K.pack_key(par)
    phi2 = jnp.where(placed, phi2, K.INVALID_HI)
    plo2 = jnp.where(placed, plo2, K.INVALID_LO)
    l1_index, l1_key, par_slot, _ = _insert_keys(
        fresh.l1_index, fresh.l1_key, jnp.zeros((c1,), bool), phi2, plo2,
        placed, free_cap=c1)
    ch_off = _child_offset_of(coords)
    reg = placed & (par_slot >= 0)
    l1_children = fresh.l1_children.at[
        jnp.where(reg, par_slot, c1), jnp.where(reg, ch_off, 0)].set(
        jnp.where(reg, slot, -1), mode="drop")

    all_slots = jnp.arange(c1, dtype=jnp.int32)
    occupied = jnp.zeros((c1,), bool).at[
        jnp.where(reg, par_slot, c1)].max(True, mode="drop")
    cnt, mean, cov, _, _ = _surfel_stats_from_children(
        l0_key, l0_sum, l0_count, l1_children, l1_key, all_slots, occupied,
        hierarchy_factor)
    lam, normal = eigh3.eigh3(cov)
    plan = lam[:, 0] / (lam[:, 2] + 1e-6)
    has = occupied & (cnt >= MIN_OCCUPIED_CHILDREN) & (plan <= planarity_threshold)
    l1_surfel = jnp.concatenate(
        [normal, mean, plan[:, None], has.astype(f32)[:, None]], axis=-1)
    n_l1 = jnp.sum((cnt > 0).astype(jnp.int32))

    return VoxelMapState(
        l0_key=l0_key, l0_sum=l0_sum, l0_count=l0_count, l0_index=l0_index,
        n_l0=n_l0,
        l1_key=l1_key, l1_surfel=l1_surfel, l1_planarity=plan,
        l1_children=l1_children, l1_child_count=cnt, l1_last_count=cnt,
        l1_index=l1_index, n_l1=n_l1)


def l0_points(state: VoxelMapState):
    """All L0 centroids + validity mask (reference GetPointCloud,
    VoxelMap.cpp:388-403)."""
    valid = state.l0_count > 0
    centroid = state.l0_sum / jnp.maximum(state.l0_count, 1)[:, None].astype(jnp.float32)
    return centroid, valid
