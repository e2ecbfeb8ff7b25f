"""2-level hierarchical voxel surfel map — slot-stable device tables with
dense index grids (the TPU-native redesign of the reference VoxelMap,
reference src/database/VoxelMap.{h,cpp}).

Reference semantics preserved:
  * L0 leaf voxels hold a running centroid (kept as sum+count so parallel
    merges are exact) — VoxelMap.cpp:99-120.
  * L1 parents (hierarchy_factor=3 => 3x3x3 children, Estimator.cpp:79)
    cache a surfel (normal from PCA of child centroids, centroid,
    planarity = sigma2/sigma0) — VoxelMap.cpp:187-261.
  * Per-keyframe update: radius eviction beyond max_distance
    (VoxelMap.cpp:146-158), point insertion, surfel recompute only for
    AFFECTED L1 cells (touched by new points); an affected cell with
    unchanged child count keeps its cached surfel (`last_child_count`
    skip, VoxelMap.cpp:203); a non-planar affected cell is DELETED with
    its L0 children (VoxelMap.cpp:244-253); cells that merely lose
    children to eviction drop their surfel only below 5 children
    (UnregisterFromParent, VoxelMap.cpp:82-97).
  * O(1) surfel query per point (VoxelMap.cpp:368-386) -> ONE dense-grid
    gather + key verification.
  * ApplyTransformAndRehash re-keys every centroid, merges collisions by
    weighted centroid, recomputes ALL surfels without deletion
    (VoxelMap.cpp:264-366).

Design (TPU): hash maps become SLOT tables (stable indices, free-list
allocation) indexed by dense modular GRIDS — int32 arrays over the
sensor-local voxel lattice mapping packed voxel coords -> slot. A lookup
is one gather + a key compare (the grid is modular, so aliasing beyond
the eviction diameter is rejected by the stored key). Updates are pure
scatter/gather programs: leader-election dedupe of new keys via
scatter-min, free-slot allocation via cumsum, bounded-size affected-cell
lists, and per-cell child gathering over the 3x3x3 lattice — NO sorting
anywhere on the per-keyframe path.

Grid geometry: L0 grid 512x512x128 @ voxel_size (256 m x 256 m x 64 m
wrap), L1 grid 256x256x64 @ 3*voxel_size. The eviction radius
(max_range*1.2 = 120 m => 240 m diameter) fits inside the wrap period, so
live keys never alias. Keys whose z wraps are verified-and-missed rather
than corrupted.
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
           "MIN_OCCUPIED_CHILDREN", "L0_GRID", "L1_GRID"]

MIN_OCCUPIED_CHILDREN = 5  # reference VoxelMap.cpp:188

# Dense grid dimensions (power-of-two moduli). Configurable because the
# multichip dryrun and CPU tests want small grids; production TPU maps use
# the defaults. All jitted entry points key their cache on the grid array
# shapes, so states built under one configuration stay self-consistent.
L0_GRID = (512, 512, 128)
L1_GRID = (256, 256, 64)


def configure_grids(l0_dims=None, l1_dims=None):
    global L0_GRID, L1_GRID
    if l0_dims is not None:
        assert all(d & (d - 1) == 0 for d in l0_dims), "grid dims must be powers of two"
        L0_GRID = tuple(l0_dims)
    if l1_dims is not None:
        assert all(d & (d - 1) == 0 for d in l1_dims), "grid dims must be powers of two"
        L1_GRID = tuple(l1_dims)


def _l0_size():
    return L0_GRID[0] * L0_GRID[1] * L0_GRID[2]


def _l1_size():
    return L1_GRID[0] * L1_GRID[1] * L1_GRID[2]

# Static cap on per-update "affected L1 cell" set. Scans contribute at most
# scan_capacity distinct parents; in practice a few hundred. Overflow
# entries are dropped for the round (stale surfels — logged via n counts).
AFFECTED_CAP = 8192


def _grid_index(coords: jax.Array, dims) -> jax.Array:
    """(..., 3) int32 voxel coords -> flat modular grid index."""
    gx, gy, gz = dims
    ix = coords[..., 0] & (gx - 1)
    iy = coords[..., 1] & (gy - 1)
    iz = coords[..., 2] & (gz - 1)
    return (ix * gy + iy) * gz + iz


class VoxelMapState(NamedTuple):
    # L0 leaf slots (stable indices; NOT sorted)
    l0_hi: jax.Array        # (C0,) uint32 packed key (INVALID when free)
    l0_lo: jax.Array        # (C0,) uint32
    l0_sum: jax.Array       # (C0, 3) f32 running point-sum
    l0_count: jax.Array     # (C0,) i32 — 0 marks a free slot
    n_l0: jax.Array         # () i32
    l0_grid: jax.Array      # (l0 grid size,) i32 — voxel lattice -> slot (-1 empty)
    # L1 parent slots
    l1_hi: jax.Array        # (C1,) uint32
    l1_lo: jax.Array        # (C1,) uint32
    l1_normal: jax.Array    # (C1, 3)
    l1_centroid: jax.Array  # (C1, 3)
    l1_planarity: jax.Array  # (C1,)
    l1_has_surfel: jax.Array  # (C1,) bool
    l1_child_count: jax.Array  # (C1,) i32 — live child count (0 = free slot)
    l1_last_count: jax.Array   # (C1,) i32 — child count at last surfel compute
    n_l1: jax.Array         # () i32
    l1_grid: jax.Array      # (l1 grid size,) i32


def empty_map(c0: int, c1: int) -> VoxelMapState:
    u = jnp.uint32
    return VoxelMapState(
        l0_hi=jnp.full((c0,), K.INVALID_HI, dtype=u),
        l0_lo=jnp.full((c0,), K.INVALID_LO, dtype=u),
        l0_sum=jnp.zeros((c0, 3), jnp.float32),
        l0_count=jnp.zeros((c0,), jnp.int32),
        n_l0=jnp.int32(0),
        l0_grid=jnp.full((_l0_size(),), -1, jnp.int32),
        l1_hi=jnp.full((c1,), K.INVALID_HI, dtype=u),
        l1_lo=jnp.full((c1,), K.INVALID_LO, dtype=u),
        l1_normal=jnp.zeros((c1, 3), jnp.float32),
        l1_centroid=jnp.zeros((c1, 3), jnp.float32),
        l1_planarity=jnp.ones((c1,), jnp.float32),
        l1_has_surfel=jnp.zeros((c1,), bool),
        l1_child_count=jnp.zeros((c1,), jnp.int32),
        l1_last_count=jnp.zeros((c1,), jnp.int32),
        n_l1=jnp.int32(0),
        l1_grid=jnp.full((_l1_size(),), -1, jnp.int32),
    )


def _free_slot_list(valid: jax.Array, cap_out: int):
    """Compact the indices of free slots (~valid) into a (cap_out,) list
    via cumsum+scatter. Returns (slots, n_free)."""
    c = valid.shape[0]
    free = ~valid
    rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    out = jnp.full((cap_out,), -1, jnp.int32)
    pos = jnp.where(free & (rank < cap_out), rank, cap_out - 1)
    # scatter-min keeps the lowest slot index per rank (ranks are unique)
    out = out.at[pos].max(jnp.where(free & (rank < cap_out),
                                    jnp.arange(c, dtype=jnp.int32), -1),
                          mode="drop")
    return out, jnp.sum(free.astype(jnp.int32))


def _allocate(grid, hi, lo, slot_valid, cells, key_hi, key_lo, cand_mask,
              free_cap: int):
    """Allocate slots for candidate keys not present in `grid`.

    cells: (P,) flat grid indices of candidates; key_hi/lo their packed
    keys; cand_mask marks live candidates. Returns (grid', hi', lo',
    slot_per_candidate (P,) — -1 where dropped, is_new (P,)).

    Leader election: scatter-min candidate index into the grid cell; the
    winning candidate allocates, others read back the assigned slot.
    """
    c = hi.shape[0]
    p = cells.shape[0]
    idx = jnp.arange(p, dtype=jnp.int32)

    existing = grid[cells]
    ex_slot = jnp.clip(existing, 0, c - 1)
    hit = (existing >= 0) & K.key_eq(hi[ex_slot], lo[ex_slot], key_hi, key_lo) \
        & slot_valid[ex_slot] & cand_mask
    miss = cand_mask & ~hit

    # Mark misses with temp ids (c + idx) via scatter-min; winners become
    # leaders for their cell.
    TMP = jnp.int32(c)
    marker = jnp.full((grid.shape[0],), jnp.iinfo(jnp.int32).max, jnp.int32)
    marker = marker.at[jnp.where(miss, cells, 0)].min(
        jnp.where(miss, TMP + idx, jnp.iinfo(jnp.int32).max), mode="promise_in_bounds")
    leader = miss & (marker[cells] == TMP + idx)

    free_slots, n_free = _free_slot_list(slot_valid, free_cap)
    lead_rank = jnp.cumsum(leader.astype(jnp.int32)) - 1
    can_alloc = leader & (lead_rank < n_free) & (lead_rank < free_cap)
    new_slot = jnp.where(can_alloc, free_slots[jnp.clip(lead_rank, 0, free_cap - 1)], -1)

    # Write allocated keys into slot arrays + grid.
    tgt = jnp.where(can_alloc, new_slot, c)  # c = dropped (mode=drop)
    hi = hi.at[tgt].set(key_hi, mode="drop")
    lo = lo.at[tgt].set(key_lo, mode="drop")
    grid = grid.at[jnp.where(can_alloc, cells, grid.shape[0])].set(
        new_slot, mode="drop")

    # Every candidate re-reads its cell to learn the final slot.
    final = grid[cells]
    f_slot = jnp.clip(final, 0, c - 1)
    ok = (final >= 0) & K.key_eq(hi[f_slot], lo[f_slot], key_hi, key_lo) & cand_mask
    slot_out = jnp.where(ok, final, -1)
    return grid, hi, lo, slot_out, can_alloc


def _compact_cells(marker_grid, cells, mask, cap: int):
    """Dedupe candidate grid cells via leader election on a scratch marker,
    compacting leader positions into a (cap,) list. Returns
    (cell_list (cap,), source_index_list (cap,), n)."""
    p = cells.shape[0]
    idx = jnp.arange(p, dtype=jnp.int32)
    BIG = jnp.iinfo(jnp.int32).max
    marker = marker_grid.at[jnp.where(mask, cells, 0)].min(
        jnp.where(mask, idx, BIG), mode="promise_in_bounds")
    leader = mask & (marker[cells] == idx)
    rank = jnp.cumsum(leader.astype(jnp.int32)) - 1
    keep = leader & (rank < cap)
    cell_list = jnp.full((cap,), -1, jnp.int32)
    src_list = jnp.full((cap,), -1, jnp.int32)
    pos = jnp.where(keep, rank, cap - 1)
    cell_list = cell_list.at[pos].max(jnp.where(keep, cells, -1), mode="drop")
    src_list = src_list.at[pos].max(jnp.where(keep, idx, -1), mode="drop")
    return cell_list, src_list, jnp.minimum(jnp.sum(leader.astype(jnp.int32)), cap)


_CHILD_OFFS = np.stack(np.meshgrid(*([np.arange(3)] * 3), indexing="ij"),
                       axis=-1).reshape(27, 3).astype(np.int32)


def _cell_children_stats(state_l0, parent_coords_arr, cell_mask):
    """For (A, 3) parent cell coords, gather the 27 child L0 voxels via the
    L0 grid and compute (child_count, mean, cov) from their centroids —
    the vectorized replacement for per-cell child-set iteration
    (reference VoxelMap.cpp:207-236)."""
    l0_hi, l0_lo, l0_sum, l0_count, l0_grid = state_l0
    c0 = l0_hi.shape[0]
    child_coords = parent_coords_arr[:, None, :] * 3 + jnp.asarray(_CHILD_OFFS)[None, :, :]
    chi, clo = K.pack_key(child_coords)
    gidx = _grid_index(child_coords, L0_GRID)
    slot = l0_grid[gidx]
    slot_c = jnp.clip(slot, 0, c0 - 1)
    ok = (slot >= 0) & (l0_count[slot_c] > 0) \
        & K.key_eq(l0_hi[slot_c], l0_lo[slot_c], chi, clo) \
        & cell_mask[:, None]
    cnt = jnp.sum(ok.astype(jnp.int32), axis=1)
    cen = l0_sum[slot_c] / jnp.maximum(l0_count[slot_c], 1)[..., None].astype(jnp.float32)
    w = ok.astype(jnp.float32)[..., None]
    s1 = jnp.sum(cen * w, axis=1)
    mean = s1 / jnp.maximum(cnt, 1)[:, None].astype(jnp.float32)
    d = (cen - mean[:, None, :]) * w
    cov = jnp.einsum("aky,akz->ayz", d, d) / jnp.maximum(cnt, 1)[:, None, None].astype(jnp.float32)
    return cnt, mean, cov, slot, ok


@partial(jax.jit, static_argnames=("hierarchy_factor", "compute_surfels"))
def update_map(state: VoxelMapState, new_pts: jax.Array, new_mask: jax.Array,
               sensor_pos: jax.Array, max_distance, *, voxel_size,
               planarity_threshold, hierarchy_factor: int = 3,
               compute_surfels: bool = True) -> VoxelMapState:
    """Per-keyframe map update (reference VoxelMap::UpdateVoxelMap,
    VoxelMap.cpp:128-262) as a sort-free scatter program."""
    c0 = state.l0_hi.shape[0]
    c1 = state.l1_hi.shape[0]
    f32 = jnp.float32
    p = new_pts.shape[0]

    # ---- Step 1: radius eviction (VoxelMap.cpp:146-158) ----
    centroid = state.l0_sum / jnp.maximum(state.l0_count, 1)[:, None].astype(f32)
    valid0 = state.l0_count > 0
    dist_sq = jnp.sum((centroid - sensor_pos[None, :]) ** 2, axis=-1)
    evict = valid0 & (dist_sq > max_distance * max_distance)
    keep = valid0 & ~evict
    l0_coords_all = K.unpack_key(state.l0_hi, state.l0_lo)
    ev_gidx = _grid_index(l0_coords_all, L0_GRID)
    l0_grid = state.l0_grid.at[
        jnp.where(evict, ev_gidx, state.l0_grid.shape[0])].set(-1, mode="drop")
    l0_hi = jnp.where(keep, state.l0_hi, K.INVALID_HI)
    l0_lo = jnp.where(keep, state.l0_lo, K.INVALID_LO)
    l0_sum = jnp.where(keep[:, None], state.l0_sum, 0.0)
    l0_count = jnp.where(keep, state.l0_count, 0)

    # ---- Step 2: insert new points (AddPoint, VoxelMap.cpp:99-120) ----
    inv = 1.0 / voxel_size
    pcoords = K.voxel_coords(new_pts, inv)
    phi, plo = K.pack_key(pcoords)
    pgidx = _grid_index(pcoords, L0_GRID)
    l0_grid, l0_hi, l0_lo, slot, is_new = _allocate(
        l0_grid, l0_hi, l0_lo, l0_count > 0, pgidx, phi, plo, new_mask,
        free_cap=p)
    placed = slot >= 0
    tgt = jnp.where(placed, slot, c0)
    l0_sum = l0_sum.at[tgt].add(jnp.where(placed[:, None], new_pts, 0.0), mode="drop")
    l0_count = l0_count.at[tgt].add(placed.astype(jnp.int32), mode="drop")
    n_l0 = jnp.sum((l0_count > 0).astype(jnp.int32))

    state_l0 = (l0_hi, l0_lo, l0_sum, l0_count, l0_grid)

    # ---- Step 3: affected L1 cells ----
    # (a) parents of new points (VoxelMap.cpp:172-179); (b) parents of
    # evicted voxels (UnregisterFromParent semantics).
    new_parents = K.parent_coords(pcoords, hierarchy_factor)
    ev_parents = K.parent_coords(l0_coords_all, hierarchy_factor)
    cand_coords = jnp.concatenate([new_parents, ev_parents])
    cand_mask = jnp.concatenate([new_mask & placed, evict])
    from_new = jnp.concatenate([jnp.ones((p,), bool), jnp.zeros((c0,), bool)])
    cand_gidx = _grid_index(cand_coords, L1_GRID)
    scratch = jnp.full((_l1_size(),), jnp.iinfo(jnp.int32).max, jnp.int32)
    cell_list, src_list, n_aff = _compact_cells(
        scratch, cand_gidx, cand_mask, AFFECTED_CAP)
    # was this cell touched by a NEW point (vs eviction only)? OR-reduce.
    touched_by_new = jnp.zeros((_l1_size(),), bool).at[
        jnp.where(cand_mask & from_new, cand_gidx, 0)].max(
        cand_mask & from_new, mode="promise_in_bounds")

    aff_mask = src_list >= 0
    src_c = jnp.clip(src_list, 0, cand_coords.shape[0] - 1)
    aff_coords = cand_coords[src_c]
    aff_hi, aff_lo = K.pack_key(aff_coords)
    aff_is_new = touched_by_new[jnp.clip(cell_list, 0, _l1_size() - 1)] & aff_mask

    # ---- Step 4: allocate/lookup L1 slots for affected cells ----
    l1_grid, l1_hi, l1_lo, aff_slot, l1_alloc = _allocate(
        state.l1_grid, state.l1_hi, state.l1_lo, state.l1_child_count > 0,
        jnp.clip(cell_list, 0, _l1_size() - 1), aff_hi, aff_lo, aff_mask,
        free_cap=AFFECTED_CAP)
    aff_ok = aff_slot >= 0
    aff_slot_c = jnp.clip(aff_slot, 0, c1 - 1)

    # ---- Step 5: per-cell child stats over the 3x3x3 lattice ----
    cnt, mean, cov, child_slot, child_ok = _cell_children_stats(
        state_l0, aff_coords, aff_ok)

    prev_has = state.l1_has_surfel[aff_slot_c] & ~l1_alloc
    prev_last = jnp.where(l1_alloc, 0, state.l1_last_count[aff_slot_c])

    if compute_surfels:
        lam, normal = eigh3.eigh3(cov)
        plan = lam[:, 0] / (lam[:, 2] + 1e-6)
        enough = cnt >= MIN_OCCUPIED_CHILDREN
        skip = prev_has & (prev_last == cnt)          # VoxelMap.cpp:203
        recompute = aff_is_new & aff_ok & enough & ~skip
        non_planar = recompute & (plan > planarity_threshold)
        use_new = recompute & ~non_planar

        # eviction-only cells: keep surfel while >= 5 children
        has_out = jnp.where(aff_is_new,
                            jnp.where(enough, (skip | use_new), False),
                            prev_has & enough)
        # ---- non-planar deletion (VoxelMap.cpp:244-253) ----
        del_children = child_ok & non_planar[:, None]
        dslot = jnp.where(del_children, child_slot, c0)
        l0_count = l0_count.at[dslot.reshape(-1)].set(0, mode="drop")
        l0_hi = l0_hi.at[dslot.reshape(-1)].set(K.INVALID_HI, mode="drop")
        l0_lo = l0_lo.at[dslot.reshape(-1)].set(K.INVALID_LO, mode="drop")
        child_coords = aff_coords[:, None, :] * 3 + jnp.asarray(_CHILD_OFFS)[None, :, :]
        cg = _grid_index(child_coords, L0_GRID).reshape(-1)
        l0_grid = l0_grid.at[jnp.where(del_children.reshape(-1), cg,
                                       l0_grid.shape[0])].set(-1, mode="drop")
        n_l0 = jnp.sum((l0_count > 0).astype(jnp.int32))
        cnt = jnp.where(non_planar, 0, cnt)
        has_out = has_out & ~non_planar
    else:
        normal = jnp.zeros_like(mean)
        plan = jnp.ones((AFFECTED_CAP,), f32)
        use_new = jnp.zeros((AFFECTED_CAP,), bool)
        non_planar = jnp.zeros((AFFECTED_CAP,), bool)
        has_out = jnp.zeros((AFFECTED_CAP,), bool)

    # ---- Step 6: write back affected cells ----
    wslot = jnp.where(aff_ok, aff_slot, c1)
    l1_child_count = state.l1_child_count.at[wslot].set(cnt, mode="drop")
    l1_has = state.l1_has_surfel.at[wslot].set(has_out, mode="drop")
    l1_normal = state.l1_normal.at[jnp.where(use_new, wslot, c1)].set(
        normal, mode="drop")
    l1_centroid = state.l1_centroid.at[jnp.where(use_new, wslot, c1)].set(
        mean, mode="drop")
    l1_planarity = state.l1_planarity.at[jnp.where(use_new, wslot, c1)].set(
        plan, mode="drop")
    l1_last = state.l1_last_count.at[jnp.where(use_new, wslot, c1)].set(
        cnt, mode="drop")

    # free fully-deleted / emptied cells in the grid
    freed = aff_ok & (cnt == 0)
    l1_grid = l1_grid.at[jnp.where(freed, cell_list, l1_grid.shape[0])].set(
        -1, mode="drop")
    l1_hi = l1_hi.at[jnp.where(freed, wslot, c1)].set(K.INVALID_HI, mode="drop")
    l1_lo = l1_lo.at[jnp.where(freed, wslot, c1)].set(K.INVALID_LO, mode="drop")

    n_l1 = jnp.sum((l1_child_count > 0).astype(jnp.int32))
    return VoxelMapState(
        l0_hi=l0_hi, l0_lo=l0_lo, l0_sum=l0_sum, l0_count=l0_count,
        n_l0=n_l0, l0_grid=l0_grid,
        l1_hi=l1_hi, l1_lo=l1_lo, l1_normal=l1_normal,
        l1_centroid=l1_centroid, l1_planarity=l1_planarity,
        l1_has_surfel=l1_has, l1_child_count=l1_child_count,
        l1_last_count=l1_last, n_l1=n_l1, l1_grid=l1_grid)


@partial(jax.jit, static_argnames=("hierarchy_factor",))
def lookup_surfels(state: VoxelMapState, pts: jax.Array, *, voxel_size,
                   hierarchy_factor: int = 3):
    """Batched O(1) surfel query (reference GetSurfelAtPoint,
    VoxelMap.cpp:368-386): ONE dense-grid gather + key verification.
    Returns (normal (N,3), centroid (N,3), valid (N,))."""
    inv = 1.0 / (voxel_size * hierarchy_factor)
    coords = K.voxel_coords(pts, inv)
    qhi, qlo = K.pack_key(coords)
    gidx = _grid_index(coords, L1_GRID)
    slot = state.l1_grid[gidx]
    c1 = state.l1_hi.shape[0]
    slot_c = jnp.clip(slot, 0, c1 - 1)
    hit = (slot >= 0) & K.key_eq(state.l1_hi[slot_c], state.l1_lo[slot_c], qhi, qlo)
    valid = hit & state.l1_has_surfel[slot_c]
    return state.l1_normal[slot_c], state.l1_centroid[slot_c], valid


@partial(jax.jit, static_argnames=("bucket_k",))
def grid_knn_neighbors(state: VoxelMapState, pts: jax.Array, *, voxel_size,
                       bucket_k: int = 27):
    """For each query point, gather the L0 centroids of its 3x3x3 voxel
    neighborhood via the dense grid — the KD-tree-mode candidate set
    (replaces nanoflann 5-NN, IterativeClosestPointOptimizer.cpp:696-703).
    Returns (neighbors (N, 27, 3), valid (N, 27))."""
    inv = 1.0 / voxel_size
    qc = K.voxel_coords(pts, inv)
    offs = jnp.asarray(_CHILD_OFFS) - 1  # -1..1 cube
    nb = qc[:, None, :] + offs[None, :, :]
    nhi, nlo = K.pack_key(nb)
    gidx = _grid_index(nb, L0_GRID)
    slot = state.l0_grid[gidx]
    c0 = state.l0_hi.shape[0]
    slot_c = jnp.clip(slot, 0, c0 - 1)
    ok = (slot >= 0) & (state.l0_count[slot_c] > 0) \
        & K.key_eq(state.l0_hi[slot_c], state.l0_lo[slot_c], nhi, nlo)
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
    Rare op (per accepted loop closure): rebuilds both grids from scratch.
    """
    c0 = state.l0_hi.shape[0]
    c1 = state.l1_hi.shape[0]
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
    gidx = _grid_index(coords, L0_GRID)

    # Rebuild L0 from scratch: leader election merges collisions.
    fresh = empty_map(c0, c1)
    grid, nhi, nlo, slot, _ = _allocate(
        fresh.l0_grid, fresh.l0_hi, fresh.l0_lo,
        jnp.zeros((c0,), bool), gidx, hi, lo, valid, free_cap=c0)
    placed = slot >= 0
    tgt = jnp.where(placed, slot, c0)
    l0_sum = fresh.l0_sum.at[tgt].add(
        jnp.where(placed[:, None], new_sum, 0.0), mode="drop")
    l0_count = fresh.l0_count.at[tgt].add(
        jnp.where(placed, state.l0_count, 0), mode="drop")
    n_l0 = jnp.sum((l0_count > 0).astype(jnp.int32))
    state_l0 = (nhi, nlo, l0_sum, l0_count, grid)

    # Rebuild L1: every occupied L0's parent is a candidate cell.
    par = K.parent_coords(coords, hierarchy_factor)
    par_gidx = _grid_index(par, L1_GRID)
    scratch = jnp.full((_l1_size(),), jnp.iinfo(jnp.int32).max, jnp.int32)
    cell_list, src_list, n_cells = _compact_cells(scratch, par_gidx, placed, c1)
    cmask = src_list >= 0
    src_c = jnp.clip(src_list, 0, c0 - 1)
    pcoords = par[src_c]
    phi2, plo2 = K.pack_key(pcoords)
    l1_grid, l1_hi, l1_lo, pslot, _ = _allocate(
        fresh.l1_grid, fresh.l1_hi, fresh.l1_lo, jnp.zeros((c1,), bool),
        jnp.clip(cell_list, 0, _l1_size() - 1), phi2, plo2, cmask, free_cap=c1)
    pok = pslot >= 0
    cnt, mean, cov, _, _ = _cell_children_stats(state_l0, pcoords, pok)
    lam, normal = eigh3.eigh3(cov)
    plan = lam[:, 0] / (lam[:, 2] + 1e-6)
    has = pok & (cnt >= MIN_OCCUPIED_CHILDREN) & (plan <= planarity_threshold)

    wslot = jnp.where(pok, pslot, c1)
    l1_child = fresh.l1_child_count.at[wslot].set(cnt, mode="drop")
    l1_has = fresh.l1_has_surfel.at[wslot].set(has, mode="drop")
    l1_normal = fresh.l1_normal.at[wslot].set(normal, mode="drop")
    l1_centroid = fresh.l1_centroid.at[wslot].set(mean, mode="drop")
    l1_plan = fresh.l1_planarity.at[wslot].set(plan, mode="drop")
    l1_last = fresh.l1_last_count.at[wslot].set(cnt, mode="drop")
    n_l1 = jnp.sum((l1_child > 0).astype(jnp.int32))

    return VoxelMapState(
        l0_hi=nhi, l0_lo=nlo, l0_sum=l0_sum, l0_count=l0_count, n_l0=n_l0,
        l0_grid=grid,
        l1_hi=l1_hi, l1_lo=l1_lo, l1_normal=l1_normal,
        l1_centroid=l1_centroid, l1_planarity=l1_plan, l1_has_surfel=l1_has,
        l1_child_count=l1_child, l1_last_count=l1_last, n_l1=n_l1,
        l1_grid=l1_grid)


def l0_points(state: VoxelMapState):
    """All L0 centroids + validity mask (reference GetPointCloud,
    VoxelMap.cpp:388-403)."""
    valid = state.l0_count > 0
    centroid = state.l0_sum / jnp.maximum(state.l0_count, 1)[:, None].astype(jnp.float32)
    return centroid, valid
