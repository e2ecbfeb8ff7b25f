"""Sharded voxel surfel map over a device mesh.

The single-chip map (ops/voxel_map.py) is a slot table indexed by a dense
modular grid. Distribution: the SLOT arrays shard contiguously over the
`map` mesh axis (shard k owns global slots [k*C/D, (k+1)*C/D)); the dense
grid — which maps a voxel cell to its global slot id — is small (int32)
and REPLICATED. A lookup gathers the grid locally, and the shard owning
the resolved slot answers; a psum combines the one-hot results — the
"tensor parallel" analog of SURVEY.md §2.4 (single-host hash tables ->
sharded gather).

The ICP inner reduction composes: each shard computes partial 6x6 normal
equations from the correspondences it owns, and one psum over `map`
yields the global (H, g) — the distributed version of the reference's GN
accumulation (IterativeClosestPointOptimizer.cpp:359-410).

Updates re-run the single-chip scatter program on gathered slots (round-1
path; a slot-local distributed allocator is the planned upgrade).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import icp as icp_ops
from ..ops import voxel_map as vm
from ..utils import keys as K
from ..utils import lie

__all__ = ["shard_map_state", "sharded_lookup_surfels", "sharded_icp_step",
           "map_specs"]

_REPLICATED = ("n_l0", "n_l1", "l0_grid", "l1_grid")


def map_specs(mesh_axis: str = "map", batch_axis: str = None) -> vm.VoxelMapState:
    """PartitionSpec per VoxelMapState field: slot arrays sharded over
    `mesh_axis`, grids + counters replicated (optionally batched over
    `batch_axis` as the leading dim)."""
    lead = (batch_axis,) if batch_axis else ()
    spec = {}
    for name in vm.VoxelMapState._fields:
        if name in _REPLICATED:
            spec[name] = P(*lead)
        else:
            spec[name] = P(*lead, mesh_axis)
    return vm.VoxelMapState(**spec)


def shard_map_state(state: vm.VoxelMapState, mesh: Mesh,
                    mesh_axis: str = "map") -> vm.VoxelMapState:
    specs = map_specs(mesh_axis)
    return vm.VoxelMapState(*[
        jax.device_put(arr, NamedSharding(mesh, s))
        for arr, s in zip(tuple(state), tuple(specs))])


def _local_lookup(l1_hi, l1_lo, l1_normal, l1_centroid, l1_has, l1_grid,
                  pts, voxel_size: float, hierarchy_factor: int,
                  mesh_axis: str):
    """Per-shard surfel lookup: the replicated grid resolves the global
    slot; this shard answers only for slots in its range (misses return
    zeros so a psum combines shards)."""
    shard = l1_hi.shape[0]
    offset = jax.lax.axis_index(mesh_axis) * shard
    inv = 1.0 / (voxel_size * hierarchy_factor)
    coords = K.voxel_coords(pts, inv)
    qhi, qlo = K.pack_key(coords)
    gidx = vm._grid_index(coords, vm.L1_GRID)
    slot = l1_grid[gidx]
    local = slot - offset
    mine = (slot >= 0) & (local >= 0) & (local < shard)
    local_c = jnp.clip(local, 0, shard - 1)
    hit = mine & K.key_eq(l1_hi[local_c], l1_lo[local_c], qhi, qlo) \
        & l1_has[local_c]
    normal = jnp.where(hit[:, None], l1_normal[local_c], 0.0)
    centroid = jnp.where(hit[:, None], l1_centroid[local_c], 0.0)
    return normal, centroid, hit


def sharded_lookup_surfels(state: vm.VoxelMapState, pts: jax.Array, mesh: Mesh,
                           *, voxel_size: float, hierarchy_factor: int = 3,
                           mesh_axis: str = "map"):
    """Distributed GetSurfelAtPoint: replicated queries, shard-owned
    answers, psum combine (exactly one shard can own a slot)."""

    def kernel(l1_hi, l1_lo, l1_n, l1_c, l1_has, l1_grid, q):
        normal, centroid, hit = _local_lookup(
            l1_hi, l1_lo, l1_n, l1_c, l1_has, l1_grid, q,
            voxel_size, hierarchy_factor, mesh_axis)
        normal = jax.lax.psum(normal, mesh_axis)
        centroid = jax.lax.psum(centroid, mesh_axis)
        hit = jax.lax.psum(hit.astype(jnp.int32), mesh_axis) > 0
        return normal, centroid, hit

    in_specs = (P(mesh_axis), P(mesh_axis), P(mesh_axis), P(mesh_axis),
                P(mesh_axis), P(), P())
    return jax.shard_map(
        kernel, mesh=mesh, in_specs=in_specs, out_specs=(P(), P(), P()),
        check_vma=False)(
        state.l1_hi, state.l1_lo, state.l1_normal, state.l1_centroid,
        state.l1_has_surfel, state.l1_grid, pts)


def sharded_icp_step(state: vm.VoxelMapState, pts: jax.Array, mask: jax.Array,
                     T: jax.Array, mesh: Mesh, cfg: icp_ops.ICPConfig,
                     mesh_axis: str = "map"):
    """One distributed GN step: per-shard correspondence + partial (H, g),
    psum over the map axis, replicated 6x6 solve + retraction.
    Returns (T_new, n_correspondences)."""

    def kernel(l1_hi, l1_lo, l1_n, l1_c, l1_has, l1_grid, p, m, T_in):
        R, t = lie.se3_rt(T_in)
        p_world = p @ R.T + t[None, :]
        normal, centroid, hit = _local_lookup(
            l1_hi, l1_lo, l1_n, l1_c, l1_has, l1_grid, p_world,
            cfg.voxel_size, cfg.hierarchy_factor, mesh_axis)
        r = jnp.sum(normal * (p_world - centroid), axis=-1)
        valid = hit & m & (jnp.abs(r) <= cfg.max_correspondence_distance)
        w = valid.astype(jnp.float32)
        a = normal @ R
        J = jnp.concatenate([a, jnp.cross(p, a)], axis=-1)
        Jw = J * w[:, None]
        H = J.T @ Jw
        g = J.T @ (w * r)
        H = jax.lax.psum(H, mesh_axis)
        g = jax.lax.psum(g, mesh_axis)
        n = jax.lax.psum(jnp.sum(w), mesh_axis)
        H = H + jnp.eye(6) * 1e-8
        delta = jnp.linalg.solve(H, -g)
        T_new = T_in @ lie.se3_from_exp_rt(delta[:3], delta[3:])
        return T_new, n

    in_specs = (P(mesh_axis), P(mesh_axis), P(mesh_axis), P(mesh_axis),
                P(mesh_axis), P(), P(), P(), P())
    return jax.shard_map(
        kernel, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False)(
        state.l1_hi, state.l1_lo, state.l1_normal, state.l1_centroid,
        state.l1_has_surfel, state.l1_grid, pts, mask, T)
