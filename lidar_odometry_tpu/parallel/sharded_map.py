"""Spatially-sharded voxel surfel map over a device mesh.

The single-chip map (ops/voxel_map.py) is a sorted key table; sharding it
CONTIGUOUSLY along the capacity dimension over the `map` mesh axis yields
key-range shards: each device owns a sorted slice, any key lives on
exactly one shard, and the O(log C) lookup becomes a local
O(log C/D) search + a psum that combines the one-hot hits — the
"tensor parallel" analog of SURVEY.md §2.4 (single-host hash tables ->
sharded gather).

The ICP inner reduction composes with this: each shard finds the
correspondences IT owns for all (replicated) query points and computes a
partial 6x6 H and gradient g; a psum over the `map` axis produces the
global normal equations — the distributed version of the reference's GN
accumulation (IterativeClosestPointOptimizer.cpp:359-410).

Updates re-sort globally: round 1 gathers shard slices, applies the
single-chip update, and re-shards (correct, not bandwidth-optimal; a
merge-path Pallas kernel is the planned upgrade).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import icp as icp_ops
from ..ops import voxel_map as vm
from ..utils import keys as K
from ..utils import lie

__all__ = ["shard_map_state", "sharded_lookup_surfels", "sharded_icp_step",
            "gather_map_state"]


def _map_specs(mesh_axis: str = "map"):
    """PartitionSpec per VoxelMapState field: table dims sharded, scalars
    replicated."""
    spec = {}
    for name in vm.VoxelMapState._fields:
        if name.startswith("n_"):
            spec[name] = P()
        else:
            spec[name] = P(mesh_axis)
    return vm.VoxelMapState(**spec)


def shard_map_state(state: vm.VoxelMapState, mesh: Mesh,
                    mesh_axis: str = "map") -> vm.VoxelMapState:
    """Place a map state onto the mesh with capacity dims sharded over
    `mesh_axis`. The table is already globally sorted, so contiguous
    shards are key ranges."""
    specs = _map_specs(mesh_axis)
    return vm.VoxelMapState(*[
        jax.device_put(arr, NamedSharding(mesh, s))
        for arr, s in zip(tuple(state), tuple(specs))])


def gather_map_state(state: vm.VoxelMapState) -> vm.VoxelMapState:
    return vm.VoxelMapState(*[jax.device_get(a) for a in tuple(state)])


def _local_lookup(l1_hi, l1_lo, l1_normal, l1_centroid, l1_has, pts,
                  voxel_size: float, hierarchy_factor: int):
    """Per-shard surfel lookup: local binary search over the shard's sorted
    key slice; misses return zeros so a psum combines shards."""
    inv = 1.0 / (voxel_size * hierarchy_factor)
    coords = K.voxel_coords(pts, inv)
    qhi, qlo = K.pack_key(coords)
    pos = K.searchsorted2(l1_hi, l1_lo, qhi, qlo)
    c = l1_hi.shape[0]
    pos_c = jnp.minimum(pos, c - 1)
    hit = K.key_eq(l1_hi[pos_c], l1_lo[pos_c], qhi, qlo) & l1_has[pos_c]
    normal = jnp.where(hit[:, None], l1_normal[pos_c], 0.0)
    centroid = jnp.where(hit[:, None], l1_centroid[pos_c], 0.0)
    return normal, centroid, hit


def sharded_lookup_surfels(state: vm.VoxelMapState, pts: jax.Array, mesh: Mesh,
                           *, voxel_size: float, hierarchy_factor: int = 3,
                           mesh_axis: str = "map"):
    """Distributed GetSurfelAtPoint: queries replicated, shards answer for
    their key range, psum combines (exactly one shard can hit a key)."""

    def kernel(l1_hi, l1_lo, l1_n, l1_c, l1_has, q):
        normal, centroid, hit = _local_lookup(
            l1_hi, l1_lo, l1_n, l1_c, l1_has, q, voxel_size, hierarchy_factor)
        normal = jax.lax.psum(normal, mesh_axis)
        centroid = jax.lax.psum(centroid, mesh_axis)
        hit = jax.lax.psum(hit.astype(jnp.int32), mesh_axis) > 0
        return normal, centroid, hit

    other_axes = tuple(a for a in mesh.axis_names if a != mesh_axis)
    in_specs = (P(mesh_axis), P(mesh_axis), P(mesh_axis), P(mesh_axis),
                P(mesh_axis), P())
    return jax.shard_map(
        kernel, mesh=mesh, in_specs=in_specs, out_specs=(P(), P(), P()),
        check_vma=False)(
        state.l1_hi, state.l1_lo, state.l1_normal, state.l1_centroid,
        state.l1_has_surfel, pts)


def sharded_icp_step(state: vm.VoxelMapState, pts: jax.Array, mask: jax.Array,
                     T: jax.Array, mesh: Mesh, cfg: icp_ops.ICPConfig,
                     mesh_axis: str = "map"):
    """One distributed GN step: per-shard correspondence + partial (H, g),
    psum over the map axis, replicated 6x6 solve + retraction.
    Returns (T_new, n_correspondences)."""

    def kernel(l1_hi, l1_lo, l1_n, l1_c, l1_has, p, m, T_in):
        R, t = lie.se3_rt(T_in)
        p_world = p @ R.T + t[None, :]
        normal, centroid, hit = _local_lookup(
            l1_hi, l1_lo, l1_n, l1_c, l1_has, p_world,
            cfg.voxel_size, cfg.hierarchy_factor)
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
                P(mesh_axis), P(), P(), P())
    return jax.shard_map(
        kernel, mesh=mesh, in_specs=in_specs, out_specs=(P(), P()),
        check_vma=False)(
        state.l1_hi, state.l1_lo, state.l1_normal, state.l1_centroid,
        state.l1_has_surfel, pts, mask, T)
