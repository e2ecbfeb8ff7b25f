"""Sharded voxel surfel map over a device mesh.

The single-chip map (ops/voxel_map.py) is a slot table reached through a
compact hash index. Distribution: SLOT arrays shard contiguously over the
`map` mesh axis (shard k owns global slots [k*C/D, (k+1)*C/D)); the hash
INDICES (int32, 4x capacity) are small and REPLICATED. A probe round
resolves a global slot id from the replicated index, and only the owning
shard verifies the key and answers; a psum combines the one-hot results —
the "tensor parallel" analog of SURVEY.md §2.4 (single-host hash tables
-> sharded gather). All probe rounds run on every shard (fixed depth, no
termination coupling), so exactly one shard can match each key.

The ICP inner reduction composes: each shard computes partial 6x6 normal
equations from the correspondences it owns; one psum over `map` yields
the global (H, g) — the distributed version of the reference's GN
accumulation (IterativeClosestPointOptimizer.cpp:359-410).
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
           "map_specs", "_REPLICATED", "_local_lookup"]

_REPLICATED = ("n_l0", "n_l1", "l0_index", "l1_index")


def map_specs(mesh_axis: str = "map", batch_axis: str = None) -> vm.VoxelMapState:
    """PartitionSpec per VoxelMapState field: slot arrays sharded over
    `mesh_axis`, hash indices + counters replicated (optionally batched
    over `batch_axis` as the leading dim)."""
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


def _local_lookup(l1_key_shard, l1_surfel_shard, l1_index_full, pts,
                  voxel_size: float, hierarchy_factor: int, mesh_axis: str):
    """Per-shard surfel lookup: replicated index resolves global slots;
    this shard answers only for slots in its range (misses return zeros so
    a psum combines shards)."""
    shard = l1_key_shard.shape[0]
    offset = jax.lax.axis_index(mesh_axis) * shard
    inv = 1.0 / (voxel_size * hierarchy_factor)
    coords = K.voxel_coords(pts, inv)
    qhi, qlo = K.pack_key(coords)
    qh_i = jax.lax.bitcast_convert_type(qhi, jnp.int32)
    ql_i = jax.lax.bitcast_convert_type(qlo, jnp.int32)
    h1m = l1_index_full.shape[0] - 1
    n = qhi.shape[0]
    found = jnp.zeros((n,), bool)
    gslot = jnp.full((n,), -1, jnp.int32)
    for r in range(vm.N_PROBES):
        pos = vm._hash_cell(qhi, qlo, h1m, r)
        row = l1_index_full[pos]
        ok = (row[:, 0] >= 0) & (row[:, 1] == qh_i) & (row[:, 2] == ql_i) & ~found
        gslot = jnp.where(ok, row[:, 0], gslot)
        found = found | ok
    local = gslot - offset
    mine = found & (local >= 0) & (local < shard)
    lc = jnp.clip(local, 0, shard - 1)
    k = l1_key_shard[lc]
    hit = mine & (k[:, 0] == qhi) & (k[:, 1] == qlo)  # liveness (slot reuse)
    row = l1_surfel_shard[lc]
    valid = hit & (row[:, 7] > 0.5)
    normal = jnp.where(valid[:, None], row[:, 0:3], 0.0)
    centroid = jnp.where(valid[:, None], row[:, 3:6], 0.0)
    return normal, centroid, valid


def sharded_lookup_surfels(state: vm.VoxelMapState, pts: jax.Array, mesh: Mesh,
                           *, voxel_size: float, hierarchy_factor: int = 3,
                           mesh_axis: str = "map"):
    """Distributed GetSurfelAtPoint: replicated queries, shard-owned
    answers, psum combine (exactly one shard can own a key)."""

    def kernel(l1_key, l1_surfel, l1_index, q):
        normal, centroid, hit = _local_lookup(
            l1_key, l1_surfel, l1_index, q, voxel_size, hierarchy_factor,
            mesh_axis)
        normal = jax.lax.psum(normal, mesh_axis)
        centroid = jax.lax.psum(centroid, mesh_axis)
        hit = jax.lax.psum(hit.astype(jnp.int32), mesh_axis) > 0
        return normal, centroid, hit

    return jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(mesh_axis), P(mesh_axis), P(), P()),
        out_specs=(P(), P(), P()), check_vma=False)(
        state.l1_key, state.l1_surfel, state.l1_index, pts)


def sharded_icp_step(state: vm.VoxelMapState, pts: jax.Array, mask: jax.Array,
                     T: jax.Array, mesh: Mesh, cfg: icp_ops.ICPConfig,
                     mesh_axis: str = "map"):
    """One distributed GN step: per-shard correspondence + partial (H, g),
    psum over the map axis, replicated 6x6 solve + retraction.
    Returns (T_new, n_correspondences)."""

    def kernel(l1_key, l1_surfel, l1_index, p, m, T_in):
        R, t = lie.se3_rt(T_in)
        p_world = p @ R.T + t[None, :]
        normal, centroid, hit = _local_lookup(
            l1_key, l1_surfel, l1_index, p_world,
            cfg.voxel_size, cfg.hierarchy_factor, mesh_axis)
        r = jnp.sum(normal * (p_world - centroid), axis=-1)
        valid = hit & m & (jnp.abs(r) <= cfg.max_correspondence_distance)
        w = valid.astype(jnp.float32)
        a = normal @ R
        J = jnp.concatenate([a, jnp.cross(p, a)], axis=-1)
        H = jax.lax.psum(J.T @ (J * w[:, None]), mesh_axis)
        g = jax.lax.psum(J.T @ (w * r), mesh_axis)
        n = jax.lax.psum(jnp.sum(w), mesh_axis)
        H = H + jnp.eye(6) * 1e-8
        delta = jnp.linalg.solve(H, -g)
        T_new = T_in @ lie.se3_from_exp_rt(delta[:3], delta[3:])
        return T_new, n

    return jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(mesh_axis), P(mesh_axis), P(), P(), P(), P()),
        out_specs=(P(), P()), check_vma=False)(
        state.l1_key, state.l1_surfel, state.l1_index, pts, mask, T)
