"""Multi-chip odometry step: the framework's full per-scan update jitted
over a 2-D device mesh.

Axes (SURVEY.md §2.4):
  * `data`  — independent sequences batched for throughput (the
    data-parallel axis; odometry within a sequence is inherently serial,
    so cross-sequence batching is where device-level scans/s comes from);
  * `map`   — slot-range shards of each sequence's voxel tables (the
    tensor-parallel analog); the dense index grids are replicated.

One step = ICP iterations (per-shard surfel gather, psum of the 6x6
normal equations over `map`) -> conditional keyframe map update
(all_gather of slot shards -> the single-chip scatter-update -> re-shard;
the all_gather is the round-1 update path — a slot-local distributed
allocator replaces it later). Collectives ride ICI: psum + all_gather
inside shard_map.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import icp as icp_ops
from ..ops import voxel_map as vm
from ..utils import lie
from .sharded_map import _REPLICATED, _local_lookup, map_specs

__all__ = ["multichip_odometry_step", "batched_map_state", "shard_batched_state"]


def batched_map_state(batch: int, c0: int, c1: int) -> vm.VoxelMapState:
    """A batch of empty per-sequence maps: every array gains a leading
    `data` dimension."""
    one = vm.empty_map(c0, c1)
    return vm.VoxelMapState(*[
        jnp.broadcast_to(a, (batch,) + a.shape).copy() for a in tuple(one)])


def shard_batched_state(state: vm.VoxelMapState, mesh: Mesh) -> vm.VoxelMapState:
    specs = map_specs("map", batch_axis="data")
    return vm.VoxelMapState(*[
        jax.device_put(a, NamedSharding(mesh, s))
        for a, s in zip(tuple(state), tuple(specs))])


def multichip_odometry_step(mesh: Mesh, cfg: icp_ops.ICPConfig,
                            *, update_max_distance: float = 120.0,
                            planarity_threshold: float = 0.1):
    """Build the jitted multi-chip step.

    Returns step(state, pts, mask, T, is_keyframe) -> (T_new, state_new)
    where state slot tables are (B, C, ...) sharded P('data','map'), grids
    (B, G) sharded P('data'), pts (B, N, 3) sharded P('data')."""

    def per_shard(state: vm.VoxelMapState, pts, mask, T, is_kf):
        def one_seq(st, p, m, T0, kf):
            def icp_iter(_, T_cur):
                R, t = lie.se3_rt(T_cur)
                p_world = p @ R.T + t[None, :]
                normal, centroid, hit = _local_lookup(
                    st.l1_key, st.l1_surfel, st.l1_index, p_world,
                    cfg.voxel_size, cfg.hierarchy_factor, "map")
                r = jnp.sum(normal * (p_world - centroid), axis=-1)
                valid = hit & m & (jnp.abs(r) <= cfg.max_correspondence_distance)
                w = valid.astype(jnp.float32)
                a = normal @ R
                J = jnp.concatenate([a, jnp.cross(p, a)], axis=-1)
                H = jax.lax.psum(J.T @ (J * w[:, None]), "map")
                g = jax.lax.psum(J.T @ (w * r), "map")
                H = H + jnp.eye(6) * 1e-6
                delta = jnp.linalg.solve(H, -g)
                return T_cur @ lie.se3_from_exp_rt(delta[:3], delta[3:])

            T_new = jax.lax.fori_loop(0, cfg.max_iterations, icp_iter, T0)
            T_new = lie.se3_matrix(lie.so3_project(T_new[:3, :3]), T_new[:3, 3])

            # ---- keyframe map update: gather slot shards, run the
            # single-chip scatter update, keep my slice ----
            def do_update(st_in):
                full = vm.VoxelMapState(*[
                    (arr if name in _REPLICATED or name.startswith("n_")
                     else jax.lax.all_gather(arr, "map", tiled=True))
                    for name, arr in zip(vm.VoxelMapState._fields, tuple(st_in))])
                world = lie.transform_points(T_new, p)
                updated = vm.update_map(
                    full, world, m, T_new[:3, 3], update_max_distance,
                    voxel_size=cfg.voxel_size,
                    planarity_threshold=planarity_threshold,
                    hierarchy_factor=cfg.hierarchy_factor)
                idx = jax.lax.axis_index("map")
                n_shards = jax.lax.axis_size("map")

                def my_slice(name, arr):
                    if name in _REPLICATED or name.startswith("n_"):
                        return arr
                    c = arr.shape[0] // n_shards
                    return jax.lax.dynamic_slice_in_dim(arr, idx * c, c, axis=0)

                return vm.VoxelMapState(*[
                    my_slice(name, arr) for name, arr in
                    zip(vm.VoxelMapState._fields, tuple(updated))])

            st_out = jax.lax.cond(kf, do_update, lambda s: s, st)
            return T_new, st_out

        return jax.vmap(one_seq)(state, pts, mask, T, is_kf)

    specs = map_specs("map", batch_axis="data")
    step = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(specs, P("data"), P("data"), P("data"), P("data")),
        out_specs=(P("data"), specs),
        check_vma=False)
    return jax.jit(step)
