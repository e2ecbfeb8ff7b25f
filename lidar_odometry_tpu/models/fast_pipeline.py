"""Fused odometry fast path: N frames per device dispatch.

The reference processes scans one at a time on a CPU frame loop
(reference kitti_player.cpp:79-150 -> Estimator::process_frame). On TPU,
per-call dispatch and host round-trips would dominate at hundreds of
scans/s, so the whole per-frame pipeline — voxel filter, ICP (with PKO),
velocity model, keyframe decision, conditional map update — is expressed
as ONE pure function and rolled over a chunk of scans with `lax.scan`:
one XLA program per chunk, all SLAM state device-resident, poses and
keyframe flags returned per chunk.

Loop closure / PGO stay host-driven between chunks (they are asynchronous
to odometry in the reference too — the background thread of
Estimator.cpp:890); `Estimator` remains the full-featured orchestrator,
this module is the throughput engine used by bench.py and batch drivers.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import icp as icp_ops
from ..ops import pko as pko_ops
from ..ops import voxel_filter as vf
from ..ops import voxel_map as vm
from ..utils import lie

__all__ = ["OdomCarry", "init_carry", "make_chunk_runner",
           "init_batched_carry", "make_batched_chunk_runner"]


class OdomCarry(NamedTuple):
    map_state: vm.VoxelMapState
    T_prev: jax.Array          # (4,4) previous frame pose
    velocity: jax.Array        # (4,4) constant-velocity model
    last_kf_pose: jax.Array    # (4,4)
    initialized: jax.Array     # () bool
    kf_count: jax.Array        # () int32


def init_carry(c0: int, c1: int) -> OdomCarry:
    # distinct buffers per field: the chunk runner donates the carry, and
    # aliased buffers would be donated twice
    return OdomCarry(
        map_state=vm.empty_map(c0, c1),
        T_prev=jnp.eye(4, dtype=jnp.float32),
        velocity=jnp.eye(4, dtype=jnp.float32),
        last_kf_pose=jnp.eye(4, dtype=jnp.float32),
        initialized=jnp.bool_(False), kf_count=jnp.int32(0))


def make_chunk_runner(icp_cfg: icp_ops.ICPConfig, pko_consts: pko_ops.PKOConstants,
                      **kw):
    """Build chunk(carry, scans (F, N, 3)) -> (carry, (poses (F,4,4),
    is_kf (F,), n_corr (F,))). Scans are raw padded clouds; pad slots must
    be non-finite (NaN) so the voxel filter drops them
    (reference semantics: Estimator.cpp:561-589 preprocess + :116-233)."""
    frame_step = _make_frame_step(icp_cfg, pko_consts, masked_update=False, **kw)

    # The carry (which contains the full map state) is donated: callers
    # must treat the passed-in carry as consumed (all in-tree callers
    # reassign it). Donation lets XLA alias the state buffers in place
    # through the keyframe conditional instead of copying them per frame.
    @partial(jax.jit, donate_argnums=(0,))
    def chunk(carry: OdomCarry, scans):
        return jax.lax.scan(frame_step, carry, scans)

    return chunk


def _make_frame_step(icp_cfg: icp_ops.ICPConfig, pko_consts: pko_ops.PKOConstants,
                     *, scan_voxel_size: float, point_stride: int,
                     scan_capacity: int, keyframe_distance: float,
                     keyframe_rotation: float, max_distance: float,
                     planarity_threshold: float,
                     compute_surfels: bool = True,
                     masked_update: bool = False):

    def frame_step(carry: OdomCarry, raw_scan):
        feat, mask, _ = vf.voxel_filter(
            raw_scan, jnp.int32(raw_scan.shape[0]),
            voxel_size=scan_voxel_size, stride=point_stride,
            out_capacity=scan_capacity)

        guess = carry.T_prev @ carry.velocity
        T_icp, success, n_corr = icp_ops.icp_optimize(
            carry.map_state, feat, mask, guess, pko_consts, icp_cfg)
        eye = jnp.eye(4, dtype=jnp.float32)
        # Re-orthonormalize the rotation once per frame: the velocity-model
        # recursion T_prev @ inv(T_prev2) @ T_prev SQUARES any shear in R
        # (se3_inv assumes orthogonality), which otherwise compounds
        # exponentially. The reference gets this implicitly by projecting
        # to SO(3) on every SE3 construction (MathUtils.cpp:86-99).
        T_icp = lie.se3_matrix(lie.so3_project(T_icp[:3, :3]), T_icp[:3, 3])
        T = jnp.where(carry.initialized, T_icp, eye)

        velocity = jnp.where(carry.initialized,
                             lie.se3_inv(carry.T_prev) @ T, eye)

        # Keyframe decision (reference should_create_keyframe,
        # Estimator.cpp:349-368)
        diff = T[:3, 3] - carry.last_kf_pose[:3, 3]
        dist = jnp.linalg.norm(diff)
        R_rel = carry.last_kf_pose[:3, :3].T @ T[:3, :3]
        cos_t = jnp.clip((jnp.trace(R_rel) - 1.0) * 0.5, -1.0, 1.0)
        angle = jnp.arccos(cos_t)
        is_kf = (~carry.initialized) | (dist > keyframe_distance) | (angle > keyframe_rotation)

        if masked_update:
            # vmap-friendly path: run the update unconditionally but make a
            # non-keyframe a no-op (no inserts; eviction disabled by an
            # infinite radius). Same semantics as the cond, select-safe.
            world = lie.transform_points(T, feat)
            map_state = vm.update_map(
                carry.map_state, world, mask & is_kf, T[:3, 3],
                jnp.where(is_kf, jnp.float32(max_distance), jnp.float32(1e30)),
                voxel_size=icp_cfg.voxel_size,
                planarity_threshold=planarity_threshold,
                hierarchy_factor=icp_cfg.hierarchy_factor,
                compute_surfels=compute_surfels)
        else:
            def do_update(ms):
                world = lie.transform_points(T, feat)
                return vm.update_map(
                    ms, world, mask, T[:3, 3], max_distance,
                    voxel_size=icp_cfg.voxel_size,
                    planarity_threshold=planarity_threshold,
                    hierarchy_factor=icp_cfg.hierarchy_factor,
                    compute_surfels=compute_surfels)

            map_state = jax.lax.cond(is_kf, do_update, lambda ms: ms,
                                     carry.map_state)

        new_carry = OdomCarry(
            map_state=map_state, T_prev=T, velocity=velocity,
            last_kf_pose=jnp.where(is_kf, T, carry.last_kf_pose),
            initialized=jnp.bool_(True),
            kf_count=carry.kf_count + is_kf.astype(jnp.int32))
        return new_carry, (T, is_kf, n_corr)

    return frame_step


def init_batched_carry(batch: int, c0: int, c1: int) -> OdomCarry:
    one = init_carry(c0, c1)
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape).copy(), one)


def make_batched_chunk_runner(icp_cfg: icp_ops.ICPConfig,
                              pko_consts: pko_ops.PKOConstants, **kw):
    """Multi-sequence throughput mode: the whole frame step vmapped over a
    leading batch of independent sequences (the data-parallel axis of
    SURVEY.md §2.4, on one chip). Under vmap, lax.cond becomes a select
    that executes the map update every frame, so the update is made
    semantically keyframe-only by masking its inputs (a non-keyframe
    inserts nothing and evicts nothing) rather than by branching.

    chunk(carry_B, scans (B, F, N, 3)) -> (carry_B, (poses (B, F, 4, 4),
    is_kf (B, F), n_corr (B, F))).
    """
    inner = _make_frame_step(icp_cfg, pko_consts, masked_update=True, **kw)

    @jax.jit
    def chunk(carry: OdomCarry, scans):
        def scan_one(c, xs):
            return jax.lax.scan(inner, c, xs)
        return jax.vmap(scan_one)(carry, scans)

    return chunk
