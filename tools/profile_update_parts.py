#!/usr/bin/env python3
"""Bracket update_map cost at blocked B=4 shapes by disabling pieces:
full / no-surfels / no-evict / empty-mask."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B

from lidar_odometry_tpu.models import fast_pipeline as fp
from lidar_odometry_tpu.ops import icp, pko, voxel_map as vm
from lidar_odometry_tpu.utils import lie


def main():
    icp_cfg = icp.ICPConfig(
        max_iterations=4, translation_tolerance=0.005, rotation_tolerance=0.005,
        max_correspondence_distance=1.0, min_correspondence_points=50,
        use_robust_loss=True, use_surfel_correspondence=True,
        loss_type="huber", use_adaptive_m_estimator=True, voxel_size=0.5)
    consts = pko.make_pko_constants(0.1, 10.0, 100, 10.0, "huber", 3, 100)
    kw = dict(scan_voxel_size=0.5, point_stride=8, scan_capacity=14336,
              keyframe_distance=1.0, keyframe_rotation=0.3,
              max_distance=120.0, planarity_threshold=0.1)
    Bn, block = 4, 4
    scans_np, _ = B.make_scans()
    n_chunks = B.N_FRAMES // B.CHUNK
    seq = [scans_np]
    for b in range(1, Bn):
        s_b, _ = B.make_scans(seed=11 + b)
        seq.append(s_b)
    batch_np = np.stack(seq).reshape(Bn, n_chunks, B.CHUNK, B.RAW_N, 3)
    boot = fp.make_blocked_runner(icp_cfg, consts, batch=Bn, block=1, **kw)
    cb = fp.init_blocked_carry(Bn, 262144 * Bn, 65536 * Bn)
    for c in range(3):
        cb, (pb, _, _) = boot(cb, jnp.asarray(batch_np[:, c]))
    jax.block_until_ready(pb)
    state = cb.map_state

    pre, _, _ = fp._make_parts(icp_cfg, consts, **kw)
    offs = np.zeros((Bn, 3), np.float32)
    offs[:, 0] = np.arange(Bn) * 1024.0
    homes = np.tile(np.eye(4, dtype=np.float32), (Bn, 1, 1))
    homes[:, :3, 3] = offs
    homes_j = jnp.asarray(homes)
    lane_axes = fp.OdomCarry(map_state=None, T_prev=0, velocity=0,
                             last_kf_pose=0, initialized=0, kf_count=0)

    @jax.jit
    def build_block(carry, scans_blk):
        ins_pts, ins_msk = [], []
        for j in range(block):
            T, vel, is_kf, n_corr, feat, mask = jax.vmap(
                pre, in_axes=(lane_axes, 0, 0))(carry, scans_blk[j], homes_j)
            carry = carry._replace(
                T_prev=T, velocity=vel,
                last_kf_pose=jnp.where(is_kf[:, None, None], T,
                                       carry.last_kf_pose))
            world = jax.vmap(lie.transform_points)(T, feat)
            ins_pts.append(world)
            ins_msk.append(mask & is_kf[:, None])
        return (jnp.concatenate(ins_pts).reshape(-1, 3),
                jnp.concatenate(ins_msk).reshape(-1),
                carry.T_prev[:, :3, 3])

    blk = jnp.swapaxes(jnp.asarray(batch_np[:, 3]), 0, 1)[:block]
    pts_all, msk_all, sensors = build_block(cb, blk)
    jax.block_until_ready(pts_all)

    def timed(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*args)
            jax.block_until_ready(out.n_l0)
        print(f"{name:28s} {(time.perf_counter()-t0)/5*1e3:8.1f} ms")

    mk = lambda surf, maxd: jax.jit(lambda st, p_, m_, s_: vm.update_map(
        st, p_, m_, s_, jnp.float32(maxd), voxel_size=0.5,
        planarity_threshold=0.1, hierarchy_factor=3, compute_surfels=surf))

    timed("full", mk(True, 120.0), state, pts_all, msk_all, sensors)
    timed("no-surfels", mk(False, 120.0), state, pts_all, msk_all, sensors)
    timed("no-evict", mk(True, 1e30), state, pts_all, msk_all, sensors)
    timed("empty-mask", mk(True, 120.0), state, pts_all,
          jnp.zeros_like(msk_all), sensors)
    timed("empty-mask+no-evict", mk(True, 1e30), state, pts_all,
          jnp.zeros_like(msk_all), sensors)


if __name__ == "__main__":
    main()
