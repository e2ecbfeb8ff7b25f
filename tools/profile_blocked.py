#!/usr/bin/env python3
"""Attribute blocked-runner (B=4) step time: pre-only (filter+ICP per
lane) vs full (pre + per-block masked shared-map update), on the bench
workload's steady state. Run on the real TPU with no other JAX process
alive."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B  # reuse the bench workload generator/config

from functools import partial
from lidar_odometry_tpu.models import fast_pipeline as fp
from lidar_odometry_tpu.ops import icp, pko
from lidar_odometry_tpu.utils import lie


def make_pre_only_runner(icp_cfg, consts, *, batch, block=4,
                         lane_spacing_m=1024.0, **kw):
    """Blocked runner with the map update REMOVED (map frozen): isolates
    the per-frame work from the per-block shared-map update."""
    pre, _, _ = fp._make_parts(icp_cfg, consts, **kw)
    offs = np.zeros((batch, 3), np.float32)
    offs[:, 0] = np.arange(batch) * lane_spacing_m
    offs_j = jnp.asarray(offs)
    homes = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    homes[:, :3, 3] = offs
    homes_j = jnp.asarray(homes)
    lane_axes = fp.OdomCarry(map_state=None, T_prev=0, velocity=0,
                             last_kf_pose=0, initialized=0, kf_count=0)

    def block_body(carry, scans_blk):
        outs = []
        for j in range(block):
            T, vel, is_kf, n_corr, feat, mask = jax.vmap(
                pre, in_axes=(lane_axes, 0, 0))(carry, scans_blk[j], homes_j)
            carry = fp.OdomCarry(
                map_state=carry.map_state, T_prev=T, velocity=vel,
                last_kf_pose=jnp.where(is_kf[:, None, None], T,
                                       carry.last_kf_pose),
                initialized=jnp.ones_like(carry.initialized),
                kf_count=carry.kf_count + is_kf.astype(jnp.int32))
            outs.append((T.at[:, :3, 3].add(-offs_j), is_kf, n_corr))
        T_s = jnp.stack([o[0] for o in outs])
        return carry, (T_s,)

    @partial(jax.jit, donate_argnums=(0,))
    def chunk(carry, scans):
        b, f, n, _ = scans.shape
        blk = jnp.swapaxes(scans, 0, 1).reshape(f // block, block, b, n, 3)
        carry, (T,) = jax.lax.scan(block_body, carry, blk)
        return carry, T

    return chunk


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    icp_cfg = icp.ICPConfig(
        max_iterations=4, translation_tolerance=0.005, rotation_tolerance=0.005,
        max_correspondence_distance=1.0, min_correspondence_points=50,
        use_robust_loss=True, use_surfel_correspondence=True,
        loss_type="huber", use_adaptive_m_estimator=True, voxel_size=0.5)
    consts = pko.make_pko_constants(0.1, 10.0, 100, 10.0, "huber", 3, 100)
    kw = dict(scan_voxel_size=0.5, point_stride=8, scan_capacity=14336,
              keyframe_distance=1.0, keyframe_rotation=0.3,
              max_distance=120.0, planarity_threshold=0.1)
    Bn = 4
    scans_np, _ = B.make_scans()
    n_chunks = B.N_FRAMES // B.CHUNK
    seq = [scans_np]
    for b in range(1, Bn):
        s_b, _ = B.make_scans(seed=11 + b)
        seq.append(s_b)
    batch_np = np.stack(seq).reshape(Bn, n_chunks, B.CHUNK, B.RAW_N, 3)

    boot = fp.make_blocked_runner(icp_cfg, consts, batch=Bn, block=1, **kw)
    blocked = fp.make_blocked_runner(icp_cfg, consts, batch=Bn, block=4, **kw)
    pre_only = make_pre_only_runner(icp_cfg, consts, batch=Bn, block=4, **kw)

    cb = fp.init_blocked_carry(Bn, 262144 * Bn, 65536 * Bn)
    chunks = [jnp.asarray(batch_np[:, c]) for c in range(n_chunks)]
    jax.block_until_ready(chunks)

    # boot 2 chunks so the map is steady
    for c in range(2):
        cb, (pb, _, _) = boot(cb, chunks[c])
    jax.block_until_ready(pb)

    # snapshot carry for the pre-only run (deep copy since runners donate)
    cb_copy = jax.tree_util.tree_map(lambda a: a + 0 if hasattr(a, 'dtype')
                                     else a, cb)

    # full blocked steady
    cb2, (pb, _, _) = blocked(cb, chunks[2])  # warm compile
    jax.block_until_ready(pb)
    t0 = time.perf_counter()
    for c in range(3, n_chunks):
        cb2, (pb, _, _) = blocked(cb2, chunks[c])
    jax.block_until_ready(pb)
    full_ms = (time.perf_counter() - t0) / (n_chunks - 3) * 1e3
    print(f"full blocked chunk (20 frames x 4 lanes): {full_ms:.1f} ms "
          f"-> {Bn * B.CHUNK * (n_chunks - 3) * 1e3 / (full_ms * (n_chunks - 3)):.0f} scans/s",
          file=sys.stderr)

    cbp, pT = pre_only(cb_copy, chunks[2])  # warm compile
    jax.block_until_ready(pT)
    t0 = time.perf_counter()
    for c in range(3, n_chunks):
        cbp, pT = pre_only(cbp, chunks[c])
    jax.block_until_ready(pT)
    pre_ms = (time.perf_counter() - t0) / (n_chunks - 3) * 1e3
    print(f"pre-only blocked chunk: {pre_ms:.1f} ms", file=sys.stderr)
    print(f"=> update share: {full_ms - pre_ms:.1f} ms/chunk "
          f"({(full_ms - pre_ms) / 5:.1f} ms per block-update)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
