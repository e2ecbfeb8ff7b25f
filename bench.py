#!/usr/bin/env python3
"""Benchmark: scans/sec/chip on a KITTI-07-like workload.

Runs the fused odometry fast path (voxel filter + surfel ICP with PKO +
keyframe map updates, one lax.scan chunk per dispatch) on synthetic
KITTI-like scans (~128k raw points, stride 8, 0.5 m voxels — the
reference's KITTI operating point, config/kitti.yaml:17-18,35) with scans
pre-staged in device memory (the native prefetcher's job in production).

Prints ONE JSON line:
  {"metric": "scans_per_sec_per_chip", "value": N, "unit": "scans/s",
   "vs_baseline": N/400}
(the reference's headline number is ~400 FPS on KITTI, README.md:3).
Accuracy is sanity-checked (ATE vs the synthetic ground truth) so the
throughput number is for a working pipeline, not a no-op.
"""
import json
import os
import sys
import time

import numpy as np


RAW_N = 131072          # KITTI velodyne scan size
N_FRAMES = 120
CHUNK = 20
WARMUP_CHUNKS = 1


def make_scans():
    from lidar_odometry_tpu.io import synthetic
    world = synthetic.make_world(seed=11, extent=120.0, n_buildings=28)
    poses = synthetic.straight_trajectory(N_FRAMES, step=0.25)  # ~10 m/s @ 10 Hz... 0.25m/frame
    rng = np.random.default_rng(11)
    scans = np.full((N_FRAMES, RAW_N, 3), np.nan, np.float32)
    for i in range(N_FRAMES):
        s = synthetic.sample_scan(world, poses[i], RAW_N, rng,
                                  max_range=80.0, noise=0.01)
        scans[i, : len(s)] = s
    return scans, poses


def main():
    import jax
    import jax.numpy as jnp

    from lidar_odometry_tpu.models import fast_pipeline as fp
    from lidar_odometry_tpu.ops import icp, pko
    from lidar_odometry_tpu.eval import ate_rmse

    platform = jax.devices()[0].platform
    print(f"# device: {jax.devices()[0]} ({platform})", file=sys.stderr)

    icp_cfg = icp.ICPConfig(
        max_iterations=4, translation_tolerance=0.005, rotation_tolerance=0.005,
        max_correspondence_distance=1.0, min_correspondence_points=50,
        use_robust_loss=True, use_surfel_correspondence=True,
        loss_type="huber", use_adaptive_m_estimator=True, voxel_size=0.5)
    consts = pko.make_pko_constants(0.1, 10.0, 100, 10.0, "huber", 3, 100)

    chunk_runner = fp.make_chunk_runner(
        icp_cfg, consts, scan_voxel_size=0.5, point_stride=8,
        scan_capacity=16384, keyframe_distance=1.0, keyframe_rotation=0.3,
        max_distance=120.0, planarity_threshold=0.1)

    print("# generating scans...", file=sys.stderr)
    scans_np, gt_poses = make_scans()
    n_chunks = N_FRAMES // CHUNK
    scans = jnp.asarray(scans_np.reshape(n_chunks, CHUNK, RAW_N, 3))
    jax.block_until_ready(scans)

    carry = fp.init_carry(c0=262144, c1=65536)

    print("# compiling + warmup...", file=sys.stderr)
    t0 = time.perf_counter()
    carry, (poses0, kf0, nc0) = chunk_runner(carry, scans[0])
    jax.block_until_ready(poses0)
    print(f"# warmup chunk: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    all_poses = [np.asarray(poses0)]
    t0 = time.perf_counter()
    for c in range(WARMUP_CHUNKS, n_chunks):
        carry, (poses, kf, nc) = chunk_runner(carry, scans[c])
        all_poses.append(np.asarray(poses))  # sync each chunk
    elapsed = time.perf_counter() - t0
    frames_timed = (n_chunks - WARMUP_CHUNKS) * CHUNK
    fps = frames_timed / elapsed

    est = np.concatenate(all_poses)
    err = ate_rmse(est, gt_poses)
    kf_total = int(carry.kf_count)
    print(f"# frames={frames_timed} time={elapsed:.2f}s ate_rmse={err:.3f}m "
          f"keyframes={kf_total} map_l0={int(carry.map_state.n_l0)}",
          file=sys.stderr)
    if err > 0.5:
        print(f"# WARNING: accuracy degraded (ATE {err:.3f} m)", file=sys.stderr)

    print(json.dumps({
        "metric": "scans_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "scans/s",
        "vs_baseline": round(fps / 400.0, 3),
    }))


if __name__ == "__main__":
    main()
