#!/usr/bin/env python3
"""KITTI-07-shaped accuracy benchmark (round-1 verdict item 2).

A >=1000-frame stadium-circuit trajectory (two straights + two
semicircular corners, ~2.1 laps so the whole route is revisited) driven
through the FULL pipeline — chunked odometry on device, async loop
closure + PGO — at the reference's KITTI operating point (stride->16k
features, 0.5 m voxels, 4 ICP iters, PKO on, loop gates per
config/kitti.yaml). Reports the reference evaluator's segment errors
(trans %/rot deg/100m, app/player/kitti_player.cpp:576-757), ATE, and the
loop-constraint count, for BOTH odometry-only and loop-enabled runs.
Writes ACCURACY.json at the repo root.
"""
import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_FRAMES = 1280
RAW_N = 65536
CHUNK = 20


def make_scans():
    from lidar_odometry_tpu.io import synthetic
    cache = f"/tmp/acc_scans_{N_FRAMES}_{RAW_N}.npz"
    if os.path.exists(cache):
        d = np.load(cache)
        return d["scans"], d["poses"]
    world = synthetic.make_world(seed=21, extent=130.0, n_buildings=40)
    poses = synthetic.circuit_trajectory(N_FRAMES, length=120.0, radius=25.0,
                                         step=0.65)
    rng = np.random.default_rng(21)
    scans = np.full((N_FRAMES, RAW_N, 3), np.nan, np.float32)
    t0 = time.time()
    for i in range(N_FRAMES):
        s = synthetic.sample_scan(world, poses[i], RAW_N, rng,
                                  max_range=80.0, noise=0.01)
        scans[i, : len(s)] = s
        if i % 200 == 0:
            print(f"#   scan {i}/{N_FRAMES} ({time.time()-t0:.0f}s)",
                  file=sys.stderr)
    try:
        np.savez(cache, scans=scans, poses=poses)
    except Exception:
        pass
    return scans, poses


def run(scans, enable_loop):
    from lidar_odometry_tpu.config import SystemConfig
    from lidar_odometry_tpu.models.estimator import Estimator
    cfg = SystemConfig(
        scan_capacity=14336, map_l0_capacity=262144, map_l1_capacity=65536,
        keyframe_capacity=1024, point_stride=4,
        voxel_size=0.5, map_voxel_size=0.5, max_range=100.0,
        max_iterations=4, use_adaptive_m_estimator=True,
        enable_loop_detection=enable_loop,
        min_keyframe_gap=50, max_search_distance=10.0,
        similarity_threshold=0.35,
        enable_console_statistics=False)
    est = Estimator(cfg)  # async loop/PGO worker, like production
    t0 = time.perf_counter()
    for c in range(0, len(scans), CHUNK):
        est.process_chunk(scans[c:c + CHUNK])
    # drain the loop/PGO pipeline (process the newest still-queued query
    # inline, apply pending PGO) before reading the trajectory
    est.finalize_loops()
    dt = time.perf_counter() - t0
    return est, dt


def main():
    from lidar_odometry_tpu.eval import evaluate_trajectory, ate_rmse

    print("# generating scans...", file=sys.stderr)
    scans, gt = make_scans()

    # Warm the chunk-program compile cache with a throwaway estimator so
    # the measured wall_s/fps reflect steady-state work, not the first
    # invocation's XLA compile (a cold compile is ~10 min on axon and
    # any source edit shifts the cache key).
    print("# warmup (compile cache)...", file=sys.stderr)
    est_w, _ = run(scans[:2 * CHUNK], enable_loop=False)
    est_w.shutdown()

    out = {"kind": "kitti07_like_accuracy",
           "frames": N_FRAMES,
           "path_length_m": round(float(np.sum(np.linalg.norm(
               np.diff(gt[:, :3, 3], axis=0), axis=-1))), 1),
           "laps": 2.1}
    for tag, enable in (("odometry_only", False), ("loop_closure", True)):
        est, dt = run(scans, enable)
        traj = est.trajectory()
        stats = evaluate_trajectory(traj, gt,
                                    segment_lengths=[100.0, 200.0, 300.0,
                                                     400.0])
        res = {
            "ate_rmse_m": round(ate_rmse(traj, gt), 4),
            "segment_translation_pct": round(stats.translation_mean, 4),
            "segment_rotation_deg_per_100m": round(stats.rotation_mean, 4),
            "segments": stats.total_segments,
            "keyframes": len(est.keyframes),
            "loop_constraints": est.loop_constraint_count,
            "loop_queries": est.loop_detector.total_queries,
            "loop_candidates": est.loop_detector.total_candidates,
            "loop_icp_attempts": est.loop_icp_attempts,
            "map_dropped": int(np.asarray(est.map_state.n_dropped)),
            "wall_s": round(dt, 1),
            "fps": round(N_FRAMES / dt, 1),
        }
        out[tag] = res
        est.shutdown()  # join the loop/PGO worker (an unjoined thread
        # holding the device client aborts at interpreter teardown)
        print(f"# {tag}: ate={res['ate_rmse_m']}m "
              f"trans={res['segment_translation_pct']}% "
              f"rot={res['segment_rotation_deg_per_100m']}deg/100m "
              f"loops={res['loop_constraints']} kf={res['keyframes']} "
              f"({res['fps']} fps incl. host bookkeeping)", file=sys.stderr)
    ok = (out["loop_closure"]["loop_constraints"] >= 1
          and out["loop_closure"]["ate_rmse_m"]
          <= max(out["odometry_only"]["ate_rmse_m"], 0.5))
    out["pass"] = bool(ok)
    with open(os.path.join(ROOT, "ACCURACY.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
