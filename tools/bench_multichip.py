#!/usr/bin/env python3
"""Multichip scaling benchmark on a virtual CPU mesh.

Times the sharded odometry step (ICP GN iterations + shard-local keyframe
map update, parallel/sharded_map.py) at 1/2/4/8 virtual devices on
realistic shapes (262k-slot L0 tables, 16k-point scans) and reports
scans/s per device count plus scaling efficiency.

CPU-mesh relative scaling is the only option in this image (one real TPU
chip is attached); the absolute numbers are meaningless but the RATIO
device-time(1) / device-time(N) measures how much compute the sharding
actually distributes vs. replicates. Writes MULTICHIP-style JSON to
stdout.
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lidar_odometry_tpu.io import synthetic
from lidar_odometry_tpu.ops import icp, voxel_map as vm
from lidar_odometry_tpu.parallel import mesh as mesh_mod
from lidar_odometry_tpu.parallel import sharded_map as sm

C0_TOTAL, C1_TOTAL = 262144, 65536
N_PTS = 16384
N_FRAMES = 24


def run_n(n_dev, scans, poses):
    mesh = mesh_mod.make_mesh(n_dev, ("map",))
    state = sm.sharded_empty_map(C0_TOTAL, C1_TOTAL, mesh, "map")
    cfg = icp.ICPConfig(max_iterations=4, voxel_size=0.5,
                        use_adaptive_m_estimator=False)

    @jax.jit
    def frame(st, pts, mask, T):
        for _ in range(2):
            T, _n = sm.sharded_icp_step(st, pts, mask, T, mesh, cfg)
        st = sm.sharded_update_map(st, pts, mask, T[:3, 3], 120.0, mesh,
                                   voxel_size=0.5, planarity_threshold=0.1)
        return st, T

    # warmup / build
    masks = [jnp.asarray(np.isfinite(s[:, 0])) for s in scans]
    dscans = [jnp.asarray(np.nan_to_num(s)) for s in scans]
    state, _ = frame(state, dscans[0], masks[0], jnp.asarray(poses[0]))
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for i in range(1, N_FRAMES):
        state, T = frame(state, dscans[i], masks[i], jnp.asarray(poses[i]))
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return (N_FRAMES - 1) / dt, int(np.asarray(state.n_l0).sum())


def main():
    world = synthetic.make_world(seed=3, extent=120.0, n_buildings=24)
    poses = synthetic.straight_trajectory(N_FRAMES, step=1.0)
    rng = np.random.default_rng(3)
    scans = []
    for i in range(N_FRAMES):
        s = synthetic.sample_scan(world, poses[i], N_PTS, rng,
                                  max_range=80.0, noise=0.01)
        buf = np.full((N_PTS, 3), np.nan, np.float32)
        buf[: len(s)] = (s @ poses[i][:3, :3].T + poses[i][:3, 3])
        scans.append(buf)

    results = {}
    base = None
    for n in (1, 2, 4, 8):
        fps, n_l0 = run_n(n, scans, poses)
        if base is None:
            base = fps
        eff = fps / (base)  # relative speedup vs 1 device
        results[str(n)] = {"scans_per_sec": round(fps, 2),
                           "speedup_vs_1": round(fps / base, 3),
                           "n_l0": n_l0}
        print(f"# n={n}: {fps:.2f} scans/s  speedup={fps/base:.2f}x "
              f"n_l0={n_l0}", file=sys.stderr)
    out = {
        "kind": "multichip_scaling",
        "mesh": "virtual CPU mesh (xla_force_host_platform_device_count)",
        "shapes": {"c0_total": C0_TOTAL, "c1_total": C1_TOTAL,
                   "scan_pts": N_PTS},
        "note": ("relative scaling on a host-CPU mesh; single real TPU "
                 "chip in this image, so absolute scans/s is not "
                 "TPU-representative"),
        "results": results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
