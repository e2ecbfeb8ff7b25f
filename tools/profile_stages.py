#!/usr/bin/env python3
"""Per-stage TPU timing breakdown of the odometry pipeline.

Times each stage in isolation on realistic shapes (KITTI operating
point: 131072 raw pts, stride 8, 16384-pt feature capacity, 262144/65536
slot tables), mirroring the reference's stage taxonomy
(reference src/processing/Estimator.cpp:1307-1355).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lidar_odometry_tpu.io import synthetic
from lidar_odometry_tpu.models import fast_pipeline as fp
from lidar_odometry_tpu.ops import icp, pko, voxel_filter as vf, voxel_map as vm
from lidar_odometry_tpu.utils import lie

RAW_N = 131072
C0, C1 = 262144, 65536


def timeit(fn, *args, n=20, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    world = synthetic.make_world(seed=11, extent=120.0, n_buildings=28)
    poses = synthetic.straight_trajectory(40, step=0.25)
    rng = np.random.default_rng(11)
    scans = np.full((40, RAW_N, 3), np.nan, np.float32)
    for i in range(40):
        s = synthetic.sample_scan(world, poses[i], RAW_N, rng,
                                  max_range=80.0, noise=0.01)
        scans[i, : len(s)] = s

    icp_cfg = icp.ICPConfig(
        max_iterations=4, translation_tolerance=0.005, rotation_tolerance=0.005,
        max_correspondence_distance=1.0, min_correspondence_points=50,
        use_robust_loss=True, use_surfel_correspondence=True,
        loss_type="huber", use_adaptive_m_estimator=True, voxel_size=0.5)
    consts = pko.make_pko_constants(0.1, 10.0, 100, 10.0, "huber", 3, 100)

    scans_d = jnp.asarray(scans)

    # ---- build a warm map by running ~10 keyframe updates ----
    filt = jax.jit(lambda s: vf.voxel_filter(
        s, jnp.int32(RAW_N), voxel_size=0.5, stride=8, out_capacity=16384))
    state = vm.empty_map(C0, C1)
    feats, masks = [], []
    for i in range(40):
        f, m, _ = filt(scans_d[i])
        feats.append(f); masks.append(m)
    for i in range(0, 40, 4):
        T = jnp.asarray(poses[i], jnp.float32)
        w = lie.transform_points(T, feats[i])
        state = vm.update_map(state, w, masks[i], T[:3, 3], 120.0,
                              voxel_size=0.5, planarity_threshold=0.1,
                              hierarchy_factor=3)
    jax.block_until_ready(state)
    print(f"# warm map: n_l0={int(state.n_l0)} n_l1={int(state.n_l1)}",
          file=sys.stderr)

    t_filter = timeit(filt, scans_d[20])

    f20, m20 = feats[20], masks[20]
    guess = jnp.asarray(poses[20], jnp.float32)

    icp_fn = jax.jit(lambda st, f, m, g: icp.icp_optimize(st, f, m, g, consts, icp_cfg))
    t_icp = timeit(icp_fn, state, f20, m20, guess)

    icp_cfg_nopko = icp_cfg.replace(use_adaptive_m_estimator=False)
    icp_np = jax.jit(lambda st, f, m, g: icp.icp_optimize(st, f, m, g, consts, icp_cfg_nopko))
    t_icp_nopko = timeit(icp_np, state, f20, m20, guess)

    # lookup alone
    look = jax.jit(lambda st, p: vm.lookup_surfels(st, p, voxel_size=0.5,
                                                   hierarchy_factor=3))
    world_pts = lie.transform_points(guess, f20)
    t_lookup = timeit(look, state, world_pts)

    # update_map on a warm map (steady-state keyframe)
    upd = jax.jit(lambda st, w, m, p: vm.update_map(
        st, w, m, p, 120.0, voxel_size=0.5, planarity_threshold=0.1,
        hierarchy_factor=3))
    w24 = lie.transform_points(jnp.asarray(poses[24], jnp.float32), feats[24])
    t_update = timeit(upd, state, w24, masks[24], jnp.asarray(poses[24, :3, 3], jnp.float32))

    # full frame step, non-keyframe vs keyframe, via the chunk runner at CHUNK=1
    kw = dict(scan_voxel_size=0.5, point_stride=8, scan_capacity=16384,
              keyframe_distance=1.0, keyframe_rotation=0.3,
              max_distance=120.0, planarity_threshold=0.1)
    runner = fp.make_chunk_runner(icp_cfg, consts, **kw)
    carry = fp.init_carry(C0, C1)
    t0 = time.perf_counter()
    carry, _ = runner(carry, scans_d[:20])
    jax.block_until_ready(carry)
    print(f"# chunk warmup(compile): {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    n_ch = 0
    for rep in range(3):
        carry, _ = runner(carry, scans_d[20:40])
        n_ch += 1
    jax.block_until_ready(carry)
    t_frame = (time.perf_counter() - t0) / (n_ch * 20) * 1e3

    print(f"voxel_filter      : {t_filter:8.2f} ms")
    print(f"surfel lookup     : {t_lookup:8.2f} ms")
    print(f"icp (4it, PKO)    : {t_icp:8.2f} ms")
    print(f"icp (4it, no PKO) : {t_icp_nopko:8.2f} ms")
    print(f"update_map (warm) : {t_update:8.2f} ms")
    print(f"frame step (avg)  : {t_frame:8.2f} ms  ({1000/t_frame:.1f} fps)")


if __name__ == "__main__":
    main()
