#!/usr/bin/env python3
"""Bracket update_map cost at SINGLE-chip bench shapes on a steady map:
full / no-surfels / no-evict / empty-mask, plus top-40 device ops."""
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
from tools.tputime import device_top_ops


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
    scans_np, _ = B.make_scans()
    runner = fp.make_chunk_runner(icp_cfg, consts, **kw)
    carry = fp.init_carry(262144, 65536)
    for c in range(4):
        carry, (poses, kf, _) = runner(
            carry, jnp.asarray(scans_np[c * 20:(c + 1) * 20]))
    jax.block_until_ready(poses)
    state = carry.map_state
    print("n_l0", int(state.n_l0), file=sys.stderr)

    pre, _, _ = fp._make_parts(icp_cfg, consts, **kw)

    @jax.jit
    def mk_insert(carry, scan):
        T, vel, is_kf, n_corr, feat, mask = pre(carry, scan)
        world = lie.transform_points(T, feat)
        return world, mask, T[:3, 3]

    w, m, spos = mk_insert(carry, jnp.asarray(scans_np[81]))
    jax.block_until_ready(w)

    def timed(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(*args)
            jax.block_until_ready(out.n_l0)
        print(f"{name:28s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms")

    mk = lambda surf, maxd: jax.jit(lambda st, p_, m_, s_: vm.update_map(
        st, p_, m_, s_, jnp.float32(maxd), voxel_size=0.5,
        planarity_threshold=0.1, hierarchy_factor=3, compute_surfels=surf))

    timed("full", mk(True, 120.0), state, w, m, spos)
    timed("no-surfels", mk(False, 120.0), state, w, m, spos)
    timed("no-evict", mk(True, 1e30), state, w, m, spos)
    timed("empty-mask", mk(True, 120.0), state, w,
          jnp.zeros_like(m), spos)
    timed("empty-mask+no-evict", mk(True, 1e30), state, w,
          jnp.zeros_like(m), spos)

    rows = device_top_ops(mk(True, 120.0), state, w, m, spos, n=3, k=40)
    print("# top-40 device ops")
    for ms, cnt, name in rows:
        print(f"{ms:8.3f} x{cnt:<3d} {name}")


if __name__ == "__main__":
    main()
