#!/usr/bin/env python3
"""Differential profile of the FUSED chunk runner at bench shapes.

Standalone per-op timings on axon are inflated by dispatch/tunnel
overhead; the ground truth for the headline is the donated chunk
program. This tool measures chunk variants with one stage knocked
out/reduced each and reports the deltas — the honest per-stage cost
in the fused context (same methodology the reference uses for its
per-stage table, Estimator.cpp:1307-1355, but via program variants
since XLA fuses the stages)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lidar_odometry_tpu.models import fast_pipeline as fp
from lidar_odometry_tpu.ops import icp, pko

RAW_N = 131072
N_FRAMES = 240
CHUNK = 20


def run_variant(name, icp_cfg, consts, scans, reps=2, **kw):
    runner = fp.make_chunk_runner(icp_cfg, consts, **kw)
    carry = fp.init_carry(c0=262144, c1=65536)
    t0 = time.perf_counter()
    carry, out = runner(carry, scans[0])
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    n_chunks = len(scans)
    t0 = time.perf_counter()
    for r in range(reps):
        for c in range(1, n_chunks):
            carry, out = runner(carry, scans[c])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    per_frame = dt / (reps * (n_chunks - 1) * CHUNK) * 1e3
    kfs = int(carry.kf_count)
    print(f"{name:34s}: {per_frame:6.3f} ms/frame  "
          f"({1000.0/per_frame:6.1f} fps)  kf={kfs}  compile={compile_s:.0f}s",
          file=sys.stderr)
    return per_frame


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib
    bench = importlib.import_module("bench")
    scans_np, _ = bench.make_scans()
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    n_chunks = N_FRAMES // CHUNK
    scans = [jnp.asarray(scans_np[c * CHUNK:(c + 1) * CHUNK])
             for c in range(n_chunks)]
    jax.block_until_ready(scans)

    base_icp = icp.ICPConfig(
        max_iterations=4, translation_tolerance=0.005,
        rotation_tolerance=0.005, max_correspondence_distance=1.0,
        min_correspondence_points=50, use_robust_loss=True,
        use_surfel_correspondence=True, loss_type="huber",
        use_adaptive_m_estimator=True, voxel_size=0.5)
    consts = pko.make_pko_constants(0.1, 10.0, 100, 10.0, "huber", 3, 100)
    kw = dict(scan_voxel_size=0.5, point_stride=8, scan_capacity=14336,
              keyframe_distance=1.0, keyframe_rotation=0.3,
              max_distance=120.0, planarity_threshold=0.1)

    base = run_variant("baseline", base_icp, consts, scans, **kw)
    no_kf = run_variant("no keyframes (no map update)", base_icp, consts,
                        scans, **{**kw, "keyframe_distance": 1e9,
                                  "keyframe_rotation": 1e9})
    no_surf = run_variant("update w/o surfel recompute", base_icp, consts,
                          scans, **{**kw, "compute_surfels": False})
    icp1 = run_variant("icp max_iterations=1", base_icp.replace(
        max_iterations=1), consts, scans, **kw)
    no_pko = run_variant("icp w/o PKO", base_icp.replace(
        use_adaptive_m_estimator=False), consts, scans, **kw)
    # floor dissection: max_iterations=0 makes the ICP while_loop exit
    # immediately (T = guess, no correspondences) -> filter + frame
    # bookkeeping only; stride 16 halves the filter's sort width on top
    no_icp = run_variant("no icp (filter+bookkeeping)", base_icp.replace(
        max_iterations=0), consts, scans,
        **{**kw, "keyframe_distance": 1e9, "keyframe_rotation": 1e9})
    half_filter = run_variant("no icp, stride 16", base_icp.replace(
        max_iterations=0), consts, scans,
        **{**kw, "point_stride": 16, "keyframe_distance": 1e9,
           "keyframe_rotation": 1e9})
    print("# --- deltas (fused-context stage costs) ---", file=sys.stderr)
    print(f"map update total      : {base-no_kf:6.3f} ms/frame", file=sys.stderr)
    print(f"  surfel recompute    : {base-no_surf:6.3f} ms/frame", file=sys.stderr)
    print(f"icp iterations 2-4    : {base-icp1:6.3f} ms/frame", file=sys.stderr)
    print(f"pko                   : {base-no_pko:6.3f} ms/frame", file=sys.stderr)
    print(f"floor (filter+icp1+..): {no_kf:6.3f} ms/frame", file=sys.stderr)
    print(f"icp stage (1 it + pko): {no_kf-no_icp:6.3f} ms/frame", file=sys.stderr)
    print(f"filter+bookkeeping    : {no_icp:6.3f} ms/frame", file=sys.stderr)
    print(f"  filter sort half    : {no_icp-half_filter:6.3f} ms/frame", file=sys.stderr)


if __name__ == "__main__":
    main()
