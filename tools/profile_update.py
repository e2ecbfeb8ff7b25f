#!/usr/bin/env python3
"""Bisect update_map's cost: time variants with stages disabled."""
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
from lidar_odometry_tpu.ops import voxel_filter as vf, voxel_map as vm
from lidar_odometry_tpu.utils import lie

RAW_N = 131072
C0, C1 = 262144, 65536


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    world = synthetic.make_world(seed=11, extent=120.0, n_buildings=28)
    poses = synthetic.straight_trajectory(40, step=0.25)
    rng = np.random.default_rng(11)
    filt = jax.jit(lambda s: vf.voxel_filter(
        s, jnp.int32(RAW_N), voxel_size=0.5, stride=8, out_capacity=16384))
    feats, masks = [], []
    for i in range(40):
        s = synthetic.sample_scan(world, poses[i], RAW_N, rng,
                                  max_range=80.0, noise=0.01)
        raw = np.full((RAW_N, 3), np.nan, np.float32)
        raw[: len(s)] = s
        f, m, _ = filt(jnp.asarray(raw))
        feats.append(f); masks.append(m)
    state = vm.empty_map(C0, C1)
    for i in range(0, 40, 4):
        T = jnp.asarray(poses[i], jnp.float32)
        w = lie.transform_points(T, feats[i])
        state = vm.update_map(state, w, masks[i], T[:3, 3], 120.0,
                              voxel_size=0.5, planarity_threshold=0.1,
                              hierarchy_factor=3)
    jax.block_until_ready(state)
    print(f"# warm map: n_l0={int(state.n_l0)} n_l1={int(state.n_l1)}")

    w24 = lie.transform_points(jnp.asarray(poses[24], jnp.float32), feats[24])
    m24 = masks[24]
    pos24 = jnp.asarray(poses[24, :3, 3], jnp.float32)

    def run(tag, **kw):
        upd = jax.jit(lambda st, w, m, p: vm.update_map(
            st, w, m, p, 120.0, voxel_size=0.5, planarity_threshold=0.1,
            hierarchy_factor=3, **kw))
        t = timeit(upd, state, w24, m24, pos24)
        print(f"{tag:40s}: {t:7.2f} ms")

    run("full")
    run("compute_surfels=False", compute_surfels=False)

    # stage-level pieces, jitted standalone
    from lidar_odometry_tpu.utils import keys as K
    inv = 1.0 / 0.5
    pcoords = K.voxel_coords(w24, inv)
    phi, plo = K.pack_key(pcoords)
    phi = jnp.where(m24, phi, K.INVALID_HI)
    plo = jnp.where(m24, plo, K.INVALID_LO)

    ins0 = jax.jit(lambda idx, keys, cnt, h, l, m: vm._insert_keys(
        idx, keys, cnt > 0, h, l, m, free_cap=16384))
    t = timeit(ins0, state.l0_index, state.l0_key, state.l0_count, phi, plo, m24)
    print(f"{'_insert_keys L0 (16384q)':40s}: {t:7.2f} ms")

    _, _, slot, _ = ins0(state.l0_index, state.l0_key, state.l0_count, phi, plo, m24)
    npar = K.parent_coords(pcoords, 3)
    nphi, nplo = K.pack_key(npar)
    ins1 = jax.jit(lambda idx, keys, cnt, h, l, m: vm._insert_keys(
        idx, keys, cnt > 0, h, l, m, free_cap=vm.AFFECTED_CAP))
    t = timeit(ins1, state.l1_index, state.l1_key, state.l1_child_count,
               nphi, nplo, m24)
    print(f"{'_insert_keys L1 (16384q)':40s}: {t:7.2f} ms")

    _, _, par_slot, _ = ins1(state.l1_index, state.l1_key, state.l1_child_count,
                             nphi, nplo, m24)
    aff_ok = par_slot >= 0
    aslot = jnp.where(aff_ok, par_slot, -1)[: vm.AFFECTED_CAP]
    aok = aff_ok[: vm.AFFECTED_CAP]
    ck = state.l1_key[jnp.clip(aslot, 0, C1 - 1)]
    stats = jax.jit(lambda: vm._surfel_stats_from_children(
        state.l0_key, state.l0_sum, state.l0_count, state.l1_children,
        ck, aslot, aok, 3))
    t = timeit(stats)
    print(f"{'_surfel_stats (8192x27)':40s}: {t:7.2f} ms")

    ev = jax.jit(lambda c: vm._compact_mask(c > 0, vm.EVICT_CAP))
    t = timeit(ev, state.l0_count)
    print(f"{'_compact_mask EVICT_CAP':40s}: {t:7.2f} ms")

    fs = jax.jit(lambda c: vm._free_slot_list(c > 0, 16384))
    t = timeit(fs, state.l0_count)
    print(f"{'_free_slot_list (C0)':40s}: {t:7.2f} ms")


if __name__ == "__main__":
    main()
