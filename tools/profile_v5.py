#!/usr/bin/env python3
"""Per-stage timing of the v5 update_map internals at bench shapes.
Each stage runs R times inside one jit (fori_loop) so axon dispatch
overhead amortizes away; reported is per-iteration cost."""
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
from lidar_odometry_tpu.utils import keys as K, lie

C0, C1 = 262144, 65536
P = 14336
R = 50


def timeit_loop(build, *args):
    """build(x, *args) -> y with x:f32 scalar carried; run R times."""
    @jax.jit
    def run(*a):
        def body(i, acc):
            return acc + build(i, *a)
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
    out = run(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / R * 1e3


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    world = synthetic.make_world(seed=11, extent=120.0, n_buildings=28)
    poses = synthetic.straight_trajectory(40, step=0.25)
    rng = np.random.default_rng(11)

    filt = jax.jit(lambda s: vf.voxel_filter(
        s, jnp.int32(131072), voxel_size=0.5, stride=8, out_capacity=P))
    state = vm.empty_map(C0, C1)
    feats, masks = [], []
    for i in range(40):
        s = np.full((131072, 3), np.nan, np.float32)
        sc = synthetic.sample_scan(world, poses[i], 131072, rng,
                                   max_range=80.0, noise=0.01)
        s[: len(sc)] = sc
        f, m, _ = filt(jnp.asarray(s))
        feats.append(f); masks.append(m)
    for i in range(0, 40, 4):
        T = jnp.asarray(poses[i], jnp.float32)
        w = lie.transform_points(T, feats[i])
        state = vm.update_map(state, w, masks[i], T[:3, 3], 120.0,
                              voxel_size=0.5, planarity_threshold=0.1)
    jax.block_until_ready(state)
    print(f"# warm map: n_l0={int(state.n_l0)} n_l1={int(state.n_l1)}",
          file=sys.stderr)

    w24 = lie.transform_points(jnp.asarray(poses[24], jnp.float32), feats[24])
    m24 = masks[24]
    spos = jnp.asarray(poses[24][:3, 3], jnp.float32)
    nrows = C1 * vm.NCH

    # --- stage A: eviction full-table mask + parent reduce + compact ---
    def stA(i, l0_data, sp):
        cnt = l0_data[:, 0]
        cen = l0_data[:, 1:4] / jnp.maximum(cnt, 1.0)[:, None]
        d2 = jnp.sum((cen - (sp + i)) ** 2, axis=-1)
        ev = (cnt > 0.0) & (d2 > 120.0 ** 2)
        cand = jnp.any(ev.reshape(C1, vm.NCH), axis=1)
        lst, n = vm._compact(cand, vm.EVICT_LIST)
        return jnp.float32(n) + jnp.float32(lst[0])
    print(f"A evict scan+compact      : {timeit_loop(stA, state.l0_data, spos):7.3f} ms", file=sys.stderr)

    # --- stage B: evict block gather + zero + counter ---
    def stB(i, l0_data, meta):
        evp = (jnp.arange(vm.EVICT_LIST, dtype=jnp.int32) * 13 + i.astype(jnp.int32)) % C1
        blk = l0_data.reshape(C1, vm.NCH, 4)[evp]
        bev = blk[..., 0] > 1e30  # no real evictions; masked path cost
        ch_idx, _ = vm._compact(bev.reshape(-1), vm.CH_CAP)
        ch_ok = ch_idx >= 0
        ci = jnp.clip(ch_idx, 0, vm.EVICT_LIST * vm.NCH - 1)
        ch_par = evp[ci // vm.NCH]
        ch_addr = ch_par * vm.NCH + (ci % vm.NCH)
        l0 = vm._zero_child_rows(l0_data, ch_addr, ch_ok)
        meta2 = meta.at[jnp.where(ch_ok, ch_par, C1), 2].add(-1, mode="drop")
        return l0[0, 0] + jnp.float32(meta2[0, 2])
    print(f"B evict gather+zero       : {timeit_loop(stB, state.l0_data, state.l1_meta):7.3f} ms", file=sys.stderr)

    # --- stage C: parent bucket find (P) ---
    pcoords = K.voxel_coords(w24, 2.0)
    par_c = jnp.floor_divide(pcoords, 3)
    phi, plo = K.pack_key(par_c)
    def stC(i, index, h, l):
        s, hit, _, _ = vm._bucket_find(index, h + i.astype(jnp.uint32) * 0, l)
        return jnp.float32(jnp.sum(s)) + jnp.float32(jnp.sum(hit))
    print(f"C find0 (P bucket gather) : {timeit_loop(stC, state.l1_index, phi, plo):7.3f} ms", file=sys.stderr)

    # --- stage D: leader sort + pre_cnt gather ---
    khi, klo = K.pack_key(pcoords)
    off = vm._child_offset_of(pcoords)
    slot0, hit0, _, _ = vm._bucket_find(state.l1_index, phi, plo)
    addr0 = jnp.clip(slot0, 0, C1 - 1) * vm.NCH + off
    def stD(i, l0_data, kh, kl, a0, h0):
        idx = jnp.arange(P, dtype=jnp.int32)
        s_hi, s_lo, s_idx = jax.lax.sort((kh, kl, idx), num_keys=2)
        firstk = jnp.concatenate([jnp.ones((1,), bool),
                                  ~((s_hi[1:] == s_hi[:-1]) & (s_lo[1:] == s_lo[:-1]))])
        leader = jnp.zeros((P,), bool).at[s_idx].set(firstk)
        pre = jnp.where(h0, l0_data[a0, 0], 0.0)
        return jnp.float32(jnp.sum(leader)) + jnp.sum(pre)
    print(f"D leader sort + pre_cnt   : {timeit_loop(stD, state.l0_data, khi, klo, addr0, hit0):7.3f} ms", file=sys.stderr)

    # --- stage F: accumulate scatters (4 cols at P) ---
    def stF(i, l0_data, a0, pts):
        l0 = l0_data.at[a0, 0].add(0.0, mode="drop")
        for w in range(3):
            l0 = l0.at[a0, w + 1].add(pts[:, w] * 0.0, mode="drop")
        return l0[0, 0]
    print(f"F accumulate (4xP scatter): {timeit_loop(stF, state.l0_data, addr0, w24):7.3f} ms", file=sys.stderr)

    # --- stage H: stats gather + eigh + surfel writes at small-tier caps ---
    from lidar_odometry_tpu.utils import eigh3
    r_cap = 1536
    def stH(i, l0_data, surf):
        r_slot = (jnp.arange(r_cap, dtype=jnp.int32) * 17 + i.astype(jnp.int32)) % C1
        blk = l0_data.reshape(C1, vm.NCH, 4)[r_slot]
        cnt, mean, cov, ok = vm._block_stats(blk)
        lam, normal = eigh3.eigh3(cov)
        plan = lam[:, 0] / (lam[:, 2] + 1e-6)
        srows = jnp.concatenate([normal, mean, plan[:, None]], axis=-1)
        s2 = surf
        for w in range(7):
            s2 = s2.at[r_slot, w].set(srows[:, w], mode="drop")
        return s2[0, 0] + jnp.float32(jnp.sum(cnt))
    print(f"H stats+eigh+writes (1536): {timeit_loop(stH, state.l0_data, state.l1_surfel):7.3f} ms", file=sys.stderr)

    # --- full update (donated in-jit loop) ---
    @jax.jit
    def upd_loop(st, w, m, sp):
        def body(i, s):
            return vm.update_map(s, w, m, sp, 120.0, voxel_size=0.5,
                                 planarity_threshold=0.1)
        return jax.lax.fori_loop(0, 20, body, st)
    st2 = upd_loop(state, w24, m24, spos)
    jax.block_until_ready(st2)
    t0 = time.perf_counter()
    st2 = upd_loop(st2, w24, m24, spos)
    jax.block_until_ready(st2)
    print(f"full update (in-jit loop) : {(time.perf_counter()-t0)/20*1e3:7.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
