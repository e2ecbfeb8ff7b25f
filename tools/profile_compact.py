#!/usr/bin/env python3
"""Compare compaction strategies + bisect _insert_keys internals."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

C0, H0, N, CAP = 262144, 524288, 16384, 16384


def timeit(fn, *args, n=30, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def compact_scatter(mask, cap):
    n = mask.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    keep = mask & (rank < cap)
    out = jnp.full((cap,), -1, jnp.int32)
    pos = jnp.where(keep, rank, cap - 1)
    out = out.at[pos].max(jnp.where(keep, jnp.arange(n, dtype=jnp.int32), -1),
                          mode="drop")
    return out


def compact_searchsorted(mask, cap):
    csum = jnp.cumsum(mask.astype(jnp.int32))
    total = csum[-1]
    tgt = jnp.arange(1, cap + 1, dtype=jnp.int32)
    pos = jnp.searchsorted(csum, tgt, side="left").astype(jnp.int32)
    return jnp.where(tgt <= total, pos, -1)


def main():
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    mask = jnp.asarray(rng.random(C0) < 0.7)

    t = timeit(lambda m: compact_scatter(m, CAP), mask)
    print(f"compact scatter  (C0->16384)  : {t:7.3f} ms")
    t = timeit(lambda m: compact_searchsorted(m, CAP), mask)
    print(f"compact srchsort (C0->16384)  : {t:7.3f} ms")
    a = compact_scatter(mask, CAP)
    b = compact_searchsorted(mask, CAP)
    print(f"equal: {bool(jnp.all(a == b))}")

    # small-mask variants (AFFECTED leader list: mask over 24576)
    mask2 = jnp.asarray(rng.random(24576) < 0.2)
    t = timeit(lambda m: compact_scatter(m, 8192), mask2)
    print(f"compact scatter  (24k->8192)  : {t:7.3f} ms")
    t = timeit(lambda m: compact_searchsorted(m, 8192), mask2)
    print(f"compact srchsort (24k->8192)  : {t:7.3f} ms")

    # _insert_keys pieces: probe rounds only vs + election vs full
    from lidar_odometry_tpu.ops import voxel_map as vm
    from lidar_odometry_tpu.utils import keys as K
    pts = jnp.asarray(rng.random((N, 3)) * 200 - 100, jnp.float32)
    coords = K.voxel_coords(pts, 2.0)
    hi, lo = K.pack_key(coords)
    index = jnp.full((H0, 3), -1, jnp.int32)
    keys = jnp.full((C0, 2), 0xFFFFFFFF, jnp.uint32)
    cnt = jnp.zeros((C0,), jnp.int32)
    m = jnp.ones((N,), bool)

    def probe_only(idx, kt, h, l):
        return vm._probe(idx, kt, h, l)
    t = timeit(probe_only, index, keys, hi, lo)
    print(f"_probe 4 rounds (16384q)      : {t:7.3f} ms")

    t = timeit(lambda i, k, c, h, l, mm: vm._insert_keys(
        i, k, c > 0, h, l, mm, free_cap=N), index, keys, cnt, hi, lo, m)
    print(f"_insert_keys empty table      : {t:7.3f} ms")

    # warm table: insert then re-insert (all hits)
    i2, k2, slot, _ = jax.jit(lambda i, k, c, h, l, mm: vm._insert_keys(
        i, k, c > 0, h, l, mm, free_cap=N))(index, keys, cnt, hi, lo, m)
    c2 = jnp.zeros((C0,), jnp.int32).at[jnp.clip(slot, 0, C0 - 1)].set(
        jnp.where(slot >= 0, 1, 0))
    t = timeit(lambda i, k, c, h, l, mm: vm._insert_keys(
        i, k, c > 0, h, l, mm, free_cap=N), i2, k2, c2, hi, lo, m)
    print(f"_insert_keys all-hits         : {t:7.3f} ms")


if __name__ == "__main__":
    main()
