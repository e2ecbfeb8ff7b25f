#!/usr/bin/env python3
"""Find the fusion pathology inside _probe/_insert_keys: incremental versions."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lidar_odometry_tpu.ops import voxel_map as vm

C0, H0, N = 262144, 524288, 16384
NP_ = vm.N_PROBES


def timeit(f, *args, n=50, warmup=3):
    f = jax.jit(f)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    qhi = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32))
    qlo = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32))
    index = jnp.asarray(rng.integers(-1, C0, (H0, 3)), jnp.int32)
    key_tbl = jnp.asarray(
        rng.integers(0, 2**32, (C0, 2), dtype=np.uint64).astype(np.uint32))

    def v1(idx, h, l):
        acc = jnp.zeros((N,), jnp.int32)
        for r in range(NP_):
            pos = vm._hash_cell(h, l, H0 - 1, r)
            acc = acc + idx[pos][:, 0]
        return acc

    def v2(idx, h, l):
        qh_i = jax.lax.bitcast_convert_type(h, jnp.int32)
        ql_i = jax.lax.bitcast_convert_type(l, jnp.int32)
        slot = jnp.full((N,), -1, jnp.int32)
        found = jnp.zeros((N,), bool)
        for r in range(NP_):
            pos = vm._hash_cell(h, l, H0 - 1, r)
            row = idx[pos]
            ok = (row[:, 0] >= 0) & (row[:, 1] == qh_i) & (row[:, 2] == ql_i) & ~found
            slot = jnp.where(ok, row[:, 0], slot)
            found = found | ok
        return slot, found

    def v3(idx, kt, h, l):
        slot, found = v2(idx, h, l)
        k = kt[jnp.clip(slot, 0, C0 - 1)]
        live = found & (k[:, 0] == h) & (k[:, 1] == l)
        return jnp.where(live, slot, -1)

    def v2b(idx, h, l):
        qh_i = jax.lax.bitcast_convert_type(h, jnp.int32)
        ql_i = jax.lax.bitcast_convert_type(l, jnp.int32)
        slot = jnp.full((N,), -1, jnp.int32)
        found = jnp.zeros((N,), bool)
        for r in range(NP_):
            pos = vm._hash_cell(h, l, H0 - 1, r)
            pos = jax.lax.optimization_barrier(pos)
            row = idx[pos]
            row = jax.lax.optimization_barrier(row)
            ok = (row[:, 0] >= 0) & (row[:, 1] == qh_i) & (row[:, 2] == ql_i) & ~found
            slot = jnp.where(ok, row[:, 0], slot)
            found = found | ok
        return slot, found

    def v3b(idx, kt, h, l):
        slot, found = v2b(idx, h, l)
        slot = jax.lax.optimization_barrier(slot)
        k = kt[jnp.clip(slot, 0, C0 - 1)]
        live = found & (k[:, 0] == h) & (k[:, 1] == l)
        return jnp.where(live, slot, -1)

    print(f"v1 hash+gather+add           : {timeit(v1, index, qhi, qlo):7.3f} ms")
    print(f"v2 + compare/where           : {timeit(v2, index, qhi, qlo):7.3f} ms")
    print(f"v3 full probe                : {timeit(v3, index, key_tbl, qhi, qlo):7.3f} ms")
    print(f"v2b barriers                 : {timeit(v2b, index, qhi, qlo):7.3f} ms")
    print(f"v3b barriers                 : {timeit(v3b, index, key_tbl, qhi, qlo):7.3f} ms")
    print(f"_probe as-is                 : {timeit(lambda i, k, h, l: vm._probe(i, k, h, l), index, key_tbl, qhi, qlo):7.3f} ms")


if __name__ == "__main__":
    main()
