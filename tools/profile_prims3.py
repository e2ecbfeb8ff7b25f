#!/usr/bin/env python3
"""Measurement-artifact check: same op timed with (a) identical input
repeated, (b) distinct inputs per call, (c) dependency-chained calls."""
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

H0, N = 524288, 16384


def t_same(f, arg, n=50):
    for _ in range(3):
        out = f(arg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def t_distinct(f, args, n=50):
    for a in args[:3]:
        out = f(a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = f(args[i % len(args)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def t_chained(f, arg, n=50):
    x = arg
    for _ in range(3):
        x = f(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32))
    his = [jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32))
           for _ in range(10)]

    f_hash = jax.jit(lambda h: vm._hash_cell(h, h, H0 - 1, 0))
    print(f"hash same     : {t_same(f_hash, hi):7.3f} ms")
    print(f"hash distinct : {t_distinct(f_hash, his):7.3f} ms")
    f_hash_u = jax.jit(lambda h: vm._hash_cell(h, h, H0 - 1, 0).astype(jnp.uint32))
    print(f"hash chained  : {t_chained(f_hash_u, hi):7.3f} ms")

    f_add = jax.jit(lambda h: h + jnp.uint32(1))
    print(f"add  same     : {t_same(f_add, hi):7.3f} ms")
    print(f"add  distinct : {t_distinct(f_add, his):7.3f} ms")
    print(f"add  chained  : {t_chained(f_add, hi):7.3f} ms")


if __name__ == "__main__":
    main()
