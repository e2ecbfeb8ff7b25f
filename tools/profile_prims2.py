#!/usr/bin/env python3
"""Second-level primitive bisection: hash math, small-array ops, dependent gathers."""
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


def main():
    rng = np.random.default_rng(0)
    hi = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32))
    lo = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32))
    index = jnp.asarray(rng.integers(-1, 100, (H0, 3)), jnp.int32)
    posN = jnp.asarray(rng.integers(0, H0, N), jnp.int32)
    m24 = jnp.asarray(rng.random(24576) < 0.2)
    big = jnp.asarray(rng.random(C0) < 0.7)

    print(f"hash_cell u32 (16384)        : "
          f"{timeit(lambda h, l: vm._hash_cell(h, l, H0 - 1, 0), hi, lo):7.3f} ms")
    print(f"4x hash+gather dependent     : "
          f"{timeit(lambda h, l, ix: sum(ix[vm._hash_cell(h, l, H0 - 1, r)][:, 0] for r in range(4)), hi, lo, index):7.3f} ms")
    print(f"4x gather precomputed pos    : "
          f"{timeit(lambda ix, p: sum(ix[(p + r) & (H0 - 1)][:, 0] for r in range(4)), index, posN):7.3f} ms")
    print(f"cumsum bool (24576)          : "
          f"{timeit(lambda m: jnp.cumsum(m.astype(jnp.int32)), m24):7.3f} ms")
    print(f"cumsum bool (262144)         : "
          f"{timeit(lambda m: jnp.cumsum(m.astype(jnp.int32)), big):7.3f} ms")
    cs24 = jnp.cumsum(m24.astype(jnp.int32))
    csC0 = jnp.cumsum(big.astype(jnp.int32))
    q8 = jnp.arange(1, 8193, dtype=jnp.int32)
    q16 = jnp.arange(1, 16385, dtype=jnp.int32)
    print(f"searchsorted 8192q in 24576  : "
          f"{timeit(lambda c, q: jnp.searchsorted(c, q, side='left'), cs24, q8):7.3f} ms")
    print(f"searchsorted 16384q in C0    : "
          f"{timeit(lambda c, q: jnp.searchsorted(c, q, side='left'), csC0, q16):7.3f} ms")
    print(f"scatter-max 24576u -> 8192   : "
          f"{timeit(lambda m: jnp.full((8192,), -1, jnp.int32).at[jnp.where(m, (jnp.cumsum(m.astype(jnp.int32)) - 1) % 8192, 8191)].max(jnp.arange(24576, dtype=jnp.int32), mode='drop'), m24):7.3f} ms")
    print(f"scatter-max 262144u -> 16384 : "
          f"{timeit(lambda m: jnp.full((16384,), -1, jnp.int32).at[jnp.where(m, (jnp.cumsum(m.astype(jnp.int32)) - 1) % 16384, 16383)].max(jnp.arange(C0, dtype=jnp.int32), mode='drop'), big):7.3f} ms")
    # u32 multiply cost check
    print(f"u32 mul (262144)             : "
          f"{timeit(lambda h: h * jnp.uint32(0x9E3779B1), jnp.tile(hi, 16)):7.3f} ms")
    print(f"i32 mul (262144)             : "
          f"{timeit(lambda h: h * jnp.int32(1234567), jnp.tile(jax.lax.bitcast_convert_type(hi, jnp.int32), 16)):7.3f} ms")


if __name__ == "__main__":
    main()
