#!/usr/bin/env python3
"""Micro-bench the scatter/gather primitives used by update_map."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

C0, H0 = 262144, 524288
C1 = 65536
N = 16384
A = 8192


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
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    idxN = jnp.asarray(rng.integers(0, C0, N), jnp.int32)
    idxH = jnp.asarray(rng.integers(0, H0, N), jnp.int32)
    idxA = jnp.asarray(rng.integers(0, C1, A), jnp.int32)
    valN = jnp.asarray(rng.random(N), jnp.float32)
    tbl1 = jnp.zeros((C0,), jnp.float32)
    tblH3 = jnp.zeros((H0, 3), jnp.int32)
    tblC27 = jnp.zeros((C1, 27), jnp.int32)
    tblC3 = jnp.zeros((C0, 3), jnp.float32)
    kidsA = jnp.asarray(rng.integers(0, C0, (A, 27)), jnp.int32)
    big = jnp.zeros((C0,), jnp.int32)
    cov = jnp.asarray(rng.random((A, 3, 3)), jnp.float32)
    cov = cov @ jnp.swapaxes(cov, 1, 2)

    r = {}
    r["gather (N,) <- (C0,)"] = timeit(lambda t, i: t[i], tbl1, idxN)
    r["gather rows (N,3) <- (H0,3)"] = timeit(lambda t, i: t[i], tblH3, idxH)
    r["gather rows (A,27) <- (C1,27)"] = timeit(lambda t, i: t[i], tblC27, idxA)
    r["gather (A,27,3) <- (C0,3)"] = timeit(lambda t, i: t[i], tblC3, kidsA)
    r["scatter set (N,)->(C0,) 1col"] = timeit(
        lambda t, i, v: t.at[i].set(v, mode="drop"), tbl1, idxN, valN)
    r["scatter add (N,)->(C0,) 1col"] = timeit(
        lambda t, i, v: t.at[i].add(v, mode="drop"), tbl1, idxN, valN)
    r["scatter min (N,)->(C0,)"] = timeit(
        lambda t, i, v: t.at[i].min(v, mode="drop"), big, idxN,
        jnp.arange(N, dtype=jnp.int32))
    r["scatter col (N,)->(H0,3) fixed w"] = timeit(
        lambda t, i, v: t.at[i, 1].set(v, mode="drop"), tblH3, idxH,
        jnp.arange(N, dtype=jnp.int32))
    r["scatter row (A,27)->(C1,27)"] = timeit(
        lambda t, i: t.at[i].set(-1, mode="drop"), tblC27, idxA)
    r["cumsum (C0,)"] = timeit(lambda t: jnp.cumsum(t), big)
    r["cumsum (N,)"] = timeit(lambda v: jnp.cumsum(v), valN)
    from lidar_odometry_tpu.utils import eigh3
    r["eigh3 (A,3,3)"] = timeit(lambda c: eigh3.eigh3(c), cov)
    r["eigh3 (2048,3,3)"] = timeit(lambda c: eigh3.eigh3(c), cov[:2048])
    from lidar_odometry_tpu.utils import keys as K
    kh = jnp.asarray(rng.integers(0, 2**32, (A, 27), dtype=np.uint64).astype(np.uint32))
    r["unpack+pack key (A,27)"] = timeit(
        lambda h, l: K.pack_key(K.parent_coords(K.unpack_key(h, l), 3)), kh, kh)
    r["sort (N,) u32"] = timeit(lambda v: jnp.sort(v), kh[:, 0].reshape(-1)[:N])
    r["argsort (N,) u32"] = timeit(lambda v: jnp.argsort(v), kh[:, 0].reshape(-1)[:N])

    for k, v in r.items():
        print(f"{k:34s}: {v:7.3f} ms")


if __name__ == "__main__":
    main()
