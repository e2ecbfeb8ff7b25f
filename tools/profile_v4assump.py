#!/usr/bin/env python3
"""Verify v4 voxel-map design assumptions with device-time traces."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tputime import device_time_ms

C0, H0, N = 262144, 524288, 16384
A27 = 2048 * 27


def main():
    rng = np.random.default_rng(0)
    store = jnp.asarray(rng.integers(-100, 100, (C0, 8)), jnp.int32)
    store2 = jnp.asarray(rng.integers(-100, 100, (C0, 2)), jnp.int32)
    idxN = jnp.asarray(rng.integers(0, C0, N), jnp.int32)
    idxH = jnp.asarray(rng.integers(0, H0, N), jnp.int32)
    idxA = jnp.asarray(rng.integers(0, C0, A27), jnp.int32)
    rowsN = jnp.asarray(rng.integers(-5, 5, (N, 8)), jnp.int32)
    colN = jnp.asarray(rng.integers(-5, 5, N), jnp.int32)
    h1 = jnp.asarray(rng.integers(-1, C0, H0), jnp.int32)
    keys = jnp.asarray(rng.integers(0, 2**31, (N,)), jnp.int32)

    def t(tag, f, *args):
        print(f"{tag:42s}: {device_time_ms(jax.jit(f), *args):7.3f} ms")

    t("row scatter-add (N,8)->(C0,8)",
      lambda s, i, v: s.at[i].add(v, mode="drop"), store, idxN, rowsN)
    t("8x col scatter-add ->(C0,8)",
      lambda s, i, v: _cols(s, i, v), store, idxN, rowsN)
    t("row scatter-set (N,8)->(C0,8)",
      lambda s, i, v: s.at[i].set(v, mode="drop"), store, idxN, rowsN)
    t("col scatter-set (N,)->(H0,)",
      lambda s, i, v: s.at[i].set(v, mode="drop"), h1, idxH, colN)
    t("gather rows (N,8)<-(C0,8)", lambda s, i: s[i], store, idxN)
    t("gather rows (N,2)<-(C0,2)", lambda s, i: s[i], store2, idxN)
    t("gather col (N,)<-(H0,)", lambda s, i: s[i], h1, idxH)
    t("gather rows (A27,8)<-(C0,8)", lambda s, i: s[i], store, idxA)
    t("sort2 (N,) i32 pairs",
      lambda k, v: jax.lax.sort((k, v), num_keys=1), keys, colN)
    t("cumsum (N,)", lambda v: jnp.cumsum(v), colN)
    t("full probe sim: 4x(gatherH+gather8)",
      lambda h, s, i: _probe_sim(h, s, i), h1, store, idxH)


def _cols(s, i, v):
    for w in range(8):
        s = s.at[i, w].add(v[:, w], mode="drop")
    return s


def _probe_sim(h1, store, pos0):
    acc = jnp.zeros((N,), jnp.int32)
    pos = pos0
    for r in range(4):
        slot = h1[pos]
        row = store[jnp.clip(slot, 0, C0 - 1)]
        acc = acc + row[:, 0]
        pos = (pos + 1 + row[:, 1] % 7) & (H0 - 1)
    return acc


if __name__ == "__main__":
    main()
