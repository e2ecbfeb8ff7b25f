"""Voxel key packing, sorting, binary search, and Morton parity tests."""
import numpy as np
import jax.numpy as jnp

from lidar_odometry_tpu.utils import keys


def test_voxel_coords_floor_semantics():
    pts = jnp.array([[-0.01, 0.49, 0.51], [-0.5, -0.51, 1.0]], dtype=jnp.float32)
    c = np.asarray(keys.voxel_coords(pts, 1.0 / 0.5))
    # floor(x / s) semantics, matching reference VoxelMap.cpp:50-58
    np.testing.assert_array_equal(c, [[-1, 0, 1], [-1, -2, 2]])


def test_pack_key_unique_and_ordered():
    rng = np.random.default_rng(0)
    coords = rng.integers(-1000, 1000, size=(4096, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)
    hi, lo = keys.pack_key(jnp.asarray(coords))
    packed = np.asarray(hi).astype(np.uint64) << np.uint64(32) | np.asarray(lo).astype(np.uint64)
    assert len(np.unique(packed)) == len(coords)


def test_parent_coords_floor_division():
    c = jnp.array([[4, -4, 5], [-1, -3, 0], [2, 3, -7]], dtype=jnp.int32)
    p = np.asarray(keys.parent_coords(c, 3))
    # reference GetParentKey: floor division (VoxelMap.cpp:60-67)
    np.testing.assert_array_equal(p, [[1, -2, 1], [-1, -1, 0], [0, 1, -3]])


def test_sort_and_searchsorted_roundtrip():
    rng = np.random.default_rng(1)
    coords = np.unique(rng.integers(-500, 500, size=(2000, 3)).astype(np.int32), axis=0)
    n = len(coords)
    cap = 4096
    hi, lo = keys.pack_key(jnp.asarray(coords))
    hi_p = jnp.concatenate([hi, jnp.full((cap - n,), keys.INVALID_HI, dtype=jnp.uint32)])
    lo_p = jnp.concatenate([lo, jnp.full((cap - n,), keys.INVALID_LO, dtype=jnp.uint32)])
    payload = jnp.arange(cap, dtype=jnp.int32)
    hi_s, lo_s, pay_s = keys.sort_by_key(hi_p, lo_p, payload)
    # every original key must be found at its sorted position
    pos = keys.searchsorted2(hi_s, lo_s, hi, lo)
    found_hi = np.asarray(hi_s)[np.asarray(pos)]
    found_lo = np.asarray(lo_s)[np.asarray(pos)]
    np.testing.assert_array_equal(found_hi, np.asarray(hi))
    np.testing.assert_array_equal(found_lo, np.asarray(lo))
    # miss lookups land on a different key
    miss = keys.pack_key(jnp.asarray(np.array([[9999, 9999, 9999]], dtype=np.int32)))
    mpos = keys.searchsorted2(hi_s, lo_s, *miss)
    assert not bool(
        (np.asarray(hi_s)[int(mpos[0])] == np.asarray(miss[0])[0])
        and (np.asarray(lo_s)[int(mpos[0])] == np.asarray(miss[1])[0])
    )


def test_segment_starts():
    coords = np.array([[0, 0, 0], [0, 0, 0], [1, 0, 0], [1, 0, 0], [2, 2, 2]], dtype=np.int32)
    hi, lo = keys.pack_key(jnp.asarray(coords))
    valid = jnp.ones(5, dtype=bool)
    is_start, seg = keys.segment_starts(hi, lo, valid)
    np.testing.assert_array_equal(np.asarray(is_start), [1, 0, 1, 0, 1])
    np.testing.assert_array_equal(np.asarray(seg), [0, 0, 1, 1, 2])


def test_morton_np_matches_reference_bit_interleave():
    # Reference expandBits on a few hand-checked values (VoxelMap.h:114-135).
    c = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], dtype=np.int64)
    m = keys.morton_np(c - (1 << 20))  # cancel the bias to test raw interleave
    assert m[1] - m[0] == 1  # x occupies bit 0
    assert m[2] - m[0] == 2  # y occupies bit 1
    assert m[3] - m[0] == 4  # z occupies bit 2
    assert m[4] - m[0] == 7
