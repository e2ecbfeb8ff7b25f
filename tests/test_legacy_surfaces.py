"""Reference API surfaces that the reference itself never calls (round-2
VERDICT missing item 4): legacy VoxelGrid/CropBox/RangeFilter
(reference src/util/PointCloudUtils.h:462-638) and the PKO auxiliary
helpers (reference src/optimization/AdaptiveMEstimator.cpp:158-215,
587-673)."""
import numpy as np
import jax.numpy as jnp

from lidar_odometry_tpu.ops import legacy_filters as lf
from lidar_odometry_tpu.ops import pko


def test_voxel_grid_filter_matches_numpy_mean():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    mask = np.ones(2000, bool)
    mask[::17] = False
    cen, valid = lf.voxel_grid_filter(jnp.asarray(pts), jnp.asarray(mask),
                                      leaf_size=1.0)
    cen, valid = np.asarray(cen), np.asarray(valid)
    # numpy oracle: mean per voxel key
    keys = np.floor(pts[mask] / 1.0).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    assert valid.sum() == len(uniq)
    sums = np.zeros((len(uniq), 3))
    cnts = np.zeros(len(uniq))
    np.add.at(sums, inv, pts[mask])
    np.add.at(cnts, inv, 1)
    oracle = sums / cnts[:, None]
    got = cen[valid]
    # order-independent comparison via lexicographic sort
    o = oracle[np.lexsort(oracle.T)]
    g = got[np.lexsort(got.T)]
    np.testing.assert_allclose(g, o, atol=1e-4)


def test_crop_box_inside_and_negative():
    pts = np.array([[0, 0, 0], [2, 0, 0], [0.5, 0.5, 0.5], [-2, 0, 0]],
                   np.float32)
    mask = np.ones(4, bool)
    inside = np.asarray(lf.crop_box(jnp.asarray(pts), jnp.asarray(mask),
                                    [-1, -1, -1], [1, 1, 1]))
    np.testing.assert_array_equal(inside, [True, False, True, False])
    outside = np.asarray(lf.crop_box(jnp.asarray(pts), jnp.asarray(mask),
                                     [-1, -1, -1], [1, 1, 1],
                                     negative=True))
    np.testing.assert_array_equal(outside, ~inside)


def test_range_filter():
    pts = np.array([[0.05, 0, 0], [3, 0, 0], [0, 60, 0]], np.float32)
    mask = np.ones(3, bool)
    out = np.asarray(lf.range_filter(jnp.asarray(pts), jnp.asarray(mask),
                                     0.1, 50.0))
    np.testing.assert_array_equal(out, [False, True, False])


def test_detect_picks_finds_valley():
    rng = np.random.default_rng(1)
    # bimodal with a clear valley near 5
    r = np.concatenate([rng.normal(1.0, 0.4, 3000),
                        rng.normal(9.0, 0.4, 3000)])
    picks = pko.detect_picks_for_init(np.abs(r))
    assert len(picks) >= 1
    assert any(2.0 < p < 8.0 for p in picks)
    # degenerate inputs return empty like the reference
    assert pko.detect_picks_for_init([1.0, 1.0]) == []
    assert pko.detect_picks_for_init(np.ones(100)) == []


def test_information_helpers():
    r = jnp.asarray(np.abs(np.random.default_rng(2).normal(0, 1, 64)))
    diag, scale = pko.information_matrix_diagonal(r, jnp.ones(64, bool),
                                                  last_scale_factor=0.7)
    assert diag.shape == (64,)
    assert float(jnp.max(jnp.abs(diag - 1.0))) == 0.0
    assert scale == 0.7
    w = pko.information_weight(jnp.float32(2.0), jnp.float32(0.5), "huber")
    assert 0.0 < float(w) <= 1.0
    # invalid scale degrades to weight 1 (reference :203-206)
    assert float(pko.information_weight(jnp.float32(2.0),
                                        jnp.float32(0.0))) == 1.0
