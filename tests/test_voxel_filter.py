"""FastVoxelFilter-equivalent tests (reference VoxelMap.h:53-140)."""
import numpy as np
import jax.numpy as jnp

from lidar_odometry_tpu.ops.voxel_filter import voxel_filter


def _run(points, n, voxel_size=0.5, stride=1, cap=256):
    pts = np.zeros((max(len(points), 8), 3), np.float32)
    pts[: len(points)] = points
    c, m, nv = voxel_filter(jnp.asarray(pts), jnp.int32(n),
                            voxel_size=voxel_size, stride=stride, out_capacity=cap)
    c, m = np.asarray(c), np.asarray(m)
    return c[m], int(nv)


def test_single_voxel_centroid():
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [0.3, 0.3, 0.3]], np.float32)
    out, nv = _run(pts, 3)
    assert nv == 1
    np.testing.assert_allclose(out[0], [0.2, 0.2, 0.2], atol=1e-6)


def test_separate_voxels():
    pts = np.array([[0.1, 0.1, 0.1], [1.1, 0.1, 0.1], [-0.1, 0.1, 0.1]], np.float32)
    out, nv = _run(pts, 3)
    assert nv == 3


def test_stride_skipping():
    # stride=2 keeps indices 0, 2 (reference VoxelMap.h:82: i += stride)
    pts = np.array([[0.1, 0, 0], [5.0, 0, 0], [10.0, 0, 0], [15.0, 0, 0]], np.float32)
    out, nv = _run(pts, 4, stride=2)
    assert nv == 2
    got = sorted(out[:, 0].tolist())
    np.testing.assert_allclose(got, [0.1, 10.0], atol=1e-6)


def test_nonfinite_rejected():
    pts = np.array([[0.1, 0, 0], [np.nan, 0, 0], [np.inf, 1, 1]], np.float32)
    out, nv = _run(pts, 3)
    assert nv == 1


def test_padding_ignored():
    pts = np.array([[0.1, 0, 0], [99.0, 99.0, 99.0]], np.float32)
    out, nv = _run(pts, 1)  # only first point valid
    assert nv == 1


def test_matches_numpy_reference_impl():
    rng = np.random.default_rng(0)
    pts = (rng.standard_normal((5000, 3)) * 20).astype(np.float32)
    out, nv = _run(pts, 5000, voxel_size=1.0, stride=3, cap=8192)
    # reference implementation in numpy
    sub = pts[::3]
    keys_ref = np.floor(sub / 1.0).astype(np.int64)
    uniq, inv = np.unique(keys_ref, axis=0, return_inverse=True)
    cents = np.zeros((len(uniq), 3))
    counts = np.zeros(len(uniq))
    np.add.at(cents, inv, sub)
    np.add.at(counts, inv, 1)
    cents /= counts[:, None]
    assert nv == len(uniq)
    got = out[np.lexsort(out.T)]
    want = cents[np.lexsort(cents.T)]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_compact_keys_matches_generic():
    """The compact single-u32 key path must produce the same voxel set and
    centroids as the generic (hi, lo) path for in-envelope scans, and drop
    out-of-envelope points like non-finite ones."""
    rng = np.random.default_rng(3)
    pts = (rng.standard_normal((4096, 3)) * 30).astype(np.float32)
    pts[17] = np.nan
    g_c, g_m, g_n = voxel_filter(jnp.asarray(pts), jnp.int32(4096),
                                 voxel_size=0.5, stride=2, out_capacity=4096)
    c_c, c_m, c_n = voxel_filter(jnp.asarray(pts), jnp.int32(4096),
                                 voxel_size=0.5, stride=2, out_capacity=4096,
                                 compact_keys=True)
    assert int(g_n) == int(c_n)
    a = np.asarray(g_c)[np.asarray(g_m)]
    b = np.asarray(c_c)[np.asarray(c_m)]
    # the two key paths sort in different orders, so the corner-relative
    # prefix sums accumulate in different orders: agreement is to float
    # reduction noise (~1e-5 of a metre), not bitwise
    np.testing.assert_allclose(a[np.lexsort(a.T)], b[np.lexsort(b.T)],
                               atol=2e-4)
    # out-of-envelope point (beyond +-512 voxels) is dropped, not aliased
    far = np.zeros((8, 3), np.float32)
    far[0] = [0.1, 0.1, 0.1]
    far[1] = [400.0, 0.0, 0.0]     # 800 voxels at 0.5 m -> outside
    _, _, n_far = voxel_filter(jnp.asarray(far), jnp.int32(2),
                               voxel_size=0.5, stride=1, out_capacity=8,
                               compact_keys=True)
    assert int(n_far) == 1


def test_nan_padded_tail_does_not_poison_centroids():
    """A NaN-padded scan whose n_points covers the padding (the Estimator
    API contract allows it: padding rows are non-finite) must yield
    all-finite masked centroids. Regression: NaN * 0-weight rows summed
    into the LAST segment, emitting one masked-True NaN centroid that
    froze ICP for the whole run (delta_x NaN -> zero step)."""
    rng = np.random.default_rng(3)
    pts = np.full((2048, 3), np.nan, np.float32)
    pts[:1500] = (rng.standard_normal((1500, 3)) * 20).astype(np.float32)
    for ck in (False, True):
        c, m, n = voxel_filter(jnp.asarray(pts), jnp.int32(2048),
                               voxel_size=0.5, stride=1, out_capacity=2048,
                               compact_keys=ck)
        got = np.asarray(c)[np.asarray(m)]
        assert np.isfinite(got).all(), f"compact_keys={ck}"
        assert int(n) == len(got)
