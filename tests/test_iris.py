"""LiDAR-Iris descriptor tests (reference thirdparty/LidarIris/LidarIris.cpp)."""
import numpy as np
import jax.numpy as jnp

from lidar_odometry_tpu.ops import iris


def _ring_cloud(rng, n=4000, yaw_offset=0.0):
    """Structured cloud with angular features (asymmetric walls)."""
    pts = []
    for ang_deg, dist in [(0, 10), (40, 20), (90, 15), (200, 30), (300, 8)]:
        ang = np.radians(ang_deg) + yaw_offset
        k = n // 5
        a = ang + rng.standard_normal(k) * 0.05
        d = dist + rng.standard_normal(k) * 0.5
        z = rng.uniform(-2, 2, k)
        pts.append(np.stack([d * np.cos(a), d * np.sin(a), z], axis=-1))
    return np.concatenate(pts).astype(np.float32)


def test_iris_image_binning():
    pts = np.array([[10.0, 0.0, 0.0],      # dis=10, yaw=180, z=0 -> arc 5
                    [0.0, 20.0, -5.0]], np.float32)  # dis=20, yaw=270, arc 0
    img = np.asarray(iris.iris_image(jnp.asarray(pts), jnp.ones(2, bool)))
    assert img[10, 180] == 32.0   # 1 << 5
    assert img[20, 270] == 1.0    # 1 << 0
    assert img.sum() == 33.0


def test_identical_clouds_near_zero_distance():
    rng = np.random.default_rng(0)
    cloud = _ring_cloud(rng)
    img = iris.iris_image(jnp.asarray(cloud), jnp.ones(len(cloud), bool))
    f = iris.iris_feature(img)
    d, bias = iris.compare_batch(f[0], f[1], f[2],
                                 f[0][None], f[1][None], f[2][None],
                                 jnp.ones(1, bool))
    assert float(d[0]) < 0.05
    assert int(bias[0]) % 360 in (0, 359, 1)


def test_rotated_cloud_low_distance_correct_bias():
    rng = np.random.default_rng(1)
    cloud = _ring_cloud(rng)
    yaw = np.radians(90)
    R = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                  [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]], np.float32)
    rotated = cloud @ R.T
    f1 = iris.iris_feature(iris.iris_image(jnp.asarray(cloud), jnp.ones(len(cloud), bool)))
    f2 = iris.iris_feature(iris.iris_image(jnp.asarray(rotated), jnp.ones(len(rotated), bool)))
    d, bias = iris.compare_batch(f1[0], f1[1], f1[2],
                                 f2[0][None], f2[1][None], f2[2][None],
                                 jnp.ones(1, bool))
    assert float(d[0]) < 0.15, float(d[0])


def test_different_places_high_distance():
    rng = np.random.default_rng(2)
    c1 = _ring_cloud(rng)
    c2 = rng.uniform(-40, 40, (4000, 3)).astype(np.float32)
    f1 = iris.iris_feature(iris.iris_image(jnp.asarray(c1), jnp.ones(len(c1), bool)))
    f2 = iris.iris_feature(iris.iris_image(jnp.asarray(c2), jnp.ones(len(c2), bool)))
    d_same, _ = iris.compare_batch(f1[0], f1[1], f1[2],
                                   f1[0][None], f1[1][None], f1[2][None],
                                   jnp.ones(1, bool))
    d_diff, _ = iris.compare_batch(f1[0], f1[1], f1[2],
                                   f2[0][None], f2[1][None], f2[2][None],
                                   jnp.ones(1, bool))
    assert float(d_diff[0]) > float(d_same[0]) + 0.1


def test_batch_invalid_masked():
    rng = np.random.default_rng(3)
    c = _ring_cloud(rng)
    f = iris.iris_feature(iris.iris_image(jnp.asarray(c), jnp.ones(len(c), bool)))
    d, _ = iris.compare_batch(f[0], f[1], f[2],
                              jnp.stack([f[0], f[0]]), jnp.stack([f[1], f[1]]),
                              jnp.stack([f[2], f[2]]),
                              jnp.asarray([True, False]))
    assert np.isfinite(float(d[0]))
    assert np.isinf(float(d[1]))
