"""SE(3)/SO(3) unit tests: Exp/Log round trips, branches, conventions.

Reference semantics: src/util/MathUtils.cpp:23-174.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lidar_odometry_tpu.utils import lie


def _rand_w(rng, n, scale=1.0):
    return jnp.asarray(rng.standard_normal((n, 3)) * scale, dtype=jnp.float32)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    w = _rand_w(rng, 64, 1.0)
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=2e-5)


def test_so3_exp_orthogonal():
    rng = np.random.default_rng(1)
    R = lie.so3_exp(_rand_w(rng, 32, 2.0))
    I = np.eye(3)
    for Ri in np.asarray(R):
        np.testing.assert_allclose(Ri @ Ri.T, I, atol=1e-5)
        assert np.linalg.det(Ri) > 0.99


def test_so3_log_small_angle():
    w = jnp.array([[1e-8, -2e-8, 1e-8]], dtype=jnp.float32)
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(lie.so3_log(R)), np.asarray(w), atol=1e-7)


def test_so3_log_near_pi():
    rng = np.random.default_rng(2)
    axes = rng.standard_normal((16, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    # f32 amplifies rounding by theta/(2 sin theta) near pi (the reference
    # has the identical conditioning, MathUtils.cpp:54-80); probe the
    # regime in f64 where the same branch structure is stable, plus a
    # loose f32 check away from the singularity.
    import jax
    with jax.enable_x64():
        for theta in [np.pi - 1e-4, np.pi - 1e-7, np.pi - 1e-11]:
            w = jnp.asarray(axes * theta, dtype=jnp.float64)
            R = lie.so3_exp(w)
            w2 = np.asarray(lie.so3_log(R))
            R2 = np.asarray(lie.so3_exp(jnp.asarray(w2)))
            np.testing.assert_allclose(R2, np.asarray(R), atol=1e-7)
    w = jnp.asarray(axes * (np.pi - 1e-3), dtype=jnp.float32)
    R2 = np.asarray(lie.so3_exp(lie.so3_log(lie.so3_exp(w))))
    np.testing.assert_allclose(R2, np.asarray(lie.so3_exp(w)), atol=2e-2)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    xi_np = rng.standard_normal((64, 6))
    # keep rotation magnitude below pi — Log wraps beyond that, so the
    # round trip is only defined within the principal branch
    xi_np[:, 3:] *= 0.9 * np.pi / np.maximum(
        np.linalg.norm(xi_np[:, 3:], axis=-1, keepdims=True), 1e-9)
    xi_np[:, 3:] *= rng.random((64, 1))
    xi = jnp.asarray(xi_np, dtype=jnp.float32)
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=3e-5)


def test_se3_twist_ordering_is_trans_rot():
    # Pure translation twist -> translation in T, identity rotation
    # (reference convention MathUtils.h:109-123: [trans, rot]).
    xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0], dtype=jnp.float32)
    T = lie.se3_exp(xi)
    np.testing.assert_allclose(np.asarray(T[:3, 3]), [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(T[:3, :3]), np.eye(3), atol=1e-6)


def test_se3_inverse_compose():
    rng = np.random.default_rng(4)
    xi = jnp.asarray(rng.standard_normal((8, 6)), dtype=jnp.float32)
    T = lie.se3_exp(xi)
    TT = lie.se3_mul(T, lie.se3_inv(T))
    np.testing.assert_allclose(np.asarray(TT), np.broadcast_to(np.eye(4), TT.shape), atol=1e-5)


def test_so3_project_matches_svd():
    rng = np.random.default_rng(5)
    R = np.asarray(lie.so3_exp(_rand_w(rng, 16, 1.5)))
    noisy = jnp.asarray(R + rng.standard_normal(R.shape) * 1e-3, dtype=jnp.float32)
    p_newton = np.asarray(lie.so3_project(noisy))
    p_svd = np.asarray(lie.so3_project_svd(noisy))
    np.testing.assert_allclose(p_newton, p_svd, atol=1e-5)


def test_se3_exp_against_jacfwd_consistency():
    # The analytic V matrix must match translation of Exp for random twists
    # cross-checked via composition: Exp(xi) * Exp(-xi) = I.
    rng = np.random.default_rng(6)
    xi = jnp.asarray(rng.standard_normal((32, 6)) * 0.5, dtype=jnp.float32)
    T = lie.se3_mul(lie.se3_exp(xi), lie.se3_exp(-xi))
    np.testing.assert_allclose(np.asarray(T), np.broadcast_to(np.eye(4), T.shape), atol=1e-5)


def test_transform_points():
    T = lie.se3_matrix(lie.so3_exp(jnp.array([0.0, 0.0, np.pi / 2], dtype=jnp.float32)),
                       jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32))
    p = jnp.array([[1.0, 0.0, 0.0]], dtype=jnp.float32)
    out = lie.transform_points(T, p)
    np.testing.assert_allclose(np.asarray(out[0]), [1.0, 1.0, 0.0], atol=1e-6)
