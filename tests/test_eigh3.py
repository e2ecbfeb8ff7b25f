"""Closed-form 3x3 symmetric eigendecomposition vs numpy (SURVEY.md §4:
'surfel PCA vs. numpy SVD')."""
import numpy as np
import jax.numpy as jnp

from lidar_odometry_tpu.utils import eigh3


def _rand_spd(rng, n):
    A = rng.standard_normal((n, 3, 3))
    return (A @ np.swapaxes(A, -1, -2)).astype(np.float32)


def test_eigvals_match_numpy():
    rng = np.random.default_rng(0)
    A = _rand_spd(rng, 256)
    lam, _ = eigh3.eigh3(jnp.asarray(A))
    lam_np = np.linalg.eigvalsh(A.astype(np.float64))
    np.testing.assert_allclose(np.asarray(lam), lam_np, rtol=2e-3, atol=2e-3)


def test_smallest_eigenvector_is_null_direction():
    rng = np.random.default_rng(1)
    A = _rand_spd(rng, 128)
    lam, v = eigh3.eigh3(jnp.asarray(A))
    lam, v = np.asarray(lam), np.asarray(v)
    for Ai, li, vi in zip(A, lam, v):
        resid = np.linalg.norm(Ai @ vi - li[0] * vi)
        assert resid < 1e-2 * max(1.0, li[2]), resid


def test_plane_fit_recovers_plane():
    rng = np.random.default_rng(2)
    n_true = np.array([0.0, 0.0, 1.0])
    pts = rng.standard_normal((1, 32, 3)).astype(np.float32)
    pts[..., 2] = 5.0 + 0.001 * rng.standard_normal((1, 32)).astype(np.float32)
    mask = np.ones((1, 32), dtype=bool)
    normal, centroid, planarity = eigh3.plane_from_points(jnp.asarray(pts), jnp.asarray(mask))
    nv = np.asarray(normal)[0]
    assert abs(abs(nv @ n_true) - 1.0) < 1e-3
    assert abs(np.asarray(centroid)[0][2] - 5.0) < 1e-2
    assert float(np.asarray(planarity)[0]) < 0.01


def test_plane_fit_masked_entries_ignored():
    pts = np.zeros((1, 8, 3), dtype=np.float32)
    pts[0, :5] = [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [0.5, 0.5, 0]]
    pts[0, 5:] = 1e6  # garbage that must be masked out
    mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0]], dtype=bool)
    normal, centroid, planarity = eigh3.plane_from_points(jnp.asarray(pts), jnp.asarray(mask))
    assert abs(abs(np.asarray(normal)[0][2]) - 1.0) < 1e-4
    np.testing.assert_allclose(np.asarray(centroid)[0][:2], [0.5, 0.5], atol=1e-5)


def test_degenerate_identity_matrix():
    A = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (4, 3, 3))
    lam, v = eigh3.eigh3(A)
    np.testing.assert_allclose(np.asarray(lam), np.ones((4, 3)), atol=1e-6)
    nrm = np.linalg.norm(np.asarray(v), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)
