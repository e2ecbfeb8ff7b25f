"""KITTI evaluator tests vs hand-computed values (reference evaluator,
kitti_player.cpp:576-757)."""
import numpy as np

from lidar_odometry_tpu.eval import (T_LIDAR_TO_CAM, ate_rmse,
                                     evaluate_trajectory, lidar_pose_to_cam)


def _traj(xs, ys=None):
    n = len(xs)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = xs
    if ys is not None:
        poses[:, 1, 3] = ys
    return poses


def test_identical_trajectories_zero_error():
    xs = np.arange(0, 1200, 1.0)  # 1.2 km so segments up to 800 m exist
    gt = _traj(xs)
    s = evaluate_trajectory(gt, gt)
    assert s.available
    assert s.ate_rmse < 1e-9
    assert s.translation_mean < 1e-6
    assert s.rotation_mean < 1e-6
    assert s.total_segments > 0


def test_known_lateral_offset_ate():
    xs = np.arange(0, 50, 1.0)
    gt = _traj(xs)
    est = _traj(xs, ys=np.full(50, 0.0))
    est[:, 1, 3] = 0.3  # constant lateral offset
    # first-frame alignment removes a constant offset entirely
    assert ate_rmse(est, gt) < 1e-9
    est2 = _traj(xs)
    est2[:, 1, 3] = np.linspace(0, 1.0, 50)  # growing drift
    err = ate_rmse(est2, gt)
    expected = np.sqrt(np.mean(np.linspace(0, 1.0, 50) ** 2))
    np.testing.assert_allclose(err, expected, rtol=1e-6)


def test_scale_factor_estimation():
    xs = np.arange(0, 400, 1.0)
    gt = _traj(xs)
    est = _traj(xs * 0.5)  # half scale
    s = evaluate_trajectory(est, gt)
    np.testing.assert_allclose(s.scale_factor, 2.0, rtol=1e-6)
    # after scale correction the trajectories coincide
    assert s.ate_rmse < 1e-9


def test_segment_translation_error_percent():
    xs = np.arange(0, 400, 1.0)
    gt = _traj(xs)
    est = _traj(xs * 1.02)  # 2% length error per meter
    s = evaluate_trajectory(est, gt, apply_scale=False)
    np.testing.assert_allclose(s.translation_mean, 2.0, rtol=1e-2)


def test_lidar_cam_conversion_roundtrip():
    rng = np.random.default_rng(0)
    T = np.eye(4)
    T[:3, 3] = rng.standard_normal(3)
    cam = lidar_pose_to_cam(T)
    # conjugation preserves translation norm
    np.testing.assert_allclose(np.linalg.norm(cam[:3, 3]),
                               np.linalg.norm(T[:3, 3]), rtol=1e-9)
    back = np.linalg.inv(T_LIDAR_TO_CAM) @ cam @ T_LIDAR_TO_CAM
    np.testing.assert_allclose(back, T, atol=1e-12)
