"""End-to-end odometry on a synthetic structured world: golden-trajectory
style integration test (SURVEY.md §4 test strategy)."""
import numpy as np
import pytest

from lidar_odometry_tpu.config import SystemConfig
from lidar_odometry_tpu.eval import ate_rmse
from lidar_odometry_tpu.io import synthetic
from lidar_odometry_tpu.models.estimator import Estimator


def _small_cfg(**kw):
    cfg = SystemConfig(
        scan_capacity=8192,
        map_l0_capacity=65536,
        map_l1_capacity=16384,
        keyframe_capacity=256,
        point_stride=1,
        enable_loop_detection=False,
        enable_console_statistics=False,
    )
    return cfg.replace(**kw)


@pytest.mark.slow
def test_straight_line_odometry():
    cfg = _small_cfg()
    world = synthetic.make_world(seed=3, extent=60.0, n_buildings=14)
    poses = synthetic.straight_trajectory(30, step=0.4)
    rng = np.random.default_rng(3)

    est = Estimator(cfg, sync_loop=True)
    for i in range(len(poses)):
        scan = synthetic.sample_scan(world, poses[i], 15000, rng,
                                     max_range=50.0, noise=0.01)
        assert est.process_frame(scan)

    traj = est.trajectory()
    assert len(traj) == len(poses)
    err = ate_rmse(traj, poses)
    assert err < 0.15, err
    # keyframes roughly every keyframe_distance_threshold meters
    assert 8 <= len(est.keyframes) <= 16
    est.shutdown()


@pytest.mark.slow
def test_kdtree_mode_odometry():
    cfg = _small_cfg(use_surfel_correspondence=False)
    world = synthetic.make_world(seed=4, extent=60.0, n_buildings=14)
    poses = synthetic.straight_trajectory(15, step=0.4)
    rng = np.random.default_rng(4)
    est = Estimator(cfg, sync_loop=True)
    for i in range(len(poses)):
        scan = synthetic.sample_scan(world, poses[i], 12000, rng,
                                     max_range=50.0, noise=0.01)
        assert est.process_frame(scan)
    err = ate_rmse(est.trajectory(), poses)
    assert err < 0.2, err
    est.shutdown()


@pytest.mark.slow
def test_estimator_api_parity_surface():
    """Reference Estimator public API equivalents (Estimator.h)."""
    cfg = _small_cfg()
    world = synthetic.make_world(seed=50, extent=40.0, n_buildings=8)
    poses = synthetic.straight_trajectory(6, step=0.4)
    rng = np.random.default_rng(50)
    est = Estimator(cfg, sync_loop=True)
    for p in poses:
        est.process_frame(synthetic.sample_scan(world, p, 8000, rng,
                                                max_range=30.0, noise=0.01))
    assert est.get_keyframe_count() >= 2
    kf = est.get_keyframe(0)
    assert kf is not None and kf.kf_id == 0
    assert est.get_keyframe(9999) is None
    assert est.get_current_pose().shape == (4, 4)
    assert est.get_loop_closure_count() == 0
    est.enable_loop_closure(True)
    assert est.loop_detector.config.enable_loop_detection
    import tempfile, os
    out = os.path.join(tempfile.mkdtemp(), "map.ply")
    assert est.save_map_to_ply(out)
    assert os.path.getsize(out) > 100
    est.shutdown()


def test_reset_reuses_compiled_programs():
    """Estimator.reset() clears SLAM state but keeps compiled runners:
    a second sequence on the same instance must track as if fresh."""
    from lidar_odometry_tpu.io import synthetic
    from lidar_odometry_tpu.eval import ate_rmse
    import numpy as np

    cfg = SystemConfig(scan_capacity=4096, map_l0_capacity=32768,
                       map_l1_capacity=8192, keyframe_capacity=128,
                       point_stride=2, enable_loop_detection=False,
                       enable_console_statistics=False)
    world = synthetic.make_world(seed=9, extent=50.0, n_buildings=12)
    poses = synthetic.straight_trajectory(16, step=0.5)
    rng = np.random.default_rng(9)
    est = Estimator(cfg, sync_loop=True)
    for p in poses[:8]:
        est.process_frame(synthetic.sample_scan(world, p, 8000, rng,
                                                max_range=40.0, noise=0.01))
    est.reset()
    assert est.frame_count == 0 and len(est.keyframes) == 0
    for p in poses:
        est.process_frame(synthetic.sample_scan(world, p, 8000, rng,
                                                max_range=40.0, noise=0.01))
    assert ate_rmse(est.trajectory(), poses) < 0.05
    est.shutdown()
