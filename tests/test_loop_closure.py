"""Loop-closure + PGO end-to-end on a synthetic loop trajectory
(reference Estimator loop/PGO path, Estimator.cpp:890-1225)."""
import numpy as np
import pytest

from lidar_odometry_tpu.config import SystemConfig
from lidar_odometry_tpu.eval import ate_rmse
from lidar_odometry_tpu.io import synthetic
from lidar_odometry_tpu.models.estimator import Estimator


@pytest.mark.slow
def test_loop_closure_detects_and_corrects():
    cfg = SystemConfig(
        scan_capacity=8192, map_l0_capacity=131072, map_l1_capacity=32768,
        keyframe_capacity=256, point_stride=1,
        enable_loop_detection=True, min_keyframe_gap=15,
        max_search_distance=8.0, similarity_threshold=0.4,
        enable_console_statistics=False)
    world = synthetic.make_world(seed=9, extent=80.0, n_buildings=20)
    n_frames = 120  # ~0.66 m + ~3.3 deg per frame — realistic scan motion
    poses = synthetic.loop_trajectory(n_frames, radius=12.0, revolutions=1.05)
    rng = np.random.default_rng(9)

    est = Estimator(cfg, sync_loop=True)
    for i in range(n_frames):
        scan = synthetic.sample_scan(world, poses[i], 12000, rng,
                                     max_range=60.0, noise=0.01)
        assert est.process_frame(scan)
    est.shutdown()

    traj = est.trajectory()
    err = ate_rmse(traj, poses)
    # The loop should close: either a loop was found and PGO ran, or the
    # odometry was already tight enough to stay under the bound.
    assert err < 0.5, err
    assert len(est.keyframes) >= 20


def test_loop_detector_gating():
    from lidar_odometry_tpu.models.loop_closure import (
        LoopClosureConfig, LoopClosureDetector)
    det = LoopClosureDetector(LoopClosureConfig(
        min_keyframe_gap=10, max_search_distance=5.0,
        similarity_threshold=0.9), capacity=64)
    rng = np.random.default_rng(0)
    cloud = rng.uniform(-20, 20, (2000, 3)).astype(np.float32)
    mask = np.ones(2000, bool)
    det.add_keyframe(cloud, mask, 0, np.zeros(3, np.float32))
    # gap too small -> no candidates
    out = det.detect_loop_closures(cloud, mask, 5, np.zeros(3, np.float32))
    assert out == []
    # far away -> no candidates
    out = det.detect_loop_closures(cloud, mask, 50, np.asarray([100.0, 0, 0], np.float32))
    assert out == []
    # same place, enough gap -> candidate with near-zero distance
    out = det.detect_loop_closures(cloud, mask, 50, np.zeros(3, np.float32))
    assert len(out) == 1
    assert out[0].match_keyframe_id == 0
    assert out[0].similarity_score < 0.1
