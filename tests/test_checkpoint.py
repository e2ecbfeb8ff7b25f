"""Checkpoint/resume round trip (a capability the reference lacks,
SURVEY.md §5)."""
import numpy as np
import pytest

from lidar_odometry_tpu import checkpoint
from lidar_odometry_tpu.config import SystemConfig
from lidar_odometry_tpu.eval import ate_rmse
from lidar_odometry_tpu.io import synthetic
from lidar_odometry_tpu.models.estimator import Estimator


@pytest.mark.slow
def test_checkpoint_resume_identical_trajectory(tmp_path):
    cfg = SystemConfig(scan_capacity=8192, map_l0_capacity=65536,
                       map_l1_capacity=16384, keyframe_capacity=128,
                       point_stride=2, enable_loop_detection=False,
                       enable_console_statistics=False)
    world = synthetic.make_world(seed=12, extent=60.0, n_buildings=12)
    poses = synthetic.straight_trajectory(24, step=0.4)
    scans = []
    rng = np.random.default_rng(12)
    for p in poses:
        scans.append(synthetic.sample_scan(world, p, 12000, rng,
                                           max_range=50.0, noise=0.01))

    # continuous run
    est_a = Estimator(cfg, sync_loop=True)
    for s in scans:
        est_a.process_frame(s)
    traj_a = est_a.trajectory()
    est_a.shutdown()

    # run half, checkpoint, restore, run rest
    est_b = Estimator(cfg, sync_loop=True)
    for s in scans[:12]:
        est_b.process_frame(s)
    ckpt = str(tmp_path / "state.npz")
    checkpoint.save(ckpt, est_b)
    est_b.shutdown()

    est_c = checkpoint.restore(ckpt, cfg, sync_loop=True)
    for s in scans[12:]:
        est_c.process_frame(s)
    traj_c = est_c.trajectory()
    est_c.shutdown()

    assert len(traj_c) == len(traj_a)
    # identical inputs + restored state => same trajectory to float tolerance
    np.testing.assert_allclose(traj_c[:, :3, 3], traj_a[:, :3, 3], atol=1e-3)
    assert ate_rmse(traj_c, poses) < 0.2


def test_window_size_memory_tiering():
    """Reference sliding window (Estimator.cpp:474-490, window_size):
    keyframes older than the window spill their feature clouds to disk
    (bounded host RSS), reload transparently for loop-closure ICP /
    map export, and loops still fire against spilled keyframes."""
    import os
    import numpy as np
    from lidar_odometry_tpu.config import SystemConfig
    from lidar_odometry_tpu.eval import ate_rmse
    from lidar_odometry_tpu.io import synthetic
    from lidar_odometry_tpu.models.estimator import Estimator

    poses = synthetic.circuit_trajectory(230, length=30.0, radius=10.0,
                                         step=0.6)   # 1.12 laps: revisits
    world = synthetic.make_world(seed=9, extent=60.0, n_buildings=18)
    rng = np.random.default_rng(9)
    cfg = SystemConfig(
        scan_capacity=8192, map_l0_capacity=131072, map_l1_capacity=32768,
        keyframe_capacity=256, point_stride=1, max_iterations=2,
        window_size=8, enable_loop_detection=True, min_keyframe_gap=25,
        max_search_distance=8.0, similarity_threshold=0.4,
        enable_console_statistics=False)
    est = Estimator(cfg, sync_loop=True)
    for p in poses:
        assert est.process_frame(synthetic.sample_scan(
            world, p, 6000, rng, max_range=45.0, noise=0.02))

    n_kf = len(est.keyframes)
    assert n_kf > 30
    resident = [kf for kf in est.keyframes if not kf.is_spilled]
    spilled = [kf for kf in est.keyframes if kf.is_spilled]
    # RAM holds at most window_size dense clouds (+ any re-loaded copies
    # are transient); everything older is on disk
    assert len(resident) <= cfg.window_size
    assert len(spilled) == n_kf - len(resident)
    assert est._spool_dir is not None and os.path.isdir(est._spool_dir)
    assert len(os.listdir(est._spool_dir)) >= len(spilled)

    # spilled clouds reload exactly (masked content round-trips)
    kf0 = est.keyframes[0]
    assert kf0.is_spilled
    cloud = kf0.feature_cloud
    assert cloud.shape == (cfg.scan_capacity, 3)
    assert np.isfinite(cloud[kf0.feature_mask]).all()
    assert kf0.feature_mask.sum() > 100

    # the loop fired against a spilled (lap-1) keyframe
    assert est.get_loop_closure_count() >= 1

    # map export reads every keyframe, spilled or not
    acc = est.accumulated_map(voxel_size=0.5)
    assert len(acc) > 10000

    # reset drops the spool
    spool = est._spool_dir
    est.reset()
    assert est._spool_dir is None
    assert not os.path.isdir(spool)
    est.shutdown()
