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
