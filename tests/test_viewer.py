"""Headless viewer artifact tests (PangolinViewer stand-in, viewer.py)."""
import os

import numpy as np
import pytest

from lidar_odometry_tpu import viewer


def test_render_snapshot(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((500, 3)).astype(np.float32) * 10
    traj = np.tile(np.eye(4, dtype=np.float32), (20, 1, 1))
    traj[:, 0, 3] = np.arange(20)
    out = str(tmp_path / "snap.png")
    ok = viewer.render_snapshot(out, map_points=pts, trajectory=traj,
                                keyframe_positions=traj[::5, :3, 3])
    if ok:
        assert os.path.getsize(out) > 1000
    # returns False gracefully when matplotlib is missing — either way no crash


def test_console_viewer_autoplay():
    cv = viewer.ConsoleViewer(step_mode=False, print_every=5)
    pose = np.eye(4, dtype=np.float32)
    for _ in range(12):
        assert cv.on_frame(pose, n_points=100, n_keyframes=2)
    cv.finish()


@pytest.mark.slow
def test_export_state(tmp_path):
    from lidar_odometry_tpu.config import SystemConfig
    from lidar_odometry_tpu.io import synthetic
    from lidar_odometry_tpu.models.estimator import Estimator
    cfg = SystemConfig(scan_capacity=4096, map_l0_capacity=16384,
                       map_l1_capacity=4096, keyframe_capacity=16,
                       point_stride=2, enable_loop_detection=False,
                       enable_console_statistics=False)
    world = synthetic.make_world(seed=40, extent=40.0, n_buildings=8)
    poses = synthetic.straight_trajectory(5, step=0.4)
    rng = np.random.default_rng(40)
    est = Estimator(cfg, sync_loop=True)
    for p in poses:
        est.process_frame(synthetic.sample_scan(world, p, 6000, rng,
                                                max_range=30.0, noise=0.01))
    out = str(tmp_path / "export")
    viewer.export_state(out, est)
    assert os.path.isfile(os.path.join(out, "map.ply"))
    assert os.path.isfile(os.path.join(out, "trajectory_xyz.csv"))
    assert os.path.isfile(os.path.join(out, "keyframes_xyz.csv"))
    # surfel dump: centroid + unit normal + planarity per cached L1 surfel
    surf = np.loadtxt(os.path.join(out, "surfels.csv"), delimiter=",",
                      skiprows=1, ndmin=2)
    assert surf.shape[0] > 0 and surf.shape[1] == 7
    np.testing.assert_allclose(np.linalg.norm(surf[:, 3:6], axis=1), 1.0,
                               atol=1e-3)
    assert np.all(surf[:, 6] >= 0.0)
    # pre/post-ICP debug clouds of the last frame (reference
    # update_icp_debug_clouds): both exist and differ by the ICP refine
    assert os.path.isfile(os.path.join(out, "debug_pre_icp.ply"))
    assert os.path.isfile(os.path.join(out, "debug_post_icp.ply"))
    est.shutdown()


def test_timing_statistics_smoke(capsys):
    from lidar_odometry_tpu.models.estimator import Estimator, TimingStats
    from lidar_odometry_tpu.config import SystemConfig
    est = Estimator(SystemConfig(enable_loop_detection=False,
                                 scan_capacity=1024, map_l0_capacity=4096,
                                 map_l1_capacity=1024), sync_loop=True)
    for i in range(5):
        est.timing_history.append(TimingStats(1.0, 2.0, 3.0, 6.0))
    est.print_timing_statistics()  # must not raise
    est.shutdown()


def test_live_viewer_serves_state_and_controls():
    """LiveViewer (the reference PangolinViewer's live render + auto/step
    UI as a local HTTP server): page + state.json + control endpoints,
    and the frame-loop gate semantics."""
    import json
    import threading
    import urllib.request

    import numpy as np

    from lidar_odometry_tpu.config import SystemConfig
    from lidar_odometry_tpu.io import synthetic
    from lidar_odometry_tpu.models.estimator import Estimator
    from lidar_odometry_tpu.viewer import LiveViewer

    cfg = SystemConfig(scan_capacity=4096, map_l0_capacity=32768,
                       map_l1_capacity=8192, keyframe_capacity=64,
                       point_stride=2, enable_loop_detection=False,
                       enable_console_statistics=False)
    world = synthetic.make_world(seed=3, extent=40.0, n_buildings=8)
    rng = np.random.default_rng(3)
    est = Estimator(cfg, sync_loop=True)
    for p in synthetic.straight_trajectory(6, step=0.5):
        est.process_frame(synthetic.sample_scan(world, p, 6000, rng,
                                                max_range=30.0, noise=0.01))
    lv = LiveViewer(port=0)   # ephemeral port
    try:
        lv.update(est)
        base = f"http://127.0.0.1:{lv.port}"
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "lidar_odometry_tpu live" in page
        state = json.loads(urllib.request.urlopen(
            f"{base}/state.json").read())
        assert state["frame"] == 6
        assert len(state["traj"]) == 6
        assert state["n_map"] > 1000
        assert len(state["map"]) == state["n_map"]

        # finish control stops the frame-loop gate
        urllib.request.urlopen(urllib.request.Request(
            f"{base}/control?mode=finish", method="POST"))
        assert lv.wait_if_stepping() is False

        # step mode grants exactly the posted steps
        urllib.request.urlopen(urllib.request.Request(
            f"{base}/control?mode=step", method="POST"))
        granted = []
        t = threading.Thread(
            target=lambda: granted.append(lv.wait_if_stepping()))
        t.start()
        t.join(timeout=5.0)
        assert granted == [True]
    finally:
        lv.close()
        est.shutdown()
