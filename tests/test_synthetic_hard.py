"""Hardened synthetic data (round-2 VERDICT weak item 6 / next item 6):
ray-cast spinning-beam scans with ring structure, dynamic objects, and
non-planar clutter — the closest available proxy for real KITTI (no
dataset in the image). The pipeline must hold accuracy against them."""
import numpy as np

from lidar_odometry_tpu.config import SystemConfig
from lidar_odometry_tpu.eval import ate_rmse
from lidar_odometry_tpu.io import synthetic
from lidar_odometry_tpu.models.estimator import Estimator


def _hard_scene(n_frames):
    world = synthetic.make_world(seed=21, extent=80.0, n_buildings=24)
    # spawn traffic along the WHOLE circuit, not just the tested prefix
    lap = synthetic.circuit_trajectory(260, length=60.0, radius=15.0,
                                       step=0.65)
    poses = lap[:n_frames]
    objs = synthetic.make_dynamic_objects(21, 18, extent=70.0,
                                          near_path=lap[::8, :2, 3])
    clut = synthetic.make_clutter(21, 24, extent=70.0)
    return world, poses, objs, clut


def test_ring_scan_structure():
    """Ring scans must show beam structure: elevation-quantized directions
    and range-dependent ground-ring spacing (unlike the area sampler)."""
    world, poses, objs, clut = _hard_scene(4)
    rng = np.random.default_rng(0)
    s, dyn = synthetic.sample_scan_rings(
        world, poses[0], rng, n_rings=64, azimuth_steps=600,
        dynamic_objects=objs, t=0.0, clutter=clut, return_dynamic_mask=True)
    assert len(s) > 10000
    assert dyn.shape == (len(s),)
    # elevation angles concentrate on exactly <=64 distinct rings
    el = np.degrees(np.arctan2(s[:, 2] - 0.0,
                               np.linalg.norm(s[:, :2], axis=1)))
    # ground points: their sensor-frame elevation is quantized to beams
    ground = np.abs(s[:, 2] + poses[0][2, 3]) < 0.15
    el_g = np.round(el[ground] * 4) / 4
    assert len(np.unique(el_g)) < 120  # quantized, not a continuum
    # dynamic returns exist and are a minority
    assert 0.005 < dyn.mean() < 0.4


def test_odometry_robust_to_dynamics_and_clutter():
    """20 frames of ring scans with moving boxes + clutter: ATE must stay
    bounded and the clutter must not poison the surfel map (planarity
    rejection, reference VoxelMap.cpp:244-253)."""
    world, poses, objs, clut = _hard_scene(20)
    rng = np.random.default_rng(1)
    scans = [synthetic.sample_scan_rings(
        world, poses[i], rng, n_rings=64, azimuth_steps=600,
        dynamic_objects=objs, t=float(i), clutter=clut)
        for i in range(20)]
    cfg = SystemConfig(
        scan_capacity=14336, map_l0_capacity=131072, map_l1_capacity=32768,
        keyframe_capacity=256, point_stride=4, enable_loop_detection=False,
        enable_console_statistics=False)
    est = Estimator(cfg, sync_loop=True)
    for s in scans:
        assert est.process_frame(s)
    err = ate_rmse(est.trajectory(), poses[:20])
    assert err < 0.15, err
    assert est.get_keyframe_count() >= 8


def test_corridor_world_indoor_odometry():
    """MID360-style indoor corridor (KD-tree correspondence mode,
    0.4 m voxels): wide-FOV ring scans with floor+ceiling."""
    ip = synthetic.circuit_trajectory(16, length=24.0, radius=7.0,
                                      step=0.25, height=1.2)
    ck = synthetic.circuit_trajectory(
        64, length=24.0, radius=7.0,
        step=(2 * 24.0 + 2 * np.pi * 7.0) / 64, height=1.2)
    world = synthetic.make_corridor_world(ck[:, :2, 3], width=5.0,
                                          height=3.0, extent=25.0)
    rng = np.random.default_rng(2)
    scans = [synthetic.sample_scan_rings(
        world, ip[i], rng, n_rings=40, azimuth_steps=600, max_range=25.0,
        noise=0.008, elevation_range=(-7.0, 52.0)) for i in range(16)]
    cfg = SystemConfig(
        scan_capacity=8192, map_l0_capacity=131072, map_l1_capacity=32768,
        keyframe_capacity=256, point_stride=4, voxel_size=0.4,
        map_voxel_size=0.4, max_range=40.0,
        use_surfel_correspondence=False, enable_loop_detection=False,
        enable_console_statistics=False)
    est = Estimator(cfg, sync_loop=True)
    for s in scans:
        assert est.process_frame(s)
    err = ate_rmse(est.trajectory(), ip)
    assert err < 0.1, err
