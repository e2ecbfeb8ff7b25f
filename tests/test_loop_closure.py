"""Loop-closure + PGO end-to-end on a synthetic loop trajectory
(reference Estimator loop/PGO path, Estimator.cpp:890-1225)."""
import numpy as np
import pytest

from lidar_odometry_tpu.config import SystemConfig
from lidar_odometry_tpu.eval import ate_rmse
from lidar_odometry_tpu.io import synthetic
from lidar_odometry_tpu.models.estimator import Estimator


def _circuit_scans(seed=9, n_frames=220):
    world = synthetic.make_world(seed=seed, extent=60.0, n_buildings=18)
    poses = synthetic.circuit_trajectory(n_frames, length=30.0, radius=10.0,
                                         step=0.6)
    rng = np.random.default_rng(seed)
    scans = [synthetic.sample_scan(world, poses[i], 6000, rng,
                                   max_range=45.0, noise=0.02)
             for i in range(n_frames)]
    return poses, scans


def _run_circuit(scans, enable_loop, pgo_backend="manual"):
    # max_iterations=2 under-converges ICP so odometry accumulates REAL
    # drift (~2.5 m over the circuit) that loop closure must then fix —
    # the round-1 version of this test could pass without any loop firing.
    cfg = SystemConfig(
        scan_capacity=8192, map_l0_capacity=131072, map_l1_capacity=32768,
        keyframe_capacity=256, point_stride=1, max_iterations=2,
        enable_loop_detection=enable_loop, min_keyframe_gap=25,
        max_search_distance=8.0, similarity_threshold=0.4,
        pgo_backend=pgo_backend, enable_console_statistics=False)
    est = Estimator(cfg, sync_loop=True)
    for s in scans:
        assert est.process_frame(s)
    est.shutdown()
    return est


@pytest.mark.slow
@pytest.mark.parametrize("pgo_backend", ["manual", "distributed"])
def test_loop_closure_detects_and_corrects(pgo_backend):
    """STRICT loop-closure e2e: the loop constraint must actually fire AND
    PGO must improve the trajectory (reference Estimator.cpp:890-1225).
    The distributed parametrization runs the Schur-complement PGO backend
    inside the real pipeline."""
    poses, scans = _circuit_scans()
    est_odo = _run_circuit(scans, enable_loop=False)
    err_odo = ate_rmse(est_odo.trajectory(), poses)
    assert err_odo > 1.0, f"workload too easy to prove anything ({err_odo})"

    est = _run_circuit(scans, enable_loop=True, pgo_backend=pgo_backend)
    err = ate_rmse(est.trajectory(), poses)
    # the loop must have fired — this fails if detection silently stops
    assert est.get_loop_closure_count() >= 1
    assert est.pose_graph.loop_closure_count >= 1
    # and PGO must have materially corrected the drift
    assert err < err_odo * 0.6, (err, err_odo)
    assert len(est.keyframes) >= 80


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


def test_loop_detector_scales_to_500_keyframes():
    """DB insertion must stay O(1) per keyframe and a query against a
    500-entry DB must return promptly (the round-1 device DB re-copied
    ~470 MB per insertion; reference scans the whole DB sequentially,
    LoopClosureDetector.cpp:129-154)."""
    import time
    from lidar_odometry_tpu.models.loop_closure import (
        LoopClosureConfig, LoopClosureDetector)
    det = LoopClosureDetector(LoopClosureConfig(
        min_keyframe_gap=10, max_search_distance=1e9,
        similarity_threshold=0.99), capacity=1024)
    rng = np.random.default_rng(3)
    n = 500
    base = rng.uniform(-20, 20, (1500, 3)).astype(np.float32)
    mask = np.ones(len(base), bool)
    for k in range(n):
        # same structure, shifted — descriptors differ per keyframe
        det.add_keyframe(base + rng.normal(0, 0.5, 3).astype(np.float32),
                         mask, k, np.zeros(3, np.float32))
    t0 = time.perf_counter()
    out = det.detect_loop_closures(base, mask, n + 20, np.zeros(3, np.float32))
    dt = time.perf_counter() - t0
    assert det._db_n == n
    assert len(out) == 1  # every entry passes the wide-open gates; best wins
    # the whole 500-candidate batched compare (CPU here) must be seconds,
    # not the minutes a sequential per-pair scan would take
    assert dt < 60.0, dt


def test_full_db_query_never_corrupts_live_rows():
    """Round-3 advisor (high): with db_n == capacity, an unknown-query
    extraction used to overwrite LIVE row capacity-1 and then self-match
    it at similarity 0.0 — a fabricated loop closure. The scratch row
    must live PAST the live region and repeated full-DB queries must
    leave every stored descriptor intact."""
    import numpy as np
    from lidar_odometry_tpu.models.loop_closure import (
        LoopClosureConfig, LoopClosureDetector)
    cap = 8
    det = LoopClosureDetector(LoopClosureConfig(
        min_keyframe_gap=2, max_search_distance=1e9,
        similarity_threshold=0.05), capacity=cap)
    rng = np.random.default_rng(5)
    mask = np.ones(1200, bool)
    clouds = [rng.uniform(-20, 20, (1200, 3)).astype(np.float32)
              for _ in range(cap)]
    for k, c in enumerate(clouds):
        det.add_keyframe(c, mask, k, np.zeros(3, np.float32))
    det._drain_pending()
    assert det._db_n == cap
    before = np.asarray(det._dev_img)[:cap].copy()

    # an UNRELATED query against the full DB, repeated (each one used to
    # clobber row cap-1 in turn)
    q = rng.uniform(-20, 20, (1200, 3)).astype(np.float32)
    for qid in (100, 101):
        out = det.detect_loop_closures(q, mask, qid, np.zeros(3, np.float32))
        # a random cloud must not match anything at threshold 0.05 —
        # the corrupted-row bug produced a guaranteed 0.0 self-match
        assert out == []
    after = np.asarray(det._dev_img)[:cap]
    np.testing.assert_array_equal(before, after)

    # the query keyframe's OWN stored descriptor still matches itself
    out = det.detect_loop_closures(clouds[0], mask, 50,
                                   np.zeros(3, np.float32))
    assert len(out) == 1 and out[0].match_keyframe_id == 0


def test_import_state_truncates_host_lists_with_device_rows():
    """Round-3 advisor (low): a checkpoint larger than capacity must
    truncate _kf_ids/_positions in lockstep with the device rows, or a
    later query clamp-gathers the wrong descriptor."""
    import numpy as np
    from lidar_odometry_tpu.models.loop_closure import (
        LoopClosureConfig, LoopClosureDetector)
    big = LoopClosureDetector(LoopClosureConfig(
        min_keyframe_gap=2, max_search_distance=1e9,
        similarity_threshold=0.9), capacity=16)
    rng = np.random.default_rng(6)
    mask = np.ones(800, bool)
    for k in range(12):
        big.add_keyframe(rng.uniform(-20, 20, (800, 3)).astype(np.float32),
                         mask, k, np.zeros(3, np.float32))
    state = big.export_state()

    small = LoopClosureDetector(LoopClosureConfig(
        min_keyframe_gap=2, max_search_distance=1e9,
        similarity_threshold=0.9), capacity=8)
    small.import_state(state)
    assert small._db_n == 8
    assert len(small._kf_ids) == 8
    assert len(small._positions) == 8
    # queries still work against the truncated DB
    out = small.detect_loop_closures(
        rng.uniform(-20, 20, (800, 3)).astype(np.float32), mask, 99,
        np.zeros(3, np.float32))
    assert isinstance(out, list)
