"""Accepted-loop T_rel accuracy against synthetic ground truth (round-4
VERDICT weak item 1 / next item 1): the flagship failure mode was loop
closures DEGRADING a good trajectory because the coarse-bin loop solve
left T_rel only cm-accurate while PGO weighed it equal to a mm-accurate
odometry chain. The fine polish phase (ops/icp.icp_optimize_loop
fine_table + polish_iterations) must recover the TRUE relative correction
to well under the 2 cm bound, and report an honest residual RMS for the
loop-factor noise scaling (models/estimator.py noise_scale).

Reference semantics under test: optimize_loop's relative transform
(IterativeClosestPointOptimizer.cpp:205-209) consumed by run_pgo_for_loop
(Estimator.cpp:959-1137) — the reference achieves its precision with an
unbounded exact KD-tree over the fine cloud (:465-585).
"""
import jax.numpy as jnp
import numpy as np

from lidar_odometry_tpu.io import synthetic
from lidar_odometry_tpu.ops import icp, pko, voxel_filter


def _keyframe_pair(drift_t, drift_yaw_deg, seed=11, n_pts=9000):
    """A revisit: matched keyframe stored at its TRUE pose; query keyframe
    physically at the same spot with a drifted pose estimate. Clouds are
    voxel-filtered at 0.5 m like real keyframe feature clouds (the fine
    polish table assumes <= 1 point per 0.5 m bin)."""
    world = synthetic.make_world(seed=seed, extent=50.0, n_buildings=14)
    rng = np.random.default_rng(seed)
    true_pose = np.eye(4, dtype=np.float32)
    true_pose[2, 3] = 1.8

    def feat(cloud):
        cap = 8192
        raw = jnp.asarray(cloud.astype(np.float32))
        f, m, _ = voxel_filter.voxel_filter(
            raw, jnp.int32(len(cloud)), voxel_size=0.5, stride=1,
            out_capacity=cap)
        return np.asarray(f), np.asarray(m)

    matched = synthetic.sample_scan(world, true_pose, n_pts, rng,
                                    max_range=45.0, noise=0.01)
    query = synthetic.sample_scan(world, true_pose, n_pts, rng,
                                  max_range=45.0, noise=0.01)
    m_pts, m_mask = feat(matched)
    q_pts, q_mask = feat(query)

    th = np.deg2rad(drift_yaw_deg)
    c, s = np.cos(th), np.sin(th)
    drift = np.eye(4, dtype=np.float32)
    drift[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    drift[:3, 3] = drift_t
    est_pose = (drift @ true_pose).astype(np.float32)
    return (q_pts, q_mask, est_pose), (m_pts, m_mask, true_pose), true_pose


def _solve(query, matched, polish_iterations):
    q_pts, q_mask, est_pose = query
    m_pts, m_mask, m_pose = matched
    cfg = icp.ICPConfig(max_iterations=4, voxel_size=0.5)
    consts = pko.make_pko_constants(0.1, 10.0, 100, 10.0, "huber", 3, 100)
    packed = np.asarray(icp.loop_closure_solve(
        jnp.asarray(q_pts), jnp.asarray(q_mask), jnp.asarray(est_pose),
        jnp.asarray(m_pts), jnp.asarray(m_mask), jnp.asarray(m_pose),
        jnp.float32(0.0), consts, cfg, prealign=True, bucket_width=8,
        max_loop_iterations=30, polish_iterations=polish_iterations))
    T_rel = packed[:16].reshape(4, 4)
    return T_rel, packed[16] > 0.5, float(packed[17]), float(packed[18])


def _errors(est_pose, T_rel, true_pose):
    T_corr = est_pose.astype(np.float64) @ T_rel.astype(np.float64)
    t_err = float(np.linalg.norm(T_corr[:3, 3] - true_pose[:3, 3]))
    R_err = T_corr[:3, :3].T @ true_pose[:3, :3]
    ang = float(np.degrees(np.arccos(
        np.clip((np.trace(R_err) - 1.0) / 2.0, -1.0, 1.0))))
    return t_err, ang


def test_polished_loop_trel_is_sub_centimeter():
    """The accepted-loop bound: corrected pose within 1 cm / 0.1 deg of
    truth — below the odometry noise floor of the bench circuits, so an
    accepted loop can only help. (VERDICT 'done' bar was <= ~2 cm.)"""
    query, matched, true_pose = _keyframe_pair(
        drift_t=(1.5, -0.8, 0.0), drift_yaw_deg=4.0)
    T_rel, success, inliers, rms = _solve(query, matched,
                                          polish_iterations=8)
    assert bool(success) and inliers >= 0.5
    t_err, ang = _errors(query[2], T_rel, true_pose)
    assert t_err < 0.01, f"polished T_rel translation error {t_err*1e3:.1f} mm"
    assert ang < 0.1, f"polished T_rel rotation error {ang:.3f} deg"
    # honest residual: nonzero (edge/corner correspondences keep it above
    # the 1 cm sampling noise — measured ~6 cm here) but bounded
    assert 0.001 < rms < 0.15, rms


def test_polish_improves_on_coarse_solve():
    """The coarse phase alone (2 m bins, truncated buckets, NN target) is
    what shipped in round 4; the polish must strictly tighten it."""
    query, matched, true_pose = _keyframe_pair(
        drift_t=(1.5, -0.8, 0.0), drift_yaw_deg=4.0)
    T_c, ok_c, _, _ = _solve(query, matched, polish_iterations=0)
    T_p, ok_p, _, _ = _solve(query, matched, polish_iterations=8)
    assert bool(ok_c) and bool(ok_p)
    err_c, _ = _errors(query[2], T_c, true_pose)
    err_p, _ = _errors(query[2], T_p, true_pose)
    assert err_p <= err_c
    assert err_p < 0.01


def test_polished_loop_trel_large_drift():
    """Precision must survive a large-drift loop (prealign + coarse get
    into the basin; polish finishes the job)."""
    query, matched, true_pose = _keyframe_pair(
        drift_t=(8.0, -5.0, 0.0), drift_yaw_deg=20.0)
    T_rel, success, inliers, _ = _solve(query, matched,
                                        polish_iterations=8)
    assert bool(success) and inliers >= 0.5
    t_err, ang = _errors(query[2], T_rel, true_pose)
    assert t_err < 0.02, f"large-drift T_rel translation error {t_err*1e3:.1f} mm"
    assert ang < 0.2, ang
