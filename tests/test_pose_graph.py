"""Pose-graph optimizer tests (reference PoseGraphOptimizer.cpp)."""
import numpy as np

from lidar_odometry_tpu.models import pose_graph as pg


def _pose(x=0.0, y=0.0, z=0.0, yaw=0.0):
    T = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    T[:3, 3] = [x, y, z]
    return T


def test_se3_exp_log_roundtrip_gtsam_order():
    rng = np.random.default_rng(0)
    for _ in range(20):
        xi = rng.standard_normal(6)
        R, t = pg.se3_exp(xi)
        xi2 = pg.se3_log(R, t)
        np.testing.assert_allclose(xi2, xi, atol=1e-9)


def test_between_error_zero_when_consistent():
    T0 = _pose(0, 0, 0, 0.0)
    T1 = _pose(1, 0, 0, 0.1)
    measured = np.linalg.inv(T0) @ T1
    err, _, _ = pg.between_error(T0, T1, measured)
    np.testing.assert_allclose(err, 0, atol=1e-12)


def test_between_jacobian_matches_numeric():
    # The reference uses first-order Jacobians J_to = I, J_from = -Ad(hx^-1)
    # (PoseGraphOptimizer.cpp:487-495), which are exact only at zero error
    # (they omit the Logmap derivative); validate numerically there.
    rng = np.random.default_rng(1)
    T0 = _pose(*rng.standard_normal(3), yaw=0.3)
    T1 = _pose(*rng.standard_normal(3), yaw=-0.2)
    measured = np.linalg.inv(T0) @ T1  # zero-error configuration
    err0, J_from, J_to = pg.between_error(T0, T1, measured)
    eps = 1e-7

    def retract(T, delta):
        dR, dt = pg.se3_exp(delta)
        out = np.eye(4)
        out[:3, :3] = T[:3, :3] @ dR
        out[:3, 3] = T[:3, :3] @ dt + T[:3, 3]
        return out

    for J, which in ((J_from, 0), (J_to, 1)):
        num = np.zeros((6, 6))
        for k in range(6):
            d = np.zeros(6)
            d[k] = eps
            Ta = retract(T0, d) if which == 0 else T0
            Tb = retract(T1, d) if which == 1 else T1
            errk, _, _ = pg.between_error(Ta, Tb, measured)
            num[:, k] = (errk - err0) / eps
        np.testing.assert_allclose(J, num, atol=1e-5)


def test_loop_closure_corrects_drift():
    # Chain of 10 keyframes around a square with drift; loop factor pulls
    # the last keyframe back onto the first.
    opt = pg.PoseGraphOptimizer()
    true_poses = [_pose(x=float(i)) for i in range(10)]
    drift = 0.05
    odom_meas = []
    cur = np.eye(4)
    noisy_poses = [cur.copy()]
    for i in range(1, 10):
        rel_true = np.linalg.inv(true_poses[i - 1]) @ true_poses[i]
        rel_noisy = rel_true.copy()
        rel_noisy[1, 3] += drift  # consistent lateral drift
        odom_meas.append(rel_noisy)
        cur = cur @ rel_noisy
        noisy_poses.append(cur.copy())

    opt.add_first_keyframe(0, noisy_poses[0])
    for i in range(1, 10):
        opt.add_keyframe_with_odom(i - 1, i, noisy_poses[i], odom_meas[i - 1], 1.0, 1.0)

    # Loop: keyframe 9 observed at its TRUE relative pose from keyframe 0.
    rel_loop = np.linalg.inv(true_poses[0]) @ true_poses[9]
    assert opt.add_loop_and_optimize(0, 9, rel_loop, 1.0, 1.0)

    got = opt.get_all_optimized_poses()
    err_before = np.linalg.norm(noisy_poses[9][:3, 3] - true_poses[9][:3, 3])
    err_after = np.linalg.norm(got[9][:3, 3] - true_poses[9][:3, 3])
    assert err_after < err_before * 0.2, (err_before, err_after)


def test_first_keyframe_prior_pins_origin():
    opt = pg.PoseGraphOptimizer()
    opt.add_first_keyframe(0, _pose(0, 0, 0))
    opt.add_keyframe_with_odom(0, 1, _pose(1, 0, 0), _pose(1, 0, 0), 1.0, 1.0)
    opt.add_loop_and_optimize(0, 1, _pose(1, 0, 0), 1.0, 1.0)
    got = opt.get_all_optimized_poses()
    np.testing.assert_allclose(got[0][:3, 3], 0, atol=1e-6)


def test_distributed_backend_matches_manual():
    def build(backend):
        opt = pg.PoseGraphOptimizer(backend=backend, n_blocks=4)
        true_poses = [_pose(x=float(i)) for i in range(24)]
        cur = np.eye(4)
        noisy = [cur.copy()]
        opt.add_first_keyframe(0, noisy[0])
        for i in range(1, 24):
            rel_true = np.linalg.inv(true_poses[i - 1]) @ true_poses[i]
            rel_noisy = rel_true.copy()
            rel_noisy[1, 3] += 0.03
            cur = cur @ rel_noisy
            noisy.append(cur.copy())
            opt.add_keyframe_with_odom(i - 1, i, noisy[i], rel_noisy, 1.0, 1.0)
        rel_loop = np.linalg.inv(true_poses[3]) @ true_poses[20]
        assert opt.add_loop_and_optimize(3, 20, rel_loop, 1.0, 1.0)
        return opt.get_all_optimized_poses()

    manual = build("manual")
    dist = build("distributed")
    for k in manual:
        np.testing.assert_allclose(dist[k], manual[k], atol=1e-4)


def test_distributed_backend_loop_to_keyframe_zero():
    """Regression (ADVICE round-1 item 1): a loop anchored at keyframe 0 —
    the common loop-back-to-start case — must actually correct drift under
    the distributed backend (plan_partition used to drop endpoint 0 from
    the separator set and the solve silently failed)."""
    def build(backend):
        opt = pg.PoseGraphOptimizer(backend=backend, n_blocks=4)
        true_poses = [_pose(x=float(i)) for i in range(20)]
        cur = np.eye(4)
        noisy = [cur.copy()]
        opt.add_first_keyframe(0, noisy[0])
        for i in range(1, 20):
            rel_true = np.linalg.inv(true_poses[i - 1]) @ true_poses[i]
            rel_noisy = rel_true.copy()
            rel_noisy[1, 3] += 0.04
            cur = cur @ rel_noisy
            noisy.append(cur.copy())
            opt.add_keyframe_with_odom(i - 1, i, noisy[i], rel_noisy, 1.0, 1.0)
        rel_loop = np.linalg.inv(true_poses[0]) @ true_poses[19]
        assert opt.add_loop_and_optimize(0, 19, rel_loop, 1.0, 1.0)
        return opt.get_all_optimized_poses(), noisy, true_poses

    manual, _, _ = build("manual")
    dist, noisy, true_poses = build("distributed")
    err_before = np.linalg.norm(noisy[19][:3, 3] - true_poses[19][:3, 3])
    err_after = np.linalg.norm(dist[19][:3, 3] - true_poses[19][:3, 3])
    assert err_after < err_before * 0.2, (err_before, err_after)
    for k in manual:
        np.testing.assert_allclose(dist[k], manual[k], atol=1e-4)


def test_device_gn_matches_manual_across_padding_sizes():
    """The device-resident GN program (round-2: linearization, Schur
    solve, retraction all jitted — parallel/distributed_pgo.py
    gn_optimize_device) must match the host manual backend bit-tight at
    sizes that exercise the pow2 padding edges (n == pow2, n == pow2+1,
    n < 8 floor)."""
    from lidar_odometry_tpu.parallel import distributed_pgo as dpgo

    for n in (6, 16, 17, 37):
        rng = np.random.default_rng(n)
        true_poses = [_pose(x=float(i), y=0.1 * (i % 3)) for i in range(n)]
        cur = np.eye(4)
        noisy = [cur.copy()]
        manual = pg.PoseGraphOptimizer(backend="manual")
        manual.add_first_keyframe(0, noisy[0])
        priors = [(0, noisy[0], np.sqrt(pg.make_information(1e-2, 1e-2)))]
        betweens = []
        for i in range(1, n):
            rel = np.linalg.inv(true_poses[i - 1]) @ true_poses[i]
            rel_noisy = rel.copy()
            rel_noisy[:3, 3] += rng.normal(0, 0.02, 3)
            cur = cur @ rel_noisy
            noisy.append(cur.copy())
            manual.add_keyframe_with_odom(i - 1, i, noisy[i], rel_noisy,
                                          1.0, 1.0)
            betweens.append((i - 1, i, rel_noisy,
                             np.sqrt(pg.make_information(1.0, 1.0))))
        rel_loop = np.linalg.inv(true_poses[2]) @ true_poses[n - 1]
        assert manual.add_loop_and_optimize(2, n - 1, rel_loop, 0.5, 0.5)
        betweens.append((2, n - 1, rel_loop,
                         np.sqrt(pg.make_information(0.5, 0.5))))

        out, ok = dpgo.gn_optimize_device(np.stack(noisy), priors, betweens)
        assert ok, f"device GN did not converge at n={n}"
        ref = manual.get_all_optimized_poses()
        for i in range(n):
            np.testing.assert_allclose(out[i], ref[i], atol=1e-8,
                                       err_msg=f"n={n} pose {i}")


def test_distributed_backend_uses_device_path():
    """The distributed backend must take the device GN path, not the
    host fallback (the fallback exists only for unsupported device
    back-ends)."""
    called = {}
    opt = pg.PoseGraphOptimizer(backend="distributed")
    orig = opt._optimize_distributed_device

    def spy(*a, **k):
        r = orig(*a, **k)
        called["result"] = r
        return r

    opt._optimize_distributed_device = spy
    true_poses = [_pose(x=float(i)) for i in range(12)]
    opt.add_first_keyframe(0, true_poses[0])
    for i in range(1, 12):
        rel = np.linalg.inv(true_poses[i - 1]) @ true_poses[i]
        opt.add_keyframe_with_odom(i - 1, i, true_poses[i], rel, 1.0, 1.0)
    rel_loop = np.linalg.inv(true_poses[1]) @ true_poses[11]
    assert opt.add_loop_and_optimize(1, 11, rel_loop, 1.0, 1.0)
    assert called.get("result") is True
