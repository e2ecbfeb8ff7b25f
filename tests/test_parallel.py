"""Multi-device tests on the virtual 8-device CPU mesh: sharded map
update/lookup/GN (parent-hash ownership, shard-local updates),
distributed Schur PGO, multichip pipeline, graft entry."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_odometry_tpu.ops import icp, voxel_map as vm
from lidar_odometry_tpu.parallel import distributed_pgo as dpgo
from lidar_odometry_tpu.parallel import mesh as mesh_mod
from lidar_odometry_tpu.parallel import sharded_map as sm

C0, C1 = 32768, 16384


def _scans(seed=0, n=3):
    from lidar_odometry_tpu.io import synthetic
    world = synthetic.make_world(seed=seed, extent=40.0, n_buildings=8)
    rng = np.random.default_rng(seed)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 1.8
    out = []
    for i in range(n):
        p = pose.copy(); p[0, 3] += 0.3 * i
        scan = synthetic.sample_scan(world, p, 8000, rng, max_range=40.0,
                                     noise=0.01)
        wpts = (scan @ p[:3, :3].T + p[:3, 3]).astype(np.float32)
        out.append((wpts, p))
    return world, out, pose, rng


def _build_both(mesh, seed=0, max_dist=120.0):
    """Identical update sequences on a single-chip map and a sharded map."""
    world, scans, pose, rng = _scans(seed)
    single = vm.empty_map(C0, C1)
    sharded = sm.sharded_empty_map(C0 * 8, C1 * 8, mesh, "map")
    for wpts, p in scans:
        pts = jnp.asarray(wpts)
        msk = jnp.ones(len(wpts), bool)
        spos = jnp.asarray(p[:3, 3])
        single = vm.update_map(single, pts, msk, spos, max_dist,
                               voxel_size=0.5, planarity_threshold=0.1)
        sharded = sm.sharded_update_map(sharded, pts, msk, spos, max_dist,
                                        mesh, voxel_size=0.5,
                                        planarity_threshold=0.1)
    return world, single, sharded, pose, rng


def test_sharded_update_and_lookup_match_single_device():
    """Shard-local updates (O(scan) comm, no table movement) must yield a
    map that answers every query exactly like the single-chip map."""
    mesh = mesh_mod.make_mesh(8, ("map",))
    world, single, sharded, pose, rng = _build_both(mesh)
    assert int(np.asarray(single.n_l0)) == int(np.asarray(sharded.n_l0).sum())
    assert int(np.asarray(single.n_l1)) == int(np.asarray(sharded.n_l1).sum())
    from lidar_odometry_tpu.io import synthetic
    scan = synthetic.sample_scan(world, pose, 2000, rng, max_range=40.0,
                                 noise=0.01)
    q = jnp.asarray(scan @ pose[:3, :3].T + pose[:3, 3])
    n1, c1_, v1 = vm.lookup_surfels(single, q, voxel_size=0.5)
    n2, c2_, v2 = sm.sharded_lookup_surfels(sharded, q, mesh, voxel_size=0.5)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    m = np.asarray(v1)
    assert m.sum() > 100
    np.testing.assert_allclose(np.asarray(n1)[m], np.asarray(n2)[m], atol=1e-5)
    np.testing.assert_allclose(np.asarray(c1_)[m], np.asarray(c2_)[m], atol=1e-5)


def test_sharded_eviction_matches_single_device():
    mesh = mesh_mod.make_mesh(8, ("map",))
    _, single, sharded, pose, _ = _build_both(mesh)
    # evict a band of the map from an offset sensor position. Eviction is
    # bounded per update (evict-candidate cap scaled to map capacity;
    # excess defers to the next update, where the radius mask is
    # recomputed), and the single map's demand is 8x each shard's — so
    # drain until both stop changing; at convergence they must agree
    # exactly.
    n_before = int(np.asarray(single.n_l0))
    far = jnp.asarray([25.0, 0.0, 0.0], jnp.float32)
    nanpts = jnp.full((64, 3), jnp.nan, jnp.float32)
    nomask = jnp.zeros((64,), bool)
    evict_cap, _, _ = vm._scaled_caps(C1, 64)
    prev = (-1, -1)
    for _ in range(-(-n_before // evict_cap) + 2):
        single = vm.update_map(single, nanpts, nomask, far, 30.0,
                               voxel_size=0.5, planarity_threshold=0.1)
        sharded = sm.sharded_update_map(sharded, nanpts, nomask, far, 30.0,
                                        mesh, voxel_size=0.5,
                                        planarity_threshold=0.1)
        cur = (int(np.asarray(single.n_l0)),
               int(np.asarray(sharded.n_l0).sum()))
        if cur == prev:
            break
        prev = cur
    n_single, n_sharded = prev
    assert n_single == n_sharded
    assert n_single < n_before  # something actually evicted


def test_sharded_icp_step_matches_single_device():
    """The distributed GN step (per-shard partial H,g + psum) must equal
    the single-device unweighted GN step."""
    from lidar_odometry_tpu.utils import lie
    mesh = mesh_mod.make_mesh(8, ("map",))
    world, single, sharded, pose, rng = _build_both(mesh, seed=1)
    from lidar_odometry_tpu.io import synthetic
    true_pose = pose.copy(); true_pose[0, 3] += 0.3
    scan = synthetic.sample_scan(world, true_pose, 4000, rng, max_range=40.0,
                                 noise=0.01)
    pts = jnp.asarray(scan)
    mask = jnp.ones(len(scan), bool)
    guess = true_pose.copy(); guess[0, 3] += 0.2
    cfg = icp.ICPConfig(voxel_size=0.5)

    def ref_step(T):
        R, t = lie.se3_rt(T)
        pw = pts @ R.T + t[None, :]
        n_, c_, v_ = vm.lookup_surfels(single, pw, voxel_size=0.5)
        r = jnp.sum(n_ * (pw - c_), axis=-1)
        valid = v_ & mask & (jnp.abs(r) <= cfg.max_correspondence_distance)
        w = valid.astype(jnp.float32)
        a = n_ @ R
        J = jnp.concatenate([a, jnp.cross(pts, a)], axis=-1)
        H = J.T @ (J * w[:, None]) + jnp.eye(6) * 1e-8
        g = J.T @ (w * r)
        d = jnp.linalg.solve(H, -g)
        return T @ lie.se3_from_exp_rt(d[:3], d[3:]), jnp.sum(w)

    T_ref = jnp.asarray(guess)
    T_sh = jnp.asarray(guess)
    for _ in range(3):
        T_ref, n_ref = ref_step(T_ref)
        T_sh, n_sh = sm.sharded_icp_step(sharded, pts, mask, T_sh, mesh, cfg)
        assert int(n_ref) == int(n_sh)
        np.testing.assert_allclose(np.asarray(T_sh), np.asarray(T_ref),
                                   atol=2e-5)


def test_sharded_rehash_matches_single_device():
    """Voxels change owner under a rigid correction; the redistributed
    rebuild must agree with the single-chip rehash on every query."""
    from lidar_odometry_tpu.utils import lie as _lie
    mesh = mesh_mod.make_mesh(8, ("map",))
    world, single, sharded, pose, rng = _build_both(mesh, seed=2)
    ang = 0.2
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                            [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    T[:3, 3] = [1.5, -0.7, 0.2]
    T = jnp.asarray(T)
    single2 = vm.transform_and_rehash(single, T, voxel_size=0.5,
                                      planarity_threshold=0.1)
    sharded2 = sm.sharded_transform_and_rehash(sharded, T, mesh,
                                               voxel_size=0.5,
                                               planarity_threshold=0.1)
    assert int(np.asarray(single2.n_l0)) == int(np.asarray(sharded2.n_l0).sum())
    from lidar_odometry_tpu.io import synthetic
    scan = synthetic.sample_scan(world, pose, 1500, rng, max_range=40.0,
                                 noise=0.01)
    q0 = jnp.asarray(scan @ pose[:3, :3].T + pose[:3, 3])
    q = q0 @ T[:3, :3].T + T[:3, 3]
    n1, c1_, v1 = vm.lookup_surfels(single2, q, voxel_size=0.5)
    n2, c2_, v2 = sm.sharded_lookup_surfels(sharded2, q, mesh, voxel_size=0.5)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    m = np.asarray(v1)
    assert m.sum() > 50
    np.testing.assert_allclose(np.asarray(c1_)[m], np.asarray(c2_)[m],
                               atol=1e-4)


def _random_chain(n, rng):
    diag = np.zeros((n, 6, 6))
    off = np.zeros((n - 1, 6, 6))
    for i in range(n - 1):
        A = rng.standard_normal((6, 6)) * 0.3
        off[i] = A
    for i in range(n):
        diag[i] = np.eye(6) * 8.0 + rng.standard_normal((6, 6)) * 0.1
        diag[i] = (diag[i] + diag[i].T) / 2
    b = rng.standard_normal((n, 6))
    return diag, off, b


def test_block_tridiag_solve_matches_dense():
    rng = np.random.default_rng(0)
    diag, off, b = _random_chain(12, rng)
    x_dense = dpgo.dense_solve(diag, off, b)
    x_thomas = np.asarray(dpgo.block_tridiag_solve(
        jnp.asarray(diag), jnp.asarray(off), jnp.asarray(b)))
    np.testing.assert_allclose(x_thomas, x_dense, atol=1e-4)


@pytest.mark.parametrize("use_mesh", [False, True])
def test_schur_partitioned_matches_dense(use_mesh):
    rng = np.random.default_rng(1)
    n = 32
    diag, off, b = _random_chain(n, rng)
    # loop edge between poses 10 and 24
    Baa = np.eye(6) * 2.0
    Bab = -np.eye(6)
    Bbb = np.eye(6) * 2.0
    loop_edges = [(10, 24)]
    loop_blocks = [(Baa, Bab, Bbb)]
    x_dense = dpgo.dense_solve(diag, off, b, loop_edges, loop_blocks)
    seps = dpgo.plan_partition(n, 4, loop_edges)
    mesh = None
    if use_mesh:
        seps = dpgo.plan_partition(n, 8, loop_edges)
        while len(seps) % 8 != 0:
            seps = dpgo.plan_partition(n, len(seps) + 1, loop_edges)
        mesh = mesh_mod.make_mesh(8, ("data",))
    x = dpgo.schur_partitioned_solve(
        np.asarray(diag, np.float64), np.asarray(off, np.float64),
        np.asarray(b, np.float64), seps, loop_edges, loop_blocks,
        mesh=mesh, mesh_axis="data")
    np.testing.assert_allclose(x, x_dense, atol=1e-3)


def test_graft_entry_and_dryrun():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    T, success, ncorr = jax.jit(fn)(*args)
    assert bool(success)
    assert np.all(np.isfinite(np.asarray(T)))
    ge.dryrun_multichip(8)


def test_sharded_icp_optimize_full_parity_semantics():
    """The FULL distributed ICP (sigma/6 normalization + PKO + robust
    weights + early exit, sharded_map.sharded_icp_optimize) must converge
    to the single-chip engine's optimum (ops/icp.icp_optimize) on the
    same scan/map. PKO subsampling sees a different (gathered) residual
    ordering, so per-iteration deltas differ slightly — the CONVERGED
    poses must agree."""
    from lidar_odometry_tpu.io import synthetic
    from lidar_odometry_tpu.ops import pko

    mesh = mesh_mod.make_mesh(8, ("map",))
    world, single, sharded, pose, rng = _build_both(mesh, seed=2)
    true_pose = pose.copy()
    true_pose[0, 3] += 0.35
    true_pose[1, 3] += 0.1
    scan = synthetic.sample_scan(world, true_pose, 6000, rng,
                                 max_range=40.0, noise=0.005)
    pts = jnp.asarray(scan)
    mask = jnp.ones(len(scan), bool)
    guess = true_pose.copy()
    guess[0, 3] += 0.15
    guess[1, 3] -= 0.05

    cfg = icp.ICPConfig(max_iterations=8, voxel_size=0.5,
                        use_robust_loss=True, loss_type="huber",
                        use_adaptive_m_estimator=True)
    consts = pko.make_pko_constants(0.1, 10.0, 100, 10.0, "huber", 3, 100)

    T_single, ok_s, n_s = icp.icp_optimize(single, pts, mask,
                                           jnp.asarray(guess), consts, cfg)
    T_shard, ok_d, n_d = sm.sharded_icp_optimize(
        sharded, pts, mask, jnp.asarray(guess), mesh, cfg, consts)
    assert bool(ok_s) and bool(ok_d)
    # both must recover the true pose
    np.testing.assert_allclose(np.asarray(T_single)[:3, 3],
                               true_pose[:3, 3], atol=0.02)
    np.testing.assert_allclose(np.asarray(T_shard)[:3, 3],
                               true_pose[:3, 3], atol=0.02)
    # and agree with each other at the optimum
    np.testing.assert_allclose(np.asarray(T_shard), np.asarray(T_single),
                               atol=5e-3)


def test_sharded_icp_optimize_insufficient_falls_back_to_guess():
    """Failure semantics parity: too few correspondences -> the initial
    guess comes back with success=False (reference Estimator.cpp:304-307)."""
    mesh = mesh_mod.make_mesh(8, ("map",))
    sharded = sm.sharded_empty_map(C0 * 8, C1 * 8, mesh, "map")  # empty map
    pts = jnp.asarray(np.random.default_rng(0).uniform(-10, 10, (512, 3)),
                      jnp.float32)
    mask = jnp.ones(512, bool)
    guess = jnp.eye(4)
    cfg = icp.ICPConfig(max_iterations=4, voxel_size=0.5)
    T, ok, n = sm.sharded_icp_optimize(sharded, pts, mask, guess, mesh, cfg)
    assert not bool(ok)
    assert int(n) == 0
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)


def test_owned_cap_margins_cover_measured_overloads():
    """Scale-aware per-shard point caps (round-5): the margin must cover
    >= the worst ownership overloads measured on both bench workloads
    (131k scans: 1.07/1.20/1.36 at S=2/4/8; 16k ring scans:
    1.38/1.62/2.13) with headroom, while staying bounded."""
    from lidar_odometry_tpu.parallel.sharded_map import _owned_cap
    measured = {(131072, 2): 1.072, (131072, 4): 1.203, (131072, 8): 1.36,
                (16384, 2): 1.382, (16384, 4): 1.616, (16384, 8): 2.132}
    for (n, s), worst in measured.items():
        cap = _owned_cap(n, s)
        margin = cap * s / n
        assert margin >= worst, (n, s, margin, worst)
        assert cap <= n
        assert cap % 256 == 0
    assert _owned_cap(16384, 1) == 16384
