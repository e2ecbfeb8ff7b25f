"""Multi-device tests on the virtual 8-device CPU mesh: sharded map
lookup/GN, distributed Schur PGO, multichip pipeline, graft entry."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_odometry_tpu.ops import icp, voxel_map as vm
from lidar_odometry_tpu.parallel import distributed_pgo as dpgo
from lidar_odometry_tpu.parallel import mesh as mesh_mod
from lidar_odometry_tpu.parallel import sharded_map


def _mk_map(c0=8192, c1=2048, seed=0):
    from lidar_odometry_tpu.io import synthetic
    world = synthetic.make_world(seed=seed, extent=40.0, n_buildings=8)
    rng = np.random.default_rng(seed)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 1.8
    state = vm.empty_map(c0, c1)
    for dx in (-0.3, 0.0, 0.3):
        p = pose.copy(); p[0, 3] += dx
        scan = synthetic.sample_scan(world, p, 8000, rng, max_range=40.0, noise=0.01)
        wpts = scan @ p[:3, :3].T + p[:3, 3]
        state = vm.update_map(state, jnp.asarray(wpts), jnp.ones(len(wpts), bool),
                              jnp.asarray(p[:3, 3]), 120.0,
                              voxel_size=0.5, planarity_threshold=0.1)
    return world, state, pose, rng


def test_sharded_lookup_matches_single_device():
    world, state, pose, rng = _mk_map()
    mesh = mesh_mod.make_mesh(8, ("map",))
    sharded = sharded_map.shard_map_state(state, mesh, "map")
    from lidar_odometry_tpu.io import synthetic
    scan = synthetic.sample_scan(world, pose, 2000, rng, max_range=40.0, noise=0.01)
    q = jnp.asarray(scan @ pose[:3, :3].T + pose[:3, 3])
    n1, c1_, v1 = vm.lookup_surfels(state, q, voxel_size=0.5)
    n2, c2_, v2 = sharded_map.sharded_lookup_surfels(
        sharded, q, mesh, voxel_size=0.5, mesh_axis="map")
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    m = np.asarray(v1)
    np.testing.assert_allclose(np.asarray(n1)[m], np.asarray(n2)[m], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1_)[m], np.asarray(c2_)[m], atol=1e-6)


def test_sharded_icp_step_matches_single_device():
    """The distributed GN step (per-shard partial H,g + psum) must equal the
    single-device unweighted GN step bit-for-bit-ish."""
    from lidar_odometry_tpu.utils import lie
    world, state, pose, rng = _mk_map(seed=1)
    mesh = mesh_mod.make_mesh(8, ("map",))
    sharded = sharded_map.shard_map_state(state, mesh, "map")
    from lidar_odometry_tpu.io import synthetic
    true_pose = pose.copy(); true_pose[0, 3] += 0.3
    scan = synthetic.sample_scan(world, true_pose, 4000, rng, max_range=40.0, noise=0.01)
    pts = jnp.asarray(scan)
    mask = jnp.ones(len(scan), bool)
    guess = true_pose.copy(); guess[0, 3] += 0.2
    cfg = icp.ICPConfig(voxel_size=0.5)

    def ref_step(T):
        R, t = lie.se3_rt(T)
        pw = pts @ R.T + t[None, :]
        n_, c_, v_ = vm.lookup_surfels(state, pw, voxel_size=0.5)
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
        T_sh, n_sh = sharded_map.sharded_icp_step(sharded, pts, mask, T_sh, mesh, cfg)
        assert int(n_ref) == int(n_sh)
        np.testing.assert_allclose(np.asarray(T_sh), np.asarray(T_ref), atol=2e-5)


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
        # pad block count to the mesh size by splitting evenly
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
