"""2-level voxel surfel map tests (reference src/database/VoxelMap.cpp)."""
import numpy as np
import jax.numpy as jnp

from lidar_odometry_tpu.ops import voxel_map as vm

C0, C1 = 4096, 1024
VOX = 0.5
THR = 0.1


def _mk(points):
    pts = jnp.asarray(np.asarray(points, np.float32))
    mask = jnp.ones(len(points), bool)
    return pts, mask


def _update(state, pts, mask, sensor=(0, 0, 0), max_dist=120.0, **kw):
    return vm.update_map(state, pts, mask, jnp.asarray(sensor, jnp.float32),
                         max_dist, voxel_size=VOX, planarity_threshold=THR, **kw)


def _plane_points(n=200, z=0.0, extent=5.0, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    xy = (rng.random((n, 2)) - 0.5) * 2 * extent
    zs = np.full((n, 1), z) + noise * rng.standard_normal((n, 1))
    return np.concatenate([xy, zs], axis=1).astype(np.float32)


def test_insert_and_centroids():
    state = vm.empty_map(C0, C1)
    pts, mask = _mk([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [1.1, 0.1, 0.1]])
    state = _update(state, pts, mask)
    assert int(state.n_l0) == 2
    cen, valid = vm.l0_points(state)
    cen = np.asarray(cen)[np.asarray(valid)]
    cen = cen[np.argsort(cen[:, 0])]
    np.testing.assert_allclose(cen[0], [0.15, 0.15, 0.15], atol=1e-6)
    np.testing.assert_allclose(cen[1], [1.1, 0.1, 0.1], atol=1e-6)


def test_incremental_centroid_merging():
    state = vm.empty_map(C0, C1)
    pts1, m1 = _mk([[0.1, 0.1, 0.1]])
    state = _update(state, pts1, m1)
    pts2, m2 = _mk([[0.3, 0.3, 0.3]])
    state = _update(state, pts2, m2)
    cen, valid = vm.l0_points(state)
    cen = np.asarray(cen)[np.asarray(valid)]
    assert len(cen) == 1
    np.testing.assert_allclose(cen[0], [0.2, 0.2, 0.2], atol=1e-6)


def test_surfel_created_for_plane():
    state = vm.empty_map(C0, C1)
    pts, mask = _mk(_plane_points(400, z=0.25))
    state = _update(state, pts, mask)
    normals, centroids, valid = vm.lookup_surfels(
        state, jnp.asarray([[0.0, 0.0, 0.25]], jnp.float32), voxel_size=VOX)
    assert bool(np.asarray(valid)[0])
    n = np.asarray(normals)[0]
    assert abs(abs(n[2]) - 1.0) < 1e-2
    assert abs(np.asarray(centroids)[0][2] - 0.25) < 0.05


def test_no_surfel_below_min_children():
    state = vm.empty_map(C0, C1)
    # 3 occupied L0 cells in one L1 cell < MIN_OCCUPIED_CHILDREN=5
    pts, mask = _mk([[0.1, 0.1, 0.1], [0.6, 0.1, 0.1], [1.1, 0.1, 0.1]])
    state = _update(state, pts, mask)
    _, _, valid = vm.lookup_surfels(
        state, jnp.asarray([[0.5, 0.1, 0.1]], jnp.float32), voxel_size=VOX)
    assert not bool(np.asarray(valid)[0])


def test_nonplanar_cell_deleted_with_children():
    state = vm.empty_map(C0, C1)
    rng = np.random.default_rng(1)
    # Dense isotropic blob inside one L1 cell (1.5 m cube) -> planarity high
    pts = (rng.random((300, 3)) * 1.4 + 0.05).astype(np.float32)
    # Baseline insert without surfel logic: no deletion happens there.
    n_before = int(_update(vm.empty_map(C0, C1), *_mk(pts),
                           compute_surfels=False).n_l0)
    assert n_before > 5
    state = _update(state, *_mk(pts))
    # reference VoxelMap.cpp:244-253: non-planar -> delete cell and children
    _, _, valid = vm.lookup_surfels(
        state, jnp.asarray([[0.7, 0.7, 0.7]], jnp.float32), voxel_size=VOX)
    assert not bool(np.asarray(valid)[0])
    assert int(state.n_l0) < n_before  # children were deleted


def test_radius_eviction():
    state = vm.empty_map(C0, C1)
    pts, mask = _mk([[0.1, 0.1, 0.1], [50.0, 0.0, 0.0]])
    state = _update(state, pts, mask)
    assert int(state.n_l0) == 2
    # next update with small max_distance evicts the far voxel
    pts2, m2 = _mk([[0.2, 0.2, 0.2]])
    state = _update(state, pts2, m2, sensor=(0, 0, 0), max_dist=10.0)
    assert int(state.n_l0) == 1


def test_transform_and_rehash():
    state = vm.empty_map(C0, C1)
    pts, mask = _mk(_plane_points(400, z=0.25))
    state = _update(state, pts, mask)
    # pure translation by +10 in x
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 10.0
    state2 = vm.transform_and_rehash(state, jnp.asarray(T), voxel_size=VOX,
                                     planarity_threshold=THR)
    assert int(state2.n_l0) == int(state.n_l0)
    _, centroids, valid = vm.lookup_surfels(
        state2, jnp.asarray([[10.0, 0.0, 0.25]], jnp.float32), voxel_size=VOX)
    assert bool(np.asarray(valid)[0])
    assert abs(float(np.asarray(centroids)[0][0]) - 10.0) < 0.6


def test_unaffected_cells_keep_surfels():
    state = vm.empty_map(C0, C1)
    plane_a = _plane_points(1200, z=0.25, seed=2)
    state = _update(state, *_mk(plane_a))
    q = jnp.asarray([[0.0, 0.0, 0.25], [30.0, 0.0, 0.25]], jnp.float32)
    _, _, valid0 = vm.lookup_surfels(state, q, voxel_size=VOX)
    assert bool(np.asarray(valid0)[0])  # dense plane -> surfel exists
    # Insert a far-away plane; cell A is unaffected and must keep its surfel.
    plane_b = _plane_points(1200, z=0.25, seed=3) + np.asarray([30.0, 0, 0], np.float32)
    state = _update(state, *_mk(plane_b))
    _, _, valid = vm.lookup_surfels(state, q, voxel_size=VOX)
    assert bool(np.asarray(valid)[0])
    assert bool(np.asarray(valid)[1])


def test_insert_evict_reinsert_cycles():
    """Stale index cells must recycle correctly: keys evicted and
    re-inserted repeatedly stay findable and never duplicate."""
    rng = np.random.default_rng(7)
    state = vm.empty_map(0, 4096)
    base = rng.uniform(-20, 20, (3000, 3)).astype(np.float32)
    pts = jnp.asarray(base)
    mask = jnp.ones(len(base), bool)
    far_sensor = jnp.asarray([1000.0, 0.0, 0.0], jnp.float32)
    near_sensor = jnp.zeros(3, jnp.float32)
    for cycle in range(4):
        # insert
        state = vm.update_map(state, pts, mask, near_sensor, 120.0,
                              voxel_size=0.5, planarity_threshold=1.0)
        n_after_insert = int(state.n_l0)
        # all inserted points must be findable via the index
        found = np.asarray(vm.voxel_occupied(state, pts, voxel_size=0.5))
        assert found.mean() > 0.995, found.mean()
        # evict everything (sensor far away); eviction is bounded per
        # update (evict-candidate parent cap, scaled to map capacity),
        # so drain repeatedly — deferral must converge to empty
        evict_cap, _, _ = vm._scaled_caps(4096, len(base))
        max_drains = -(-3000 // evict_cap) + 1
        for _ in range(max_drains):
            state = vm.update_map(state, jnp.full_like(pts, jnp.nan),
                                  jnp.zeros(len(base), bool), far_sensor,
                                  50.0, voxel_size=0.5,
                                  planarity_threshold=1.0)
            if int(state.n_l0) == 0:
                break
        assert int(state.n_l0) == 0, cycle
    # final reinsert: counts stable across cycles (no slot/index leak)
    state = vm.update_map(state, pts, mask, near_sensor, 120.0,
                          voxel_size=0.5, planarity_threshold=1.0)
    assert abs(int(state.n_l0) - n_after_insert) <= n_after_insert * 0.01


def test_large_fresh_keyframe_gets_full_surfel_coverage():
    """A fresh keyframe inserting >4k distinct parent cells must not lose
    surfels to affected-list overflow (regression: AFFECTED_CAP=4096
    silently dropped half the cells and destroyed tracking)."""
    rng = np.random.default_rng(11)
    state = vm.empty_map(65536, 16384)
    # dense planar patch grid: ~5500 distinct L1 cells, all surfel-worthy
    n_cells = 5500
    side = int(np.ceil(np.sqrt(n_cells)))
    pts = []
    for cy in range(side):
        for cx in range(side):
            if cx * side + cy >= n_cells:
                break
            ox, oy = cx * 1.5, cy * 1.5
            xs = rng.random(16) * 1.4 + ox
            ys = rng.random(16) * 1.4 + oy
            zs = np.full(16, 0.25)
            pts.append(np.stack([xs, ys, zs], axis=1))
    pts = np.concatenate(pts).astype(np.float32)
    state = vm.update_map(state, jnp.asarray(pts), jnp.ones(len(pts), bool),
                          jnp.zeros(3), 1e9, voxel_size=0.5,
                          planarity_threshold=0.1)
    n_surf = int((np.asarray(state.l1_surfel[:, 7]) > 0.5).sum())
    assert n_surf > 0.9 * n_cells, (n_surf, n_cells)


def test_degather_pad_preserves_lookup():
    """The gather-band sidestep (round-5): lookups against a map whose
    surfel table falls in the padded band are identical to the
    un-padded semantics (padding rows are never addressed)."""
    import jax.numpy as jnp
    import numpy as np
    from lidar_odometry_tpu.ops import voxel_map as vm
    assert vm._GATHER_BAD_LO <= 262144 < vm._GATHER_BAD_HI
    from lidar_odometry_tpu.io import synthetic
    world = synthetic.make_world(seed=6, extent=40.0, n_buildings=10)
    rng = np.random.default_rng(6)
    pose = np.eye(4, dtype=np.float32); pose[2, 3] = 1.8
    pts = synthetic.sample_scan(world, pose, 4000, rng, max_range=35.0,
                                noise=0.01)[:4000]
    n_pts = len(pts)
    st_band = vm.empty_map(65536, 262144)   # surfel table in the band
    st_ref = vm.empty_map(65536, 16384)     # out of the band
    for st in (st_band, st_ref):
        st2 = vm.update_map(st, jnp.asarray(pts), jnp.ones(n_pts, bool),
                            jnp.zeros(3), 120.0, voxel_size=0.5,
                            planarity_threshold=0.1)
        n, c, v = vm.lookup_surfels(st2, jnp.asarray(pts), voxel_size=0.5)
        if st is st_band:
            band = (np.asarray(n), np.asarray(c), np.asarray(v))
        else:
            ref = (np.asarray(n), np.asarray(c), np.asarray(v))
    # same points, same build: identical surfel hits and values
    assert band[2].sum() == ref[2].sum() > 100
    np.testing.assert_allclose(band[0][band[2]], ref[0][ref[2]], atol=1e-5)
    np.testing.assert_allclose(band[1][band[2]], ref[1][ref[2]], atol=1e-5)
