"""Randomized equivalence test of ops/voxel_map against a plain-Python
dict ORACLE transcribing the reference map semantics (reference
src/database/VoxelMap.cpp:99-386):

  * AddPoint: incremental centroid per L0 voxel; new voxels register to
    their 3x3x3 L1 parent (VoxelMap.cpp:99-120).
  * UpdateVoxelMap: radius eviction from the sensor (:146-158), insert,
    then surfel recompute ONLY for affected L1 cells whose child count
    changed (:187-261, last_child_count skip at :203); >= 5 occupied
    children required (:188); PCA normal = least eigenvector, planarity
    = sigma_min/sigma_max; planarity > threshold DELETES the cell and its
    children (:244-253); eviction-only cells keep cached surfels while
    >= 5 children remain.
  * GetSurfelAtPoint: one L1 cell lookup (:368-386).

Slot order is ignored: comparison is by voxel/cell KEY.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from lidar_odometry_tpu.ops import voxel_map as vm

VOXEL = 0.5
HF = 3
PLANARITY_THR = 0.1


class OracleMap:
    """Dict-of-keys reference semantics (slot-free)."""

    def __init__(self):
        self.l0 = {}   # key(int tuple) -> [sum(3,), count]
        self.l1 = {}   # pkey -> {children:set, surfel:(n,c,plan)|None,
                       #          last_count:int}

    @staticmethod
    def _coords(p):
        return tuple(np.floor(p / VOXEL).astype(np.int64))

    @staticmethod
    def _parent(c):
        return tuple(np.floor_divide(np.asarray(c, np.int64), HF))

    def _cell(self, pk):
        return self.l1.setdefault(
            pk, {"children": set(), "surfel": None, "last_count": 0})

    def update(self, points, sensor_pos, max_distance):
        affected = {}   # pkey -> touched_by_insert(bool)
        # --- eviction (VoxelMap.cpp:146-158) ---
        for k in list(self.l0.keys()):
            s, n = self.l0[k]
            centroid = s / n
            if np.linalg.norm(centroid - sensor_pos) > max_distance:
                del self.l0[k]
                pk = self._parent(k)
                if pk in self.l1:
                    self.l1[pk]["children"].discard(k)
                    affected.setdefault(pk, False)
        # --- insertion (AddPoint, VoxelMap.cpp:99-120) ---
        for p in points:
            k = self._coords(p)
            if k in self.l0:
                self.l0[k][0] = self.l0[k][0] + p
                self.l0[k][1] += 1
            else:
                self.l0[k] = [p.copy(), 1]
                pk = self._parent(k)
                self._cell(pk)["children"].add(k)
                affected[pk] = True
        # --- surfel pass over affected cells (VoxelMap.cpp:187-261) ---
        for pk, by_insert in affected.items():
            cell = self.l1.get(pk)
            if cell is None:
                continue
            cnt = len(cell["children"])
            enough = cnt >= vm.MIN_OCCUPIED_CHILDREN
            prev_has = cell["surfel"] is not None
            if not by_insert:
                # eviction-only: keep cached surfel while enough children
                if not enough:
                    cell["surfel"] = None
                if cnt == 0:
                    del self.l1[pk]
                continue
            skip = prev_has and (cell["last_count"] == cnt)
            if not enough:
                cell["surfel"] = None
                if cnt == 0:
                    del self.l1[pk]
                continue
            if skip:
                continue
            cen = np.stack([self.l0[c][0] / self.l0[c][1]
                            for c in cell["children"]])
            mean = cen.mean(axis=0)
            d = cen - mean
            cov = d.T @ d / cnt
            w, v = np.linalg.eigh(cov)
            plan = w[0] / (w[2] + 1e-6)
            if plan > PLANARITY_THR:
                # non-planar: delete the cell AND its children (:244-253)
                for c in cell["children"]:
                    self.l0.pop(c, None)
                del self.l1[pk]
                continue
            cell["surfel"] = (v[:, 0], mean, plan)
            cell["last_count"] = cnt

    def query(self, p):
        pk = tuple(np.floor(np.asarray(p) / (VOXEL * HF)).astype(np.int64))
        cell = self.l1.get(pk)
        if cell is None or cell["surfel"] is None:
            return None
        return cell["surfel"]


def _make_points(rng, n, lo=-8.0, hi=8.0):
    """Clustered near-planar points so surfels actually form."""
    pts = []
    for _ in range(n // 64):
        base = rng.uniform(lo, hi, 3).astype(np.float32)
        normal = rng.normal(size=3)
        normal /= np.linalg.norm(normal)
        u = np.cross(normal, [1.0, 0.3, 0.2])
        u /= np.linalg.norm(u)
        w = np.cross(normal, u)
        ab = rng.uniform(-2.2, 2.2, (64, 2)).astype(np.float32)
        noise = rng.normal(0, 0.01, 64).astype(np.float32)
        pts.append(base + ab[:, :1] * u + ab[:, 1:] * w
                   + noise[:, None] * normal)
    return np.concatenate(pts).astype(np.float32)


def _state_dicts(state):
    """Extract key->centroid (L0) from the device map."""
    from lidar_odometry_tpu.utils import keys as K
    hi, lo, _cnt, cen, live = vm.l0_records(state)
    cen = np.asarray(cen)
    live = np.asarray(live)
    coords = np.asarray(K.unpack_key(hi, lo))
    l0 = {}
    for i in np.nonzero(live)[0]:
        l0[tuple(coords[i])] = cen[i]
    return l0


@pytest.mark.parametrize("seed", [0, 1])
def test_update_and_query_match_oracle(seed):
    rng = np.random.default_rng(seed)
    oracle = OracleMap()
    state = vm.empty_map(16384, 4096)

    sensor = np.zeros(3, np.float32)
    for step in range(4):
        pts = _make_points(rng, 512)
        sensor = sensor + np.array([1.2, 0.4, 0.0], np.float32)
        max_dist = 14.0  # forces real evictions as the sensor advances
        oracle.update(pts, sensor, max_dist)

        cap = 1024
        buf = np.zeros((cap, 3), np.float32)
        msk = np.zeros((cap,), bool)
        buf[: len(pts)] = pts
        msk[: len(pts)] = True
        state = vm.update_map(
            state, jnp.asarray(buf), jnp.asarray(msk),
            jnp.asarray(sensor), max_dist,
            voxel_size=VOXEL, planarity_threshold=PLANARITY_THR,
            hierarchy_factor=HF)

    # --- L0 table: same voxel keys, same centroids ---
    impl_l0 = _state_dicts(state)
    orc_l0 = {k: v[0] / v[1] for k, v in oracle.l0.items()}
    assert set(impl_l0.keys()) == set(orc_l0.keys())
    for k, c in orc_l0.items():
        np.testing.assert_allclose(impl_l0[k], c, rtol=1e-4, atol=1e-4)

    # --- n_l0 counter ---
    assert int(state.n_l0) == len(orc_l0)

    # --- surfel queries: random probes plus every oracle surfel centroid ---
    qs = rng.uniform(-10, 14, (256, 3)).astype(np.float32)
    cell_centroids = np.array(
        [c["surfel"][1] for c in oracle.l1.values()
         if c["surfel"] is not None], np.float32).reshape(-1, 3)
    qs = np.concatenate([qs, cell_centroids]).astype(np.float32)
    normals, centroids, valid = vm.lookup_surfels(
        state, jnp.asarray(qs), voxel_size=VOXEL, hierarchy_factor=HF)
    normals = np.asarray(normals)
    centroids = np.asarray(centroids)
    valid = np.asarray(valid)
    n_checked = 0
    for i, q in enumerate(qs):
        expect = oracle.query(q)
        assert valid[i] == (expect is not None), (
            f"query {q}: impl valid={valid[i]} oracle={expect is not None}")
        if expect is not None:
            n_orc, c_orc, _ = expect
            assert abs(float(np.dot(normals[i], n_orc))) > 0.999
            np.testing.assert_allclose(centroids[i], c_orc, atol=5e-3)
            n_checked += 1
    assert n_checked >= 20  # the probe grid must actually hit surfels
