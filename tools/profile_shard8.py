#!/usr/bin/env python3
"""Per-op breakdown of the S=8 per-shard programs (strong-scaling floor
hunt): the steady batched keyframe update and the post-compaction ICP
iteration body, at exactly the shapes bench_multichip.py times.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

C0_TOTAL, C1_TOTAL = 262144, 65536
N_PTS = 16384
ICP_ITERS = 4


def main():
    import jax
    import jax.numpy as jnp
    from lidar_odometry_tpu.io import synthetic
    from lidar_odometry_tpu.ops import icp, voxel_map as vm
    from lidar_odometry_tpu.parallel import sharded_map as sm
    from lidar_odometry_tpu.utils import lie
    from tputime import device_time_ms, device_top_ops

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dev = jax.devices()[0]
    print(f"# device: {dev} ({dev.platform}) S={S}", file=sys.stderr)

    world = synthetic.make_world(seed=3, extent=120.0, n_buildings=24)
    poses = synthetic.straight_trajectory(48, step=1.0)
    rng = np.random.default_rng(3)
    scans = []
    for i in range(48):
        s = synthetic.sample_scan(world, poses[i], N_PTS, rng,
                                  max_range=80.0, noise=0.01)
        buf = np.zeros((N_PTS, 3), np.float32)
        m = np.zeros(N_PTS, bool)
        buf[: len(s)] = s @ poses[i][:3, :3].T + poses[i][:3, 3]
        m[: len(s)] = True
        scans.append((buf, m))

    cap = sm._owned_cap(N_PTS, S)
    c0, c1 = C0_TOTAL // S, C1_TOTAL // S

    def shard_pts(i):
        buf, m = scans[i]
        owner = np.asarray(sm.owner_of_points(
            jnp.asarray(buf), S, voxel_size=0.5))
        mine = m & (owner == 0)
        sel = np.nonzero(mine)[0][:cap]
        p = np.zeros((cap, 3), np.float32)
        mm = np.zeros(cap, bool)
        p[: len(sel)] = buf[sel]
        mm[: len(sel)] = True
        return p, mm

    staged = [shard_pts(i) for i in range(48)]
    P_all = jnp.asarray(np.stack([s[0] for s in staged]))
    M_all = jnp.asarray(np.stack([s[1] for s in staged]))
    SP_all = jnp.asarray(np.stack([p[:3, 3] for p in poses],
                                  dtype=np.float32))

    @jax.jit
    def build24(st):
        def step(st, xs):
            p, m, sp = xs
            return vm.update_map(st, p, m, sp, 120.0, voxel_size=0.5,
                                 planarity_threshold=0.1), 0
        st, _ = jax.lax.scan(step, st, (P_all[:24], M_all[:24],
                                        SP_all[:24]))
        return st

    K = 8
    KB = 4

    @jax.jit
    def steady_batched(st):
        def step(st, xs):
            p, m, sp = xs
            return vm.update_map(st, p.reshape(-1, 3), m.reshape(-1),
                                 sp[-1], 120.0, voxel_size=0.5,
                                 planarity_threshold=0.1), 0
        st, _ = jax.lax.scan(
            step, st,
            (P_all[8:8 + K].reshape(K // KB, KB * cap, 3),
             M_all[8:8 + K].reshape(K // KB, KB * cap),
             SP_all[8:8 + K].reshape(K // KB, KB, 3)))
        return st

    @jax.jit
    def icp_chain(st, T):
        p, m = P_all[40], M_all[40]

        def it(_, T_cur):
            R, t = lie.se3_rt(T_cur)
            pw = p @ R.T + t[None, :]
            normal, centroid, hit = vm.lookup_surfels(st, pw,
                                                      voxel_size=0.5)
            r = jnp.sum(normal * (pw - centroid), axis=-1)
            w = (hit & m & (jnp.abs(r) <= 1.0)).astype(jnp.float32)
            a = normal @ R
            J = jnp.concatenate([a, jnp.cross(p, a)], axis=-1)
            H = J.T @ (J * w[:, None]) + jnp.eye(6) * 1e-8
            g = J.T @ (w * r)
            delta = jnp.linalg.solve(H, -g)
            return T_cur @ lie.se3_from_exp_rt(delta[:3], delta[3:])

        return jax.lax.fori_loop(0, ICP_ITERS, it, T)

    st = build24(vm.empty_map(c0, c1))
    jax.block_until_ready(st)
    T0 = jnp.asarray(poses[40], jnp.float32)

    t_b = device_time_ms(steady_batched, st, n=4)
    print(f"steady_batched dispatch (KB={KB}, 2 dispatches): "
          f"{t_b:.3f} ms total, {t_b / K * 1e3:.0f} us/kf")
    for ms, cnt, name in device_top_ops(steady_batched, st, n=4, k=28):
        print(f"  upd {ms:8.4f} ms  x{cnt:4d}  {name[:110]}")

    t_i = device_time_ms(icp_chain, st, T0, n=4)
    print(f"icp_chain ({ICP_ITERS} iters): {t_i:.3f} ms total, "
          f"{t_i / ICP_ITERS * 1e3:.0f} us/iter")
    for ms, cnt, name in device_top_ops(icp_chain, st, T0, n=4, k=28):
        print(f"  icp {ms:8.4f} ms  x{cnt:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
