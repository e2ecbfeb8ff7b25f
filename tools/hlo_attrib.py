#!/usr/bin/env python3
"""Map hot HLO fusions of the S=8 steady-batched update to source lines:
compile the same program bench_multichip times, dump optimized HLO, and
print the per-op metadata of the named fusions."""
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

C0_TOTAL, C1_TOTAL = 262144, 65536
N_PTS = 16384


def main():
    import jax
    import jax.numpy as jnp
    from lidar_odometry_tpu.ops import voxel_map as vm
    from lidar_odometry_tpu.parallel import sharded_map as sm

    S = 8
    cap = sm._owned_cap(N_PTS, S)
    c0, c1 = C0_TOTAL // S, C1_TOTAL // S
    K, KB = 8, 4

    P_all = jnp.zeros((K // KB, KB * cap, 3), jnp.float32)
    M_all = jnp.zeros((K // KB, KB * cap), bool)
    SP_all = jnp.zeros((K // KB, KB, 3), jnp.float32)

    @jax.jit
    def steady_batched(st):
        def step(st, xs):
            p, m, sp = xs
            return vm.update_map(st, p, m, sp[-1], 120.0, voxel_size=0.5,
                                 planarity_threshold=0.1), 0
        st, _ = jax.lax.scan(step, st, (P_all, M_all, SP_all))
        return st

    st = vm.empty_map(c0, c1)
    txt = steady_batched.lower(st).compile().as_text()
    print(f"# HLO chars: {len(txt)}", file=sys.stderr)

    targets = sys.argv[1:] or ["fusion.78", "fusion.18", "fusion.81",
                               "fusion.522", "copy.438", "fusion.525",
                               "fusion.513", "fusion.8 ", "fusion.9 ",
                               "fusion.10 ", "fusion.516"]
    lines = txt.splitlines()
    # find each fused computation body and print op metadata
    for tgt in targets:
        tgt = tgt.strip()
        # the fusion instruction line references a computation: fusion(...), calls=%fused_computation.N
        for ln in lines:
            if f"%{tgt} = " in ln or f" {tgt} = " in ln:
                mcalls = re.search(r"calls=%?([\w.\-]+)", ln)
                mshape = re.search(rf"{re.escape(tgt)} = (\S+) fusion", ln)
                print(f"\n=== {tgt} shape={mshape.group(1) if mshape else '?'} "
                      f"calls={mcalls.group(1) if mcalls else '?'}")
                meta = re.search(r'metadata={[^}]*op_name="([^"]*)"', ln)
                if meta:
                    print(f"    op_name: {meta.group(1)[:160]}")
                if mcalls:
                    comp = mcalls.group(1)
                    # print the computation body's distinct source locations
                    inbody = False
                    locs = {}
                    kinds = {}
                    for bl in lines:
                        if bl.startswith(f"%{comp} ") or bl.startswith(f"{comp} "):
                            inbody = True
                            continue
                        if inbody:
                            if bl.startswith("}"):
                                break
                            sm_ = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', bl)
                            on = re.search(r'op_name="([^"]*)"', bl)
                            opm = re.match(r"\s*%?[\w.\-]+ = (\S+) ([\w\-]+)", bl)
                            if sm_:
                                k = f"{os.path.basename(sm_.group(1))}:{sm_.group(2)}"
                                locs[k] = locs.get(k, 0) + 1
                            if opm:
                                kinds[opm.group(2)] = kinds.get(opm.group(2), 0) + 1
                    print(f"    ops: {sorted(kinds.items(), key=lambda x: -x[1])[:10]}")
                    print(f"    src: {sorted(locs.items(), key=lambda x: -x[1])[:12]}")
                break


if __name__ == "__main__":
    main()
