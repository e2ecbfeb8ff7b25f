"""Multi-host process-group smoke test: two REAL processes join via
jax.distributed.initialize over localhost (the DCN story of SURVEY.md
§2.5 as code), build a global mesh, and psum across processes.

Runs the workers as subprocesses so the test itself stays in the normal
single-process CPU session.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO_ROOT"])
from lidar_odometry_tpu.parallel import mesh as mesh_mod

pid = mesh_mod.initialize_multihost(
    coordinator_address=os.environ["COORD"],
    num_processes=2, process_id=int(sys.argv[1]))
assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 local x 2 processes

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = mesh_mod.make_mesh(4, ("map",))
arr = jax.make_array_from_callback(
    (4, 8), NamedSharding(mesh, P("map")),
    lambda idx: jnp.full((1, 8), float(idx[0].start)))
total = jax.jit(lambda x: jnp.sum(x),
                out_shardings=NamedSharding(mesh, P()))(arr)
expect = sum(i * 8 for i in range(4))
assert float(total) == expect, (float(total), expect)
print(f"OK process {pid}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_group_psum(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["COORD"] = f"127.0.0.1:{port}"
    env["REPO_ROOT"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, "-c", _WORKER, str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-2000:]}"
        assert f"OK process {i}" in out
