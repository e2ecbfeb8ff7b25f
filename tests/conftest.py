"""Test configuration: force the CPU backend with a virtual 8-device mesh
so sharding tests run without TPU hardware (SURVEY.md §4 test strategy).

The deployment image pre-registers the axon TPU plugin via sitecustomize
and pins JAX_PLATFORMS=axon, so the env var alone is not enough — the
platform is overridden through jax.config before any backend init.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# NO persistent compilation cache for the CPU test suite. XLA:CPU's
# executable (de)serialization is unreliable on this deploy image: an
# entry written on a host with different CPU vector extensions segfaults
# on load (JAX's cache key omits host features, cpu_aot_loader warns and
# crashes), and serialization itself SIGABRTs for some programs here.
# In-process jit caching still deduplicates within a run; the TPU-side
# tools keep their own (axon) cache, which works.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")



def pytest_collection_modifyitems(config, items):
    """Run the heaviest-compile modules FIRST. XLA:CPU segfaults inside
    backend_compile (LLVM) when the very large bulk-tier voxel-map
    programs compile late in a long-lived process that has already built
    ~100 other executables on this image — the same tests pass in a
    fresh process, and nothing in JAX-land reaches the crash (it is
    below backend_compile_and_load). Compiling the big programs while
    the process is fresh sidesteps it without changing any test."""
    front = ("test_voxel_map.py", "test_voxel_map_oracle.py",
             "test_fast_pipeline.py")

    def key(item):
        name = item.fspath.basename
        return (front.index(name) if name in front else len(front), 0)

    items.sort(key=key)
