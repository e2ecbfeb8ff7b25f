"""Test configuration: force the CPU backend with a virtual 8-device mesh
so sharding tests run without TPU hardware (SURVEY.md §4 test strategy).

The deployment image pre-registers the axon TPU plugin via sitecustomize
and pins JAX_PLATFORMS=axon, so the env var alone is not enough — the
platform is overridden through jax.config before any backend init.
"""
import hashlib
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent-cache entries embed host-specific CPU AOT code, and JAX's
# cache key does NOT include the host's CPU features — an entry written
# on a machine with different vector extensions segfaults on load
# (cpu_aot_loader feature-mismatch). Fingerprint the dir by the host's
# flag set so a reused /tmp never serves foreign executables.
def _host_tag():
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "nocpuinfo"


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      f"/tmp/jax_cache_{_host_tag()}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

