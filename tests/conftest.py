"""Test configuration: force the CPU backend with a virtual 8-device mesh
so sharding tests run without TPU hardware (SURVEY.md §4 test strategy).

The deployment image pre-registers the axon TPU plugin via sitecustomize
and pins JAX_PLATFORMS=axon, so the env var alone is not enough — the
platform is overridden through jax.config before any backend init.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

