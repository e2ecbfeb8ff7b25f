"""lidar_odometry_tpu — a TPU-native LiDAR odometry + SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ system (`SiarheiHerasiuta/lidar_odometry`): Morton/voxel downsampling,
a 2-level voxel surfel map, point-to-plane ICP with Gauss-Newton on SE(3)
and a PKO adaptive M-estimator, LiDAR-Iris loop closure, and pose-graph
optimization — expressed as fixed-shape array programs that compile onto
TPU (sorted device tables + batched gathers instead of pointer-chasing
hash maps; masked vectorized ops instead of per-point branching; async
dispatch instead of threads).

Layout (mirrors the reference layer map, SURVEY.md §1):
  utils/    L0: Lie groups, voxel keys, 3x3 eigendecomposition, logging, IO
  ops/      L1/L2: voxel filter, voxel surfel map, ICP, PKO, Iris descriptor
  models/   L3: frames, estimator (pipeline orchestrator), loop closure, PGO
  parallel/ device-mesh sharding: sharded map lookup, distributed Schur PGO
  io/       L5: dataset players (KITTI .bin, PLY), trajectory writers, eval
  runtime/  native C++ data loader (ctypes) with numpy fallback
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# TPU matmuls default to bfloat16 operand precision; geometry (point
# transforms, 6x6 Gauss-Newton products) loses ~0.4 m at 100 m range that
# way. This framework's matmul volume is tiny (6-dim contractions), so
# full float32 costs nothing measurable — force it globally.
_jax.config.update("jax_default_matmul_precision", "float32")

# Honor JAX_PLATFORMS from the environment explicitly: this deploy
# image pre-registers the axon TPU plugin via sitecustomize, and a bare
# env var does not always win over it (tests/conftest.py) — a CLI run
# with JAX_PLATFORMS=cpu would otherwise attach to the axon tunnel and
# deadlock against whatever process already holds the single chip.
if _os.environ.get("JAX_PLATFORMS"):
    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: tunnel-attached TPU compiles are slow
# (tens of seconds per program); cache them across processes — but ONLY
# when the caller opts in via JAX_COMPILATION_CACHE_DIR. XLA:CPU
# executable (de)serialization is unreliable on some hosts (AOT feature
# mismatch segfaults on load; serialize() itself can SIGABRT), so an
# unconditional default cache took down the CPU test suite.
if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["JAX_COMPILATION_CACHE_DIR"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
