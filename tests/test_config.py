"""Config parsing tests against the reference YAML schema
(reference src/util/ConfigUtils.cpp:24-79 grammar)."""
import numpy as np
import pytest

from lidar_odometry_tpu.config import SystemConfig, load_config, parse_flat_yaml


REFERENCE_KITTI_YAML = """
# Data paths
data_directory: "/data/KITTI"
seq: "07"

player:
  enable_viewer: true
  step_mode: false  # Step-by-step processing mode

point_cloud:
  voxel_size: 0.5                    # Voxel size for downsampling
  point_stride: 8
  max_range: 100.0

odometry:
  max_iterations: 4
  translation_threshold: 0.005

robust_estimation:
  use_adaptive_m_estimator: true
  pko_kernel_type: "huber"
  gmm_sample_size: 100

estimator:
  use_surfel_correspondence: true

keyframe:
  window_size: 10

loop_detector:
  min_keyframe_gap: 50
  similarity_threshold: 0.3

pose_graph_optimization:
  enable_pgo: true
  odometry_translation_noise: 1.0
"""


def test_parse_flat_yaml():
    flat = parse_flat_yaml(REFERENCE_KITTI_YAML)
    assert flat["data_directory"] == "/data/KITTI"
    assert flat["seq"] == "07"
    assert flat["player.enable_viewer"] is True
    assert flat["player.step_mode"] is False
    assert flat["point_cloud.voxel_size"] == 0.5
    assert flat["point_cloud.point_stride"] == 8
    assert flat["odometry.max_iterations"] == 4
    assert flat["robust_estimation.pko_kernel_type"] == "huber"


def test_config_from_yaml(tmp_path):
    p = tmp_path / "kitti.yaml"
    p.write_text(REFERENCE_KITTI_YAML)
    cfg = load_config(str(p))
    assert cfg.seq == "07"
    assert cfg.voxel_size == 0.5
    assert cfg.point_stride == 8
    assert cfg.max_iterations == 4
    assert cfg.use_surfel_correspondence is True
    assert cfg.window_size == 10
    assert cfg.min_keyframe_gap == 50
    assert cfg.enable_pgo is True
    assert cfg.odometry_translation_noise == 1.0


def test_defaults_match_reference():
    cfg = SystemConfig()
    # reference config/kitti.yaml values used as defaults
    assert cfg.voxel_size == 0.5
    assert cfg.max_iterations == 4
    assert cfg.min_scale_factor == 0.1
    assert cfg.max_scale_factor == 10.0
    assert cfg.num_alpha_segments == 100
    assert cfg.gmm_components == 3
    assert cfg.similarity_threshold == 0.3
    assert cfg.derived_hierarchy_factor() == 3


def test_validation_rejects_bad_config():
    from lidar_odometry_tpu.config import validate_config
    with pytest.raises(AssertionError):
        validate_config(SystemConfig(voxel_size=-1.0))
    with pytest.raises(AssertionError):
        validate_config(SystemConfig(point_stride=0))


def test_repo_config_files_load():
    cfg = load_config("config/kitti.yaml")
    assert cfg.use_surfel_correspondence is True
    assert cfg.point_stride == 8
    cfg2 = load_config("config/mid360.yaml")
    assert cfg2.use_surfel_correspondence is False
    assert cfg2.point_stride == 4
    assert cfg2.min_keyframe_gap == 100
