"""Checkpoint / resume for the SLAM state.

The reference cannot resume a run (SURVEY.md §5: no state serialization).
The fixed-capacity array design makes checkpointing trivial here: the
voxel tables, keyframe records, frame records, and the pose-graph factors
serialize to one compressed .npz. `save`/`restore` round-trip a live
Estimator mid-sequence.
"""
from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from .config import SystemConfig
from .models.estimator import Estimator, FrameRecord, KeyframeRecord
from .models import pose_graph as pg
from .ops import voxel_map as vm


CHECKPOINT_VERSION = 2


def save(path: str, est: Estimator) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    # voxel map tables
    for name, val in est.map_state._asdict().items():
        arrays[f"map.{name}"] = np.asarray(val)
    # keyframes
    with est._keyframes_lock:
        kfs = list(est.keyframes)
    arrays["kf.ids"] = np.asarray([k.kf_id for k in kfs], np.int32)
    arrays["kf.frame_index"] = np.asarray([k.frame_index for k in kfs], np.int32)
    if kfs:
        arrays["kf.poses"] = np.stack([k.stored_pose for k in kfs])
        arrays["kf.relatives"] = np.stack([k.relative_pose for k in kfs])
        arrays["kf.clouds"] = np.stack([k.feature_cloud for k in kfs])
        arrays["kf.masks"] = np.stack([k.feature_mask for k in kfs])
    # frames
    arrays["fr.kf_ref"] = np.asarray([f.kf_ref for f in est.frames], np.int32)
    arrays["fr.kf_index"] = np.asarray([f.kf_index for f in est.frames], np.int32)
    arrays["fr.is_kf"] = np.asarray([f.is_keyframe for f in est.frames], bool)
    if est.frames:
        arrays["fr.relatives"] = np.stack([f.relative_pose for f in est.frames])
    # pose graph factors
    graph = est.pose_graph
    with graph._lock:
        arrays["pg.kf_ids"] = np.asarray(graph._keyframe_ids, np.int32)
        if graph._poses:
            ids = sorted(graph._poses)
            arrays["pg.pose_ids"] = np.asarray(ids, np.int32)
            arrays["pg.poses"] = np.stack([graph._poses[i] for i in ids])
        if graph._priors:
            arrays["pg.prior_keys"] = np.asarray([p.key for p in graph._priors], np.int32)
            arrays["pg.prior_meas"] = np.stack([p.measured for p in graph._priors])
            arrays["pg.prior_sqrt"] = np.stack([p.sqrt_info for p in graph._priors])
        if graph._betweens:
            arrays["pg.bt_from"] = np.asarray([b.key_from for b in graph._betweens], np.int32)
            arrays["pg.bt_to"] = np.asarray([b.key_to for b in graph._betweens], np.int32)
            arrays["pg.bt_meas"] = np.stack([b.measured for b in graph._betweens])
            arrays["pg.bt_sqrt"] = np.stack([b.sqrt_info for b in graph._betweens])

    # loop-detector descriptor DB (exact, including queue-time positions —
    # the distance gate deliberately uses pre-PGO positions, so a rebuild
    # from current poses would not be faithful)
    for name, val in est.loop_detector.export_state().items():
        arrays[f"lc.{name}"] = val

    meta = {
        "version": CHECKPOINT_VERSION,
        "initialized": est.initialized,
        "next_keyframe_id": est.next_keyframe_id,
        "last_successful_loop_kf_id": est.last_successful_loop_kf_id,
        "frame_count": est.frame_count,
        "T_current": est.T_current.tolist(),
        "velocity": est.velocity.tolist(),
        "prev_pose": est._prev_pose.tolist(),
        "last_keyframe_pose": est.last_keyframe_pose.tolist(),
    }
    arrays["meta_json"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    np.savez_compressed(path, **arrays)


def restore(path: str, config: SystemConfig, sync_loop: bool = False) -> Estimator:
    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["meta_json"]).decode())
    assert meta["version"] in (1, CHECKPOINT_VERSION)

    est = Estimator(config, sync_loop=sync_loop)
    import jax.numpy as jnp
    est.map_state = vm.VoxelMapState(**{
        name: jnp.asarray(data[f"map.{name}"])
        for name in vm.VoxelMapState._fields})

    kfs = []
    ids = data["kf.ids"]
    for i in range(len(ids)):
        kfs.append(KeyframeRecord(
            kf_id=int(ids[i]),
            stored_pose=data["kf.poses"][i],
            relative_pose=data["kf.relatives"][i],
            feature_cloud=data["kf.clouds"][i],
            feature_mask=data["kf.masks"][i],
            frame_index=int(data["kf.frame_index"][i])))
    est.keyframes = kfs
    # restored clouds re-tier immediately (window_size sliding window)
    est._spill_old_keyframes()

    frames = []
    for i in range(len(data["fr.kf_ref"])):
        frames.append(FrameRecord(
            kf_ref=int(data["fr.kf_ref"][i]),
            relative_pose=data["fr.relatives"][i],
            is_keyframe=bool(data["fr.is_kf"][i]),
            kf_index=int(data["fr.kf_index"][i])))
    est.frames = frames

    graph = est.pose_graph
    with graph._lock:
        graph._keyframe_ids = [int(i) for i in data["pg.kf_ids"]]
        graph._kf_to_index = {k: i for i, k in enumerate(graph._keyframe_ids)}
        if "pg.pose_ids" in data:
            graph._poses = {int(i): data["pg.poses"][j]
                            for j, i in enumerate(data["pg.pose_ids"])}
        if "pg.prior_keys" in data:
            graph._priors = [
                pg.PriorFactor(int(k), data["pg.prior_meas"][j], data["pg.prior_sqrt"][j])
                for j, k in enumerate(data["pg.prior_keys"])]
        if "pg.bt_from" in data:
            graph._betweens = [
                pg.BetweenFactor(int(f), int(t), data["pg.bt_meas"][j], data["pg.bt_sqrt"][j])
                for j, (f, t) in enumerate(zip(data["pg.bt_from"], data["pg.bt_to"]))]

    est.initialized = meta["initialized"]
    est.next_keyframe_id = meta["next_keyframe_id"]
    est.last_successful_loop_kf_id = meta["last_successful_loop_kf_id"]
    est.frame_count = meta["frame_count"]
    est.T_current = np.asarray(meta["T_current"], np.float32)
    est.velocity = np.asarray(meta["velocity"], np.float32)
    est._prev_pose = np.asarray(meta["prev_pose"], np.float32)
    est.last_keyframe_pose = np.asarray(meta["last_keyframe_pose"], np.float32)

    # Loop-closure DB: exact import when present (v2 checkpoints),
    # otherwise rebuild from keyframe clouds (v1 fallback — loses the
    # queue-time positions the distance gate expects).
    if "lc.iris_kf_ids" in data:
        est.loop_detector.import_state(
            {name: data[f"lc.{name}"] for name in
             ("iris_img", "iris_T", "iris_M", "iris_kf_ids",
              "iris_positions")})
    elif config.enable_loop_detection:
        for kf in est.keyframes:
            est.loop_detector.add_keyframe(
                kf.feature_cloud, kf.feature_mask, kf.kf_id, kf.stored_pose[:3, 3])
    return est
