"""Loop-closure detection over LiDAR-Iris descriptors (reference
src/processing/LoopClosureDetector.{h,cpp}).

Host-side orchestration + device-side batched comparison:
  * keyframes are queued with their LOCAL-frame feature cloud and queue-time
    position (lazy feature extraction, reference LoopClosureDetector.cpp:44-73);
  * detection drains the pending queue, extracts Iris features (device),
    gates candidates by keyframe-id gap and Euclidean distance of the
    stored (possibly drifted) positions (reference :129-154 — the distance
    gate deliberately uses pre-PGO positions, SURVEY.md §7 hard part (d)),
    and scores all surviving candidates in ONE batched compare instead of
    the reference's sequential scan;
  * only the best candidate under similarity_threshold is returned
    (reference :156-175).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import iris
from ..utils import logging_util as log


@dataclass
class LoopCandidate:
    query_keyframe_id: int
    match_keyframe_id: int
    similarity_score: float
    bias: int


@dataclass
class LoopClosureConfig:
    enable_loop_detection: bool = True
    similarity_threshold: float = 0.3
    min_keyframe_gap: int = 50
    max_search_distance: float = 5.0
    enable_debug_output: bool = False


class LoopClosureDetector:
    """The descriptor DB lives HOST-side as growing lists (one numpy row
    per keyframe): insertion is O(1) — the round-1 device DB re-copied
    ~470 MB of `.at[i].set` buffers per drained keyframe — and each query
    stages only the gate-surviving candidates to the device for the one
    batched compare. Iris images are stored uint8 (they are 8-bit
    occupancy masks, reference LidarIris.cpp:4-19)."""

    def __init__(self, config: LoopClosureConfig, capacity: int = 4096):
        self.config = config
        self.capacity = capacity
        self._db_img: List[np.ndarray] = []   # (ROWS, COLS) uint8 each
        self._db_T: List[np.ndarray] = []     # (PACKED_WORDS, COLS) uint32
        self._db_M: List[np.ndarray] = []
        self._db_n = 0
        self._kf_ids: List[int] = []
        self._positions: List[np.ndarray] = []
        self._pending: List[tuple] = []  # (cloud np, mask np, kf_id, position)
        self.total_queries = 0
        self.total_candidates = 0

    def add_keyframe(self, cloud: np.ndarray, mask: np.ndarray, kf_id: int,
                     position: np.ndarray) -> bool:
        if cloud is None or not mask.any():
            log.warn("[LoopClosureDetector] Empty point cloud for keyframe {}", kf_id)
            return False
        self._pending.append((cloud, mask, kf_id, position.copy()))
        return True

    _DRAIN_BATCH = 16

    def _extract(self, cloud: np.ndarray, mask: np.ndarray):
        img = iris.iris_image(jnp.asarray(cloud), jnp.asarray(mask))
        return iris.iris_feature(img)

    @staticmethod
    @jax.jit
    def _extract_batch_packed(clouds, masks):
        """Batch extraction with ONE uint32 output array — a synchronous
        np.asarray pays a full tunnel round trip, so the image/T/M fetch
        is packed into a single transfer (cols: img | T | M)."""
        imgs = jax.vmap(iris.iris_image)(clouds, masks)
        _, Ts, Ms = jax.vmap(iris.iris_feature)(imgs)
        b = imgs.shape[0]
        return jnp.concatenate(
            [imgs.astype(jnp.uint32).reshape(b, -1),
             Ts.reshape(b, -1), Ms.reshape(b, -1)], axis=1)

    def _drain_pending(self):
        """Extract queued keyframes in vmapped batches: the round-1
        one-at-a-time loop starved the background worker when many
        keyframes queued between queries (each drain was a separate
        device dispatch chain)."""
        n_img = iris.ROWS * iris.COLS
        n_tm = iris.PACKED_WORDS * iris.COLS
        while self._pending:
            # batch size = next power of two covering the pending count
            # (<= _DRAIN_BATCH): the common steady case is 1-2 pending
            # per query, and padding those to 16 cost a 2.7 MB fetch per
            # drain on a ~150 ms-latency tunnel. Power-of-two buckets
            # bound the compile count to 5 shapes.
            b = 1
            while b < min(len(self._pending), self._DRAIN_BATCH):
                b *= 2
            batch = self._pending[:b]
            self._pending = self._pending[b:]
            k = len(batch)
            clouds = np.stack([x[0] for x in batch] + [batch[0][0]] * (b - k))
            masks = np.stack([x[1] for x in batch] + [batch[0][1]] * (b - k))
            packed = np.asarray(self._extract_batch_packed(
                jnp.asarray(clouds), jnp.asarray(masks)))
            imgs_np = packed[:, :n_img].astype(np.uint8).reshape(
                b, iris.ROWS, iris.COLS)
            Ts_np = packed[:, n_img:n_img + n_tm].reshape(
                b, iris.PACKED_WORDS, iris.COLS)
            Ms_np = packed[:, n_img + n_tm:].reshape(
                b, iris.PACKED_WORDS, iris.COLS)
            for j in range(k):
                _, _, kf_id, position = batch[j]
                if self._db_n >= self.capacity:
                    log.warn("[LoopClosureDetector] DB capacity exceeded, "
                             "dropping KF {}", kf_id)
                    continue
                self._db_img.append(imgs_np[j])
                self._db_T.append(Ts_np[j])
                self._db_M.append(Ms_np[j])
                self._kf_ids.append(kf_id)
                self._positions.append(position)
                self._db_n += 1

    def detect_loop_closures(self, query_cloud: np.ndarray, query_mask: np.ndarray,
                             query_kf_id: int,
                             query_position: np.ndarray) -> List[LoopCandidate]:
        if not self.config.enable_loop_detection:
            return []
        self.total_queries += 1
        self._drain_pending()
        if self._db_n == 0:
            return []

        # The query keyframe was just drained into the DB — reuse its
        # stored descriptor (staging three small rows) instead of
        # re-uploading and re-extracting the raw cloud.
        if query_kf_id in self._kf_ids:
            qi = self._kf_ids.index(query_kf_id)
            q_img = jnp.asarray(self._db_img[qi].astype(np.float32))
            qT = jnp.asarray(self._db_T[qi])
            qM = jnp.asarray(self._db_M[qi])
        else:
            q_img, qT, qM = self._extract(query_cloud, query_mask)

        ids = np.asarray(self._kf_ids[: self._db_n])
        pos = np.stack(self._positions[: self._db_n])
        gap_ok = (query_kf_id - ids) >= self.config.min_keyframe_gap
        dist = np.linalg.norm(pos - query_position[None, :], axis=-1)
        dist_ok = dist <= self.config.max_search_distance
        cand_idx = np.nonzero(gap_ok & dist_ok)[0]
        if len(cand_idx) == 0:
            return []

        # Pad candidate count to a power of two to bound recompiles; only
        # the surviving candidates are staged to the device.
        pad = 1
        while pad < len(cand_idx):
            pad *= 2
        idx_p = np.zeros(pad, np.int32)
        idx_p[: len(cand_idx)] = cand_idx
        valid = np.zeros(pad, bool)
        valid[: len(cand_idx)] = True

        # Candidates stage as uint8 images (the f32 cast quadrupled the
        # upload) and the (distance, bias) results come back in ONE
        # packed fetch — round trips dominate this path on a tunnel.
        c_img = np.stack([self._db_img[i] for i in idx_p])
        c_T = np.stack([self._db_T[i] for i in idx_p])
        c_M = np.stack([self._db_M[i] for i in idx_p])
        out = np.asarray(iris.compare_batch_packed(
            q_img, qT, qM, jnp.asarray(c_img), jnp.asarray(c_T),
            jnp.asarray(c_M), jnp.asarray(valid)))
        dists = out[:, 0]
        biases = out[:, 1].astype(np.int32)
        best = int(np.argmin(dists))
        best_score = float(dists[best])
        if not np.isfinite(best_score) or best_score > self.config.similarity_threshold:
            return []
        match_id = int(ids[idx_p[best]])
        self.total_candidates += 1
        if self.config.enable_debug_output:
            log.debug("[LoopClosureDetector] {} <-> {} (distance: {:.4f}, bias: {})",
                      query_kf_id, match_id, best_score, int(biases[best]))
        return [LoopCandidate(query_kf_id, match_id, best_score, int(biases[best]))]

    def clear(self):
        self._db_img = []
        self._db_T = []
        self._db_M = []
        self._db_n = 0
        self._kf_ids = []
        self._positions = []
        self._pending = []
        self.total_queries = 0
        self.total_candidates = 0

    # ------------------------------------------------------------------
    # checkpoint support (the round-1 resume silently lost loop-closure
    # ability against pre-checkpoint keyframes)
    # ------------------------------------------------------------------

    def export_state(self) -> dict:
        """Descriptor DB as arrays for checkpointing (pending queue is
        drained first so nothing is lost)."""
        self._drain_pending()
        n = self._db_n
        return {
            "iris_img": (np.stack(self._db_img) if n else
                         np.zeros((0, iris.ROWS, iris.COLS), np.uint8)),
            "iris_T": (np.stack(self._db_T) if n else
                       np.zeros((0, iris.PACKED_WORDS, iris.COLS), np.uint32)),
            "iris_M": (np.stack(self._db_M) if n else
                       np.zeros((0, iris.PACKED_WORDS, iris.COLS), np.uint32)),
            "iris_kf_ids": np.asarray(self._kf_ids, np.int32),
            "iris_positions": (np.stack(self._positions) if n else
                               np.zeros((0, 3), np.float32)),
        }

    def import_state(self, state: dict) -> None:
        self.clear()
        n = len(state["iris_kf_ids"])
        self._db_img = [state["iris_img"][i] for i in range(n)]
        self._db_T = [state["iris_T"][i] for i in range(n)]
        self._db_M = [state["iris_M"][i] for i in range(n)]
        self._kf_ids = [int(k) for k in state["iris_kf_ids"]]
        self._positions = [state["iris_positions"][i] for i in range(n)]
        self._db_n = n
