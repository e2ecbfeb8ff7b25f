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

    def _drain_pending(self):
        """Extract queued keyframes in vmapped batches: the round-1
        one-at-a-time loop starved the background worker when many
        keyframes queued between queries (each drain was a separate
        device dispatch chain)."""
        B = self._DRAIN_BATCH
        while self._pending:
            batch = self._pending[:B]
            self._pending = self._pending[B:]
            k = len(batch)
            clouds = np.stack([b[0] for b in batch] + [batch[0][0]] * (B - k))
            masks = np.stack([b[1] for b in batch] + [batch[0][1]] * (B - k))
            imgs = jax.vmap(iris.iris_image)(jnp.asarray(clouds),
                                             jnp.asarray(masks))
            _, Ts, Ms = jax.vmap(iris.iris_feature)(imgs)
            imgs_np = np.asarray(imgs).astype(np.uint8)
            Ts_np = np.asarray(Ts)
            Ms_np = np.asarray(Ms)
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

        c_img = np.stack([self._db_img[i] for i in idx_p]).astype(np.float32)
        c_T = np.stack([self._db_T[i] for i in idx_p])
        c_M = np.stack([self._db_M[i] for i in idx_p])
        dists, biases = iris.compare_batch(
            q_img, qT, qM, jnp.asarray(c_img), jnp.asarray(c_T),
            jnp.asarray(c_M), jnp.asarray(valid))
        dists = np.asarray(dists)
        biases = np.asarray(biases)
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
