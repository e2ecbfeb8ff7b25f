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
    def __init__(self, config: LoopClosureConfig, capacity: int = 4096):
        self.config = config
        self.capacity = capacity
        # Device DB (padded): iris image + bit-packed T/M codes.
        self._db_img = jnp.zeros((capacity, iris.ROWS, iris.COLS), jnp.float32)
        self._db_T = jnp.zeros((capacity, iris.PACKED_WORDS, iris.COLS), jnp.uint32)
        self._db_M = jnp.zeros((capacity, iris.PACKED_WORDS, iris.COLS), jnp.uint32)
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

    def _extract(self, cloud: np.ndarray, mask: np.ndarray):
        img = iris.iris_image(jnp.asarray(cloud), jnp.asarray(mask))
        return iris.iris_feature(img)

    def _drain_pending(self):
        for cloud, mask, kf_id, position in self._pending:
            img, T, M = self._extract(cloud, mask)
            if self._db_n >= self.capacity:
                log.warn("[LoopClosureDetector] DB capacity exceeded, dropping KF {}", kf_id)
                continue
            i = self._db_n
            self._db_img = self._db_img.at[i].set(img)
            self._db_T = self._db_T.at[i].set(T)
            self._db_M = self._db_M.at[i].set(M)
            self._kf_ids.append(kf_id)
            self._positions.append(position)
            self._db_n += 1
        self._pending = []

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

        # Pad candidate count to a power of two to bound recompiles.
        pad = 1
        while pad < len(cand_idx):
            pad *= 2
        idx_p = np.zeros(pad, np.int32)
        idx_p[: len(cand_idx)] = cand_idx
        valid = np.zeros(pad, bool)
        valid[: len(cand_idx)] = True

        gi = jnp.asarray(idx_p)
        dists, biases = iris.compare_batch(
            q_img, qT, qM, self._db_img[gi], self._db_T[gi], self._db_M[gi],
            jnp.asarray(valid))
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
        self._db_n = 0
        self._kf_ids = []
        self._positions = []
        self._pending = []
        self.total_queries = 0
        self.total_candidates = 0
