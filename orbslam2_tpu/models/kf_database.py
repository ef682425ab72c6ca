"""Keyframe place-recognition database.

TPU-native equivalent of ``KeyFrameDatabase`` (src/KeyFrameDatabase.cc,
SURVEY.md §2.1): the inverted file over vocabulary words becomes either

  * a dense (K, W) BoW matrix with one-reduction L1 scoring (small/medium
    vocabularies, W <= _DENSE_MAX_WORDS), or
  * a sparse per-keyframe word list scored with ops/bow.l1_scores_sparse
    (one dense query row + gathers) — the inverted-file access pattern as
    a gather kernel, feasible at the 10^6-word ORBvoc scale.

DetectLoopCandidates / DetectRelocalizationCandidates keep the reference's
candidate logic (covisible exclusion + min-score gate).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bow as bow_mod
from . import map_state as ms

_DENSE_MAX_WORDS = 1 << 17  # beyond this, dense (K, W) rows are wasteful


class KeyframeDatabase:
    """Holds per-keyframe BoW state; updated at keyframe insertion."""

    def __init__(self, vocab: bow_mod.Vocabulary, kf_capacity: int,
                 feat_capacity: int = 2048):
        self.vocab = vocab
        self.transformer = bow_mod.BowTransformer(vocab)
        self.sparse = vocab.n_words > _DENSE_MAX_WORDS
        if self.sparse:
            self.db_words = jnp.full(
                (kf_capacity, feat_capacity), -1, jnp.int32
            )
            self.db_weights = jnp.zeros(
                (kf_capacity, feat_capacity), jnp.float32
            )
        else:
            self.bow = jnp.zeros((kf_capacity, vocab.n_words), jnp.float32)
        self.has_entry = jnp.zeros((kf_capacity,), bool)
        self._feat_capacity = feat_capacity

    # -- updates -----------------------------------------------------------

    def add_keyframe(self, kf_id: int, desc: jnp.ndarray, valid: jnp.ndarray):
        row, words, nodes = self.transformer(desc, valid)
        if self.sparse:
            sw, swt = bow_mod.sparse_bow(
                words, self.vocab.idf, self.vocab.n_words
            )
            n = sw.shape[0]
            cap = self._feat_capacity
            if n < cap:
                sw = jnp.concatenate([sw, jnp.full(cap - n, -1, jnp.int32)])
                swt = jnp.concatenate([swt, jnp.zeros(cap - n, jnp.float32)])
            self.db_words = self.db_words.at[kf_id].set(sw[:cap])
            self.db_weights = self.db_weights.at[kf_id].set(swt[:cap])
        else:
            self.bow = self.bow.at[kf_id].set(row)
        self.has_entry = self.has_entry.at[kf_id].set(True)
        return words, nodes

    # -- scoring -----------------------------------------------------------

    def _scores(self, desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        row, words, _ = self.transformer(desc, valid)
        if self.sparse:
            sw, swt = bow_mod.sparse_bow(
                words, self.vocab.idf, self.vocab.n_words
            )
            return bow_mod.l1_scores_sparse(
                sw, swt, self.db_words, self.db_weights, self.vocab.n_words
            )
        return bow_mod.l1_scores(row, self.bow)

    def _scores_for_kf(self, kf_id: int) -> jnp.ndarray:
        if self.sparse:
            return bow_mod.l1_scores_sparse(
                self.db_words[kf_id], self.db_weights[kf_id],
                self.db_words, self.db_weights, self.vocab.n_words,
            )
        return bow_mod.l1_scores(self.bow[kf_id], self.bow)

    # -- queries (reference candidate logic) -------------------------------

    def detect_loop_candidates(
        self,
        m: ms.MapState,
        kf_id: int,
        n_candidates: int = 3,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """KeyFrameDatabase::DetectLoopCandidates (≈90): exclude the query's
        covisible neighbors, gate on the min score among covisibles, return
        the top remaining keyframes."""
        scores = self._scores_for_kf(kf_id)
        W = ms.covisibility(m)
        covis_row = W[kf_id] > 0
        covis_scores = jnp.where(covis_row & self.has_entry, scores, jnp.inf)
        min_score = jnp.min(covis_scores)
        min_score = jnp.where(jnp.isinf(min_score), 0.0, min_score)

        K = self.has_entry.shape[0]
        eligible = (
            self.has_entry
            & m.kf_valid
            & ~covis_row
            & (jnp.arange(K) != kf_id)
            & (scores >= jnp.maximum(min_score, 0.0))
        )
        masked = jnp.where(eligible, scores, -1.0)
        top_s, top_i = jax.lax.top_k(masked, n_candidates)
        keep = np.asarray(top_s) > 0.0
        return np.asarray(top_i)[keep], np.asarray(top_s)[keep]

    def detect_relocalization_candidates(
        self,
        m: ms.MapState,
        frame_desc: jnp.ndarray,
        frame_valid: jnp.ndarray,
        n_candidates: int = 3,
    ) -> np.ndarray:
        """KeyFrameDatabase::DetectRelocalizationCandidates (≈200): no
        covisibility exclusion, no min-score gate."""
        scores = self._scores(frame_desc, frame_valid)
        eligible = self.has_entry & m.kf_valid
        masked = jnp.where(eligible, scores, -1.0)
        top_s, top_i = jax.lax.top_k(masked, n_candidates)
        keep = np.asarray(top_s) > 0.0
        return np.asarray(top_i)[keep]

    # -- maintenance ---------------------------------------------------------

    def remap(self, kf_new_from_old: np.ndarray):
        """Apply a keyframe-pool compaction (map_state.compact_map): row j of
        the database becomes the row of the old id that moved to slot j;
        rows of dropped keyframes are cleared."""
        K = self.has_entry.shape[0]
        kf_map = np.asarray(kf_new_from_old)
        old_of_new = np.full(K, -1, np.int64)
        kept = np.nonzero(kf_map >= 0)[0]
        old_of_new[kf_map[kept]] = kept
        src = np.maximum(old_of_new, 0)
        live = jnp.asarray(old_of_new >= 0)
        if self.sparse:
            self.db_words = jnp.where(
                live[:, None], self.db_words[src], -1
            )
            self.db_weights = jnp.where(
                live[:, None], self.db_weights[src], 0.0
            )
        else:
            self.bow = jnp.where(live[:, None], self.bow[src], 0.0)
        self.has_entry = live & self.has_entry[src]

    # -- compat ------------------------------------------------------------

    def frame_bow(self, desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        row, _, _ = self.transformer(desc, valid)
        return row
