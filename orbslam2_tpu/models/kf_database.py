"""Keyframe place-recognition database.

TPU-native equivalent of ``KeyFrameDatabase`` (src/KeyFrameDatabase.cc,
SURVEY.md §2.1): the inverted file over vocabulary words becomes a dense
(K, W) BoW matrix; DetectLoopCandidates / DetectRelocalizationCandidates
become one masked L1-score reduction + the reference's accumulated-score
candidate grouping, computed on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bow as bow_mod
from . import map_state as ms


class KeyframeDatabase:
    """Holds per-keyframe BoW rows; updated at keyframe insertion."""

    def __init__(self, vocab: bow_mod.Vocabulary, kf_capacity: int):
        self.vocab = vocab
        self.transformer = bow_mod.BowTransformer(vocab)
        self.bow = jnp.zeros((kf_capacity, vocab.n_words), jnp.float32)
        self.has_entry = jnp.zeros((kf_capacity,), bool)

    def add_keyframe(self, kf_id: int, desc: jnp.ndarray, valid: jnp.ndarray):
        row, words, nodes = self.transformer(desc, valid)
        self.bow = self.bow.at[kf_id].set(row)
        self.has_entry = self.has_entry.at[kf_id].set(True)
        return words, nodes

    def frame_bow(self, desc: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
        row, _, _ = self.transformer(desc, valid)
        return row

    def detect_loop_candidates(
        self,
        m: ms.MapState,
        kf_id: int,
        n_candidates: int = 3,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """KeyFrameDatabase::DetectLoopCandidates (≈90): exclude the query's
        covisible neighbors, gate on the min score among covisibles, return
        the top remaining keyframes.

        Returns (candidate ids (n,), scores (n,)) as numpy (host decides).
        """
        query = self.bow[kf_id]
        scores = bow_mod.l1_scores(query, self.bow)
        W = ms.covisibility(m)
        covis_row = W[kf_id] > 0
        # min score vs covisible neighbors = the reference's minScore gate.
        covis_scores = jnp.where(covis_row & self.has_entry, scores, jnp.inf)
        min_score = jnp.min(covis_scores)
        min_score = jnp.where(jnp.isinf(min_score), 0.0, min_score)

        eligible = (
            self.has_entry
            & m.kf_valid
            & ~covis_row
            & (jnp.arange(self.bow.shape[0]) != kf_id)
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
        query = self.frame_bow(frame_desc, frame_valid)
        scores = bow_mod.l1_scores(query, self.bow)
        eligible = self.has_entry & m.kf_valid
        masked = jnp.where(eligible, scores, -1.0)
        top_s, top_i = jax.lax.top_k(masked, n_candidates)
        keep = np.asarray(top_s) > 0.0
        return np.asarray(top_i)[keep]
