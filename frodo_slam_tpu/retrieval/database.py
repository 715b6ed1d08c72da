"""Keyframe retrieval database for loop closure.

Behavioral spec: ``mast3r_slam/retrieval_database.py:9-171`` — per-keyframe:
project encoder features through the retrieval head (whiten + attention
top-k), quantize against the 64k codebook on-device, query the incremental
IVF for top-k similar keyframes above a threshold, then add the keyframe.

ASMK parameters of record (``mast3r/retrieval/processor.py:91-96``): binary
kernel, multiple_assignment 1 for build / 5 for query, alpha=3,
similarity_threshold=0, no IDF.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .asmk import Codebook, InvertedFile, aggregate_image
from .model import RetrievalHead

BUILD_MA = 1
QUERY_MA = 5
ALPHA = 3.0
SIM_THRESHOLD = 0.0


class RetrievalDatabase:
    def __init__(self, head: RetrievalHead, codebook: Codebook,
                 degraded: bool = False):
        self.head = head
        self.codebook = codebook
        # True when running on a random head/codebook fallback (no trained
        # retrieval assets): loop closures are then meaningless, and eval
        # runs must record it (loader.py marks this)
        self.degraded = degraded
        self.dim_bits = codebook.dim
        self.ivf = InvertedFile(codebook.size, self.dim_bits)
        self.kf_counter = 0
        self.kf_ids: List[int] = []

    def reset(self):
        self.ivf = InvertedFile(self.codebook.size, self.dim_bits)
        self.kf_counter = 0
        self.kf_ids = []

    def update(self, backbone_feat, add_after_query: bool, k: int,
               min_thresh: float = 0.0) -> List[int]:
        """Query + (optionally) insert one keyframe
        (retrieval_database.py:48-77). ``backbone_feat``: (1, N, enc_dim).

        Returns indices (database ids == insertion order) of the top-k
        matching keyframes above ``min_thresh``.
        """
        feat = np.asarray(self.head.prep_features(backbone_feat))[0]  # (nfeat, dim)

        topk_image_inds: List[int] = []
        topk_codes: Optional[np.ndarray] = None
        if self.kf_counter > 0:
            word_ids_q = self.codebook.quantize(feat, QUERY_MA)
            topk_codes = word_ids_q
            ades, words = aggregate_image(self.codebook, feat, word_ids_q)
            ranks, scores = self.ivf.search(
                ades, words, alpha=ALPHA, similarity_threshold=SIM_THRESHOLD, topk=None
            )
            # ranks are sorted by descending score (inverted_file.py:103-105)
            for r, s in zip(ranks[: min(k, self.ivf.n_images)], scores):
                if s > min_thresh:
                    topk_image_inds.append(int(r))

        if add_after_query:
            self._add(feat, topk_codes)
        return topk_image_inds

    def _add(self, feat: np.ndarray, topk_codes: Optional[np.ndarray]):
        """Insert into the IVF, reusing query-time quantization when
        available (retrieval_database.py:147-171)."""
        if topk_codes is None:
            word_ids = self.codebook.quantize(feat, BUILD_MA)
        else:
            word_ids = topk_codes[:, :BUILD_MA]
        ades, words = aggregate_image(self.codebook, feat, word_ids)
        imids = np.full(words.shape[0], self.kf_counter, np.int64)
        self.ivf.add(ades, words, imids)
        self.kf_ids.append(self.kf_counter)
        self.kf_counter += 1
