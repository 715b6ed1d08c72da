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
               min_thresh: float = 0.0, kf_id: Optional[int] = None) -> List[int]:
        """Query + (optionally) insert one keyframe
        (retrieval_database.py:48-77). ``backbone_feat``: (1, N, enc_dim).

        ``kf_id``: the caller's keyframe index for this insertion. The IVF
        is keyed by insertion order internally, but results are mapped back
        through ``kf_ids`` — so callers whose insertion order can diverge
        from keyframe order (a preempting relocalization, a backlogged
        backend queue) still get true keyframe indices back. Defaults to the
        insertion counter (id == insertion order, the reference contract).

        Returns keyframe ids of the top-k matching keyframes above
        ``min_thresh``.
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
                    topk_image_inds.append(int(self.kf_ids[int(r)]))

        if add_after_query:
            self._add(feat, topk_codes, kf_id)
        return topk_image_inds

    def state_arrays(self) -> dict:
        """Flat numpy dict of the database's map state (IVF + id mapping),
        for checkpoint/resume. The codebook and head are model assets, not
        map state — they reload from their own files."""
        vecs, ids, words = [], [], []
        for w in range(self.ivf.n_words):
            c = int(self.ivf.counts[w])
            if c:
                vecs.append(self.ivf.ivf_vecs[w][:c])
                ids.append(self.ivf.ivf_image_ids[w][:c])
                words.append(np.full(c, w, np.int64))
        cat = lambda xs, dt: (np.concatenate(xs) if xs else np.zeros((0,), dt))  # noqa: E731
        return {
            "vecs": cat(vecs, np.uint64),
            "image_ids": cat(ids, np.int64),
            "word_ids": cat(words, np.int64),
            "norm_factor": self.ivf.norm_factor,
            "n_images": np.int64(self.ivf.n_images),
            "kf_ids": np.asarray(self.kf_ids, np.int64),
            "kf_counter": np.int64(self.kf_counter),
        }

    def load_state_arrays(self, d: dict) -> None:
        """Inverse of ``state_arrays`` (into a freshly-reset database)."""
        self.reset()
        if len(d["vecs"]):
            self.ivf.add(np.asarray(d["vecs"]), np.asarray(d["word_ids"]),
                         np.asarray(d["image_ids"]))
        # add() recomputes norm_factor/n_images from the entries; restore the
        # exact values (images whose features all hashed elsewhere included)
        self.ivf.norm_factor = np.asarray(d["norm_factor"], np.float64)
        self.ivf.n_images = int(d["n_images"])
        self.kf_ids = [int(k) for k in np.asarray(d["kf_ids"])]
        self.kf_counter = int(d["kf_counter"])

    def _add(self, feat: np.ndarray, topk_codes: Optional[np.ndarray],
             kf_id: Optional[int] = None):
        """Insert into the IVF, reusing query-time quantization when
        available (retrieval_database.py:147-171)."""
        if topk_codes is None:
            word_ids = self.codebook.quantize(feat, BUILD_MA)
        else:
            word_ids = topk_codes[:, :BUILD_MA]
        ades, words = aggregate_image(self.codebook, feat, word_ids)
        imids = np.full(words.shape[0], self.kf_counter, np.int64)
        self.ivf.add(ades, words, imids)
        self.kf_ids.append(self.kf_counter if kf_id is None else int(kf_id))
        self.kf_counter += 1
