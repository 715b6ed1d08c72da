"""ASMK: aggregated selective match kernel for image retrieval.

Behavioral spec (the vendored asmk package is the spec, per SURVEY.md):
- codebook quantization: L2 top-k against 64k centroids, done as one matmul
  (``retrieval_database.py:101-110`` already used this trick on GPU; on TPU
  the (N, D) x (D, 64k) product is pure MXU work);
- aggregation: per visual word, sum of residuals to the centroid, then
  binarize (sign) and pack to uint32 (``asmk/kernel.py:26-50``,
  ``asmk/cython/hamming.pyx:79-...``);
- similarity: normalized packed hamming -> [-1, 1], threshold + monomial
  alpha kernel (``asmk/kernel.py:55-68``, ``asmk/functional.py:11-15``);
- inverted file: per-word store of packed residuals + image ids, IDF-less
  (``use_idf: False`` in the SLAM params, ``retrieval/processor.py:91-96``),
  norm factor = per-image word count (``asmk/inverted_file.py:56-105``).

The database side (IVF) is host numpy — it is pointer-chasing bookkeeping at
keyframe rate, exactly what the reference keeps on the CPU via Cython. The
popcount scoring uses a native C kernel when built (native/, ctypes) and
numpy otherwise.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# optional native popcount kernels (native/asmk_kernels.cpp)
try:  # pragma: no cover - exercised when the native lib is built
    from ..utils import native as _native
except Exception:
    _native = None
_native_hamming = _native.hamming_cdist_packed if _native else None

_POPCNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def binarize_and_pack(vecs: np.ndarray) -> np.ndarray:
    """(N, D) float -> (N, ceil(D/32)) uint32, bit = (v > 0)
    (hamming.pyx:79-105). Bit order: bit k of word w is element 32w+k,
    MSB-first to match the Cython packer (result |= 1 << (31 - k))."""
    n, d = vecs.shape
    dpad = (-d) % 32
    bits = (vecs > 0).astype(np.uint8)
    if dpad:
        bits = np.concatenate([bits, np.zeros((n, dpad), np.uint8)], axis=1)
    bits = bits.reshape(n, -1, 32)
    weights = (1 << (31 - np.arange(32, dtype=np.uint64))).astype(np.uint64)
    packed = (bits.astype(np.uint64) * weights).sum(axis=2)
    return packed.astype(np.uint32)


def hamming_cdist_packed(a: np.ndarray, b: np.ndarray, dim_bits: int) -> np.ndarray:
    """Normalized hamming distance between packed uint32 rows
    (hamming.pyx:128-...): popcount(xor) / dim_bits."""
    if _native_hamming is not None:
        return _native_hamming(a, b, dim_bits)
    x = a[:, None, :] ^ b[None, :, :]
    counts = _POPCNT_TABLE[x.view(np.uint8).reshape(*x.shape[:2], -1)].sum(axis=-1)
    return counts.astype(np.float32) / float(dim_bits)


class Codebook:
    """64k-centroid codebook with on-device quantization."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = np.asarray(centroids, np.float32)  # (K, D)
        self._dev_centroids = jnp.asarray(self.centroids)
        self._dev_norms = jnp.sum(self._dev_centroids**2, axis=1)
        self._quant_cache = {}

    @property
    def size(self) -> int:
        return self.centroids.shape[0]

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]

    def quantize(self, qvecs: np.ndarray, multiple_assignment: int) -> np.ndarray:
        """Top-k nearest centroids by L2, via the expanded-norm matmul trick
        (retrieval_database.py:101-110). Returns (N, k) int32."""
        k = multiple_assignment
        fn = self._quant_cache.get(k)
        if fn is None:
            c = self._dev_centroids
            cn = self._dev_norms

            @jax.jit
            def fn(q):
                qn = jnp.sum(q**2, axis=1)[:, None]
                d2 = qn + cn[None, :] - 2.0 * (q @ c.T)
                _, idx = jax.lax.top_k(-d2, k)
                return idx

            self._quant_cache[k] = fn
        return np.asarray(fn(jnp.asarray(qvecs, jnp.float32)))

    @staticmethod
    def random(rng: np.random.Generator, size: int, dim: int) -> "Codebook":
        """Placeholder codebook when the trained 64k pickle is unavailable."""
        return Codebook(rng.normal(size=(size, dim)).astype(np.float32))


def aggregate_image(codebook: Codebook, des: np.ndarray, word_ids: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Sum residuals per unique visual word, binarize+pack
    (kernel.py:26-40). ``word_ids``: (N, MA)."""
    unique_ids = np.unique(word_ids)
    ades = np.empty((unique_ids.shape[0], des.shape[1]), np.float32)
    for i, word in enumerate(unique_ids):
        sel = (word_ids == word).any(axis=1)
        ades[i] = (des[sel] - codebook.centroids[word]).sum(0)
    return binarize_and_pack(ades), unique_ids


class InvertedFile:
    """IDF-less inverted file over packed binary residuals
    (inverted_file.py:40-105 with use_idf=False)."""

    def __init__(self, n_words: int, dim_bits: int):
        self.n_words = n_words
        self.dim_bits = dim_bits
        self.ivf_vecs: List[Optional[np.ndarray]] = [None] * n_words
        self.ivf_image_ids: List[Optional[np.ndarray]] = [None] * n_words
        self.counts = np.zeros(n_words, np.int64)
        self.norm_factor = np.zeros(0)
        self.n_images = 0

    @staticmethod
    def _append(arr: Optional[np.ndarray], size: int, item: np.ndarray) -> np.ndarray:
        if arr is None:
            arr = np.zeros((10,) + item.shape, item.dtype)
        elif size >= arr.shape[0]:
            arr = np.resize(arr, (int(np.ceil(arr.shape[0] * 1.5)),) + arr.shape[1:])
        arr[size] = item
        return arr

    def add(self, des: np.ndarray, word_ids: np.ndarray, image_ids: np.ndarray):
        max_imid = int(image_ids.max())
        assert int(image_ids.min()) >= self.n_images, "image ids must be consecutive"
        self.norm_factor = np.concatenate(
            [self.norm_factor, np.zeros(max_imid + 1 - len(self.norm_factor))]
        )
        self.n_images = max(self.n_images, max_imid + 1)
        for i, word in enumerate(word_ids):
            w = int(word)
            self.ivf_vecs[w] = self._append(self.ivf_vecs[w], self.counts[w], des[i])
            self.ivf_image_ids[w] = self._append(self.ivf_image_ids[w], self.counts[w], image_ids[i])
            self.counts[w] += 1
            self.norm_factor[image_ids[i]] += 1

    def search(self, des: np.ndarray, word_ids: np.ndarray, *, alpha: float,
               similarity_threshold: float, topk: Optional[int]) -> Tuple[np.ndarray, np.ndarray]:
        """Accumulate monomial-kernel similarities over the query's words
        (inverted_file.py:84-105 + kernel.similarity + asmk_kernel)."""
        scores = np.zeros(self.n_images)
        q_norm_factor = len(word_ids)  # idf == 1 per word when use_idf=False
        use_native = _native is not None and alpha == 3.0
        for qvec, word in zip(des, word_ids):
            w = int(word)
            if self.ivf_image_ids[w] is None:
                continue
            vecs = self.ivf_vecs[w][: self.counts[w]]
            imids = self.ivf_image_ids[w][: self.counts[w]]
            if use_native:
                _native.asmk_accumulate_word(
                    qvec, vecs, imids.astype(np.int64), self.dim_bits,
                    similarity_threshold, self.norm_factor, scores,
                )
                continue
            nd = hamming_cdist_packed(qvec[None], vecs, self.dim_bits)[0]
            sim = -2.0 * nd + 1.0
            mask = sim >= similarity_threshold
            contrib = np.sign(sim[mask]) * np.abs(sim[mask]) ** alpha
            ids = imids[mask]
            scores[ids] += contrib / np.sqrt(self.norm_factor[ids])
        scores = scores / np.sqrt(max(q_norm_factor, 1))
        k = self.n_images if topk is None else min(topk, self.n_images)
        ranks = np.argsort(-scores)[:k]
        return ranks, scores[ranks]
