"""Train an ASMK retrieval codebook from your own data.

The reference downloads a pre-trained 64k-centroid codebook
(``*_codebook.pkl``, mast3r/retrieval/processor.py:65-99); when it is
unavailable the loader falls back to a RANDOM codebook and flags every run
as degraded (loader.py:79-86). This utility closes that gap without any
download: it runs the encoder + retrieval head over a dataset (any loader
path data/datasets.py supports, or a plain image folder), collects the
per-image top-k local features (whiten -> project -> attention top-k,
exactly what the database quantizes at runtime), k-means them with
mini-batch Lloyd iterations, and writes a ``{"centroids": (K, D)}`` pickle
the loader consumes directly (loader.py:68-77).

Usage:
  python scripts/train_codebook.py --dataset <path> --out checkpoints/my_codebook.pkl \
      [--centroids 65536] [--max-images 500] [--iters 20] [--ckpt <model.pth/npz>]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np


def minibatch_kmeans(rng: np.random.Generator, feats: np.ndarray, k: int,
                     iters: int = 20, batch: int = 65536) -> np.ndarray:
    """Mini-batch Lloyd k-means (the reference trains its codebook with
    faiss k-means, asmk/asmk/codebook.py; this is the dependency-free
    equivalent). feats (N, D) l2-normalized; returns (k, D) centroids."""
    n, d = feats.shape
    if n <= k:
        # degenerate: pad by resampling with noise
        reps = int(np.ceil(k / max(n, 1)))
        base = np.tile(feats, (reps, 1))[:k]
        return base + rng.normal(scale=1e-4, size=base.shape).astype(feats.dtype)
    centroids = feats[rng.choice(n, size=k, replace=False)].copy()
    counts = np.ones((k,), np.float64)
    for _ in range(iters):
        idx = rng.choice(n, size=min(batch, n), replace=False)
        xb = feats[idx]
        # assign: argmax dot == argmin L2 on normalized vectors
        sims = xb @ centroids.T  # (B, k)
        assign = np.argmax(sims, axis=1)
        for j in np.unique(assign):
            sel = xb[assign == j]
            m = sel.shape[0]
            lr = m / (counts[j] + m)
            centroids[j] = (1 - lr) * centroids[j] + lr * sel.mean(axis=0)
            counts[j] += m
    norms = np.linalg.norm(centroids, axis=1, keepdims=True)
    return (centroids / np.maximum(norms, 1e-12)).astype(np.float32)


def iter_images(path: str, img_size, max_images: int):
    """Yield resized frames from a dataset path or a plain image folder."""
    from frodo_slam_tpu.data.datasets import load_dataset

    ds = load_dataset(path, img_size=img_size)
    n = min(len(ds), max_images)
    step = max(1, len(ds) // max(n, 1))
    for i in range(0, len(ds), step):
        _, img = ds[i]
        yield img
        n -= 1
        if n <= 0:
            return


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--centroids", type=int, default=65536)
    ap.add_argument("--max-images", type=int, default=500)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--retrieval-ckpt", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax.numpy as jnp

    from frodo_slam_tpu import loader
    from frodo_slam_tpu.models import mast3r

    params, cfg = loader.load_mast3r(args.ckpt)
    db = loader.load_retriever(cfg, args.retrieval_ckpt)
    head = db.head

    feats = []
    n_img = 0
    for img in iter_images(args.dataset, (288, 512), args.max_images):
        feat, _pos = mast3r.encode_image(params, cfg, jnp.asarray(img)[None])
        topk = head.prep_features(feat)[0]  # (nfeat, D) selected local feats
        feats.append(np.asarray(topk))
        n_img += 1
    if not feats:
        raise SystemExit(f"no images found under {args.dataset}")
    allf = np.concatenate(feats, axis=0)
    norms = np.linalg.norm(allf, axis=1, keepdims=True)
    allf = allf / np.maximum(norms, 1e-12)
    print(f"collected {allf.shape[0]} local features from {n_img} images")

    rng = np.random.default_rng(args.seed)
    centroids = minibatch_kmeans(rng, allf, args.centroids, iters=args.iters)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        # fingerprint binds this codebook to the head it was trained
        # against; loader.load_retriever verifies it (mismatch => degraded)
        pickle.dump({"centroids": centroids,
                     "head_fingerprint": loader.head_fingerprint(head)}, f)
    print(f"wrote {args.out}: centroids {centroids.shape}")


if __name__ == "__main__":
    main()
