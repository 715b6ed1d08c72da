"""Retrieval stack tests: packing/hamming parity with the reference Cython
docstrings, quantization vs brute force, and end-to-end database behavior
(revisited places rank first)."""

import numpy as np
import jax
import jax.numpy as jnp

from frodo_slam_tpu.retrieval.asmk import (
    Codebook,
    InvertedFile,
    aggregate_image,
    binarize_and_pack,
    hamming_cdist_packed,
)
from frodo_slam_tpu.retrieval.database import RetrievalDatabase
from frodo_slam_tpu.retrieval.model import RetrievalHead


def test_binarize_and_pack_matches_cython_docstring():
    # hamming.pyx:87-89: binarize_and_pack_2D(rand(2,10)-0.5) with seed-fixed
    # values is hard to reproduce; instead verify the documented bit order
    # (MSB-first within each uint32) with a hand case.
    v = np.zeros((1, 10), np.float32)
    v[0, 0] = 1.0  # bit 0 -> MSB
    packed = binarize_and_pack(v)
    assert packed[0, 0] == np.uint32(1 << 31)
    v[0, 9] = 1.0
    packed = binarize_and_pack(v)
    assert packed[0, 0] == np.uint32((1 << 31) | (1 << 22))


def test_hamming_cdist_packed():
    # hamming.pyx:135-137 example: arrs [[3],[1]] vs [[1],[2]], norm 2
    a = np.array([[3], [1]], np.uint32)
    b = np.array([[1], [2]], np.uint32)
    d = hamming_cdist_packed(a, b, 2)
    np.testing.assert_allclose(d, [[0.5, 0.5], [0.0, 1.0]])


def test_quantize_matches_bruteforce():
    rng = np.random.default_rng(0)
    cb = Codebook(rng.normal(size=(128, 16)).astype(np.float32))
    q = rng.normal(size=(40, 16)).astype(np.float32)
    idx = cb.quantize(q, 3)
    d2 = ((q[:, None] - cb.centroids[None]) ** 2).sum(-1)
    ref = np.argsort(d2, axis=1)[:, :3]
    np.testing.assert_array_equal(np.sort(idx, axis=1), np.sort(ref, axis=1))


def test_aggregate_residual_sign():
    rng = np.random.default_rng(1)
    cb = Codebook(np.zeros((4, 8), np.float32))
    des = np.abs(rng.normal(size=(5, 8))).astype(np.float32)  # all positive
    words = np.zeros((5, 1), np.int64)
    ades, uids = aggregate_image(cb, des, words)
    assert uids.tolist() == [0]
    # residual sum is positive in every dim -> all bits set for first 8 bits
    expected = np.uint32(sum(1 << (31 - k) for k in range(8)))
    assert ades[0, 0] == expected


def test_database_revisit_ranks_first():
    """Same-place keyframes should retrieve each other; distinct places
    should not cross-fire with high score."""
    rng = np.random.default_rng(2)
    dim = 32
    head = RetrievalHead.init(jax.random.PRNGKey(0), backbone_dim=dim, hdims=[dim], nfeat=16)
    cb = Codebook(rng.normal(size=(64, dim)).astype(np.float32) * 3)
    db = RetrievalDatabase(head, cb)

    def fake_feat(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(r.normal(size=(1, 24, dim)).astype(np.float32))

    # insert 4 distinct places
    for s in range(4):
        got = db.update(fake_feat(s), add_after_query=True, k=3, min_thresh=5e-3)
    assert db.kf_counter == 4

    # query a revisit of place 1 (tiny noise)
    r = np.random.default_rng(1)
    feat = r.normal(size=(1, 24, dim)).astype(np.float32)
    feat += np.random.default_rng(99).normal(size=feat.shape) * 0.01
    got = db.update(jnp.asarray(feat.astype(np.float32)), add_after_query=False, k=1, min_thresh=0.0)
    assert got and got[0] == 1, got


def _place_db(dim=32, n_places=4):
    rng = np.random.default_rng(2)
    head = RetrievalHead.init(jax.random.PRNGKey(0), backbone_dim=dim, hdims=[dim], nfeat=16)
    cb = Codebook(rng.normal(size=(64, dim)).astype(np.float32) * 3)
    db = RetrievalDatabase(head, cb)

    def fake_feat(seed, noise=0.0):
        r = np.random.default_rng(seed)
        f = r.normal(size=(1, 24, dim)).astype(np.float32)
        if noise:
            f += np.random.default_rng(99).normal(size=f.shape).astype(np.float32) * noise
        return jnp.asarray(f)

    return db, fake_feat


def test_database_explicit_kf_ids():
    """Insertions carry explicit keyframe ids: results map through kf_ids,
    so an out-of-keyframe-order insertion (a preempting relocalization, a
    backlogged backend queue) still retrieves TRUE keyframe indices."""
    db, fake_feat = _place_db()
    # keyframes inserted out of order: 0, then 7 (reloc jumped the queue),
    # then the backlogged 1..2
    for kf in (0, 7, 1, 2):
        db.update(fake_feat(kf), add_after_query=True, k=3, min_thresh=5e-3,
                  kf_id=kf)
    got = db.update(fake_feat(7, noise=0.01), add_after_query=False, k=1,
                    min_thresh=0.0)
    assert got == [7], got
    got = db.update(fake_feat(1, noise=0.01), add_after_query=False, k=1,
                    min_thresh=0.0)
    assert got == [1], got


def test_database_state_roundtrip():
    """state_arrays/load_state_arrays (checkpoint/resume): a restored
    database returns identical results and keeps accepting insertions."""
    db, fake_feat = _place_db()
    for kf in range(4):
        db.update(fake_feat(kf), add_after_query=True, k=3, min_thresh=5e-3,
                  kf_id=kf)
    state = {k: np.asarray(v) for k, v in db.state_arrays().items()}

    db2, _ = _place_db()
    db2.load_state_arrays(state)
    assert db2.kf_counter == db.kf_counter and db2.kf_ids == db.kf_ids
    q = fake_feat(1, noise=0.01)
    assert (db2.update(q, add_after_query=False, k=1, min_thresh=0.0)
            == db.update(q, add_after_query=False, k=1, min_thresh=0.0) == [1])
    # the restored db keeps growing
    db2.update(fake_feat(9), add_after_query=True, k=3, min_thresh=5e-3, kf_id=9)
    got = db2.update(fake_feat(9, noise=0.01), add_after_query=False, k=1,
                     min_thresh=0.0)
    assert got == [9], got


def test_ivf_norm_factor():
    ivf = InvertedFile(8, 32)
    des = binarize_and_pack(np.random.default_rng(3).normal(size=(3, 32)).astype(np.float32))
    ivf.add(des, np.array([0, 1, 2]), np.array([0, 0, 0]))
    assert ivf.n_images == 1
    assert ivf.norm_factor[0] == 3


def test_native_kernels_match_numpy():
    """The C popcount kernels (native/asmk_kernels.cpp) must agree with the
    numpy reference implementations."""
    try:
        from frodo_slam_tpu.utils import native
    except ImportError:
        import pytest

        pytest.skip("native library not built")

    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(6, 70)).astype(np.float32)
    np.testing.assert_array_equal(native.binarize_and_pack_2d(vecs), binarize_and_pack(vecs))

    a = binarize_and_pack(rng.normal(size=(4, 64)).astype(np.float32))
    b = binarize_and_pack(rng.normal(size=(9, 64)).astype(np.float32))
    # force the numpy path for the reference value
    from frodo_slam_tpu.retrieval import asmk as asmk_mod

    x = a[:, None, :] ^ b[None, :, :]
    counts = asmk_mod._POPCNT_TABLE[x.view(np.uint8).reshape(*x.shape[:2], -1)].sum(axis=-1)
    ref = counts.astype(np.float32) / 64.0
    np.testing.assert_allclose(native.hamming_cdist_packed(a, b, 64), ref)

    # fused accumulate vs explicit formula (alpha=3)
    imids = rng.integers(0, 3, size=b.shape[0]).astype(np.int64)
    norm = np.abs(rng.normal(size=3)) + 1.0
    scores_native = np.zeros(3)
    native.asmk_accumulate_word(a[0], b, imids, 64, 0.0, norm, scores_native)
    sim = -2.0 * ref[0] + 1.0
    mask = sim >= 0.0
    scores_ref = np.zeros(3)
    np.add.at(scores_ref, imids[mask], sim[mask] ** 3 / np.sqrt(norm[imids[mask]]))
    np.testing.assert_allclose(scores_native, scores_ref, rtol=1e-6)


def test_trained_codebook_roundtrip(tmp_path):
    """scripts/train_codebook.py output loads through loader.load_retriever
    as a NON-degraded database, independent of the head checkpoint."""
    import pickle
    import sys

    sys.path.insert(0, "scripts")
    from train_codebook import minibatch_kmeans

    from frodo_slam_tpu import loader
    from frodo_slam_tpu.models import mast3r

    rng = np.random.default_rng(0)
    cfg = mast3r.tiny_config()
    head = loader.load_retriever(cfg).head  # deterministic random-init head
    dim = head.params["projector"]["final"]["w"].shape[1] \
        if head.params["projector"]["final"] is not None else 1024

    feats = rng.normal(size=(2000, dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    centroids = minibatch_kmeans(rng, feats, k=64, iters=5, batch=512)
    assert centroids.shape == (64, dim)
    np.testing.assert_allclose(np.linalg.norm(centroids, axis=1), 1.0, atol=1e-5)

    cb_file = tmp_path / "my_codebook.pkl"
    with open(cb_file, "wb") as f:
        # train_codebook.py binds the codebook to the head it was trained
        # against; the loader verifies the fingerprint (ADVICE r2)
        pickle.dump({"centroids": centroids,
                     "head_fingerprint": loader.head_fingerprint(head)}, f)
    db = loader.load_retriever(cfg, codebook_path=str(cb_file))
    assert not db.degraded
    assert db.codebook.size == 64

    # a codebook WITHOUT a fingerprint pairing with a random-init head must
    # be flagged degraded (it could have been trained for a different head)
    cb_file2 = tmp_path / "foreign_codebook.pkl"
    with open(cb_file2, "wb") as f:
        pickle.dump({"centroids": centroids}, f)
    db2 = loader.load_retriever(cfg, codebook_path=str(cb_file2))
    assert db2.degraded
