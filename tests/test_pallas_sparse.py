"""Pallas BM25/IP compare kernel == the XLA sparse path (interpret mode).

The kernel (ops/pallas_sparse.py) is the latency rung of the sparse
ladder (manager picks it at Q<=2 on TPU); these tests pin its contract
to ``ops.sparse.sparse_topk`` on the same corpora the XLA tests use,
including validity masks, pad slots, stored T-layout mirrors, and
non-block-multiple corpus sizes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.ops.pallas_sparse import sparse_topk_pallas
from advanced_rag_tpu.ops.sparse import sparse_topk

V = 96


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    n, p = 53, 8                      # non-multiple of block_size=16
    doc_idx = np.stack(
        [rng.permutation(V)[:p] for _ in range(n)]
    ).astype(np.int32)
    doc_idx[:, -2:] = -1
    doc_tf = rng.integers(1, 4, size=(n, p)).astype(np.float32)
    doc_tf[doc_idx < 0] = 0
    doc_len = rng.integers(20, 200, size=n).astype(np.float32)
    df = np.zeros(V, np.int32)
    for row in doc_idx:
        for t in set(row[row >= 0].tolist()):
            df[t] += 1
    q_idx = rng.integers(0, V, size=(4, 5)).astype(np.int32)
    q_idx[:, -1] = -1
    q_tf = np.ones((4, 5), np.float32)
    valid = np.ones(n, bool)
    valid[[3, 17, 52]] = False
    return doc_idx, doc_tf, doc_len, df, q_idx, q_tf, valid


def _xla(corpus, k=6, scoring="bm25", use_valid=True):
    doc_idx, doc_tf, doc_len, df, q_idx, q_tf, valid = corpus
    return sparse_topk(
        jnp.asarray(doc_idx), jnp.asarray(doc_tf), jnp.asarray(doc_len),
        jnp.asarray(df), jnp.float32(doc_idx.shape[0]),
        jnp.asarray(q_idx), jnp.asarray(q_tf), k,
        valid=jnp.asarray(valid) if use_valid else None,
        scoring=scoring, block_size=16,
    )


def _pallas(corpus, k=6, scoring="bm25", use_valid=True, t_layout=False,
            **kw):
    doc_idx, doc_tf, doc_len, df, q_idx, q_tf, valid = corpus
    extra = {}
    if t_layout:
        extra["doc_idx_t"] = jnp.asarray(doc_idx.T.copy())
        extra["doc_tf_t"] = jnp.asarray(doc_tf.T.copy())
    return sparse_topk_pallas(
        jnp.asarray(doc_idx), jnp.asarray(doc_tf), jnp.asarray(doc_len),
        jnp.asarray(df), jnp.float32(doc_idx.shape[0]),
        jnp.asarray(q_idx), jnp.asarray(q_tf), k,
        valid=jnp.asarray(valid) if use_valid else None,
        scoring=scoring, block_size=16, **extra, **kw,
    )


@pytest.mark.parametrize("scoring", ["bm25", "ip"])
def test_matches_xla(corpus, scoring):
    s1, i1 = _xla(corpus, scoring=scoring)
    s2, i2 = _pallas(corpus, scoring=scoring)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_stored_t_layout_identical(corpus):
    s1, i1 = _pallas(corpus)
    s2, i2 = _pallas(corpus, t_layout=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_no_valid_mask_matches_xla(corpus):
    s1, i1 = _xla(corpus, use_valid=False)
    s2, i2 = _pallas(corpus, use_valid=False)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_masked_rows_never_surface(corpus):
    _, _, _, _, _, _, valid = corpus
    _, ids = _pallas(corpus, k=10)
    dead = set(np.nonzero(~valid)[0].tolist())
    assert not (set(np.asarray(ids).ravel().tolist()) & dead)


def test_k_exceeding_live_rows_pads_with_minus_one(corpus):
    doc_idx, doc_tf, doc_len, df, q_idx, q_tf, _ = corpus
    few = np.zeros(doc_idx.shape[0], bool)
    few[:3] = True
    s, ids = _pallas(
        (doc_idx, doc_tf, doc_len, df, q_idx, q_tf, few), k=8)
    ids = np.asarray(ids)
    # at most 3 live rows can surface; the rest must be -1 sentinels
    assert (ids >= 0).sum(axis=1).max() <= 3
    assert (ids == -1).any()


def test_explicit_avg_len_matches_xla(corpus):
    doc_idx, doc_tf, doc_len, df, q_idx, q_tf, valid = corpus
    avg = jnp.float32(doc_len[valid].mean())
    s1, i1 = sparse_topk(
        jnp.asarray(doc_idx), jnp.asarray(doc_tf), jnp.asarray(doc_len),
        jnp.asarray(df), jnp.float32(doc_idx.shape[0]),
        jnp.asarray(q_idx), jnp.asarray(q_tf), 6,
        valid=jnp.asarray(valid), avg_len=avg, block_size=16)
    s2, i2 = _pallas(corpus, avg_len=avg)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_empty_corpus_raises():
    z = jnp.zeros((0, 4), jnp.int32)
    with pytest.raises(ValueError, match="empty corpus"):
        sparse_topk_pallas(
            z, jnp.zeros((0, 4), jnp.float32), jnp.zeros((0,), jnp.float32),
            jnp.zeros((V,), jnp.int32), jnp.float32(0),
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.float32), 5)


def test_unknown_scoring_raises(corpus):
    with pytest.raises(ValueError, match="unknown scoring"):
        _pallas(corpus, scoring="tfidf")
