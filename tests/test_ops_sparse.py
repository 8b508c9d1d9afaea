"""Sparse BM25/IP top-k vs a pure-numpy oracle, plus the host encoder."""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.index.text import (
    encode_documents,
    encode_queries,
    hash_term,
    tokenize,
)
from advanced_rag_tpu.ops.sparse import idf_weights, sparse_topk

V = 64


def oracle_bm25(doc_idx, doc_tf, doc_len, df, n_docs, q_idx, q_tf,
                k1=1.2, b=0.75, valid=None):
    n = doc_idx.shape[0]
    vmask = valid if valid is not None else np.ones(n, bool)
    avg = doc_len[vmask].mean() if vmask.any() else 1.0
    idf = np.log1p(np.maximum(n_docs - df + 0.5, 0.5) / (df + 0.5))
    scores = np.zeros((q_idx.shape[0], n), np.float64)
    for qi in range(q_idx.shape[0]):
        for t, tf_q in zip(q_idx[qi], q_tf[qi]):
            if t < 0:
                continue
            for d in range(n):
                sel = doc_idx[d] == t
                tf = doc_tf[d][sel].sum()
                if tf <= 0:
                    continue
                denom = tf + k1 * (1 - b + b * doc_len[d] / max(avg, 1.0))
                scores[qi, d] += tf_q * idf[t] * tf * (k1 + 1) / max(denom, 1e-6)
    scores = np.where(vmask[None, :], scores, -1e30)
    ids = np.argsort(-scores, axis=1)[:, :5]
    return np.take_along_axis(scores, ids, axis=1), ids


@pytest.fixture
def corpus(rng):
    n, p = 30, 8
    # distinct term ids per row (the encoder's contract: Counter keys)
    doc_idx = np.stack(
        [rng.permutation(V)[:p] for _ in range(n)]
    ).astype(np.int32)
    doc_idx[:, -2:] = -1  # padding slots
    doc_tf = rng.integers(1, 4, size=(n, p)).astype(np.float32)
    doc_tf[doc_idx < 0] = 0
    doc_len = rng.integers(20, 200, size=n).astype(np.float32)
    df = np.zeros(V, np.int32)
    for row in doc_idx:
        for t in set(row[row >= 0].tolist()):
            df[t] += 1
    return doc_idx, doc_tf, doc_len, df


def test_bm25_matches_oracle(corpus, rng):
    doc_idx, doc_tf, doc_len, df = corpus
    q_idx = rng.integers(0, V, size=(3, 4)).astype(np.int32)
    q_idx[:, -1] = -1
    q_tf = np.ones((3, 4), np.float32)
    s, i = sparse_topk(
        jnp.asarray(doc_idx), jnp.asarray(doc_tf), jnp.asarray(doc_len),
        jnp.asarray(df), jnp.float32(30), jnp.asarray(q_idx),
        jnp.asarray(q_tf), 5, block_size=16,
    )
    os_, oi = oracle_bm25(doc_idx, doc_tf, doc_len, df, 30, q_idx, q_tf)
    np.testing.assert_allclose(np.asarray(s), os_, rtol=1e-4, atol=1e-4)


def test_bm25_valid_mask(corpus, rng):
    doc_idx, doc_tf, doc_len, df = corpus
    valid = np.zeros(30, bool)
    valid[:5] = True
    q_idx = doc_idx[:1, :3].copy()  # terms guaranteed to hit doc 0
    q_tf = np.ones_like(q_idx, np.float32)
    s, i = sparse_topk(
        jnp.asarray(doc_idx), jnp.asarray(doc_tf), jnp.asarray(doc_len),
        jnp.asarray(df), jnp.float32(30), jnp.asarray(q_idx),
        jnp.asarray(q_tf), 10, jnp.asarray(valid), block_size=8,
    )
    ids = np.asarray(i)[0]
    assert set(ids[ids >= 0].tolist()) <= set(range(5))


def test_ip_mode_matches_dot(corpus):
    doc_idx, doc_tf, doc_len, df = corpus
    # dense reconstruction
    dense = np.zeros((30, V), np.float32)
    for d in range(30):
        for t, tf in zip(doc_idx[d], doc_tf[d]):
            if t >= 0:
                dense[d, t] += tf
    q_idx = np.array([[3, 7, -1]], np.int32)
    q_tf = np.array([[2.0, 1.0, 0.0]], np.float32)
    qv = np.zeros(V, np.float32)
    qv[3], qv[7] = 2.0, 1.0
    s, i = sparse_topk(
        jnp.asarray(doc_idx), jnp.asarray(doc_tf), jnp.asarray(doc_len),
        jnp.asarray(df), jnp.float32(30), jnp.asarray(q_idx),
        jnp.asarray(q_tf), 5, scoring="ip", block_size=16,
    )
    oracle = dense @ qv
    oi = np.argsort(-oracle)[:5]
    np.testing.assert_allclose(np.asarray(s)[0], oracle[oi], rtol=1e-5)


def test_idf_monotone_decreasing():
    df = jnp.asarray([1, 10, 100], dtype=jnp.int32)
    w = np.asarray(idf_weights(df, jnp.float32(100)))
    assert w[0] > w[1] > w[2] > 0


def test_tokenize_and_hash_stability():
    toks = tokenize("The quick brown Fox! jumps;   over 2 lazy dogs.")
    assert "the" not in toks and "quick" in toks and "2" in toks
    assert hash_term("retrieval", 1024) == hash_term("retrieval", 1024)
    assert 0 <= hash_term("retrieval", 1024) < 1024


def test_encode_documents_roundtrip():
    texts = ["alpha beta beta gamma", "delta delta delta"]
    idx, tf, lens, df = encode_documents(texts, vocab_size=128, doc_nnz=4)
    assert idx.shape == (2, 4) and tf.shape == (2, 4)
    assert lens.tolist() == [4.0, 3.0]
    # doc 0: 3 distinct terms; beta has tf=2
    assert (idx[0] >= 0).sum() == 3
    assert sorted(tf[0][idx[0] >= 0].tolist()) == [1.0, 1.0, 2.0]
    # df counts distinct terms per doc
    assert df.sum() == 4


def test_encode_documents_nnz_truncation():
    text = " ".join(f"term{i}" for i in range(10))
    idx, tf, lens, df = encode_documents([text], vocab_size=4096, doc_nnz=4)
    assert (idx[0] >= 0).sum() == 4
    assert df.sum() == 4  # df counts only kept terms


def test_encode_queries_drop_ratio():
    text = "common common common rare1 rare2 rare3 rare4 rare5"
    idx_full, _ = encode_queries([text], 4096, 8, drop_ratio=0.0)
    idx_drop, _ = encode_queries([text], 4096, 8, drop_ratio=0.5)
    assert (idx_full[0] >= 0).sum() == 6
    assert (idx_drop[0] >= 0).sum() == 3


def test_end_to_end_bm25_text_relevance():
    docs = [
        "the tpu systolic array multiplies matrices in hardware",
        "cats and dogs are common household pets",
        "matrix multiplication on tpu uses the mxu systolic unit",
        "the stock market closed higher on tuesday",
    ]
    idx, tf, lens, df = encode_documents(docs, 2048, 16)
    qi, qt = encode_queries(["tpu matrix multiplication"], 2048, 8)
    s, i = sparse_topk(
        jnp.asarray(idx), jnp.asarray(tf), jnp.asarray(lens),
        jnp.asarray(df), jnp.float32(4), jnp.asarray(qi), jnp.asarray(qt), 4,
    )
    top2 = set(np.asarray(i)[0][:2].tolist())
    assert top2 == {0, 2}
