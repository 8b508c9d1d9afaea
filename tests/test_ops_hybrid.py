"""Fused hybrid program == composing the individual ops."""

import jax.numpy as jnp
import numpy as np

from advanced_rag_tpu.index.text import encode_documents, encode_queries
from advanced_rag_tpu.ops import (
    NEG_INF,
    dense_topk,
    hybrid_retrieve,
    rrf_fuse,
    sparse_topk,
)


def _corpus(rng, n=300, d=32, vocab=2048, nnz=24):
    texts = [
        f"doc {i} " + " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta", "query", "fox"],
                       size=8).tolist()
        )
        for i in range(n)
    ]
    doc_idx, doc_tf, doc_len, df = encode_documents(texts, vocab, nnz)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return texts, emb, doc_idx, doc_tf, doc_len, df


def test_hybrid_matches_composed(rng):
    _, emb, doc_idx, doc_tf, doc_len, df = _corpus(rng)
    n = emb.shape[0]
    q_dense = rng.standard_normal((3, emb.shape[1])).astype(np.float32)
    q_dense /= np.linalg.norm(q_dense, axis=1, keepdims=True)
    q_idx, q_tf = encode_queries(["alpha fox query", "beta gamma", "delta"],
                                 2048, 16)
    args = (jnp.asarray(emb), jnp.asarray(doc_idx), jnp.asarray(doc_tf),
            jnp.asarray(doc_len), jnp.asarray(df), jnp.float32(n),
            jnp.asarray(q_dense), jnp.asarray(q_idx), jnp.asarray(q_tf),
            None, jnp.asarray([0.7, 0.3], jnp.float32), jnp.float32(0.8))
    res = hybrid_retrieve(*args, k_cand=20, k_out=10, use_mmr=False)

    d_s, d_i = dense_topk(jnp.asarray(emb), jnp.asarray(q_dense), 20, None,
                          metric="ip")
    s_s, s_i = sparse_topk(jnp.asarray(doc_idx), jnp.asarray(doc_tf),
                           jnp.asarray(doc_len), jnp.asarray(df),
                           jnp.float32(n), jnp.asarray(q_idx),
                           jnp.asarray(q_tf), 20)
    f_s, f_i, f_c = rrf_fuse(jnp.stack([d_i, s_i]),
                             jnp.asarray([0.7, 0.3], jnp.float32),
                             rrf_k=60, k_out=20)
    np.testing.assert_array_equal(np.asarray(res.ids),
                                  np.asarray(f_i)[:, :10])
    np.testing.assert_allclose(np.asarray(res.scores),
                               np.asarray(f_s)[:, :10], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(res.dense_ids), np.asarray(d_i))


def test_hybrid_mmr_diversifies(rng):
    """With near-duplicate top docs, MMR must not pick both first."""
    n, d = 64, 16
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb[1] = emb[0] + 1e-4 * rng.standard_normal(d)  # near-dup of row 0
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[0:1].copy()
    texts = ["same words here"] * n
    doc_idx, doc_tf, doc_len, df = encode_documents(texts, 512, 8)
    args = (jnp.asarray(emb), jnp.asarray(doc_idx), jnp.asarray(doc_tf),
            jnp.asarray(doc_len), jnp.asarray(df), jnp.float32(n),
            jnp.asarray(q), jnp.asarray(doc_idx[:1, :8]),
            jnp.asarray(doc_tf[:1, :8]),
            None, jnp.asarray([1.0, 0.0], jnp.float32), jnp.float32(0.5))
    res = hybrid_retrieve(*args, k_cand=10, k_out=5, use_mmr=True,
                          enable_sparse=False)
    ids = np.asarray(res.ids)[0]
    # rows 0 and 1 are near-identical; MMR with lambda .5 must separate them
    assert ids[0] == 0
    assert ids[1] != 1


def test_hybrid_respects_mask(rng):
    _, emb, doc_idx, doc_tf, doc_len, df = _corpus(rng, n=100)
    q_dense = rng.standard_normal((1, emb.shape[1])).astype(np.float32)
    q_idx, q_tf = encode_queries(["alpha"], 2048, 16)
    valid = np.zeros(100, bool)
    valid[:10] = True
    res = hybrid_retrieve(
        jnp.asarray(emb), jnp.asarray(doc_idx), jnp.asarray(doc_tf),
        jnp.asarray(doc_len), jnp.asarray(df), jnp.float32(10),
        jnp.asarray(q_dense), jnp.asarray(q_idx), jnp.asarray(q_tf),
        jnp.asarray(valid), jnp.asarray([0.7, 0.3], jnp.float32),
        jnp.float32(0.8), k_cand=20, k_out=10, use_mmr=True,
    )
    ids = np.asarray(res.ids)
    assert ((ids < 10) | (ids == -1)).all()
    assert (ids >= 0).sum() <= 10


def test_rescore_postings_matches_doc_table(rng):
    """exact_tier_scores_postings == exact_tier_scores whenever the
    postings cap covers every (doc, term) occurrence (the equality
    contract in ops/rescore.py): the inverted layout carries exactly
    the information the doc-major table does, so the candidate-local
    gather must reproduce the full-body BM25 bit-for-bit (f32)."""
    from advanced_rag_tpu.ops.postings import build_postings
    from advanced_rag_tpu.ops.rescore import (
        exact_tier_scores, exact_tier_scores_postings)

    _, emb, doc_idx, doc_tf, doc_len, df = _corpus(rng, n=200)
    n = emb.shape[0]
    post_rows, post_tf = build_postings(doc_idx, doc_tf, 2048, cap=n)
    q_dense = rng.standard_normal((3, emb.shape[1])).astype(np.float32)
    q_dense /= np.linalg.norm(q_dense, axis=1, keepdims=True)
    q_idx, q_tf = encode_queries(
        ["alpha fox query", "beta gamma doc", "delta"], 2048, 16)
    cand = rng.integers(0, n, (3, 8)).astype(np.int32)
    cand[0, 3] = -1                                  # padded candidate
    valid = np.ones(n, bool)
    valid[n - 5:] = False                            # some deleted rows

    common = (jnp.asarray(cand), jnp.asarray(q_dense), jnp.asarray(q_idx),
              jnp.asarray(q_tf), jnp.asarray(emb))
    tail = (jnp.asarray(doc_len), jnp.asarray(df), jnp.float32(n - 5))
    d1, s1 = exact_tier_scores(
        *common, jnp.asarray(doc_idx), jnp.asarray(doc_tf), *tail,
        valid=jnp.asarray(valid))
    d2, s2 = exact_tier_scores_postings(
        *common, jnp.asarray(post_rows), jnp.asarray(post_tf), *tail,
        valid=jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                               rtol=1e-5, atol=1e-5)
    assert s1[0, 3] == 0.0 and d2[0, 3] == 0.0       # pads score 0


def test_rescore_postings_truncation_underestimates(rng):
    """With a cap smaller than a term's df, dropped (doc, term) slots
    score 0 — the same documented underestimate as the postings scan
    tier, never an overestimate."""
    from advanced_rag_tpu.ops.postings import build_postings
    from advanced_rag_tpu.ops.rescore import (
        exact_tier_scores, exact_tier_scores_postings)

    _, emb, doc_idx, doc_tf, doc_len, df = _corpus(rng, n=200)
    n = emb.shape[0]
    post_rows, post_tf = build_postings(doc_idx, doc_tf, 2048, cap=4)
    q_dense = rng.standard_normal((2, emb.shape[1])).astype(np.float32)
    q_idx, q_tf = encode_queries(["alpha beta gamma", "fox query"], 2048, 16)
    cand = rng.integers(0, n, (2, 10)).astype(np.int32)
    common = (jnp.asarray(cand), jnp.asarray(q_dense), jnp.asarray(q_idx),
              jnp.asarray(q_tf), jnp.asarray(emb))
    tail = (jnp.asarray(doc_len), jnp.asarray(df), jnp.float32(n))
    _, s_full = exact_tier_scores(
        *common, jnp.asarray(doc_idx), jnp.asarray(doc_tf), *tail)
    _, s_trunc = exact_tier_scores_postings(
        *common, jnp.asarray(post_rows), jnp.asarray(post_tf), *tail)
    assert (np.asarray(s_trunc) <= np.asarray(s_full) + 1e-5).all()
