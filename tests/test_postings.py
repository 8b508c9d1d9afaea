"""Inverted postings-list BM25 == the slot-scan oracle (when no query
term's df exceeds the cap)."""

import jax.numpy as jnp
import numpy as np
import pytest

from advanced_rag_tpu.index.text import encode_documents, encode_queries
from advanced_rag_tpu.ops.postings import (
    auto_postings_cap,
    build_postings,
    postings_topk,
)
from advanced_rag_tpu.ops.sparse import sparse_topk


def _sorted_rows(scores, ids):
    """Canonicalize by (rounded -score, id): the postings path computes
    segment sums via cumsum differences (~1e-6 relative noise), so ties
    are compared at 1e-4 granularity."""
    s = np.round(np.asarray(scores, np.float64), 4)
    order = np.lexsort((np.asarray(ids), -s), axis=-1)
    return (np.take_along_axis(np.asarray(scores), order, -1),
            np.take_along_axis(np.asarray(ids), order, -1))


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    texts = [
        f"doc {i} " + " ".join(rng.choice(
            ["alpha", "beta", "gamma", "delta", "fox", "zeta", "eta",
             "theta"], 10).tolist())
        for i in range(400)
    ]
    vocab, nnz = 2048, 24
    doc_idx, doc_tf, doc_len, df = encode_documents(texts, vocab, nnz)
    cap = auto_postings_cap(len(texts), nnz, vocab)
    # this corpus has ~8 content terms -> df up to ~400; cap must cover
    cap = max(cap, 512)
    post_rows, post_tf = build_postings(doc_idx, doc_tf, vocab, cap)
    return (doc_idx, doc_tf, doc_len, df, post_rows, post_tf, vocab,
            len(texts))


class TestPostingsTopk:
    def test_matches_slot_scan(self, corpus):
        """Same top-k score values; every returned id is a valid top-k
        member of the exact ranking (tied kth-boundary groups may pick
        different — equally correct — subsets)."""
        doc_idx, doc_tf, doc_len, df, post_rows, post_tf, vocab, n = corpus
        q_idx, q_tf = encode_queries(
            ["alpha fox gamma", "zeta theta", "delta"], vocab, 16)

        def run(k):
            return (
                sparse_topk(jnp.asarray(doc_idx), jnp.asarray(doc_tf),
                            jnp.asarray(doc_len), jnp.asarray(df),
                            jnp.float32(n), jnp.asarray(q_idx),
                            jnp.asarray(q_tf), k),
                postings_topk(jnp.asarray(post_rows), jnp.asarray(post_tf),
                              jnp.asarray(doc_len), jnp.asarray(df),
                              jnp.float32(n), jnp.asarray(q_idx),
                              jnp.asarray(q_tf), k),
            )

        (ref_s, _), (got_s, got_i) = run(10)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                                   rtol=1e-4, atol=1e-4)
        # full exact ranking for membership validation
        (full_s, full_i), _ = run(256)
        for q in range(3):
            ref_scores = {int(r): float(s) for s, r in
                          zip(np.asarray(full_s)[q], np.asarray(full_i)[q])
                          if r >= 0}
            kth = np.asarray(ref_s)[q, 9]
            for rid in np.asarray(got_i)[q]:
                assert int(rid) in ref_scores
                assert ref_scores[int(rid)] >= kth - 1e-4

    def test_respects_validity_mask(self, corpus):
        doc_idx, doc_tf, doc_len, df, post_rows, post_tf, vocab, n = corpus
        q_idx, q_tf = encode_queries(["alpha fox"], vocab, 16)
        valid = np.zeros(n, bool)
        valid[:50] = True
        s, i = postings_topk(jnp.asarray(post_rows), jnp.asarray(post_tf),
                             jnp.asarray(doc_len), jnp.asarray(df),
                             jnp.float32(50), jnp.asarray(q_idx),
                             jnp.asarray(q_tf), 10, jnp.asarray(valid))
        ids = np.asarray(i)
        assert ((ids < 50) | (ids == -1)).all()

    def test_no_match_returns_padding(self, corpus):
        _, _, doc_len, df, post_rows, post_tf, vocab, n = corpus
        q_idx = np.full((1, 4), -1, np.int32)
        q_tf = np.zeros((1, 4), np.float32)
        s, i = postings_topk(jnp.asarray(post_rows), jnp.asarray(post_tf),
                             jnp.asarray(doc_len), jnp.asarray(df),
                             jnp.float32(n), jnp.asarray(q_idx),
                             jnp.asarray(q_tf), 5)
        assert (np.asarray(i) == -1).all()

    def test_truncation_keeps_highest_tf(self):
        """Tiny cap: postings keep the highest-tf docs for each term."""
        doc_idx = np.asarray([[5], [5], [5], [5]], np.int32)
        doc_tf = np.asarray([[1.0], [9.0], [3.0], [7.0]], np.float32)
        post_rows, post_tf = build_postings(doc_idx, doc_tf, 8, cap=2)
        assert set(post_rows[5].tolist()) == {1, 3}  # tf 9 and 7 survive

    def test_ip_scoring(self, corpus):
        doc_idx, doc_tf, doc_len, df, post_rows, post_tf, vocab, n = corpus
        q_idx, q_tf = encode_queries(["alpha beta"], vocab, 8)
        ref = sparse_topk(jnp.asarray(doc_idx), jnp.asarray(doc_tf),
                          jnp.asarray(doc_len), jnp.asarray(df),
                          jnp.float32(n), jnp.asarray(q_idx),
                          jnp.asarray(q_tf), 10, scoring="ip")
        got = postings_topk(jnp.asarray(post_rows), jnp.asarray(post_tf),
                            jnp.asarray(doc_len), jnp.asarray(df),
                            jnp.float32(n), jnp.asarray(q_idx),
                            jnp.asarray(q_tf), 10, scoring="ip")
        rs, _ = _sorted_rows(*ref)
        gs, _ = _sorted_rows(*got)
        np.testing.assert_allclose(gs, rs, rtol=1e-4, atol=1e-4)


class TestSparseIndexPostings:
    def test_incremental_append_matches_rebuild(self):
        from advanced_rag_tpu.config import IndexConfig, IndexType
        from advanced_rag_tpu.index.sparse_index import SparseIndex

        idx = SparseIndex(IndexConfig(index_type=IndexType.SPARSE,
                                      vocab_size=2048, doc_nnz=16))
        batch1 = [f"alpha beta doc {i}" for i in range(20)]
        batch2 = [f"gamma fox doc {i}" for i in range(20)]
        idx.append_texts(0, batch1)
        idx.build_postings(cap=64)
        idx.append_texts(20, batch2)  # incremental postings update

        q_idx, q_tf = idx.encode_query(["gamma fox"])
        s_inc, i_inc = idx.search_postings(q_idx, q_tf, 10)

        # rebuild from scratch must agree
        idx.build_postings(cap=64)
        s_rb, i_rb = idx.search_postings(q_idx, q_tf, 10)
        np.testing.assert_allclose(np.asarray(s_inc), np.asarray(s_rb),
                                   rtol=1e-5)
        assert set(np.asarray(i_inc)[0].tolist()) == \
            set(np.asarray(i_rb)[0].tolist())
        # batch2 rows are retrievable through the incremental path
        assert all(r >= 20 for r in np.asarray(i_inc)[0] if r >= 0)

    def test_cap_growth_on_overflow(self):
        from advanced_rag_tpu.config import IndexConfig, IndexType
        from advanced_rag_tpu.index.sparse_index import SparseIndex

        idx = SparseIndex(IndexConfig(index_type=IndexType.SPARSE,
                                      vocab_size=512, doc_nnz=8))
        idx.append_texts(0, ["common term here"] * 4)
        idx.build_postings(cap=4)
        idx.append_texts(4, ["common term here"] * 8)  # overflows cap 4
        assert idx._post_cap >= 8
        q_idx, q_tf = idx.encode_query(["common term"])
        _, i = idx.search_postings(q_idx, q_tf, 12)
        assert (np.asarray(i)[0] >= 0).sum() == 12

    def test_manager_auto_builds_postings(self, monkeypatch):
        from advanced_rag_tpu.index.corpus import ChunkRecord
        from advanced_rag_tpu.index.manager import MultiIndexManager
        from advanced_rag_tpu.index.sparse_index import SparseIndex

        monkeypatch.setattr(SparseIndex, "POSTINGS_AUTO_THRESHOLD", 30)
        m = MultiIndexManager()
        m.index_chunks([
            ChunkRecord(chunk_id=f"c{i}", doc_id="d",
                        content=f"alpha topic item {i}")
            for i in range(40)
        ])
        hits = m.hybrid_search_sync("alpha topic", 5)
        assert hits
        assert m.sparse.has_postings


def test_delete_compaction_drops_dead_postings():
    """maintenance_tick rebuilds postings without deleted rows once the
    stale fraction passes 10% (Milvus-compaction equivalent)."""
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager
    from advanced_rag_tpu.config import PipelineConfig

    mgr = MultiIndexManager(config=PipelineConfig(semantic_dim=16))
    recs = [ChunkRecord(chunk_id=f"c{j}", doc_id=f"d{j}",
                        content=f"word{j} shared common text")
            for j in range(40)]
    mgr.index_chunks(recs)
    mgr.sparse.build_postings()
    assert mgr.sparse.postings_stale_fraction == 0.0

    deleted = mgr.delete_by_filter({"doc_id": {"in": [f"d{j}" for j in range(8)]}})
    assert deleted == 8
    assert mgr.sparse.postings_stale_fraction > 0.10
    out = mgr.maintenance_tick()
    assert out.get("postings_compacted") is True
    assert mgr.sparse.postings_stale_fraction == 0.0
    # dead rows are gone from the lists themselves, not just masked
    import numpy as np
    live = np.asarray(mgr.sparse._post_rows)
    assert not np.isin(live, np.arange(8)).any()
    # search still finds live rows
    s, i = mgr.sparse.search_postings(*mgr.sparse.encode_query(["word20"]), 5)
    assert 20 in np.asarray(i)[0]


class TestPostingsFastPath:
    """Round-5 sparse fast path: scatter aggregation + precomputed BM25
    tf-weights (the 10M sparse stage attribution, docs/PERF.md)."""

    def test_scatter_matches_sort(self, corpus):
        doc_idx, doc_tf, doc_len, df, post_rows, post_tf, vocab, n = corpus
        q_idx, q_tf = encode_queries(
            ["alpha fox gamma", "zeta theta"], vocab, 16)
        args = (jnp.asarray(post_rows), jnp.asarray(post_tf),
                jnp.asarray(doc_len), jnp.asarray(df), jnp.float32(n),
                jnp.asarray(q_idx), jnp.asarray(q_tf), 10)
        s_sort, i_sort = postings_topk(*args, impl="sort")
        s_sc, i_sc = postings_topk(*args, impl="scatter")
        ss, si = _sorted_rows(s_sort, i_sort)
        cs, ci = _sorted_rows(s_sc, i_sc)
        np.testing.assert_allclose(np.asarray(cs), np.asarray(ss),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(ci), np.asarray(si))

    def test_tfw_path_matches_on_the_fly(self, corpus):
        from advanced_rag_tpu.ops.postings import postings_tf_weights

        doc_idx, doc_tf, doc_len, df, post_rows, post_tf, vocab, n = corpus
        avg = float(np.asarray(doc_len)[:n].mean())
        tfw = postings_tf_weights(post_rows, post_tf, doc_len, avg)
        q_idx, q_tf = encode_queries(["alpha fox gamma"], vocab, 16)
        base = (jnp.asarray(post_rows), jnp.asarray(post_tf),
                jnp.asarray(doc_len), jnp.asarray(df), jnp.float32(n),
                jnp.asarray(q_idx), jnp.asarray(q_tf), 10)
        s_ref, i_ref = postings_topk(*base, impl="sort")
        for impl in ("sort", "scatter"):
            s_w, i_w = postings_topk(*base, post_tfw=jnp.asarray(tfw),
                                     impl=impl)
            rs, ri = _sorted_rows(s_ref, i_ref)
            ws, wi = _sorted_rows(s_w, i_w)
            np.testing.assert_allclose(np.asarray(ws), np.asarray(rs),
                                       rtol=1e-3, atol=1e-3)
            np.testing.assert_array_equal(np.asarray(wi), np.asarray(ri))

    def test_scatter_respects_validity(self, corpus):
        doc_idx, doc_tf, doc_len, df, post_rows, post_tf, vocab, n = corpus
        q_idx, q_tf = encode_queries(["alpha fox"], vocab, 16)
        full = postings_topk(
            jnp.asarray(post_rows), jnp.asarray(post_tf),
            jnp.asarray(doc_len), jnp.asarray(df), jnp.float32(n),
            jnp.asarray(q_idx), jnp.asarray(q_tf), 5, impl="scatter")[1]
        banned = {int(r) for r in np.asarray(full)[0] if r >= 0}
        mask = np.ones(doc_len.shape[0], bool)
        mask[list(banned)] = False
        s2, i2 = postings_topk(
            jnp.asarray(post_rows), jnp.asarray(post_tf),
            jnp.asarray(doc_len), jnp.asarray(df), jnp.float32(n),
            jnp.asarray(q_idx), jnp.asarray(q_tf), 5,
            jnp.asarray(mask), impl="scatter")
        assert banned.isdisjoint({int(r) for r in np.asarray(i2)[0]
                                  if r >= 0})

    def test_sparse_index_maintains_tfw_across_appends(self):
        from advanced_rag_tpu.config import PipelineConfig
        from advanced_rag_tpu.index.corpus import ChunkRecord
        from advanced_rag_tpu.index.manager import MultiIndexManager

        mgr = MultiIndexManager(PipelineConfig())
        texts = [f"alpha beta doc{i} gamma delta term{i % 7}"
                 for i in range(64)]
        mgr.index_chunks([ChunkRecord(chunk_id=f"c{i}", doc_id=f"d{i}",
                                      content=t)
                          for i, t in enumerate(texts[:48])])
        mgr.sparse.build_postings()
        assert mgr.sparse.post_tfw is not None
        # appends maintain the tfw mirror incrementally
        mgr.index_chunks([ChunkRecord(chunk_id=f"c{i}", doc_id=f"d{i}",
                                      content=texts[i])
                          for i in range(48, 64)])
        host = mgr.sparse._host_post_tfw
        dev = np.asarray(mgr.sparse.post_tfw, np.float32)
        fill = mgr.sparse._post_fill
        # every filled slot's device tfw matches the host mirror (bf16)
        for t in np.nonzero(fill)[0][:50]:
            np.testing.assert_allclose(dev[t, : fill[t]],
                                       host[t, : fill[t]],
                                       rtol=1e-2, atol=1e-2)
        # and queries over appended rows still match the slot scan
        out = mgr.hybrid_search_batch_sync(["alpha term6"], 5,
                                           use_mmr=False)
        assert out[0]
        mgr.close()
