"""Index layer: corpus store append/delete/filters, dense/sparse indexes,
multi-index manager ingest + search (SURVEY.md §4: FakeIndexBackend-style
pipeline tests — but ours exercise the REAL device index on CPU)."""

import numpy as np
import pytest

from advanced_rag_tpu.config import IndexConfig, IndexType, Metric
from advanced_rag_tpu.index import (
    ChunkRecord,
    CorpusStore,
    DenseIndex,
    MultiIndexManager,
    SparseIndex,
)
from advanced_rag_tpu.models import HashingEmbedder
from advanced_rag_tpu.utils.exceptions import ValidationError


def make_records(n, doc="d0", t0=1000.0):
    return [
        ChunkRecord(
            chunk_id=f"{doc}-c{i}",
            doc_id=doc,
            content=f"chunk {i} content about topic {i % 3}",
            chunk_index=i,
            token_count=5,
            entropy=0.1 * i,
            domain_density=0.05 * i,
            timestamp=t0 + i,
        )
        for i in range(n)
    ]


class TestCorpusStore:
    def test_append_and_rows(self):
        store = CorpusStore(min_capacity=8)
        rows = store.append(make_records(5))
        assert rows == [0, 1, 2, 3, 4]
        assert store.size == 5 and store.n_valid() == 5

    def test_idempotent_reingest(self):
        store = CorpusStore(min_capacity=8)
        recs = make_records(3)
        rows1 = store.append(recs)
        rows2 = store.append(recs)
        assert rows1 == rows2
        assert store.size == 3

    def test_intra_batch_duplicates(self):
        store = CorpusStore(min_capacity=8)
        recs = make_records(2) + make_records(2)  # same ids twice
        rows = store.append(recs)
        assert rows == [0, 1, 0, 1]
        assert store.size == 2

    def test_capacity_growth(self):
        store = CorpusStore(min_capacity=4)
        store.append(make_records(10))
        assert store.capacity >= 10 and store.size == 10
        assert store.n_valid() == 10
        assert np.asarray(store.valid_mask).sum() == 10

    def test_delete_and_forget(self):
        store = CorpusStore(min_capacity=8)
        store.append(make_records(4))
        assert store.delete_rows([1, 2], forget_content=True) == 2
        assert store.n_valid() == 2
        assert store.contents[1] is None
        # double delete is a no-op
        assert store.delete_rows([1]) == 0

    def test_rows_for_doc(self):
        store = CorpusStore(min_capacity=8)
        store.append(make_records(3, doc="a"))
        store.append(make_records(2, doc="b"))
        assert store.rows_for_doc("a") == [0, 1, 2]
        assert store.rows_for_doc("b") == [3, 4]

    def test_filter_masks(self):
        store = CorpusStore(min_capacity=8)
        store.append(make_records(5, doc="a", t0=100.0))
        store.append(make_records(2, doc="b", t0=500.0))
        m = np.asarray(store.build_filter_mask({"doc_id": "a"}))
        assert m[:5].all() and not m[5:7].any()
        m = np.asarray(store.build_filter_mask({"timestamp": {"gte": 500.0}}))
        assert m[5:7].all() and not m[:5].any()
        m = np.asarray(store.build_filter_mask(
            {"doc_id": "a", "chunk_index": {"in": [0, 2]}}))
        assert m[:5].tolist() == [True, False, True, False, False]

    def test_filter_whitelist_enforced(self):
        store = CorpusStore(min_capacity=8)
        store.append(make_records(2))
        with pytest.raises(ValidationError):
            store.build_filter_mask({"content": "x"})
        with pytest.raises(ValidationError):
            store.build_filter_mask({"doc_id": {"regex": ".*"}})
        with pytest.raises(ValidationError):
            store.build_filter_mask({"doc_id": {"in": []}})
        with pytest.raises(ValidationError):
            store.build_filter_mask({"timestamp": "not-a-number"})

    def test_filter_excludes_deleted(self):
        store = CorpusStore(min_capacity=8)
        store.append(make_records(3))
        store.delete_rows([0])
        m = np.asarray(store.build_filter_mask({"doc_id": "d0"}))
        assert m.tolist()[:3] == [False, True, True]


class TestDenseIndex:
    def test_append_search_alignment(self, rng):
        idx = DenseIndex(IndexConfig(dim=16, min_capacity=8,
                                     metric=Metric.COSINE))
        vecs = rng.standard_normal((10, 16)).astype(np.float32)
        idx.append(0, vecs)
        import jax.numpy as jnp
        mask = jnp.asarray(np.arange(idx.capacity) < 10)
        scores, rows = idx.search(vecs[3], 1, mask)
        assert np.asarray(rows)[0, 0] == 3
        assert np.asarray(scores)[0, 0] == pytest.approx(1.0, abs=1e-2)

    def test_growth_preserves_vectors(self, rng):
        idx = DenseIndex(IndexConfig(dim=8, min_capacity=4))
        v1 = rng.standard_normal((3, 8)).astype(np.float32)
        v2 = rng.standard_normal((30, 8)).astype(np.float32)
        idx.append(0, v1)
        idx.append(3, v2)
        import jax.numpy as jnp
        mask = jnp.asarray(np.arange(idx.capacity) < 33)
        scores, rows = idx.search(v1[1], 1, mask)
        assert np.asarray(rows)[0, 0] == 1

    def test_dim_mismatch_raises(self):
        idx = DenseIndex(IndexConfig(dim=8))
        with pytest.raises(ValueError):
            idx.append(0, np.zeros((2, 16), np.float32))


class TestSparseIndex:
    def test_append_search(self):
        idx = SparseIndex(IndexConfig(vocab_size=2048, doc_nnz=16,
                                      min_capacity=4))
        idx.append_texts(0, [
            "tpu matrix multiplication systolic array",
            "cats and dogs as pets",
            "tpu mxu hardware acceleration",
        ])
        import jax.numpy as jnp
        mask = jnp.asarray(np.arange(idx.capacity) < 3)
        scores, rows = idx.search_texts(["tpu hardware"], 3, mask)
        top = np.asarray(rows)[0]
        assert top[0] == 2  # both terms hit doc 2
        assert idx.n_docs == 3

    def test_remove_rows_updates_df(self):
        idx = SparseIndex(IndexConfig(vocab_size=2048, doc_nnz=16,
                                      min_capacity=4))
        idx.append_texts(0, ["alpha beta", "alpha gamma"])
        df_before = int(np.asarray(idx.df).sum())
        idx.remove_rows([0])
        assert int(np.asarray(idx.df).sum()) < df_before
        assert idx.n_docs == 1


class TestMultiIndexManager:
    @pytest.fixture
    def manager(self):
        return MultiIndexManager(
            embedder=HashingEmbedder(dim=32, vocab_size=2048, doc_nnz=32),
            enable_sparse=True,
            enable_domain=True,
            domain_embedder=HashingEmbedder(dim=16, vocab_size=1024,
                                            doc_nnz=16, seed=5),
        )

    def test_ingest_and_search_all_families(self, manager):
        report = manager.index_chunks(make_records(6, doc="docA"))
        assert report["indexed"] == 6 and not report["errors"]
        for family in ("semantic", "sparse", "domain"):
            hits = manager.search_sync(family, "chunk 2 content topic", 3)
            assert hits, family
            assert {"chunk_id", "doc_id", "content", "score", "method"} <= set(hits[0])
        stats = manager.get_collection_stats()
        assert stats["store"]["valid"] == 6
        assert stats["semantic"]["rows"] == 6

    def test_search_with_filters(self, manager):
        manager.index_chunks(make_records(4, doc="a", t0=10.0))
        manager.index_chunks(make_records(4, doc="b", t0=900.0))
        hits = manager.search_sync("semantic", "chunk content", 8,
                                   filters={"doc_id": "b"})
        assert hits and all(h["doc_id"] == "b" for h in hits)

    def test_search_empty_corpus(self, manager):
        assert manager.search_sync("semantic", "anything", 5) == []

    def test_per_chunk_error_capture(self, manager):
        class Bad:
            content = ""
        report = manager.index_chunks([Bad()] + make_records(2))
        assert report["indexed"] == 2
        assert len(report["errors"]) == 1

    def test_delete_by_filter(self, manager):
        manager.index_chunks(make_records(4, doc="gone"))
        manager.index_chunks(make_records(4, doc="kept"))
        deleted = manager.delete_by_filter({"doc_id": "gone"},
                                           forget_content=True)
        assert deleted == 4
        hits = manager.search_sync("semantic", "chunk content", 8)
        assert all(h["doc_id"] == "kept" for h in hits)
        # sparse path too
        hits = manager.search_sync("sparse", "chunk content", 8)
        assert all(h["doc_id"] == "kept" for h in hits)

    def test_reingest_idempotent(self, manager):
        recs = make_records(3)
        manager.index_chunks(recs)
        before = manager.get_collection_stats()["store"]["size"]
        manager.index_chunks(recs)
        assert manager.get_collection_stats()["store"]["size"] == before

    def test_search_k_clamped_and_validated(self, manager):
        manager.index_chunks(make_records(2))
        with pytest.raises(ValidationError):
            manager.search_sync("semantic", "x", 0)
        hits = manager.search_sync("semantic", "chunk", 10_000)
        assert len(hits) <= manager.config.retrieval.max_top_k

    def test_async_search(self, manager):
        import asyncio

        manager.index_chunks(make_records(3))
        hits = asyncio.run(manager.search("semantic", "chunk content", 2))
        assert len(hits) == 2


class TestBulkLoad:
    def test_bulk_load_matches_append(self):
        from advanced_rag_tpu.config import IndexConfig
        from advanced_rag_tpu.index.dense_index import DenseIndex

        rng = np.random.default_rng(0)
        v = rng.standard_normal((300, 32)).astype(np.float32)
        a = DenseIndex(IndexConfig(dim=32, min_capacity=64))
        a.append(0, v)
        b = DenseIndex(IndexConfig(dim=32, min_capacity=64))
        start = b.bulk_load(v)
        assert start == 0 and b.size == 300
        q = v[:3]
        sa, ia = a.search(q, 5)
        sb, ib = b.search(q, 5)
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
        np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                                   rtol=1e-5, atol=1e-6)

    def test_bulk_load_pre_normalized_skips_host_pass(self):
        from advanced_rag_tpu.config import IndexConfig
        from advanced_rag_tpu.index.dense_index import DenseIndex

        rng = np.random.default_rng(1)
        v = rng.standard_normal((128, 16)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        idx = DenseIndex(IndexConfig(dim=16, min_capacity=64))
        idx.bulk_load(v, pre_normalized=True)
        s, i = idx.search(v[:2], 1)
        assert np.asarray(i)[0, 0] == 0
        assert np.asarray(s)[0, 0] == pytest.approx(1.0, abs=1e-2)
        # mirror holds the vectors verbatim (no second normalize)
        np.testing.assert_array_equal(idx._host[:128], v)

    def test_bulk_load_sq8_and_pq_tiers(self):
        from advanced_rag_tpu.config import IndexConfig
        from advanced_rag_tpu.index.dense_index import DenseIndex

        rng = np.random.default_rng(2)
        v = rng.standard_normal((256, 32)).astype(np.float32)
        for dtype in ("int8", "pq"):
            idx = DenseIndex(IndexConfig(dim=32, dtype=dtype,
                                         min_capacity=64))
            idx.bulk_load(v)
            if dtype == "pq":
                idx.build_pq()
            s, i = idx.search(v[:4], 3)
            assert (np.asarray(i)[:, 0] == np.arange(4)).all()


class TestConcurrentIngest:
    def test_concurrent_duplicate_ingest_serializes(self):
        """Two threads ingesting the same batch concurrently (the
        service's client-disconnect + retry shape) must leave the store
        and every index family aligned, with all rows searchable the
        moment either call returns."""
        import threading

        from advanced_rag_tpu.config import PipelineConfig
        from advanced_rag_tpu.index.corpus import ChunkRecord
        from advanced_rag_tpu.index.manager import MultiIndexManager

        mgr = MultiIndexManager(config=PipelineConfig())
        chunks = [ChunkRecord(chunk_id=f"c{j}", doc_id="d0",
                              content=f"row {j} text payload {j % 7}")
                  for j in range(64)]
        reports = [None, None]

        def go(slot):
            reports[slot] = mgr.index_chunks(chunks)

        threads = [threading.Thread(target=go, args=(s,)) for s in (0, 1)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r["indexed"] == 64 for r in reports)
        st = mgr.get_collection_stats()
        assert st["store"]["size"] == 64
        assert st["semantic"]["rows"] == 64
        assert st["sparse"]["rows"] == 64

    def test_concurrent_distinct_batches_no_row_loss(self):
        import threading

        from advanced_rag_tpu.config import PipelineConfig
        from advanced_rag_tpu.index.corpus import ChunkRecord
        from advanced_rag_tpu.index.manager import MultiIndexManager

        mgr = MultiIndexManager(config=PipelineConfig())

        def batch(tag):
            return [ChunkRecord(chunk_id=f"{tag}{j}", doc_id=tag,
                                content=f"{tag} content row {j}")
                    for j in range(40)]

        threads = [threading.Thread(target=mgr.index_chunks,
                                    args=(batch(t),)) for t in ("a", "b")]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        st = mgr.get_collection_stats()
        assert st["store"]["size"] == 80
        assert st["semantic"]["rows"] == 80
        assert st["sparse"]["rows"] == 80
        # every row retrievable through the fused hybrid path
        hits = mgr.hybrid_search_batch_sync(["a content row 7"], 5)[0]
        assert any(h["chunk_id"] == "a7" for h in hits)
        hits = mgr.hybrid_search_batch_sync(["b content row 3"], 5)[0]
        assert any(h["chunk_id"] == "b3" for h in hits)


def test_embedding_cache_isolated_between_different_embedders():
    """Two managers with DIFFERENT same-dimension embedders must not
    exchange cache entries: the module-level caches key on text, and
    before the per-embedder namespace tag a second manager silently
    scored the first model's cached corpus vectors (top-1 recall 0.01)."""
    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager
    from advanced_rag_tpu.models.embedder import HashingEmbedder

    texts = [f"shared corpus text {i} about topic {i % 3}" for i in range(8)]
    recs = [ChunkRecord(chunk_id=str(i), doc_id=f"d{i}", content=t)
            for i, t in enumerate(texts)]
    e1 = HashingEmbedder(dim=48, seed=1)
    e2 = HashingEmbedder(dim=48, seed=2)     # same dim, different model
    m1 = MultiIndexManager(PipelineConfig(), embedder=e1)
    m1.index_chunks(recs)
    m2 = MultiIndexManager(PipelineConfig(), embedder=e2)
    m2.index_chunks(recs)
    v1 = np.asarray(m1.semantic.get_vectors(np.asarray([0])))
    v2 = np.asarray(m2.semantic.get_vectors(np.asarray([0])))
    # different embedders => different vectors for the same text
    assert not np.allclose(v1, v2, atol=1e-3)
    np.testing.assert_allclose(
        v2[0], e2.encode([texts[0]])[0], rtol=1e-3, atol=1e-3)
    # identical deterministic embedders DO share (same tag)
    e3 = HashingEmbedder(dim=48, seed=1)
    assert e3.cache_tag == e1.cache_tag
