"""Fault injection: timeout degradation, breaker integration, error paths
(reference test_extended.py:334-361 pattern — monkeypatched slowness)."""

import time

import pytest

from advanced_rag_tpu.config import RetrievalConfig
from advanced_rag_tpu.index.corpus import ChunkRecord
from advanced_rag_tpu.index.manager import MultiIndexManager
from advanced_rag_tpu.pipeline.retrieval import HybridRetriever
from advanced_rag_tpu.utils.exceptions import ValidationError


def _manager():
    m = MultiIndexManager()
    m.index_chunks([
        ChunkRecord(chunk_id=f"c{i}", doc_id="d", content=f"alpha topic {i}")
        for i in range(10)
    ])
    return m


class TestTimeoutDegradation:
    def test_slow_search_degrades_to_empty(self, monkeypatch):
        m = _manager()
        r = HybridRetriever(m, RetrievalConfig(enable_micro_batching=False))
        r.retrieve_sync("warm up")  # compile within cold budget

        def slow_batch(queries, k, **kw):
            time.sleep(1.0)
            return [[] for _ in queries]

        monkeypatch.setattr(m, "hybrid_search_batch_sync", slow_batch)
        t0 = time.perf_counter()
        out = r.retrieve_sync("alpha", timeout_s=0.05)
        assert out == []
        assert time.perf_counter() - t0 < 0.5

    def test_internal_error_degrades_to_empty(self, monkeypatch):
        m = _manager()
        r = HybridRetriever(m, RetrievalConfig(enable_micro_batching=False))
        r.retrieve_sync("warm up")

        def boom(queries, k, **kw):
            raise RuntimeError("device fell over")

        monkeypatch.setattr(m, "hybrid_search_batch_sync", boom)
        assert r.retrieve_sync("alpha") == []

    def test_validation_error_propagates(self):
        m = _manager()
        r = HybridRetriever(m, RetrievalConfig(enable_micro_batching=False))
        r.retrieve_sync("warm up")
        with pytest.raises(ValidationError):
            r.retrieve_sync("alpha", filters={"bogus_field": 1})

    def test_empty_query_returns_empty(self):
        r = HybridRetriever(_manager(), RetrievalConfig())
        assert r.retrieve_sync("") == []
        assert r.retrieve_sync("   ") == []


class TestEmptyCorpus:
    def test_search_empty_corpus(self):
        m = MultiIndexManager()
        assert m.hybrid_search_sync("anything", 5) == []

    def test_k_larger_than_corpus(self):
        m = _manager()
        hits = m.hybrid_search_sync("alpha topic", 50)
        assert 0 < len(hits) <= 10

    def test_invalid_k(self):
        m = _manager()
        with pytest.raises(ValidationError):
            m.hybrid_search_sync("x", 0)

    def test_closed_manager_raises(self):
        from advanced_rag_tpu.utils.exceptions import IndexingError

        m = _manager()
        m.close()
        with pytest.raises(IndexingError):
            m.hybrid_search_sync("x", 5)
