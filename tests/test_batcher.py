"""Micro-batcher: coalescing, key isolation, error propagation, and
end-to-end concurrent retrieval through the real retriever."""

import concurrent.futures
import threading
import time

import pytest

from advanced_rag_tpu.config import PipelineConfig, RetrievalConfig
from advanced_rag_tpu.index.corpus import ChunkRecord
from advanced_rag_tpu.index.manager import MultiIndexManager
from advanced_rag_tpu.pipeline.batcher import MicroBatcher
from advanced_rag_tpu.pipeline.retrieval import HybridRetriever


class TestMicroBatcher:
    def test_coalesces_concurrent_requests(self):
        calls = []

        def batch_fn(queries, **kw):
            calls.append(list(queries))
            time.sleep(0.01)
            return [q.upper() for q in queries]

        # one dispatcher: whatever queues during an in-flight dispatch
        # MUST coalesce into the next grab (continuous batching)
        mb = MicroBatcher(batch_fn, max_batch=8, max_inflight=1)
        with concurrent.futures.ThreadPoolExecutor(8) as pool:
            futs = [pool.submit(mb.submit, "key", f"q{i}") for i in range(8)]
            results = [f.result() for f in futs]
        assert sorted(results) == [f"Q{i}" for i in range(8)]
        assert len(calls) <= 4  # mostly coalesced (scheduling-dependent)
        assert mb.stats["max_seen"] >= 4
        mb.close()

    def test_distinct_keys_do_not_mix(self):
        def batch_fn(queries, **kw):
            return [kw["tag"] + q for q in queries]

        mb = MicroBatcher(batch_fn, max_wait_s=0.01)
        with concurrent.futures.ThreadPoolExecutor(4) as pool:
            a = pool.submit(mb.submit, ("a",), "x", tag="A:")
            b = pool.submit(mb.submit, ("b",), "y", tag="B:")
            assert a.result() == "A:x"
            assert b.result() == "B:y"

    def test_error_propagates_to_all(self):
        def batch_fn(queries, **kw):
            raise RuntimeError("boom")

        mb = MicroBatcher(batch_fn, max_wait_s=0.02)
        with concurrent.futures.ThreadPoolExecutor(3) as pool:
            futs = [pool.submit(mb.submit, "k", f"q{i}") for i in range(3)]
            for f in futs:
                with pytest.raises(RuntimeError):
                    f.result()


class TestRetrieverBatching:
    def test_concurrent_retrieves_coalesce_and_match_serial(self):
        manager = MultiIndexManager()
        manager.index_chunks([
            ChunkRecord(chunk_id=f"c{i}", doc_id=f"d{i % 3}",
                        content=f"topic {'alpha' if i % 2 else 'beta'} item {i}")
            for i in range(40)
        ])
        cfg = RetrievalConfig(enable_micro_batching=True,
                              micro_batch_wait_ms=20.0, timeout_seconds=60.0)
        r = HybridRetriever(manager, cfg)
        r.retrieve_sync("warm up alpha")  # compile

        query = "alpha topic"
        serial = r.retrieve_sync(query)

        barrier = threading.Barrier(6)

        def worker():
            barrier.wait()
            return r.retrieve_sync(query)

        with concurrent.futures.ThreadPoolExecutor(6) as pool:
            futs = [pool.submit(worker) for _ in range(6)]
            results = [f.result() for f in futs]
        for res in results:
            assert [h["chunk_id"] for h in res] == [h["chunk_id"] for h in serial]
        assert r._batcher.stats["max_seen"] >= 2
