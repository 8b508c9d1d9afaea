"""Regression tests pinning the reference's known bugs as ABSENT here.

The reference ships four latent defects we deliberately did not
replicate (SURVEY.md §7 "quirks to NOT replicate").  These tests name
each quirk and assert the fixed behavior, so a future refactor cannot
silently re-introduce them:

1. /chat/stream NameError — reference service.py:711-725 calls
   undefined ``_cb_check_open``/``_cb_record_*`` helpers, so the SSE
   path 500s the moment the breaker is consulted.
2. Shared-config mutation per request — reference retrieval.py:284
   mutates ``self.config`` inside ``_retrieve_inner`` (race under
   concurrency, acknowledged at service.py:166-168).
3. Drift deque slicing — reference evaluation.py:85,:404 slices a
   ``deque`` with ``[-100:]`` (TypeError) and silently reassigns the
   capped histories to plain lists (:465-467).
4. Global experiment variant mutation — reference service.py:161-183
   writes the chosen variant's knobs into the SHARED retriever config.
"""

import asyncio
import dataclasses

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from advanced_rag_tpu.config import PipelineConfig
from advanced_rag_tpu.pipeline import AdvancedRAGPipeline
from advanced_rag_tpu.service import create_app
from advanced_rag_tpu.utils.db_pool import DatabasePool

DOCS = [
    {"doc_id": "a", "content": "Dense retrieval embeds queries and "
     "documents into one vector space for nearest neighbour search."},
    {"doc_id": "b", "content": "Sparse BM25 retrieval matches lexical "
     "terms with inverse document frequency weighting."},
]


@pytest.fixture
async def served(loop, tmp_path, monkeypatch):
    monkeypatch.delenv("API_KEY", raising=False)
    pipeline = AdvancedRAGPipeline(PipelineConfig())
    db = DatabasePool(sqlite_path=str(tmp_path / "chat.db"))
    app = create_app(pipeline=pipeline, db=db)
    client = TestClient(TestServer(app))
    await client.start_server()
    yield client, app["state"]
    await client.close()


class TestChatStreamBreakerQuirk:
    """Quirk 1: the SSE path must survive an OPEN circuit breaker with a
    clean SSE error event — never a NameError/500 (ref service.py:711-725)."""

    async def test_stream_with_open_breaker_sends_error_event(self, served):
        client, state = served
        # trip the breaker to OPEN
        for _ in range(state.breaker.config.failure_threshold + 1):
            state.breaker.record_failure()
        assert state.breaker.is_open
        resp = await client.get("/chat/stream",
                                params={"message": "anything"})
        assert resp.status == 200          # SSE stream, not a 500
        body = (await resp.read()).decode()
        assert "event: error" in body
        assert "NameError" not in body

    async def test_stream_happy_path_emits_tokens_and_done(self, served):
        client, _ = served
        await client.post("/ingest", json={"documents": DOCS})
        resp = await client.get("/chat/stream",
                                params={"message": "what is BM25?"})
        body = (await resp.read()).decode()
        assert "event: token" in body and "event: done" in body


class TestSharedConfigMutationQuirk:
    """Quirks 2+4: a retrieve with profile/variant overrides must leave
    the shared RetrievalConfig bit-identical (ref retrieval.py:284,
    service.py:161-183)."""

    async def test_retrieval_config_unchanged_across_profiles(self):
        pipeline = AdvancedRAGPipeline(PipelineConfig())
        pipeline.ingest_documents(DOCS)
        retriever = pipeline.retriever
        before = dataclasses.asdict(retriever.config)
        # different query classes select different profiles (the path
        # where the reference mutates self.config)
        for q in ("how do I fix this error in retrieval",
                  "summarize the documents",
                  "what is BM25?",
                  "analyse the role of inverse document frequency "
                  "weighting across long analytical queries " * 3):
            await retriever.retrieve(q, top_k=2)
        assert dataclasses.asdict(retriever.config) == before

    async def test_variant_override_does_not_touch_shared_config(self, served):
        client, state = served
        await client.post("/ingest", json={"documents": DOCS})
        retriever = state.pipeline.retriever
        before = dataclasses.asdict(retriever.config)
        # epsilon=1 -> always explore, so non-baseline variants get picked
        state.experiments.epsilon = 1.0
        for _ in range(6):
            resp = await client.post("/retrieve",
                                     json={"query": "dense vs sparse"})
            assert resp.status == 200
        assert dataclasses.asdict(retriever.config) == before


class TestDriftHistoryQuirk:
    """Quirk 3: drift detection over >100 queries must neither raise
    (deque slicing) nor let histories grow unbounded / change type
    (ref evaluation.py:85,:404,:465-467)."""

    def test_drift_over_deep_history_caps_and_types(self):
        pipeline = AdvancedRAGPipeline(PipelineConfig())
        pipeline.ingest_documents(DOCS)
        ev = pipeline.evaluator
        ev.history_maxlen = 120
        rng = np.random.default_rng(0)
        dim = pipeline.config.semantic_dim
        for i in range(150):   # > the [-100:] window AND > maxlen
            ev.evaluate_retrieval(
                f"query {i}",
                [{"chunk_id": "c1", "content": "alpha beta", "score": 0.9},
                 {"chunk_id": "c2", "content": "gamma delta", "score": 0.4}],
                query_embedding=rng.standard_normal(dim),
            )
        report = pipeline.detect_drift()    # must not raise
        assert report is not None
        assert len(ev.query_history) <= ev.history_maxlen
        # histories keep their declared type after capping
        assert isinstance(ev.query_history, list)
        assert isinstance(ev.embedding_history, list)
