"""Service layer: endpoints, auth, rate limits, breaker, chat, SSE.

Mirrors the reference test strategy (SURVEY.md §4): the service runs
against the REAL pipeline + device index (CPU mesh), no fakes needed —
the index lives in process memory, so "integration" tests are cheap.
"""

import asyncio
import json

import pytest
from aiohttp.test_utils import TestClient, TestServer

from advanced_rag_tpu.config import PipelineConfig
from advanced_rag_tpu.pipeline import AdvancedRAGPipeline
from advanced_rag_tpu.service import create_app
from advanced_rag_tpu.utils.db_pool import DatabasePool

DOCS = [
    {"doc_id": "tpu", "content": "TPU systolic arrays excel at matrix "
     "multiplication. XLA fuses operations for throughput."},
    {"doc_id": "rag", "content": "Hybrid retrieval fuses dense embeddings "
     "with sparse BM25 scores using reciprocal rank fusion."},
]


@pytest.fixture
async def client(loop, tmp_path, monkeypatch):
    monkeypatch.delenv("API_KEY", raising=False)
    pipeline = AdvancedRAGPipeline(PipelineConfig())
    db = DatabasePool(sqlite_path=str(tmp_path / "chat.db"))
    app = create_app(pipeline=pipeline, db=db)
    client = TestClient(TestServer(app))
    await client.start_server()
    yield client
    await client.close()


async def _ingest(client):
    resp = await client.post("/ingest", json={"documents": DOCS})
    assert resp.status == 200
    return await resp.json()


class TestEndpoints:
    async def test_healthz(self, client):
        resp = await client.get("/healthz")
        assert resp.status == 200
        data = await resp.json()
        assert data["status"] == "ok"
        assert "index" in data["dependencies"]
        assert resp.headers.get("X-Request-ID")

    async def test_ingest_and_retrieve(self, client):
        report = await _ingest(client)
        assert report["indexed"] > 0
        resp = await client.post("/retrieve", json={
            "query": "how does hybrid retrieval fuse scores?"})
        assert resp.status == 200
        data = await resp.json()
        assert data["results"]
        assert data["results"][0]["doc_id"] == "rag"
        assert "hallucination_risk" in data["metrics"]

    async def test_retrieve_validation(self, client):
        resp = await client.post("/retrieve", json={"query": ""})
        assert resp.status == 400
        resp = await client.post("/retrieve", json={"query": "x" * 5000})
        assert resp.status == 400

    async def test_ingest_validation(self, client):
        resp = await client.post("/ingest", json={"documents": []})
        assert resp.status == 400
        resp = await client.post("/ingest", json={
            "documents": [{"content": "x" * 1_100_000}]})
        assert resp.status == 413

    async def test_filters_rejected_on_bad_field(self, client):
        await _ingest(client)
        resp = await client.post("/retrieve", json={
            "query": "anything", "filters": {"nasty_field": 1}})
        assert resp.status == 400

    async def test_metrics_endpoint(self, client):
        resp = await client.get("/metrics")
        assert resp.status == 200
        body = await resp.text()
        assert "rag_api_requests_total" in body

    async def test_feedback(self, client):
        resp = await client.post("/feedback", json={
            "session_id": "s1", "message_id": 1, "positive": True})
        assert resp.status == 200

    async def test_eval_run(self, client):
        await _ingest(client)
        resp = await client.post("/eval/run", json={"cases": [
            {"query": "hybrid retrieval fusion", "relevant_ids": []},
        ]})
        assert resp.status == 200
        data = await resp.json()
        assert data["cases"] == 1

    async def test_perf_and_drift(self, client):
        await _ingest(client)
        await client.post("/retrieve", json={"query": "fusion"})
        resp = await client.get("/perf")
        assert (await resp.json())["retrieve_ms"]["count"] >= 1
        resp = await client.post("/drift", json={})
        assert resp.status == 200

    async def test_quality_gauges_exported(self, client):
        """The alert-rule gauges (observability/alerts/rag_alerts.yaml,
        ref ARCHITECTURE.md:369-373) are set by /retrieve and /drift."""
        await _ingest(client)
        await client.post("/retrieve", json={"query": "fusion"})
        await client.post("/drift", json={})
        body = await (await client.get("/metrics")).text()
        assert "rag_hallucination_risk" in body
        assert "rag_drift_magnitude" in body
        line = [ln for ln in body.splitlines()
                if ln.startswith("rag_sla_compliance_ratio ")]
        assert line and 0.0 <= float(line[0].split()[-1]) <= 1.0

    async def test_etl_run(self, client, tmp_path):
        (tmp_path / "a.txt").write_text("alpha document about vectors")
        (tmp_path / "b.md").write_text("beta document about sparse scoring")
        resp = await client.post("/etl/run", json={"root": str(tmp_path)})
        data = await resp.json()
        assert data["documents"] == 2


class TestChat:
    async def test_chat_roundtrip(self, client):
        await _ingest(client)
        resp = await client.post("/chat", json={
            "message": "what fuses dense and sparse scores?"})
        assert resp.status == 200
        data = await resp.json()
        assert data["answer"]
        assert data["citations"]
        assert len(data["suggestions"]) == 4
        session = data["session_id"]

        resp = await client.get(f"/chat/history/{session}")
        hist = await resp.json()
        roles = [m["role"] for m in hist["messages"]]
        assert roles == ["user", "assistant"]

        resp = await client.get("/chat/sessions")
        assert len((await resp.json())["sessions"]) == 1

        resp = await client.delete(f"/chat/clear/{session}")
        assert resp.status == 200
        resp = await client.get(f"/chat/history/{session}")
        assert (await resp.json())["messages"] == []

    async def test_chat_stream_sse(self, client):
        await _ingest(client)
        resp = await client.get("/chat/stream",
                                params={"message": "hybrid retrieval?"})
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        raw = (await resp.read()).decode()
        events = [e for e in raw.split("\n\n") if e.strip()]
        kinds = [e.split("\n")[0].split(": ")[1] for e in events]
        assert kinds[-1] == "done"
        assert "token" in kinds
        done = json.loads(events[-1].split("data: ")[1])
        assert done["suggestions"]


class TestAuthAndLimits:
    async def test_api_key(self, loop, tmp_path, monkeypatch):
        monkeypatch.setenv("API_KEY", "secret")
        pipeline = AdvancedRAGPipeline(PipelineConfig())
        db = DatabasePool(sqlite_path=str(tmp_path / "c.db"))
        app = create_app(pipeline=pipeline, db=db)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.post("/retrieve", json={"query": "x"})
            assert resp.status == 401
            resp = await client.post("/retrieve", json={"query": "x"},
                                     headers={"X-API-Key": "secret"})
            assert resp.status == 200
        finally:
            await client.close()

    async def test_rate_limit(self, client):
        state = client.app["state"]
        # shrink the ingest bucket so the test is fast
        from advanced_rag_tpu.utils.rate_limit import RateLimiter

        state.limiters["ingest"] = RateLimiter(limit=2, window_seconds=60)
        ok = 0
        for _ in range(4):
            resp = await client.post("/ingest",
                                     json={"documents": ["tiny doc here"]})
            ok += resp.status == 200
        assert ok == 2

    async def test_breaker_rejects_when_open(self, client):
        state = client.app["state"]
        for _ in range(state.breaker.config.failure_threshold):
            state.breaker.record_failure()
        resp = await client.post("/retrieve", json={"query": "anything"})
        assert resp.status == 503


class TestEnvFlags:
    async def test_env_weight_knobs(self, loop, tmp_path, monkeypatch):
        """RAG_DENSE_WEIGHT/RAG_SPARSE_WEIGHT set the fusion operating
        point (the dev-picked weights bench_quality_service.py deploys
        with; defaults 0.7/0.3 otherwise)."""
        monkeypatch.delenv("API_KEY", raising=False)
        monkeypatch.setenv("RAG_DENSE_WEIGHT", "0.2")
        monkeypatch.setenv("RAG_SPARSE_WEIGHT", "0.8")
        db = DatabasePool(sqlite_path=str(tmp_path / "w.db"))
        app = create_app(db=db)
        cfg = app["state"].config.retrieval
        assert cfg.dense_weight == 0.2 and cfg.sparse_weight == 0.8

    async def test_env_chunk_window_knobs(self, loop, tmp_path,
                                          monkeypatch):
        """RAG_CHUNK_BASE/MAX/MIN size ingest chunks to the serving
        encoder's window, and the orchestrator's chunker honors them."""
        monkeypatch.delenv("API_KEY", raising=False)
        monkeypatch.setenv("RAG_CHUNK_BASE", "110")
        monkeypatch.setenv("RAG_CHUNK_MAX", "160")
        monkeypatch.setenv("RAG_CHUNK_MIN", "32")
        db = DatabasePool(sqlite_path=str(tmp_path / "c.db"))
        app = create_app(db=db)
        state = app["state"]
        assert state.config.chunk_base_size == 110
        chunker = state.pipeline.chunker
        assert (chunker.base_chunk_size, chunker.max_chunk_size,
                chunker.min_chunk_size) == (110, 160, 32)
        text = " ".join(f"word{i} token." for i in range(600))
        chunks = chunker.chunk_document(text, doc_id="d1")
        assert len(chunks) >= 3     # 600 words can't fit 1-2 110-word chunks
        assert all(c.metadata.token_count <= 2 * 160 for c in chunks)

    async def test_env_flags_and_learned_reranker(self, loop, tmp_path,
                                                  monkeypatch):
        monkeypatch.delenv("API_KEY", raising=False)
        monkeypatch.setenv("ENABLE_MMR", "0")
        monkeypatch.setenv("ENABLE_ADAPTIVE_WEIGHTS", "1")
        monkeypatch.setenv("RAG_RERANKER", "learned")
        db = DatabasePool(sqlite_path=str(tmp_path / "f.db"))
        app = create_app(db=db)  # config built from env
        state = app["state"]
        assert state.config.retrieval.use_mmr is False
        assert state.config.retrieval.adaptive_weights is True
        assert state.pipeline.retriever.learned_ranker is not None
        assert state.pipeline.retriever.weight_adapter is not None
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            await client.post("/ingest", json={"documents": DOCS})
            resp = await client.post("/retrieve", json={
                "query": "hybrid retrieval"})
            assert resp.status == 200
            assert (await resp.json())["results"]
        finally:
            await client.close()

    async def test_ckpt_reranker_restores_trained_params(self, loop,
                                                         tmp_path,
                                                         monkeypatch):
        """RAG_RERANKER=ckpt:<path> restores a trained cross-encoder
        with its geometry from the checkpoint (train/rerank.py)."""
        from advanced_rag_tpu.models.encoder import (
            EncoderConfig, init_cross_encoder)
        from advanced_rag_tpu.train import load_reranker, save_reranker

        cfg = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=2,
                            num_heads=4, mlp_dim=64, max_len=16)
        _, params = init_cross_encoder(cfg, seed=7)
        path = tmp_path / "reranker_ckpt"
        save_reranker(params, cfg, path, q_len=5, d_len=10)
        got_cfg, got_params, layout = load_reranker(path)
        assert got_cfg.hidden_dim == 32 and got_cfg.max_len == 16
        assert layout == {"q_len": 5, "d_len": 10}

        monkeypatch.delenv("API_KEY", raising=False)
        monkeypatch.setenv("RAG_RERANKER", f"ckpt:{path}")
        db = DatabasePool(sqlite_path=str(tmp_path / "g.db"))
        app = create_app(db=db)
        rr = app["state"].pipeline.retriever.reranker
        assert rr is not None and rr.config.hidden_dim == 32
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            await client.post("/ingest", json={"documents": DOCS})
            resp = await client.post("/retrieve", json={
                "query": "hybrid retrieval", "use_reranking": True})
            assert resp.status == 200
            assert (await resp.json())["results"]
        finally:
            await client.close()

    async def test_fused_ckpt_reranker_still_wires_adaptive_weights(
            self, loop, tmp_path, monkeypatch):
        """RAG_FUSED_E2E=1 + RAG_RERANKER=ckpt: + adaptive weights ON —
        the exact env scripts/bench_quality_service.py sets — must
        install BOTH the preloaded reranker and the
        LearnedHybridAdapter (ADVICE r4: an early return skipped the
        adapter wiring)."""
        from advanced_rag_tpu.models.encoder import (
            EncoderConfig, init_cross_encoder)
        from advanced_rag_tpu.train import save_reranker

        cfg = EncoderConfig(vocab_size=512, hidden_dim=32, num_layers=2,
                            num_heads=4, mlp_dim=64, max_len=64)
        _, params = init_cross_encoder(cfg, seed=3)
        path = tmp_path / "rr_ckpt"
        save_reranker(params, cfg, path, q_len=8, d_len=24)

        monkeypatch.delenv("API_KEY", raising=False)
        monkeypatch.setenv("RAG_FUSED_E2E", "1")
        monkeypatch.setenv("ENABLE_ADAPTIVE_WEIGHTS", "1")
        monkeypatch.setenv("RAG_RERANKER", f"ckpt:{path}")
        db = DatabasePool(sqlite_path=str(tmp_path / "h.db"))
        app = create_app(db=db)
        retriever = app["state"].pipeline.retriever
        assert retriever.reranker is app["state"]._preloaded_reranker
        assert retriever.weight_adapter is not None


class TestAdminEndpoints:
    async def test_index_stats(self, client):
        await _ingest(client)
        resp = await client.get("/admin/index/stats")
        assert resp.status == 200
        data = await resp.json()
        assert data["semantic"]["rows"] >= 2
        assert "ivf_needs_rebuild" in data["semantic"]

    async def test_maintain_builds_and_tunes(self, client):
        await _ingest(client)
        resp = await client.post("/admin/index/maintain",
                                 json={"build_ivf": True,
                                       "tune_recall": 0.5})
        assert resp.status == 200
        data = await resp.json()
        assert data.get("ivf_built") is True
        assert "nprobe" in data and data["tuned_recall"] >= 0.5
        # stats now reflect the built quantizer
        stats = await (await client.get("/admin/index/stats")).json()
        assert stats["semantic"]["ivf"] is True

    async def test_admin_warmup(self, client):
        """POST /admin/warmup compiles every profile-signature x batch
        bucket so is_warm holds for arbitrary profile queries after."""
        await _ingest(client)
        retriever = client.app["state"].pipeline.retriever
        retriever._warm_keys.clear()
        retriever._warm_buckets.clear()
        resp = await client.post("/admin/warmup", json={"top_k": [5]})
        assert resp.status == 200
        data = await resp.json()
        assert data["warmed_top_k"] == [5]
        assert retriever.is_warm("how does fusion work", 5)
        # mmr-off profiles (troubleshooting) share k=5 but are a
        # distinct compiled signature — must also be warm
        assert retriever.is_warm("error: connection failed", 5)

    async def test_maintain_requires_auth_when_key_set(self, client):
        state = client.app["state"]
        state.api_key = "secret"
        resp = await client.post("/admin/index/maintain", json={})
        assert resp.status == 401
        resp = await client.post("/admin/index/maintain", json={},
                                 headers={"X-API-Key": "secret"})
        assert resp.status == 200
        state.api_key = ""


class TestAdminPQTier:
    async def test_maintain_pq_tier(self, loop, tmp_path, monkeypatch):
        """build_pq + build_ivf (pq mode -> IVF-PQ) + tune via the admin
        endpoint; stats expose the tier flags."""
        monkeypatch.delenv("API_KEY", raising=False)
        pipeline = AdvancedRAGPipeline(PipelineConfig(semantic_dtype="pq"))
        db = DatabasePool(sqlite_path=str(tmp_path / "chat.db"))
        app = create_app(pipeline=pipeline, db=db)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            await _ingest(client)
            resp = await client.post("/admin/index/maintain",
                                     json={"build_pq": True,
                                           "build_ivf": True,
                                           "tune_recall": 0.5})
            assert resp.status == 200
            data = await resp.json()
            assert data.get("pq_built") and data.get("ivf_built")
            assert "nprobe" in data
            stats = await (await client.get("/admin/index/stats")).json()
            assert stats["semantic"]["pq"] is True
            assert stats["semantic"]["ivfpq"] is True
            resp = await client.post("/retrieve", json={
                "query": "hybrid retrieval"})
            assert resp.status == 200
            assert (await resp.json())["results"]
        finally:
            await client.close()


class TestCheckpointEndpoint:
    async def test_save_then_load_roundtrip(self, client, tmp_path,
                                            monkeypatch):
        monkeypatch.setenv("RAG_CHECKPOINT_ROOT", str(tmp_path))
        await _ingest(client)
        d = str(tmp_path / "ckpt")
        resp = await client.post("/admin/index/checkpoint",
                                 json={"dir": d, "action": "save"})
        assert resp.status == 200
        data = await resp.json()
        assert data["saved"] and data["rows"] >= 2

        # restore into a FRESH service (load requires an empty manager)
        pipeline = AdvancedRAGPipeline(PipelineConfig())
        db = DatabasePool(sqlite_path=str(tmp_path / "chat2.db"))
        app2 = create_app(pipeline=pipeline, db=db)
        c2 = TestClient(TestServer(app2))
        await c2.start_server()
        try:
            resp = await c2.post("/admin/index/checkpoint",
                                 json={"dir": d, "action": "load"})
            assert resp.status == 200
            assert (await resp.json())["rows"] >= 2
            resp = await c2.post("/retrieve", json={"query": "hybrid"})
            assert resp.status == 200
            assert (await resp.json())["results"]
        finally:
            await c2.close()

    async def test_load_into_populated_manager_conflicts(self, client,
                                                         tmp_path,
                                                         monkeypatch):
        monkeypatch.setenv("RAG_CHECKPOINT_ROOT", str(tmp_path))
        await _ingest(client)
        d = str(tmp_path / "ck2")
        await client.post("/admin/index/checkpoint",
                          json={"dir": d, "action": "save"})
        resp = await client.post("/admin/index/checkpoint",
                                 json={"dir": d, "action": "load"})
        assert resp.status == 409  # manager not empty

    async def test_missing_dir_rejected(self, client):
        resp = await client.post("/admin/index/checkpoint",
                                 json={"action": "save"})
        assert resp.status == 400

    async def test_unconfined_dir_rejected(self, client, tmp_path,
                                           monkeypatch):
        """Arbitrary filesystem paths are refused: the shared API key
        must not grant arbitrary-directory write/read."""
        monkeypatch.setenv("RAG_CHECKPOINT_ROOT", str(tmp_path))
        resp = await client.post("/admin/index/checkpoint",
                                 json={"dir": "/etc/evil", "action": "save"})
        assert resp.status == 403
        resp = await client.post(
            "/admin/index/checkpoint",
            json={"dir": str(tmp_path) + "/../escape", "action": "save"})
        assert resp.status == 403


class TestBootRestore:
    async def test_create_app_restores_checkpoint_dir(self, client,
                                                      tmp_path,
                                                      monkeypatch):
        monkeypatch.setenv("RAG_CHECKPOINT_ROOT", str(tmp_path))
        await _ingest(client)
        d = str(tmp_path / "bootck")
        resp = await client.post("/admin/index/checkpoint",
                                 json={"dir": d, "action": "save"})
        assert resp.status == 200

        monkeypatch.setenv("RAG_CHECKPOINT_DIR", d)
        pipeline = AdvancedRAGPipeline(PipelineConfig())
        db = DatabasePool(sqlite_path=str(tmp_path / "chat3.db"))
        app2 = create_app(pipeline=pipeline, db=db)
        assert app2["state"].pipeline.index_manager.store.size >= 2
        c2 = TestClient(TestServer(app2))
        await c2.start_server()
        try:
            resp = await c2.post("/retrieve", json={"query": "hybrid"})
            assert resp.status == 200
            assert (await resp.json())["results"]
        finally:
            await c2.close()

    async def test_missing_checkpoint_dir_starts_empty(self, tmp_path,
                                                       monkeypatch):
        monkeypatch.setenv("RAG_CHECKPOINT_DIR",
                           str(tmp_path / "nonexistent"))
        pipeline = AdvancedRAGPipeline(PipelineConfig())
        db = DatabasePool(sqlite_path=str(tmp_path / "chat4.db"))
        app2 = create_app(pipeline=pipeline, db=db)
        assert app2["state"].pipeline.index_manager.store.size == 0


class TestShedAccounting:
    """VERDICT r2 weak #5: shed traffic is a first-class SLO quantity —
    admission 429s, degraded-empty accounting, and the reject policy."""

    async def test_admission_queue_full_returns_429(self, loop, tmp_path,
                                                    monkeypatch):
        monkeypatch.delenv("API_KEY", raising=False)
        monkeypatch.setenv("RAG_MAX_QUEUE", "0")   # every waiter rejected
        pipeline = AdvancedRAGPipeline(PipelineConfig())
        db = DatabasePool(sqlite_path=str(tmp_path / "q.db"))
        app = create_app(pipeline=pipeline, db=db)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.post("/retrieve", json={"query": "hello"})
            assert resp.status == 429
            assert resp.headers.get("Retry-After") == "1"
        finally:
            await client.close()

    async def test_degraded_empty_default_policy_stays_200(
            self, loop, tmp_path, monkeypatch):
        monkeypatch.delenv("API_KEY", raising=False)
        monkeypatch.delenv("RAG_SHED_POLICY", raising=False)
        pipeline = AdvancedRAGPipeline(PipelineConfig())
        db = DatabasePool(sqlite_path=str(tmp_path / "d.db"))
        app = create_app(pipeline=pipeline, db=db)

        def degraded_retrieve(query, top_k=None, filters=None, **kw):
            from advanced_rag_tpu.pipeline.evaluation import RAGEvaluator
            metrics = RAGEvaluator().evaluate_retrieval(query, [], k=5,
                                                        latency_ms=1.0)
            return {"results": [], "metrics": metrics, "latency_ms": 301.0,
                    "sla_met": False, "rewritten_query": query,
                    "degraded": "timeout"}

        app["state"].pipeline.retrieve = degraded_retrieve
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.post("/retrieve", json={"query": "x"})
            # reference-compatible default: graceful empty 200 ...
            assert resp.status == 200
            assert (await resp.json())["results"] == []
            # ... but counted: /metrics exports rag_shed_total
            m = await (await client.get("/metrics")).text()
            assert 'rag_shed_total{reason="timeout"}' in m
        finally:
            await client.close()

    async def test_shed_policy_reject_converts_degrade_to_429(
            self, loop, tmp_path, monkeypatch):
        monkeypatch.delenv("API_KEY", raising=False)
        monkeypatch.setenv("RAG_SHED_POLICY", "reject")
        pipeline = AdvancedRAGPipeline(PipelineConfig())
        db = DatabasePool(sqlite_path=str(tmp_path / "r.db"))
        app = create_app(pipeline=pipeline, db=db)

        def degraded_retrieve(query, top_k=None, filters=None, **kw):
            from advanced_rag_tpu.pipeline.evaluation import RAGEvaluator
            metrics = RAGEvaluator().evaluate_retrieval(query, [], k=5,
                                                        latency_ms=1.0)
            return {"results": [], "metrics": metrics, "latency_ms": 301.0,
                    "sla_met": False, "rewritten_query": query,
                    "degraded": "timeout"}

        app["state"].pipeline.retrieve = degraded_retrieve
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.post("/retrieve", json={"query": "x"})
            assert resp.status == 429
        finally:
            await client.close()
