"""Service error/degradation paths the happy-path suite skips.

Auth on every guarded endpoint, timeout -> 504, unhandled -> 500 with
X-Request-ID, chat edge cases, ETL/eval validation, warm-up scalar
top_k, the static UI route, checkpoint-restore rollback, boot warm-up,
and the CLI entry (argparse/signal wiring with run_app stubbed).
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


class TestMiddleware:
    async def test_unknown_route_404_carries_request_id(self, client):
        resp = await client.get("/no-such-route",
                                headers={"X-Request-ID": "rid-42"})
        assert resp.status == 404
        assert resp.headers["X-Request-ID"] == "rid-42"

    async def test_unhandled_error_returns_500(self, client):
        state = client.app["state"]

        def boom():
            raise RuntimeError("kaboom")

        state.pipeline.get_performance_report = boom
        resp = await client.get("/perf")
        assert resp.status == 500
        data = await resp.json()
        assert data["error"] == "internal error"


class TestAuthEverywhere:
    async def test_guarded_endpoints_reject_bad_key(self, client):
        state = client.app["state"]
        state.api_key = "secret"
        headers = {"X-API-Key": "wrong"}
        checks = [
            ("post", "/feedback", {"session_id": "s", "positive": True}),
            ("post", "/chat", {"message": "hi"}),
            ("get", "/chat/stream?message=hi", None),
            ("post", "/etl/run", {"root": "."}),
            ("post", "/admin/warmup", {}),
        ]
        for method, path, body in checks:
            kw = {"headers": headers}
            if body is not None:
                kw["json"] = body
            resp = await getattr(client, method)(path, **kw)
            assert resp.status == 401, path
        state.api_key = ""


class TestRetrieveChatEdges:
    async def test_retrieve_timeout_504(self, client):
        await client.post("/ingest", json={"documents": DOCS})
        state = client.app["state"]
        state.retrieve_timeout_s = 1e-6

        def slow(query, top_k=None, filters=None):
            import time as _t

            _t.sleep(0.2)
            return {"results": [], "metrics": {}}

        state.pipeline.retrieve = slow
        # is_warm must say True so the strict budget applies
        state.pipeline.retriever.is_warm = lambda *a, **k: True
        resp = await client.post("/retrieve", json={"query": "hello there"})
        assert resp.status == 504

    async def test_chat_timeout_504_and_breaker_503(self, client):
        await client.post("/ingest", json={"documents": DOCS})
        state = client.app["state"]
        state.retrieve_timeout_s = 1e-6
        state.pipeline.retriever.is_warm = lambda *a, **k: True

        def slow(query, top_k=None, filters=None):
            import time as _t

            _t.sleep(0.2)
            return {"results": [], "metrics": {}}

        state.pipeline.retrieve = slow
        resp = await client.post("/chat", json={"message": "hello"})
        assert resp.status == 504
        for _ in range(state.breaker.config.failure_threshold):
            state.breaker.record_failure()
        resp = await client.post("/chat", json={"message": "hello"})
        assert resp.status == 503

    async def test_chat_requires_message(self, client):
        resp = await client.post("/chat", json={})
        assert resp.status == 400
        resp = await client.get("/chat/stream")
        assert resp.status == 400

    async def test_chat_no_context_answer(self, client):
        # empty corpus -> extractive answer has no snippets
        resp = await client.post("/chat", json={"message": "anything here"})
        assert resp.status == 200
        data = await resp.json()
        assert "could not find relevant context" in data["answer"]
        assert data["citations"] == []

    async def test_feedback_updates_ranker_and_adapter(self, client):
        from advanced_rag_tpu.pipeline.ranker import (
            LearnedHybridAdapter,
            LearnedRanker,
        )

        state = client.app["state"]
        retriever = state.pipeline.retriever
        retriever.learned_ranker = LearnedRanker()
        retriever.weight_adapter = LearnedHybridAdapter()
        w_before = retriever.learned_ranker.weights.copy()
        resp = await client.post("/feedback", json={
            "session_id": "s1", "message_id": 1, "positive": True,
            "method": "hybrid",
            "result": {"score": 0.9, "methods": ["semantic"],
                       "timestamp": 0.0},
        })
        assert resp.status == 200
        assert (await resp.json())["status"] == "recorded"
        assert (retriever.learned_ranker.weights != w_before).any()


class TestEtlEvalEdges:
    async def test_etl_rejects_non_directory(self, client, tmp_path):
        resp = await client.post("/etl/run",
                                 json={"root": str(tmp_path / "nope")})
        assert resp.status == 400

    async def test_etl_empty_directory(self, client, tmp_path):
        (tmp_path / "sub").mkdir()
        resp = await client.post("/etl/run", json={"root": str(tmp_path)})
        assert resp.status == 200
        assert (await resp.json())["indexed"] == 0

    async def test_eval_requires_cases(self, client):
        resp = await client.post("/eval/run", json={"cases": []})
        assert resp.status == 400


class TestAdminAndStatic:
    async def test_admin_unknown_action(self, client, tmp_path, monkeypatch):
        monkeypatch.setenv("RAG_CHECKPOINT_ROOT", str(tmp_path))
        resp = await client.post("/admin/index/checkpoint",
                                 json={"action": "frobnicate"})
        assert resp.status == 400

    async def test_warmup_scalar_top_k(self, client):
        await client.post("/ingest", json={"documents": DOCS})
        resp = await client.post("/admin/warmup", json={"top_k": 5})
        assert resp.status == 200

    async def test_root_serves_ui(self, client):
        resp = await client.get("/")
        assert resp.status == 200
        assert "text/html" in resp.headers["Content-Type"]


class TestBootPaths:
    async def test_corrupt_checkpoint_rolls_back(self, tmp_path, monkeypatch):
        monkeypatch.delenv("API_KEY", raising=False)
        d = tmp_path / "ckpt"
        d.mkdir()
        (d / "manifest.json").write_text("{not json at all")
        monkeypatch.setenv("RAG_CHECKPOINT_DIR", str(d))
        db = DatabasePool(sqlite_path=str(tmp_path / "c.db"))
        app = create_app(db=db)
        state = app["state"]
        assert state.pipeline.index_manager.store.size == 0

    async def test_boot_warmup_env(self, tmp_path, monkeypatch):
        monkeypatch.delenv("API_KEY", raising=False)
        monkeypatch.setenv("RAG_WARMUP", "1")
        pipeline = AdvancedRAGPipeline(PipelineConfig())
        pipeline.ingest_documents(DOCS)
        calls = []
        pipeline.warm_up = lambda *a, **k: calls.append(1)
        db = DatabasePool(sqlite_path=str(tmp_path / "w.db"))
        create_app(pipeline=pipeline, db=db)
        assert calls  # warm-up ran at boot

    async def test_micro_batch_env(self, tmp_path, monkeypatch):
        monkeypatch.delenv("API_KEY", raising=False)
        monkeypatch.setenv("RAG_MICRO_BATCH", "4")
        db = DatabasePool(sqlite_path=str(tmp_path / "m.db"))
        app = create_app(db=db)
        assert app["state"].config.retrieval.micro_batch_size == 4

    async def test_default_db_from_env(self, tmp_path, monkeypatch):
        monkeypatch.delenv("API_KEY", raising=False)
        monkeypatch.delenv("DATABASE_URL", raising=False)
        monkeypatch.setenv("CHAT_DB_PATH", str(tmp_path / "default.db"))
        app = create_app()
        assert app["state"].db.backend == "sqlite"


class TestCliEntry:
    def test_main_wires_app_and_runs(self, tmp_path, monkeypatch):
        from advanced_rag_tpu.service import app as app_mod

        monkeypatch.delenv("API_KEY", raising=False)
        monkeypatch.setenv("CHAT_DB_PATH", str(tmp_path / "cli.db"))
        monkeypatch.setattr(
            "sys.argv", ["advanced-rag-tpu", "--port", "18123"])
        ran = {}

        def fake_run_app(app, **kw):
            ran["app"] = app
            ran.update(kw)

        monkeypatch.setattr(app_mod.web, "run_app", fake_run_app)
        app_mod.main()
        assert ran["port"] == 18123
        assert "state" in ran["app"]
        # SIGTERM drain hook flips the state flag
        ran["app"]["state"].draining = False
