"""Edge paths in the L2 infra + evaluation/compliance modules.

Covers what the main suites skip: cache get_or_compute/clear/validation,
circuit-breaker reset + decorator outcomes, checkpoint format guards and
the SQ8/domain restore legs, the postgres pool branch (fake psycopg2),
evaluation zero-guards + the NLI hook, and compliance lineage/retention
internals.
"""

import sys
import time
import types

import numpy as np
import pytest

from advanced_rag_tpu.pipeline.compliance import (
    AuditEventType,
    ComplianceManager,
)
from advanced_rag_tpu.pipeline.evaluation import RAGEvaluator
from advanced_rag_tpu.utils.cache import EmbeddingCache, get_cache
from advanced_rag_tpu.utils.circuit_breaker import (
    CircuitBreaker,
    CircuitBreakerConfig,
    CircuitState,
    with_circuit_breaker,
)
from advanced_rag_tpu.utils.exceptions import CircuitBreakerOpenError


class TestCacheEdges:
    def test_capacity_validation(self):
        with pytest.raises(ValueError, match="capacity"):
            EmbeddingCache(capacity=0)

    def test_hit_rate(self):
        c = EmbeddingCache(capacity=4)
        assert c.get_stats().hit_rate == 0.0
        c.put_sync("a", np.ones(3))
        c.get_sync("a")
        c.get_sync("missing")
        assert c.get_stats().hit_rate == pytest.approx(0.5)

    def test_get_or_compute_sync(self):
        c = EmbeddingCache(capacity=4)
        calls = []

        def compute(text):
            calls.append(text)
            return np.full(2, 7.0)

        v1 = c.get_or_compute_sync("x", compute)
        v2 = c.get_or_compute_sync("x", compute)
        np.testing.assert_array_equal(v1, v2)
        assert calls == ["x"]  # second call was a hit

    def test_clear(self):
        c = EmbeddingCache(capacity=4)
        c.put_sync("a", np.ones(2))
        c.clear()
        assert c.get_sync("a") is None
        assert c.get_stats().size == 0

    def test_unknown_family_rejected(self):
        with pytest.raises(KeyError, match="unknown cache family"):
            get_cache("telepathic")


class TestBreakerEdges:
    def test_reset(self):
        b = CircuitBreaker(CircuitBreakerConfig(failure_threshold=1))
        b.record_failure()
        assert b.state == CircuitState.OPEN
        b.reset()
        assert b.state == CircuitState.CLOSED
        assert not b.is_open()

    def test_decorator_success_failure_open(self):
        b = CircuitBreaker(CircuitBreakerConfig(failure_threshold=2,
                                                timeout_seconds=60))

        @with_circuit_breaker(b)
        def flaky(fail):
            if fail:
                raise RuntimeError("boom")
            return "ok"

        assert flaky(False) == "ok"
        with pytest.raises(RuntimeError):
            flaky(True)
        with pytest.raises(RuntimeError):
            flaky(True)
        assert b.state == CircuitState.OPEN
        with pytest.raises(CircuitBreakerOpenError):
            flaky(False)


class TestCheckpointEdges:
    def test_unsupported_format_version(self, tmp_path):
        import json

        from advanced_rag_tpu.config import PipelineConfig
        from advanced_rag_tpu.index.manager import MultiIndexManager
        from advanced_rag_tpu.utils.checkpoint import load_index, save_index

        cfg = PipelineConfig()
        cfg.semantic_dim = 32
        m = MultiIndexManager(cfg)
        from advanced_rag_tpu.index.corpus import ChunkRecord

        m.index_chunks([ChunkRecord(chunk_id="a", doc_id="d",
                                    content="checkpoint format guard")])
        save_index(m, str(tmp_path))
        manifest = json.loads((tmp_path / "manifest.json").read_text())
        manifest["format_version"] = 9999
        (tmp_path / "manifest.json").write_text(json.dumps(manifest))
        m2 = MultiIndexManager(cfg)
        with pytest.raises(ValueError, match="unsupported checkpoint"):
            load_index(m2, str(tmp_path))
        m.close()
        m2.close()

    def test_sq8_and_domain_roundtrip(self, tmp_path):
        from advanced_rag_tpu.config import PipelineConfig
        from advanced_rag_tpu.index.corpus import ChunkRecord
        from advanced_rag_tpu.index.manager import MultiIndexManager
        from advanced_rag_tpu.utils.checkpoint import load_index, save_index

        cfg = PipelineConfig()
        cfg.semantic_dim = 32
        cfg.semantic_dtype = "int8"         # SQ8 tier restore leg
        m = MultiIndexManager(cfg, enable_domain=True)
        recs = [ChunkRecord(chunk_id=f"c{i}", doc_id="d",
                            content=f"sq8 restore row {i} with words")
                for i in range(6)]
        m.index_chunks(recs)
        hits_before = m.search_sync("semantic", "sq8 restore row", 3)
        save_index(m, str(tmp_path))

        m2 = MultiIndexManager(cfg, enable_domain=True)
        load_index(m2, str(tmp_path))
        assert m2.store.n_valid() == 6
        assert m2.domain is not None and m2.domain.size == 6
        hits_after = m2.search_sync("semantic", "sq8 restore row", 3)
        assert [h["chunk_id"] for h in hits_after] == \
            [h["chunk_id"] for h in hits_before]
        m.close()
        m2.close()


class TestPostgresBranch:
    def test_pool_lifecycle_with_fake_psycopg2(self, monkeypatch):
        class FakeConn:
            def __init__(self):
                self.committed = self.rolled_back = False

            def commit(self):
                self.committed = True

            def rollback(self):
                self.rolled_back = True

            def execute(self, *a):
                return None

        class FakePool:
            def __init__(self, mn, mx, dsn):
                self.dsn = dsn
                self.conns = []
                self.closed = False

            def getconn(self):
                c = FakeConn()
                self.conns.append(c)
                return c

            def putconn(self, conn):
                pass

            def closeall(self):
                self.closed = True

        fake_pool_mod = types.ModuleType("psycopg2.pool")
        fake_pool_mod.ThreadedConnectionPool = FakePool
        fake_mod = types.ModuleType("psycopg2")
        fake_mod.pool = fake_pool_mod
        monkeypatch.setitem(sys.modules, "psycopg2", fake_mod)
        monkeypatch.setitem(sys.modules, "psycopg2.pool", fake_pool_mod)

        from advanced_rag_tpu.utils.db_pool import DatabasePool

        pool = DatabasePool(database_url="postgresql://u@h/db")
        assert pool.backend == "postgres"
        with pool.get_connection() as conn:
            conn.execute("SELECT 1")
        assert conn.committed
        with pytest.raises(RuntimeError):
            with pool.get_connection() as conn2:
                raise RuntimeError("fail inside txn")
        assert conn2.rolled_back
        stats = pool.get_stats()
        assert stats["commits"] == 1 and stats["rollbacks"] == 1
        pool.close()
        assert pool._pg_pool.closed


class TestEvaluationEdges:
    def test_zero_guards(self):
        ev = RAGEvaluator()
        assert ev.precision_at_k([], ["a"], 5) == 0.0
        assert ev.precision_at_k(["a"], ["a"], 0) == 0.0
        assert ev.recall_at_k(["a"], [], 5) == 0.0
        assert ev.mrr(["x", "y"], ["z"]) == 0.0
        assert ev.query_coverage("", ["content"]) == 0.0

    def test_nli_hook_used_and_fallback_on_error(self):
        ev = RAGEvaluator(nli_scorer=lambda q, c: 0.73)
        assert ev.faithfulness("q", ["content"]) == pytest.approx(0.73)

        def broken(q, c):
            raise RuntimeError("nli down")

        ev2 = RAGEvaluator(nli_scorer=broken)
        out = ev2.faithfulness("q", ["content words here"])
        assert 0.0 <= out <= 1.0  # fell back to the redundancy blend

    def test_distribution_shift_empty_and_divergence_tiny(self):
        assert RAGEvaluator._distribution_shift(
            [np.array([]), np.array([])]) == 0.0
        assert RAGEvaluator._embedding_divergence(
            [np.zeros(4), np.zeros(4)]) == 0.0

    def test_drift_recommendations_shift_and_decay(self):
        import time as _t

        ev = RAGEvaluator()
        # two very different score distributions -> distribution shift
        ev.score_history.extend([
            np.array([0.97, 0.01, 0.01, 0.01]),
            np.array([0.01, 0.01, 0.01, 0.97]),
        ])
        # all history far older than the freshness window -> decay > 0.5
        old = _t.time() - 90 * 86400
        ev.query_history.extend(
            [{"query": f"q{i}", "timestamp": old} for i in range(4)])
        rep = ev.detect_drift(threshold=0.05)
        joined = " ".join(rep.recommendations)
        assert "re-tune fusion weights" in joined
        assert "freshness window" in joined


class TestComplianceEdges:
    def test_audit_log_cap(self, monkeypatch):
        from advanced_rag_tpu.utils import constants

        monkeypatch.setattr(constants.ComplianceConstants,
                            "AUDIT_LOG_MAXLEN", 5)
        cm = ComplianceManager()
        for i in range(9):
            cm.log_ingestion(f"d{i}", 1)
        assert len(cm.audit_logs) == 5
        assert cm.audit_logs[-1].doc_id == "d8"

    def test_lineage_add_and_depth_cap(self):
        cm = ComplianceManager()
        cm.add_lineage("child", ["p1"])
        cm.add_lineage("child", ["p2"])
        assert cm.lineage["child"] == ["p1", "p2"]
        # self-cycle: depth cap must terminate the walk
        cm.add_lineage("loop", ["loop"])
        tree = cm.get_lineage_tree("loop", max_depth=3)
        d = tree
        for _ in range(3):
            d = d["parents"][0]
        assert d["parents"] == []

    def test_get_versions_and_integrity_unknown(self):
        cm = ComplianceManager()
        assert cm.get_versions("nope") == []
        assert cm.verify_data_integrity("nope", "content") is False
        cm.create_version("doc", "hello world")
        assert len(cm.get_versions("doc")) == 1
        assert cm.verify_data_integrity("doc", "hello world") is True
        assert cm.verify_data_integrity("doc", "tampered") is False

    def test_query_audit_filters(self):
        cm = ComplianceManager(tenant="t1")
        cm.log_ingestion("d1", 2)
        time.sleep(0.01)
        mid = time.time()
        time.sleep(0.01)
        cm.log_retrieval("query text", ["d1"])
        assert len(cm.query_audit_logs(
            event_type=AuditEventType.INGESTION)) == 1
        assert len(cm.query_audit_logs(doc_id="d1")) == 1
        assert cm.query_audit_logs(tenant="other") == []
        assert len(cm.query_audit_logs(since=mid)) == 1
        assert len(cm.query_audit_logs(until=mid)) == 1
        assert len(cm.query_audit_logs(limit=1)) == 1

    def test_retention_prunes_expired_versions(self):
        cm = ComplianceManager(retention_days=0)   # everything expires now
        cm.create_version("gone", "old content")
        time.sleep(0.02)
        cm.log_ingestion("other", 1)               # triggers pruning
        assert cm.get_versions("gone") == []

    def test_retention_sweep_is_throttled(self):
        # The full-store sweep runs at most once per PRUNE_INTERVAL_S
        # (it was measured at ~18% of the serving core when it ran on
        # every audit event).  After the first event's sweep, further
        # events within the interval must NOT trigger another pass.
        cm = ComplianceManager(retention_days=0)
        cm.log_ingestion("warm", 1)                # first event sweeps
        first_sweep = cm._last_prune
        cm.create_version("gone", "old content")   # expires immediately
        time.sleep(0.02)
        cm.log_ingestion("other", 1)               # inside the interval
        assert cm._last_prune == first_sweep       # no second sweep
        assert "gone" in cm.versions               # store not yet swept

    def test_get_versions_exact_between_sweeps(self):
        # Per-doc reads must never expose expired versions, even while
        # the throttled sweep hasn't physically removed them yet.
        cm = ComplianceManager(retention_days=0)
        cm.log_ingestion("warm", 1)                # consume the first sweep
        cm.create_version("gone", "old content")
        time.sleep(0.02)
        assert "gone" in cm.versions               # still in the store...
        assert cm.get_versions("gone") == []       # ...but never readable

    def test_report_and_integrity_exact_between_sweeps(self):
        # Whole-store readers force a sweep so report counts and
        # integrity checks never include versions expired since the
        # last throttled pass.
        cm = ComplianceManager(retention_days=0)
        cm.log_ingestion("warm", 1)                # consume the first sweep
        cm.create_version("gone", "old content")
        time.sleep(0.02)
        assert "gone" in cm.versions
        report = cm.generate_compliance_report()
        assert report["documents_versioned"] == 0
        assert report["total_versions"] == 0
        assert not cm.verify_data_integrity("gone", "old content")

    def test_legal_hold_exempts_from_retention(self):
        # the hold must exist BEFORE the version: create_version's own
        # audit event already prunes, and retention_days=0 expires
        # versions at creation time
        cm = ComplianceManager(retention_days=0)
        cm.apply_legal_hold("held")
        cm.create_version("held", "must stay")
        time.sleep(0.02)
        cm.log_ingestion("other", 1)
        assert len(cm.get_versions("held")) == 1


class TestInfraBoundaryExactness:
    """Boundary-exact pins for the L2 infra (mutation batch 3): each
    assert distinguishes the shipped comparison/arith from its nearest
    mutant (>= vs >, and vs or, capacity off-by-one, +1 literals)."""

    def test_cache_ttl_exact_boundary(self):
        t = [100.0]
        c = EmbeddingCache(capacity=4, ttl_seconds=10.0, clock=lambda: t[0])
        c.put_sync("k", np.ones(3))
        t[0] = 110.0                      # exactly ttl old: still valid
        assert c.get_sync("k") is not None
        t[0] = 110.001                    # past ttl: expired
        assert c.get_sync("k") is None
        st = c.get_stats()
        assert (st.hits, st.misses, st.expirations, st.size) == (1, 1, 1, 0)

    def test_cache_capacity_exact_fifo(self):
        c = EmbeddingCache(capacity=2, ttl_seconds=1e9)
        c.put_sync("a", np.zeros(1))
        c.put_sync("b", np.ones(1))
        # re-putting an EXISTING key at capacity must not evict
        c.put_sync("a", np.full(1, 2.0))
        st = c.get_stats()
        assert (st.size, st.evictions) == (2, 0)
        assert c.get_sync("a")[0] == 2.0
        # a NEW key at capacity evicts exactly one, FIFO order ("a"
        # keeps its original insertion slot: put_sync overwrites in
        # place, so "a" is still oldest)
        c.put_sync("c", np.full(1, 3.0))
        st = c.get_stats()
        assert (st.size, st.evictions) == (2, 1)
        assert c.get_sync("a") is None
        assert c.get_sync("b") is not None and c.get_sync("c") is not None

    def test_breaker_thresholds_and_timeout_exact(self, monkeypatch):
        import advanced_rag_tpu.utils.circuit_breaker as cbm

        now = [100.0]
        monkeypatch.setattr(cbm.time, "monotonic", lambda: now[0])
        br = CircuitBreaker(CircuitBreakerConfig(
            failure_threshold=3, timeout_seconds=5.0, success_threshold=2))
        br.record_failure()
        br.record_failure()
        assert br.state == CircuitState.CLOSED    # threshold-1: still closed
        br.record_failure()
        assert br.state == CircuitState.OPEN      # opens at exactly 3
        now[0] = 104.999                          # just under timeout
        assert br.state == CircuitState.OPEN
        now[0] = 105.0                            # exactly timeout: half-open
        assert br.state == CircuitState.HALF_OPEN
        br.record_success()
        assert br.state == CircuitState.HALF_OPEN  # threshold-1 probes
        br.record_success()
        assert br.state == CircuitState.CLOSED     # closes at exactly 2

    def test_breaker_probe_failure_reopens_with_fresh_clock(self, monkeypatch):
        import advanced_rag_tpu.utils.circuit_breaker as cbm

        now = [50.0]
        monkeypatch.setattr(cbm.time, "monotonic", lambda: now[0])
        br = CircuitBreaker(CircuitBreakerConfig(
            failure_threshold=1, timeout_seconds=5.0, success_threshold=2))
        br.record_failure()
        assert br.state == CircuitState.OPEN
        now[0] = 55.0
        assert br.state == CircuitState.HALF_OPEN
        br.record_failure()                       # probe failure re-opens
        assert br.state == CircuitState.OPEN
        now[0] = 59.999                           # window restarts at 55.0
        assert br.state == CircuitState.OPEN
        now[0] = 60.0
        assert br.state == CircuitState.HALF_OPEN

    def test_db_pool_exact_counters(self, tmp_path):
        from advanced_rag_tpu.utils.db_pool import DatabasePool

        pool = DatabasePool(sqlite_path=str(tmp_path / "t.db"))
        with pool.get_connection() as conn:
            conn.execute("CREATE TABLE t (x INTEGER)")
            conn.execute("INSERT INTO t VALUES (1)")
        with pytest.raises(RuntimeError):
            with pool.get_connection() as conn:
                conn.execute("INSERT INTO t VALUES (2)")
                raise RuntimeError("boom")        # rollback path
        with pool.get_connection() as conn:
            rows = conn.execute("SELECT COUNT(*) AS n FROM t").fetchone()
        assert rows["n"] == 1                     # the rollback really rolled back
        st = pool.get_stats()
        assert (st["connections_served"], st["commits"], st["rollbacks"]) \
            == (3, 2, 1)
        pool.close()
