"""L2 infra: circuit breaker state machine, db pool, rate limiter
(reference tests/ suite — SURVEY.md §4: CB timed transitions, pool
thread-safety)."""

import threading
import time

import pytest

from advanced_rag_tpu.utils.circuit_breaker import (
    CircuitBreaker,
    CircuitBreakerConfig,
    CircuitState,
    with_circuit_breaker,
)
from advanced_rag_tpu.utils.db_pool import DatabasePool
from advanced_rag_tpu.utils.exceptions import CircuitBreakerOpenError
from advanced_rag_tpu.utils.rate_limit import RateLimiter


class TestCircuitBreaker:
    def test_opens_after_threshold(self):
        cb = CircuitBreaker(CircuitBreakerConfig(failure_threshold=3))
        for _ in range(2):
            cb.record_failure()
        assert cb.state == CircuitState.CLOSED
        cb.record_failure()
        assert cb.state == CircuitState.OPEN
        assert cb.is_open()

    def test_half_open_after_timeout_then_close(self):
        cb = CircuitBreaker(CircuitBreakerConfig(
            failure_threshold=1, timeout_seconds=0.05, success_threshold=2))
        cb.record_failure()
        assert cb.state == CircuitState.OPEN
        time.sleep(0.06)
        assert cb.state == CircuitState.HALF_OPEN
        cb.record_success()
        assert cb.state == CircuitState.HALF_OPEN
        cb.record_success()
        assert cb.state == CircuitState.CLOSED

    def test_half_open_failure_reopens(self):
        cb = CircuitBreaker(CircuitBreakerConfig(
            failure_threshold=1, timeout_seconds=0.05))
        cb.record_failure()
        time.sleep(0.06)
        assert cb.state == CircuitState.HALF_OPEN
        cb.record_failure()
        assert cb.state == CircuitState.OPEN

    def test_legacy_alias_kwargs(self):
        cb = CircuitBreaker(max_failures=7, reset_timeout=1.0,
                            half_open_successes=3)
        assert cb.config.failure_threshold == 7
        assert cb.config.success_threshold == 3

    def test_decorator_sync_and_async(self):
        cb = CircuitBreaker(CircuitBreakerConfig(failure_threshold=1))

        @with_circuit_breaker(cb)
        def boom():
            raise RuntimeError("x")

        with pytest.raises(RuntimeError):
            boom()
        with pytest.raises(CircuitBreakerOpenError):
            boom()

        import asyncio

        cb2 = CircuitBreaker(CircuitBreakerConfig(failure_threshold=1))

        @with_circuit_breaker(cb2)
        async def ok():
            return 42

        assert asyncio.get_event_loop_policy().new_event_loop().run_until_complete(ok()) == 42

    def test_stats(self):
        cb = CircuitBreaker()
        cb.record_success()
        cb.record_failure()
        stats = cb.get_stats()
        assert stats["successes"] == 1 and stats["failures"] == 1


class TestDatabasePool:
    def test_sqlite_roundtrip(self, tmp_path):
        pool = DatabasePool(sqlite_path=str(tmp_path / "t.db"))
        with pool.get_connection() as conn:
            conn.execute("CREATE TABLE t (x INTEGER)")
            conn.execute("INSERT INTO t VALUES (1)")
        with pool.get_connection() as conn:
            rows = conn.execute("SELECT x FROM t").fetchall()
        assert [r["x"] for r in rows] == [1]
        assert pool.get_stats()["commits"] == 2

    def test_rollback_on_error(self, tmp_path):
        pool = DatabasePool(sqlite_path=str(tmp_path / "t.db"))
        with pool.get_connection() as conn:
            conn.execute("CREATE TABLE t (x INTEGER)")
        with pytest.raises(RuntimeError):
            with pool.get_connection() as conn:
                conn.execute("INSERT INTO t VALUES (2)")
                raise RuntimeError("abort")
        with pool.get_connection() as conn:
            assert conn.execute("SELECT COUNT(*) c FROM t").fetchone()["c"] == 0
        assert pool.get_stats()["rollbacks"] == 1

    def test_thread_safety(self, tmp_path):
        pool = DatabasePool(sqlite_path=str(tmp_path / "t.db"))
        with pool.get_connection() as conn:
            conn.execute("CREATE TABLE t (x INTEGER)")
        errors = []

        def worker(i):
            try:
                for _ in range(20):
                    with pool.get_connection() as conn:
                        conn.execute("INSERT INTO t VALUES (?)", (i,))
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        with pool.get_connection() as conn:
            assert conn.execute("SELECT COUNT(*) c FROM t").fetchone()["c"] == 80

    def test_sqlite_url_prefix(self, tmp_path):
        pool = DatabasePool(database_url=f"sqlite:///{tmp_path}/u.db")
        assert pool.backend == "sqlite"
        assert str(tmp_path) in pool.sqlite_path


class TestRateLimiter:
    def test_bucket_drains_and_refills(self):
        t = [0.0]
        rl = RateLimiter(limit=2, window_seconds=1.0, clock=lambda: t[0])
        assert rl.allow("k") and rl.allow("k")
        assert not rl.allow("k")
        assert rl.retry_after("k") > 0
        t[0] += 0.6  # refill 1.2 tokens
        assert rl.allow("k")
        assert not rl.allow("k")

    def test_keys_independent(self):
        t = [0.0]
        rl = RateLimiter(limit=1, window_seconds=60, clock=lambda: t[0])
        assert rl.allow("a")
        assert rl.allow("b")
        assert not rl.allow("a")
