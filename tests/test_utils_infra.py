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


class TestDBPoolEdges:
    def test_postgres_without_psycopg2_raises(self, monkeypatch):
        import builtins
        import pytest as _pytest

        from advanced_rag_tpu.utils.db_pool import DatabasePool

        real_import = builtins.__import__

        def fake_import(name, *a, **k):
            if name.startswith("psycopg2"):
                raise ImportError("no psycopg2 in this environment")
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", fake_import)
        with _pytest.raises(Exception) as exc:
            DatabasePool(database_url="postgresql://u:p@h/db")
        assert "psycopg2" in str(exc.value)

    def test_module_singleton_lifecycle(self, tmp_path):
        from advanced_rag_tpu.utils import db_pool as dp

        pool = dp.initialize_pool("", str(tmp_path / "x.db"))
        assert dp.get_pool() is pool
        with pool.get_connection() as conn:
            conn.execute("CREATE TABLE t (a INT)")
        stats = pool.get_stats()
        assert stats["backend"] == "sqlite"
        dp.close_pool()

    def test_close_is_idempotent(self, tmp_path):
        from advanced_rag_tpu.utils.db_pool import DatabasePool

        p = DatabasePool(sqlite_path=str(tmp_path / "y.db"))
        with p.get_connection() as conn:
            conn.execute("SELECT 1")
        p.close()
        p.close()


class TestEmbeddingCacheAsync:
    async def test_async_get_put_roundtrip(self):
        import numpy as np

        from advanced_rag_tpu.utils.cache import EmbeddingCache

        c = EmbeddingCache(capacity=4, ttl_seconds=60)
        assert await c.get("missing") is None
        await c.put("hello", np.ones(3, np.float32))
        got = await c.get("hello")
        assert got is not None and got.shape == (3,)

    async def test_async_get_or_compute_sync_and_async_fns(self):
        import numpy as np

        from advanced_rag_tpu.utils.cache import EmbeddingCache

        c = EmbeddingCache(capacity=4, ttl_seconds=60)

        def sync_fn(_text):
            return np.full(2, 7.0, np.float32)

        v1 = await c.get_or_compute("a", sync_fn)
        assert v1[0] == 7.0

        async def async_fn(_text):
            return np.full(2, 9.0, np.float32)

        v2 = await c.get_or_compute("b", async_fn)
        assert v2[0] == 9.0
        # cached: compute fn must not be called again
        v3 = await c.get_or_compute(
            "b", lambda _t: (_ for _ in ()).throw(AssertionError))
        assert v3[0] == 9.0

    def test_ttl_eviction_and_capacity(self, monkeypatch):
        import time as _time

        import numpy as np

        from advanced_rag_tpu.utils.cache import EmbeddingCache

        c = EmbeddingCache(capacity=2, ttl_seconds=0.01)
        c.put_sync("x", np.zeros(1, np.float32))
        _time.sleep(0.03)
        assert c.get_sync("x") is None          # TTL expired
        c.put_sync("a", np.zeros(1, np.float32))
        c.put_sync("b", np.zeros(1, np.float32))
        c.put_sync("c", np.zeros(1, np.float32))  # FIFO evicts oldest
        stats = c.get_stats()
        assert stats.size <= 2

    def test_family_singletons(self):
        from advanced_rag_tpu.utils.cache import get_cache

        assert get_cache("semantic") is get_cache("semantic")
        assert get_cache("semantic") is not get_cache("domain")


class TestDeviceTiming:
    """utils/timing.py — the honest-measurement layer under the bench."""

    def test_zero_scalar_is_fold_proof(self):
        """The zero must survive jit: `v * 0.0` constant-folds to 0.0,
        severing the data chain and letting XLA dead-code-eliminate the
        timed body (observed: 50 kernel calls 'ran' in 0 ms)."""
        import jax
        import jax.numpy as jnp

        from advanced_rag_tpu.utils.timing import zero_scalar_of

        @jax.jit
        def f(x):
            return zero_scalar_of(x * 2.0)

        hlo = jax.jit(f).lower(jnp.ones((4,))).compile().as_text()
        assert float(f(jnp.ones((4,)))) == 0.0
        # the compiled program must still depend on the input
        assert "parameter(0)" in hlo or "Arg_0" in hlo

    def test_scanned_ms_runs_and_is_nonnegative(self):
        import jax.numpy as jnp

        from advanced_rag_tpu.utils.timing import scanned_ms

        x = jnp.ones((8, 64), jnp.float32)
        ms = scanned_ms(lambda eps, xx: (xx + eps) * 1.5, rounds=5,
                        operands=(x,))
        assert ms >= 0.0

    def test_scanned_ms_scales_with_work(self):
        """A 128x-bigger matmul must not time at ~0 (DCE canary)."""
        import jax.numpy as jnp

        from advanced_rag_tpu.utils.timing import scanned_ms

        small = jnp.ones((16, 16), jnp.float32)
        big = jnp.ones((512, 512), jnp.float32)
        ms_small = scanned_ms(
            lambda eps, a: (a + eps) @ a.T, rounds=20, operands=(small,))
        ms_big = scanned_ms(
            lambda eps, a: (a + eps) @ a.T, rounds=20, operands=(big,))
        assert ms_big > ms_small


class TestMutationHardening:
    """Pin stat-counter and backend-switch exactness (round-5 mutation
    survivors: cache.py expiration accounting, db_pool.py close path)."""

    def test_cache_expiration_counts_exactly_once(self):
        import time as _time

        import numpy as np

        from advanced_rag_tpu.utils.cache import EmbeddingCache

        c = EmbeddingCache(capacity=4, ttl_seconds=0.01)
        c.put_sync("x", np.zeros(1, np.float32))
        _time.sleep(0.03)
        assert c.get_sync("x") is None
        s = c.get_stats()
        assert s.expirations == 1
        assert s.misses == 1
        assert s.hits == 0
        assert s.size == 0          # expired entry actually removed
        # a later hit counts as exactly one hit
        c.put_sync("y", np.zeros(1, np.float32))
        assert c.get_sync("y") is not None
        assert c.get_stats().hits == 1

    def test_sqlite_close_never_touches_pg_pool(self, tmp_path):
        from advanced_rag_tpu.utils.db_pool import DatabasePool

        p = DatabasePool(sqlite_path=str(tmp_path / "t.db"))
        with p.get_connection() as conn:
            conn.execute("CREATE TABLE t (x INTEGER)")
        assert p.get_stats()["backend"] == "sqlite"
        # the close path must take the sqlite branch (a flipped backend
        # guard would call closeall() on the absent pg pool and raise)
        p.close()
