"""Demo script asserting the L2 infra primitives work end-to-end
(capability parity with reference verify_optimizations.py:23-214):
DB pool, circuit breaker, embedding cache, exception hierarchy,
constants, rate limiter, micro-batcher.

Run: python verify_optimizations.py
"""

from __future__ import annotations

import tempfile
import time


def check_db_pool() -> None:
    from advanced_rag_tpu.utils.db_pool import DatabasePool

    with tempfile.TemporaryDirectory() as tmp:
        pool = DatabasePool(sqlite_path=f"{tmp}/t.db")
        with pool.get_connection() as conn:
            conn.execute("CREATE TABLE t (x INTEGER)")
            conn.execute("INSERT INTO t VALUES (42)")
        with pool.get_connection() as conn:
            assert conn.execute("SELECT x FROM t").fetchone()["x"] == 42
        assert pool.get_stats()["commits"] == 2
    print("db pool: OK")


def check_circuit_breaker() -> None:
    from advanced_rag_tpu.utils.circuit_breaker import (
        CircuitBreaker, CircuitBreakerConfig, CircuitState)

    cb = CircuitBreaker(CircuitBreakerConfig(
        failure_threshold=2, timeout_seconds=0.05, success_threshold=1))
    cb.record_failure(); cb.record_failure()
    assert cb.state == CircuitState.OPEN and cb.is_open()
    time.sleep(0.06)
    assert cb.state == CircuitState.HALF_OPEN
    cb.record_success()
    assert cb.state == CircuitState.CLOSED
    print("circuit breaker: OK")


def check_embedding_cache() -> None:
    import numpy as np

    from advanced_rag_tpu.utils.cache import EmbeddingCache

    cache = EmbeddingCache(capacity=2, ttl_seconds=60)
    cache.put_sync("a", np.ones(4, np.float32), "ns")
    assert cache.get_sync("a", "ns") is not None
    cache.put_sync("b", np.ones(4, np.float32), "ns")
    cache.put_sync("c", np.ones(4, np.float32), "ns")  # evicts oldest
    stats = cache.get_stats()
    assert stats.size <= 2
    print("embedding cache: OK")


def check_exceptions() -> None:
    from advanced_rag_tpu.utils import exceptions as ex

    assert issubclass(ex.RetrievalError, ex.AdvancedRAGException)
    assert ex.RAGException is ex.AdvancedRAGException
    err = ex.ValidationError("bad", details={"field": "k"})
    assert err.details["field"] == "k"
    print("exceptions: OK")


def check_constants() -> None:
    from advanced_rag_tpu.utils.constants import (
        PerformanceConstants, RetrievalConstants)

    assert PerformanceConstants.TARGET_LATENCY_MS == 80.0
    assert RetrievalConstants.RRF_K == 60
    print("constants: OK")


def check_rate_limiter() -> None:
    from advanced_rag_tpu.utils.rate_limit import RateLimiter

    t = [0.0]
    rl = RateLimiter(limit=1, window_seconds=60, clock=lambda: t[0])
    assert rl.allow("k") and not rl.allow("k")
    print("rate limiter: OK")


def check_micro_batcher() -> None:
    import concurrent.futures

    from advanced_rag_tpu.pipeline.batcher import MicroBatcher

    mb = MicroBatcher(lambda qs: [q * 2 for q in qs], max_wait_s=0.02)
    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        futs = [pool.submit(mb.submit, "k", f"q{i}") for i in range(4)]
        assert sorted(f.result() for f in futs) == [f"q{i}q{i}" for i in range(4)]
    print(f"micro batcher: OK (max batch seen {mb.stats['max_seen']})")


if __name__ == "__main__":
    check_db_pool()
    check_circuit_breaker()
    check_embedding_cache()
    check_exceptions()
    check_constants()
    check_rate_limiter()
    check_micro_batcher()
    print("all optimizations verified")
