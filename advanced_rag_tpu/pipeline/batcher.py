"""Query micro-batching: coalesce concurrent searches into one dispatch.

The reference handles concurrency with per-request asyncio fan-out
(service.py:137-149 semaphore(64)); on TPU the winning shape is the
opposite — ONE fused program over a query batch (measured: batch-8
hybrid search gives ~8x the single-query throughput at ~equal latency).

Leader-follower protocol over plain threads (the service already hops
to a thread pool per request): the first arrival for a batch key
becomes leader, waits ``max_wait_s`` for followers, then runs the
batched search and distributes results.  Requests only coalesce when
their ENTIRE knob set (k, weights, mmr, filters) matches, so semantics
are identical to unbatched execution.
"""

from __future__ import annotations

import concurrent.futures
import threading
import time
from typing import Any, Callable, Dict, Hashable, List, Tuple


class MicroBatcher:
    """Coalesces ``submit`` calls that share a key into one batch call."""

    def __init__(
        self,
        batch_fn: Callable[..., List[Any]],
        # batch_fn(queries: list[str], **kwargs) -> list of per-query results
        max_batch: int = 8,
        max_wait_s: float = 0.003,
    ):
        self._batch_fn = batch_fn
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self._lock = threading.Lock()
        self._queues: Dict[Hashable, List[Tuple[str, concurrent.futures.Future]]] = {}
        self.stats = {"batches": 0, "requests": 0, "max_seen": 0}

    def submit(self, key: Hashable, query: str, **kwargs: Any) -> Any:
        """Block until this query's result is available.  ``kwargs`` must
        be identical for every request sharing ``key`` (the key should be
        derived from them)."""
        future: concurrent.futures.Future = concurrent.futures.Future()
        with self._lock:
            queue = self._queues.get(key)
            leader = queue is None
            if leader:
                queue = []
                self._queues[key] = queue
            queue.append((query, future))
        if not leader:
            return future.result()

        # Leader: give followers a window to pile on, then take the batch.
        if self.max_wait_s > 0:
            deadline = time.monotonic() + self.max_wait_s
            while time.monotonic() < deadline:
                with self._lock:
                    if len(self._queues.get(key, ())) >= self.max_batch:
                        break
                time.sleep(self.max_wait_s / 8)
        with self._lock:
            batch = self._queues.pop(key, [])
        if not batch:  # pragma: no cover - defensive
            raise RuntimeError("micro-batch queue vanished")

        self.stats["batches"] += 1
        self.stats["requests"] += len(batch)
        self.stats["max_seen"] = max(self.stats["max_seen"], len(batch))
        queries = [q for q, _ in batch]
        try:
            results = self._batch_fn(queries, **kwargs)
            if len(results) != len(batch):
                raise RuntimeError(
                    f"batch_fn returned {len(results)} results for "
                    f"{len(batch)} queries")
        except Exception as exc:
            for _, f in batch:
                if not f.done():
                    f.set_exception(exc)
            raise
        for (_, f), res in zip(batch, results):
            f.set_result(res)
        return future.result()


__all__ = ["MicroBatcher"]
