"""Service-level load test: sustained QPS + p99-under-load over HTTP.

The reference claims "100+ QPS with sharding" (README.md:304) with a
P95 < 300 ms endpoint SLO (docs/SLO.md:10) but ships no load test.
This drives the REAL service (aiohttp + micro-batcher + device index)
with concurrent HTTP clients and reports sustained throughput and
latency percentiles, the numbers those claims are about.

Starts its own service in-process (no separate deployment needed),
ingests a corpus, then runs closed-loop clients for --duration.

Usage:
  python scripts/bench_service_load.py [--clients 32] [--duration 30]
                                       [--docs 500] [--port 8123]
Prints one JSON line.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_repo = str(_Path(__file__).resolve().parent.parent)
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import asyncio
import json
import os
import time

import numpy as np

WORDS = ("tensor fusion retrieval ranking sparse dense kernel corpus "
         "query index shard latency throughput systolic matrix memory "
         "bandwidth pipeline compile batch gather quantize residual "
         "centroid partition token encoder attention pooling checkpoint "
         "audit drift failure breaker cache postings scan").split()


def make_docs(n: int, rng: np.random.Generator) -> list:
    docs = []
    for i in range(n):
        body = " ".join(rng.choice(WORDS, size=60))
        docs.append({"doc_id": f"doc-{i}", "content": f"Document {i}: {body}."})
    return docs


async def run(args) -> None:
    from aiohttp import ClientSession, ClientTimeout, web

    from advanced_rag_tpu.service import create_app

    os.environ.pop("API_KEY", None)
    # lift the ingest/retrieve token buckets: this test measures the
    # engine, not the limiter (limits stay on in production)
    os.environ["RAG_MAX_CONCURRENCY"] = str(max(64, args.clients))
    # ramp safety: cold compiles exceed the strict 300 ms budget, which
    # would trip the breaker and 503 the whole run.  The endpoint SLO
    # is still REPORTED (p95/p99 vs 300 ms); it just doesn't gate the
    # harness.  Production keeps the strict budget + breaker.
    os.environ.setdefault("RAG_RETRIEVE_TIMEOUT_MS", "2000")
    os.environ.setdefault("RAG_CB_FAILURES", "1000000")
    app = create_app()
    for limiter in app["state"].limiters.values():
        limiter.rate = 10**9
        limiter.capacity = 10**9
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", args.port)
    await site.start()

    rng = np.random.default_rng(0)
    base = f"http://127.0.0.1:{args.port}"
    async with ClientSession(timeout=ClientTimeout(total=600)) as s:
        t0 = time.perf_counter()
        docs = make_docs(args.docs, rng)
        for i in range(0, len(docs), 100):
            r = await s.post(f"{base}/ingest",
                             json={"documents": docs[i:i + 100]})
            assert r.status == 200, await r.text()
        ingest_s = time.perf_counter() - t0

        # deterministic warmup: compile every (k-bucket x pow2
        # micro-batch bucket) program shape for the k the clients use.
        # (HTTP-burst "warming" was tried first: continuous batching
        # coalesces arbitrary sizes, so bursts leave buckets unformed
        # and they compile seconds-long mid-run — measured p95 8.6 s.)
        r = await s.post(f"{base}/admin/warmup", json={"top_k": [args.top_k]})
        print("warmup:", await r.json(), flush=True)
        # touch the HTTP path end-to-end once per client
        await asyncio.gather(*[
            s.post(f"{base}/retrieve",
                   json={"query": f"warm up {i}", "top_k": args.top_k})
            for i in range(args.clients)])

        lat: list = []
        errors = degraded = rejected = 0
        stop_at = time.perf_counter() + args.duration

        async def client(cid: int) -> int:
            nonlocal errors, degraded, rejected
            done = 0
            crng = np.random.default_rng(cid)
            while time.perf_counter() < stop_at:
                q = " ".join(crng.choice(WORDS, size=6))
                t = time.perf_counter()
                try:
                    r = await s.post(f"{base}/retrieve",
                                     json={"query": q, "top_k": args.top_k})
                    body = await r.json()
                    if r.status == 429:
                        # admission/shed reject — first-class SLO column
                        rejected += 1
                        await asyncio.sleep(0.05)
                        continue
                    if r.status != 200 or "results" not in body:
                        errors += 1
                        await asyncio.sleep(0.05)   # no hot error loop
                        continue
                    if not body["results"]:
                        # contract degrade-to-empty under the strict
                        # internal 300 ms budget — not an error, but
                        # not a served result either.  Back off so the
                        # retry doesn't hot-loop the saturated engine
                        # (closed-loop clients spinning on degrades is a
                        # self-sustaining collapse).
                        degraded += 1
                        await asyncio.sleep(0.02)
                        continue
                except Exception:
                    errors += 1
                    await asyncio.sleep(0.05)
                    continue
                lat.append((time.perf_counter() - t) * 1e3)
                done += 1
            return done

        t0 = time.perf_counter()
        counts = await asyncio.gather(
            *[client(i) for i in range(args.clients)])
        elapsed = time.perf_counter() - t0

        # stage breakdown + micro-batch coalescing from the live service
        perf = await (await s.get(f"{base}/perf")).json()

    await runner.cleanup()
    total = int(sum(counts))
    attempts = total + errors + degraded + rejected
    # shed budget (docs/SLO.md): EVERYTHING the user did not get a real
    # answer for — 429 rejects, degraded-empty 200s, and hard errors
    shed = errors + degraded + rejected
    out = {
        "metric": "service_qps_under_load",
        "value": round(total / elapsed, 1),
        "unit": "qps",
        "vs_baseline": round(total / elapsed / 100.0, 2),  # "100+ QPS" claim
        "extra": {
            "clients": args.clients,
            "duration_s": round(elapsed, 1),
            "requests": total,
            "errors": errors,
            "degraded_to_empty": degraded,
            "rejected_429": rejected,
            "shed_pct": round(100.0 * shed / max(attempts, 1), 2),
            "shed_budget_pct": 0.5,
            "shed_budget_met": shed / max(attempts, 1) <= 0.005,
            "p50_ms": round(float(np.percentile(lat, 50)), 1) if lat else None,
            "p95_ms": round(float(np.percentile(lat, 95)), 1) if lat else None,
            "p99_ms": round(float(np.percentile(lat, 99)), 1) if lat else None,
            "endpoint_slo_ms": 300.0,
            "docs": args.docs,
            "ingest_s": round(ingest_s, 1),
            "stages_p50_ms": {k: round(v["p50"], 1)
                              for k, v in perf["stages_ms"].items()},
            "micro_batcher": perf.get("micro_batcher"),
            "fused_micro_batcher": perf.get("fused_micro_batcher"),
        },
    }
    print(json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--top-k", type=int, default=5,
                    help="retrieve depth per request (the quality-"
                         "serving config uses 48)")
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--docs", type=int, default=500)
    ap.add_argument("--port", type=int, default=8123)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU jax backend (script smoke only; "
                         "published numbers come from the TPU run)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    asyncio.run(run(args))


if __name__ == "__main__":
    main()
