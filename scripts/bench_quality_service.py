"""End-to-end retrieval quality THROUGH the HTTP service (VERDICT r3
next #6).

The manager-direct quality bench (bench_quality_real.py) exercises the
kernels but not the serving stack: profiles, query rewriting,
over-retrieve, MMR, adaptive weights, the evaluator, micro-batching.
This script measures R@10 / MRR@10 of the SAME harvested corpus and
query protocol through a real `python -m advanced_rag_tpu.service.app`
process — the reference's pipeline-level quality path
(/root/reference/src/advanced_rag/pipeline.py:217-309) — and reports
the delta vs the manager-direct `fused_reranked` tier (target: within
~0.02 R@10; a bigger gap means a profile/MMR/rewrite quality
regression the kernel tests can't see).

Protocol notes:
- The service CHUNKS ingested documents (AdaptiveChunker), so ground
  truth is doc-level: a hit counts when a returned chunk's ``doc_id``
  equals the gold passage's qualname.
- The serving model artifacts come from bench_quality_real.py
  (artifacts/biencoder_ckpt + reranker_ckpt + the dev-picked rank-key
  knobs recorded in QUALITY_REAL.json) — run that first.
- Test half only (queries[1::2]), matching the artifact's protocol.

Writes artifacts/QUALITY_SERVICE.json and prints one JSON line.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_repo = str(_Path(__file__).resolve().parent.parent)
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import json
import os
import signal
import subprocess
import time
import urllib.request
from pathlib import Path

import numpy as np

REPO = Path(_repo)


def _post(port: int, path: str, body: dict, timeout: float = 120.0) -> dict:
    """POST with 429/503 backoff — the service's admission control
    (rate limits, load shedding) answers 429 under burst; a production
    bulk loader backs off and retries rather than failing the batch."""
    delay = 0.5
    for attempt in range(12):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            if e.code not in (429, 503) or attempt == 11:
                raise
            retry_after = e.headers.get("Retry-After")
            time.sleep(float(retry_after) if retry_after else delay)
            delay = min(delay * 2, 15.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8077)
    ap.add_argument("--max-docs", type=int, default=24000)
    ap.add_argument("--queries", type=int, default=384)
    ap.add_argument("--keep-server", action="store_true")
    ap.add_argument("--one", action="store_true",
                    help="single deployment (MMR off) for fast iteration")
    args = ap.parse_args()

    quality = json.loads((REPO / "QUALITY_REAL.json").read_text())
    # serving shape: the dev-picked fused_serving tier when present
    # (k_rerank depth + doc_dedupe chosen on the dev half by
    # bench_quality_real.py), else the protocol fused tier's knobs
    rk = (quality["tiers"].get("fused_serving")
          or quality["tiers"].get("fused_reranked")
          or quality["tiers"]["trained_reranked"])
    serve_top_k = int(rk.get("k_rerank", 48))
    serve_dedupe = "1" if rk.get("doc_dedupe") else "0"
    bi_ckpt = REPO / "artifacts" / "biencoder_ckpt"
    ce_ckpt = REPO / "artifacts" / "reranker_ckpt"
    for p in (bi_ckpt, ce_ckpt):
        if not p.exists():
            raise SystemExit(f"missing {p}: run bench_quality_real.py first")

    # identical harvest + split to bench_quality_real.py (same seed)
    from scripts.bench_quality_real import harvest_docstrings

    print("harvesting (same protocol as QUALITY_REAL)...", flush=True)
    docs = harvest_docstrings(args.max_docs)
    if len(docs) != quality["n_docs"]:
        print(f"WARNING: harvest produced {len(docs)} docs vs "
              f"{quality['n_docs']} in QUALITY_REAL.json — deltas are "
              "indicative only", flush=True)
    rng = np.random.default_rng(0)
    order = rng.permutation(len(docs))
    n_eval = min(args.queries, len(docs) // 4)
    eval_idx = sorted(order[:n_eval].tolist())
    queries = [docs[i][1] for i in eval_idx]
    gold_doc = [docs[i][0] for i in eval_idx]
    test_q, test_gold = queries[1::2], gold_doc[1::2]

    def make_env(mmr_on: bool) -> dict:
        return dict(
        os.environ,
        PYTHONPATH=os.environ.get("PYTHONPATH", "") + f":{REPO}",
        RAG_FUSED_E2E="1",
        RAG_EMBEDDER=f"ckpt:{bi_ckpt.resolve()}",
        RAG_RERANKER=f"ckpt:{ce_ckpt.resolve()}",
        RAG_RERANK_MODE=rk.get("mode", "residual"),
        RAG_RERANK_BASE=rk.get("base", "exact"),
        RAG_RERANK_ALPHA=str(rk.get("alpha", 0.25)),
        RAG_RESCORE_MIX=str(rk.get("mix", 0.5)),
        RAG_DENSE_WEIGHT=str(rk.get("weights", [0.7, 0.3])[0]),
        RAG_SPARSE_WEIGHT=str(rk.get("weights", [0.7, 0.3])[1]),
        RAG_FUSED_DOC_DEDUPE=serve_dedupe,
        ENABLE_MMR="1" if mmr_on else "0",
        ENABLE_ADAPTIVE_WEIGHTS="1",
        # chunk the served corpus at the encoder's window (the manager-
        # direct protocol indexes ~110-word windows; default 512-word
        # chunks would truncate 75% of each chunk at the dense tower)
        RAG_CHUNK_BASE="110",
        RAG_CHUNK_MAX="160",
        RAG_CHUNK_MIN="32",
        # sliding-window ingest at the quality protocol's exact
        # geometry (110-word windows, stride 80): measured +0.01-0.02
        # R@10 over sentence packing (artifacts/ABLATE_SERVICE.json)
        RAG_CHUNK_STRATEGY="window",
        RAG_CHUNK_OVERLAP="0.273",
        # bulk-load admission: this bench measures retrieval quality and
        # true serving latency, not the default admission policy — a
        # 10-req/min ingest bucket would turn a 70-batch corpus load
        # into rate-limiter sleeps and fold 429 backoffs into the
        # query-latency columns
        RAG_INGEST_RPM="100000",
        RAG_RETRIEVE_RPM="100000",
        PORT=str(args.port),
    )
    def run_deployment(mmr_on: bool) -> dict:
        """Boot a server, ingest, warm, query the test half -> row."""
        tag = "mmr_on" if mmr_on else "mmr_off"
        log = open(f"/tmp/quality_service.{tag}.log", "w")
        srv = subprocess.Popen(
            [_sys.executable, "-m", "advanced_rag_tpu.service.app"],
            env=make_env(mmr_on), cwd=str(REPO), stdout=log, stderr=log)
        try:
            # startup work (checkpoint loads + first XLA compiles of a
            # new geometry over the tunnel) happens before the port
            # binds; give a cold build up to 15 min
            for _ in range(450):
                time.sleep(2)
                try:
                    urllib.request.urlopen(
                        f"http://127.0.0.1:{args.port}/healthz", timeout=5)
                    break
                except Exception:
                    if srv.poll() is not None:
                        raise SystemExit(
                            f"service died on startup; {log.name}")
            else:
                raise SystemExit("service never became healthy")

            print(f"[{tag}] ingesting corpus through /ingest...",
                  flush=True)
            t0 = time.perf_counter()
            payload = [{"doc_id": d[0], "content": d[2]} for d in docs]
            for i in range(0, len(payload), 256):
                _post(args.port, "/ingest",
                      {"documents": payload[i:i + 256]}, timeout=600)
            ingest_s = time.perf_counter() - t0
            print(f"  ingested {len(payload)} docs in {ingest_s:.0f}s",
                  flush=True)
            _post(args.port, "/admin/warmup", {"top_k": [serve_top_k]},
                  timeout=1800)

            print(f"[{tag}] querying {len(test_q)} test-half queries...",
                  flush=True)
            hits, rr, lat = 0, 0.0, []
            methods: dict = {}
            n_results, n_empty = [], 0
            for q, gold in zip(test_q, test_gold):
                t0 = time.perf_counter()
                # serve_top_k chunks -> top-10 DISTINCT docs: the
                # slate depth and doc_dedupe flag come from the
                # dev-picked fused_serving shape (bench_quality_real.py)
                out = _post(args.port, "/retrieve",
                            {"query": q, "top_k": serve_top_k}, timeout=60)
                lat.append((time.perf_counter() - t0) * 1e3)
                # serving-path diagnostics: which code path answered
                # (fused_rerank vs staged hybrid), how full the slate is
                # — a silent fallback or shed would tank recall while
                # latency still looks healthy
                n_results.append(len(out["results"]))
                if not out["results"]:
                    n_empty += 1
                else:
                    m = out["results"][0].get("metadata", {}).get(
                        "method", "?")
                    methods[m] = methods.get(m, 0) + 1
                seen, ranked_docs = set(), []
                for r in out["results"]:
                    if r["doc_id"] not in seen:
                        seen.add(r["doc_id"])
                        ranked_docs.append(r["doc_id"])
                ranked_docs = ranked_docs[:10]
                if gold in ranked_docs:
                    hits += 1
                    rr += 1.0 / (ranked_docs.index(gold) + 1)
            n = len(test_q)
            return {
                "recall_at_10": round(hits / n, 4),
                "mrr_at_10": round(rr / n, 4),
                "ms_per_query_p50": round(float(np.percentile(lat, 50)), 1),
                "ms_per_query_p99": round(float(np.percentile(lat, 99)), 1),
                "ingest_s": round(ingest_s, 1),
                "result_methods": methods,
                "empty_results": n_empty,
                "n_results_p50": float(np.percentile(n_results, 50)),
            }
        finally:
            if not args.keep_server:
                srv.send_signal(signal.SIGTERM)
                try:
                    srv.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    srv.kill()
            log.close()

    # two deployments: the full serving stack with MMR on (production
    # default) and off (the manager-direct protocol's setting) — the
    # difference isolates MMR's deliberate diversity/recall trade from
    # any serving-stack quality regression
    row_off = run_deployment(mmr_on=False)
    if not args.one:
        # let the first server's device context fully release before
        # the next boots (observed: back-to-back deployments raced the
        # chip into a FAILED_PRECONDITION on the second ingest)
        time.sleep(20)
    row_on = None if args.one else run_deployment(mmr_on=True)
    ref = rk.get("recall_at_10")
    result = {
        "metric": "service_e2e_recall_at_10",
        "value": row_off["recall_at_10"],
        "unit": "recall",
        "extra": {
            "service_e2e": row_off,
            "service_e2e_mmr_on": row_on,   # None under --one
            "manager_direct_fused": {"recall_at_10": ref,
                                     "mrr_at_10": rk.get("mrr_at_10")},
            "delta_recall": (round(row_off["recall_at_10"] - ref, 4)
                             if ref is not None else None),
            "mmr_recall_cost": (round(
                row_off["recall_at_10"] - row_on["recall_at_10"], 4)
                if row_on else None),
            "n_docs": len(docs), "n_queries": len(test_q),
            "knobs": {k: rk.get(k) for k in
                      ("base", "mix", "mode", "alpha", "weights")},
        },
    }
    art = REPO / "artifacts" / "QUALITY_SERVICE.json"
    art.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
