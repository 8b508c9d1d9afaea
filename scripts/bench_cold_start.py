"""Cold-start artifact: process start -> first SLA-compliant query.

The reference's startup story is lazy connects (service.py:186-197):
first query pays Milvus channel setup + model load, no compile.  A
TPU deployment pays XLA compilation instead — and the persistent
compile cache (RAG_COMPILE_CACHE / JAX_COMPILATION_CACHE_DIR, on by
default in service/app.py) turns the second deploy of the same build
into cache hits.  This script MEASURES that story (VERDICT r3 next
#9): it launches a fresh Python process twice against the same cache
directory — run 1 cold (empty cache), run 2 warm — and records, for
each, the time from process start to

  * ``ready_s``       — pipeline built + corpus ingested + RAG_WARMUP
                        warm_up() done (the rolling-restart gate)
  * ``first_sla_s``   — the first retrieve that completes inside the
                        80 ms SLA budget
  * ``first_query_ms``— the very first retrieve's latency (what a
                        no-warmup deploy's first user would see)

Targets (docs/PERF.md): cold < 60 s, warm < 10 s to first SLA query
on the dev chip (tunnel dispatch inflates both; a pod-local host is
strictly faster).

Writes artifacts/COLD_START.json and prints one JSON line.
Env knobs: COLD_DOCS (default 2000), COLD_SLA_MS (80).
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_repo = str(_Path(__file__).resolve().parent.parent)
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SLA_MS = float(os.environ.get("COLD_SLA_MS", 80.0))
N_DOCS = int(os.environ.get("COLD_DOCS", 2000))


def child() -> None:
    """One measured deploy: build -> ingest -> warm -> query to SLA."""
    t_start = float(os.environ["COLD_T0"])   # parent-stamped exec time

    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.pipeline.orchestrator import AdvancedRAGPipeline

    cfg = PipelineConfig()
    pipe = AdvancedRAGPipeline(cfg)
    docs = [
        {"doc_id": f"d{i}",
         "content": (f"document {i} covers topic {i % 97} with terms "
                     f"alpha{i % 13} beta{i % 29} gamma{i % 53} and a "
                     "paragraph of filler text about retrieval.")}
        for i in range(N_DOCS)
    ]
    pipe.ingest_documents(docs)
    pipe.warm_up()                     # == RAG_WARMUP=1 startup path
    ready_s = time.time() - t_start

    first_query_ms = None
    first_sla_s = None
    for i in range(50):
        t0 = time.perf_counter()
        res = pipe.retrieve(f"topic {i % 97} alpha{i % 13}", top_k=5)
        ms = (time.perf_counter() - t0) * 1e3
        if first_query_ms is None:
            first_query_ms = ms
        if ms <= SLA_MS and res["results"]:
            first_sla_s = time.time() - t_start
            break
    pipe.close()
    print(json.dumps({"ready_s": round(ready_s, 1),
                      "first_query_ms": round(first_query_ms, 1),
                      "first_sla_s": (round(first_sla_s, 1)
                                      if first_sla_s else None)}))


def run_once(label: str, cache_dir: Path) -> dict:
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=str(cache_dir),
               COLD_T0=str(time.time()),
               COLD_CHILD="1")
    out = subprocess.run(
        [sys.executable, __file__], env=env, cwd=str(REPO),
        capture_output=True, text=True, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"{label} run failed:\n{out.stderr[-2000:]}")
    doc = json.loads(out.stdout.strip().splitlines()[-1])
    doc["label"] = label
    return doc


def main() -> None:
    import shutil
    import tempfile

    cache = Path(tempfile.mkdtemp(prefix="jax_cache_cold_"))
    try:
        cold = run_once("cold", cache)       # empty cache: real compiles
        warm = run_once("warm", cache)       # same build: cache hits
    finally:
        shutil.rmtree(cache, ignore_errors=True)
    result = {
        "metric": "cold_start_first_sla_s",
        "value": cold.get("first_sla_s"),
        "unit": "s",
        "extra": {"cold": cold, "warm": warm, "sla_ms": SLA_MS,
                  "docs": N_DOCS,
                  "target_cold_s": 60.0, "target_warm_s": 10.0},
    }
    art = REPO / "artifacts" / "COLD_START.json"
    art.parent.mkdir(exist_ok=True)
    art.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("COLD_CHILD") == "1":
        child()
    else:
        main()
