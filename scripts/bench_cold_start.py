"""Cold-start artifact: process start -> first SLA-compliant query.

The reference's startup story is lazy connects (service.py:186-197):
a restarted service reconnects to Milvus, which ALREADY HOLDS the
corpus — no re-ingest.  The TPU deployment's equivalent is the index
checkpoint: RAG_CHECKPOINT_DIR restores the staged corpus on boot
(service/app.py boot-restore; utils/checkpoint.py load_index streams
the embedding matrices to HBM in one put per family), then RAG_WARMUP
compiles the retrieval shapes.  What the TPU pays that Milvus doesn't
is XLA compilation — and the persistent compile cache
(JAX_COMPILATION_CACHE_DIR) turns the second deploy of the same build
into cache hits.

This script MEASURES that story (VERDICT r3 next #9):

  * one UNMEASURED seed run ingests COLD_DOCS docs and save_index()es
    them — the analogue of the Milvus collection already existing;
  * run 1 (cold): fresh process, EMPTY XLA cache — restore + warm_up
    + query, every compile real;
  * run 2 (warm): fresh process, same cache dir — the same deploy
    with compile-cache hits (a rolling restart of the same build).

Each measured run records time from process start to

  * ``ready_s``       — pipeline built + checkpoint restored +
                        warm_up() done (the rolling-restart gate)
  * ``first_sla_s``   — the first retrieve that completes inside the
                        80 ms SLA budget
  * ``first_query_ms``— the very first retrieve's latency (what a
                        no-warmup deploy's first user would see)

A full re-ingest at boot is NOT this benchmark (the reference never
re-embeds its corpus on restart either); the one-time ingest cost is
reported as ``extra.seed_ingest_s`` for reference.

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


def _maybe_cpu() -> None:
    """COLD_CPU=1: run the measured children on the CPU backend (protocol
    validation / CI smoke without a chip; numbers are not the artifact)."""
    if os.environ.get("COLD_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")


def _mk_docs() -> list:
    return [
        {"doc_id": f"d{i}",
         "content": (f"document {i} covers topic {i % 97} with terms "
                     f"alpha{i % 13} beta{i % 29} gamma{i % 53} and a "
                     "paragraph of filler text about retrieval.")}
        for i in range(N_DOCS)
    ]


def seed() -> None:
    """Unmeasured: ingest the corpus once and save the index checkpoint
    (the analogue of the Milvus collection already holding the data)."""
    _maybe_cpu()
    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.pipeline.orchestrator import AdvancedRAGPipeline
    from advanced_rag_tpu.utils.checkpoint import save_index

    t0 = time.time()
    pipe = AdvancedRAGPipeline(PipelineConfig())
    pipe.ingest_documents(_mk_docs())
    save_index(pipe.index_manager, os.environ["COLD_CKPT"])
    pipe.close()
    print(json.dumps({"seed_ingest_s": round(time.time() - t0, 1)}))


def child() -> None:
    """One measured deploy: build -> restore checkpoint -> warm ->
    query to SLA (the service boot path, service/app.py boot-restore)."""
    t_start = float(os.environ["COLD_T0"])   # parent-stamped exec time

    _maybe_cpu()
    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.pipeline.orchestrator import AdvancedRAGPipeline
    from advanced_rag_tpu.utils.checkpoint import load_index

    cfg = PipelineConfig()
    pipe = AdvancedRAGPipeline(cfg)
    t_build = time.time()
    load_index(pipe.index_manager, os.environ["COLD_CKPT"])
    t_restore = time.time()
    # == RAG_WARMUP=1 startup path; threaded compile overlap is the
    # serving default (COLD_WARMUP_PARALLEL=0 measures serial compiles)
    pipe.warm_up(parallel=os.environ.get(
        "COLD_WARMUP_PARALLEL", "1") != "0")
    t_warm = time.time()
    ready_s = t_warm - t_start
    phases = {"build_s": round(t_build - t_start, 1),
              "restore_s": round(t_restore - t_build, 1),
              "warmup_s": round(t_warm - t_restore, 1)}

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
                                      if first_sla_s else None),
                      "phases": phases}))


def run_once(label: str, cache_dir: Path, ckpt: Path,
             mode: str = "1") -> dict:
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=str(cache_dir),
               COLD_T0=str(time.time()),
               COLD_CKPT=str(ckpt),
               COLD_CHILD=mode)
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
    ckpt = Path(tempfile.mkdtemp(prefix="cold_ckpt_"))
    try:
        # seed with a THROWAWAY cache: the measured cold run must see
        # an empty one (the seed process compiles ingest shapes the
        # deploy path never runs, but also some shared ones)
        seed_cache = Path(tempfile.mkdtemp(prefix="jax_cache_seed_"))
        try:
            seeded = run_once("seed", seed_cache, ckpt, mode="seed")
        finally:
            shutil.rmtree(seed_cache, ignore_errors=True)
        cold = run_once("cold", cache, ckpt)  # empty cache: real compiles
        warm = run_once("warm", cache, ckpt)  # same build: cache hits
    finally:
        shutil.rmtree(cache, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    result = {
        "metric": "cold_start_first_sla_s",
        "value": cold.get("first_sla_s"),
        "unit": "s",
        "extra": {"cold": cold, "warm": warm, "sla_ms": SLA_MS,
                  "docs": N_DOCS,
                  "seed_ingest_s": seeded.get("seed_ingest_s"),
                  "protocol": "restore-from-index-checkpoint (the "
                              "reference restart never re-ingests "
                              "either; Milvus holds the collection)",
                  "deploy_protocol": (
                      "scripts/bake_serving_cache.py at image build "
                      "pre-fills JAX_COMPILATION_CACHE_DIR, so the "
                      "FIRST production boot measures as the warm row "
                      "(every compile a cache hit); the cold row is "
                      "the no-bake worst case"),
                  "target_cold_s": 60.0, "target_warm_s": 10.0},
    }
    art = REPO / "artifacts" / "COLD_START.json"
    art.parent.mkdir(exist_ok=True)
    art.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("COLD_CHILD") == "seed":
        seed()
    elif os.environ.get("COLD_CHILD") == "1":
        child()
    else:
        main()
