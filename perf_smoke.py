"""CI perf smoke (capability parity with reference perf_smoke.py:15-36):
ingest 3 docs + run retrieves, print stage milliseconds, fail on gross
regression.  Runs anywhere (CPU or TPU); thresholds are generous because
CI machines vary — bench.py is the real benchmark.
"""

from __future__ import annotations

import sys
import time

from advanced_rag_tpu import AdvancedRAGPipeline

DOCS = [
    "TPU systolic arrays excel at matrix multiplication and XLA fusion.",
    "Hybrid retrieval fuses dense embeddings with sparse BM25 scores.",
    "Circuit breakers and timeouts keep retrieval services degradable.",
]

INGEST_BUDGET_MS = 120_000   # includes first-compile
STEADY_RETRIEVE_BUDGET_MS = 5_000


def main() -> int:
    pipeline = AdvancedRAGPipeline()
    t0 = time.perf_counter()
    pipeline.ingest_documents(DOCS)
    ingest_ms = (time.perf_counter() - t0) * 1e3

    pipeline.retrieve("warm up the search program")  # compile
    t0 = time.perf_counter()
    out = pipeline.retrieve("what fuses dense and sparse scores?")
    steady_ms = (time.perf_counter() - t0) * 1e3

    print(f"ingest_ms={ingest_ms:.0f} steady_retrieve_ms={steady_ms:.1f} "
          f"results={len(out['results'])}")
    if ingest_ms > INGEST_BUDGET_MS or steady_ms > STEADY_RETRIEVE_BUDGET_MS:
        print("PERF SMOKE FAILED", file=sys.stderr)
        return 1
    if not out["results"]:
        print("NO RESULTS", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
