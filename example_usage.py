"""End-to-end walkthrough (capability parity with reference
example_usage.py:21-285): ingest 3 docs -> 3 queries -> drift check ->
performance report -> compliance report — all on the device index.

Run: python example_usage.py
"""

from __future__ import annotations

import json

from advanced_rag_tpu import AdvancedRAGPipeline, PipelineConfig

DOCUMENTS = [
    {
        "doc_id": "tpu-architecture",
        "content": (
            "TPU systolic arrays excel at dense matrix multiplication. "
            "The MXU is a 128x128 grid that consumes bfloat16 tiles and "
            "accumulates in float32. XLA compiles whole programs, fusing "
            "elementwise operations into matrix multiplies so HBM "
            "bandwidth is spent once per operand. Scaling beyond one chip "
            "uses a device mesh with collectives over ICI links."
        ),
    },
    {
        "doc_id": "hybrid-retrieval",
        "content": (
            "Retrieval augmented generation grounds a language model in "
            "retrieved context. Hybrid retrieval fuses dense embedding "
            "similarity with sparse BM25 lexical scores using reciprocal "
            "rank fusion. Maximal marginal relevance then diversifies the "
            "fused candidates, and a cross-encoder reranks the survivors."
        ),
    },
    {
        "doc_id": "operations",
        "content": (
            "Production retrieval services degrade gracefully. Circuit "
            "breakers stop cascading failures, timeouts bound tail "
            "latency, and rate limits protect ingestion. Compliance "
            "requires audit logs, document versioning, legal holds, and "
            "the right to be forgotten."
        ),
    },
]

QUERIES = [
    "how does the MXU multiply matrices?",
    "what fuses dense and sparse retrieval scores?",
    "how do services degrade gracefully under failure?",
]


def main() -> None:
    pipeline = AdvancedRAGPipeline(PipelineConfig())

    print("=== ingest ===")
    report = pipeline.ingest_documents(DOCUMENTS)
    print(f"documents={report['documents']} chunks={report['indexed']} "
          f"elapsed={report['elapsed_ms']:.0f}ms flags={report['quality_flags']}")

    print("\n=== retrieve ===")
    for query in QUERIES:
        out = pipeline.retrieve(query)
        top = out["results"][0] if out["results"] else None
        m = out["metrics"]
        print(f"\nQ: {query}")
        if top:
            print(f"  top: [{top.doc_id}] score={top.score:.4f}")
            print(f"  {top.content[:90]}...")
        print(f"  latency={out['latency_ms']:.1f}ms sla_met={out['sla_met']} "
              f"hallucination_risk={m.hallucination_risk:.3f} "
              f"confidence={m.confidence:.3f}")

    print("\n=== plan and execute ===")
    plan = pipeline.plan_and_execute(
        "explain the MXU systolic array and describe reciprocal rank fusion")
    print(f"sub-queries: {plan['sub_queries']}")
    print(f"merged results from: {[r.doc_id for r in plan['results'][:4]]}")

    print("\n=== drift ===")
    drift = pipeline.detect_drift(QUERIES)
    print(f"detected={drift.drift_detected} magnitude={drift.magnitude:.4f}")
    print(f"recommendations: {drift.recommendations[0]}")

    print("\n=== performance report ===")
    perf = pipeline.get_performance_report()
    print(f"retrieve p50={perf['retrieve_ms']['p50']:.1f}ms "
          f"p99={perf['retrieve_ms']['p99']:.1f}ms "
          f"sla_compliance={perf['sla_compliance']:.2f}")

    print("\n=== compliance report ===")
    print(json.dumps(pipeline.compliance.generate_compliance_report(),
                     indent=2, default=str)[:600])

    pipeline.close()


if __name__ == "__main__":
    main()
