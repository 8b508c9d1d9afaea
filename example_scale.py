"""Scale-tier walkthrough: IVF + SQ8 + auto-tune + background maintenance.

Companion to example_usage.py (which mirrors the reference demo at
small scale).  This one exercises the knobs a production deployment at
1M-30M chunks uses:

  1. int8 SQ8 semantic storage  (PipelineConfig.semantic_dtype)
  2. bulk ingest -> IVF build   (DenseIndex.build_ivf)
  3. recall-targeted nprobe     (DenseIndex.tune_nprobe)
  4. fused hybrid search through the IVF path
  5. streaming appends -> exact-scan tail -> maintenance rebuild
  6. delete -> postings compaction
  7. the >30M tier: PQ codes + IVF-PQ residual partitions
     (semantic_dtype="pq", exact hybrid via host re-fusion)

Runs in ~a minute on CPU (small corpus stands in for the big one; the
code path is identical — only shapes change).
"""

from __future__ import annotations

import numpy as np

from advanced_rag_tpu.config import PipelineConfig
from advanced_rag_tpu.index.corpus import ChunkRecord
from advanced_rag_tpu.index.manager import MultiIndexManager


def main() -> None:
    rng = np.random.default_rng(0)
    topics = ["signal processing", "beekeeping", "solar inverters",
              "ocean currents", "compiler design", "knitting patterns",
              "volcanic soils", "auction theory"]

    print("== 1. manager with int8 SQ8 semantic storage")
    mgr = MultiIndexManager(
        config=PipelineConfig(semantic_dim=64, semantic_dtype="int8"))
    docs = [
        ChunkRecord(
            chunk_id=f"c{i}", doc_id=f"doc{i % 64}",
            content=(f"note {i} on {topics[i % len(topics)]}: "
                     f"observation {i * 7 % 101} and method {i % 13}"))
        for i in range(2048)
    ]
    report = mgr.index_chunks(docs)
    print(f"   ingested {report['indexed']} chunks, "
          f"semantic dtype={mgr.semantic.emb.dtype}")

    print("== 2. IVF build")
    mgr.semantic.build_ivf(nlist=32)
    stats = mgr.get_collection_stats()["semantic"]
    print(f"   ivf={stats['ivf']}  memory={stats['memory_bytes']/1e6:.1f} MB")

    print("== 3. recall-targeted nprobe auto-tune")
    npb, rec = mgr.semantic.tune_nprobe(recall_target=0.95, k=10, sample=32)
    print(f"   nprobe={npb}  achieved recall@10={rec:.3f}")

    print("== 4. fused hybrid search (dense_impl='ivf' selected)")
    hits = mgr.hybrid_search_batch_sync(
        ["note 80 on signal processing"], 5)[0]
    print("   top:", [h["chunk_id"] for h in hits])

    print("== 5. streaming appends -> tail -> maintenance rebuild")
    fresh = [ChunkRecord(chunk_id=f"f{i}", doc_id="fresh",
                         content=f"brand new bulletin {i} about zeppelins")
             for i in range(600)]
    mgr.index_chunks(fresh)
    print(f"   tail rows={mgr.semantic.ivf_tail_rows} "
          f"needs_rebuild={mgr.semantic.ivf_needs_rebuild}")
    hits = mgr.hybrid_search_batch_sync(["bulletin 42 about zeppelins"], 3)[0]
    print("   tail retrievable:", hits[0]["chunk_id"])
    out = mgr.maintenance_tick()
    print(f"   maintenance: {out}")

    print("== 6. delete -> postings compaction")
    mgr.sparse.build_postings()
    deleted = mgr.delete_by_filter({"doc_id": "fresh"})
    print(f"   deleted {deleted} rows, "
          f"stale={mgr.sparse.postings_stale_fraction:.2f}")
    out = mgr.maintenance_tick()
    print(f"   maintenance: {out}")
    hits = mgr.hybrid_search_batch_sync(["bulletin 42 about zeppelins"], 3)[0]
    assert all(h["doc_id"] != "fresh" for h in hits)
    print("   deleted docs no longer retrievable.")

    print("== 7. PQ + IVF-PQ tier (the >30M-rows/chip configuration)")
    mpq = MultiIndexManager(
        config=PipelineConfig(semantic_dim=64, semantic_dtype="pq"))
    mpq.index_chunks(docs)
    mpq.semantic.build_pq()       # flat codes: ~16x smaller than f32
    mpq.semantic.build_ivf()      # pq mode -> residual IVF-PQ partitions
    npb, rec = mpq.semantic.tune_nprobe(recall_target=0.95, k=10, sample=32)
    stats = mpq.get_collection_stats()["semantic"]
    print(f"   pq={mpq.semantic.has_pq} ivfpq={mpq.semantic.has_ivfpq} "
          f"nprobe={npb} recall@10={rec:.3f} "
          f"memory={stats['memory_bytes']/1e6:.1f} MB")
    hits = mpq.hybrid_search_batch_sync(
        ["note 80 on signal processing"], 5)[0]
    print("   hybrid (deep PQ candidates + exact host re-fusion):",
          [h["chunk_id"] for h in hits][:3])
    mpq.index_chunks([ChunkRecord(chunk_id="z1", doc_id="z",
                                  content="note on airship mooring masts")])
    hits = mpq.hybrid_search_batch_sync(["airship mooring"], 3)[0]
    assert hits[0]["chunk_id"] == "z1"
    print("   streaming append -> residual-coded tail retrievable — done.")


if __name__ == "__main__":
    main()
