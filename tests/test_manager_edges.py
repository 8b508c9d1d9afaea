"""MultiIndexManager edge and error paths (index/manager.py).

Covers the validation/degradation surface the happy-path suites skip:
reference-style chunk objects, per-chunk error capture, family-disabled
fallbacks, capacity-divergence detection, fused-path preconditions, and
the background maintenance daemon.
"""

import threading
import time
from types import SimpleNamespace

import numpy as np
import pytest

from advanced_rag_tpu.config import IndexType, PipelineConfig
from advanced_rag_tpu.index.corpus import ChunkRecord
from advanced_rag_tpu.index.manager import MultiIndexManager
from advanced_rag_tpu.models.embedder import NeuralEmbedder
from advanced_rag_tpu.models.encoder import EncoderConfig
from advanced_rag_tpu.models.tokenizer import HashingTokenizer, TokenizerConfig
from advanced_rag_tpu.utils.exceptions import IndexingError, ValidationError

DOCS = [
    "dense retrieval embeds queries into one vector space",
    "sparse lexical matching weighs rare terms heavily",
    "reciprocal rank fusion merges ranked candidate lists",
    "systolic arrays stream matrix tiles through the chip",
    "circuit breakers shed load from failing dependencies",
    "checkpoints persist index state across restarts",
]

SMALL_ENC = EncoderConfig(vocab_size=2048, hidden_dim=32, num_layers=1,
                          num_heads=4, mlp_dim=64, max_len=96)


def make_mgr(ingest=True, embedder=None, fused_rerank=False, **mgr_kw):
    cfg = PipelineConfig(fused_rerank=fused_rerank)
    cfg.semantic_dim = 32
    mgr = MultiIndexManager(cfg, embedder=embedder, **mgr_kw)
    if ingest:
        recs = [ChunkRecord(chunk_id=f"c{i}", doc_id=f"d{i}", content=t)
                for i, t in enumerate(DOCS)]
        mgr.index_chunks(recs)
    return mgr


def small_neural():
    tok = HashingTokenizer(TokenizerConfig(vocab_size=2048, max_len=32))
    return NeuralEmbedder(dim=32, config=SMALL_ENC, tokenizer=tok)


@pytest.fixture(scope="module")
def mgr():
    return make_mgr()


class TestIngestEdges:
    def test_all_bad_chunks_early_return(self, mgr):
        report = mgr.index_chunks([object(), object()])
        assert report["indexed"] == 0 and len(report["errors"]) == 2
        assert report["elapsed_ms"] >= 0.0

    def test_empty_content_is_per_chunk_error(self, mgr):
        rec_ok = ChunkRecord(chunk_id="ok-1", doc_id="ok", content="fine text")
        bad = SimpleNamespace(chunk_id="bad-1", doc_id="bad", content="")
        report = mgr.index_chunks([bad, rec_ok])
        assert report["indexed"] == 1
        assert any("empty chunk content" in e["error"]
                   for e in report["errors"])

    def test_reference_style_chunk_with_metadata(self, mgr):
        meta = SimpleNamespace(chunk_index=2, token_count=7, entropy=0.5,
                               redundancy=0.1, domain_density=0.2,
                               timestamp=1234.5, extra={"lang": "en"})
        chunk = SimpleNamespace(chunk_id="ref-chunk-0", doc_id="ref-doc",
                                content="reference style chunk body",
                                metadata=meta)
        report = mgr.index_chunks([chunk])
        assert report["indexed"] == 1
        row = mgr.store.rows_for_doc("ref-doc")[0]
        hit = mgr.store.hit(row, 1.0)
        assert hit["chunk_index"] == 2 and hit["metadata"] == {"lang": "en"}
        assert hit["entropy"] == 0.5 and hit["timestamp"] == 1234.5

    def test_chunk_without_metadata_defaults(self, mgr):
        chunk = SimpleNamespace(chunk_id="plain-0", doc_id="plain",
                                content="four words of text")
        report = mgr.index_chunks([chunk])
        assert report["indexed"] == 1
        hit = mgr.store.hit(mgr.store.rows_for_doc("plain")[0], 1.0)
        assert hit["token_count"] == 4 and hit["chunk_index"] == 0


class TestSearchEdges:
    def test_domain_embedding_requires_domain(self, mgr):
        with pytest.raises(IndexingError, match="domain index not enabled"):
            mgr.generate_domain_embedding("text")

    def test_hybrid_index_type_rejected(self, mgr):
        with pytest.raises(ValidationError, match="cannot search"):
            mgr.search_sync(IndexType.HYBRID, "query", 5)

    def test_domain_search_degrades_to_empty(self, mgr):
        assert mgr.search_sync(IndexType.DOMAIN, "query", 5) == []

    def test_sparse_search_degrades_when_disabled(self):
        m = make_mgr(enable_sparse=False)
        assert m.search_sync(IndexType.SPARSE, "query", 5) == []
        m.close()

    def test_precomputed_query_embedding(self, mgr):
        q = np.asarray(mgr.generate_semantic_embedding(DOCS[0]))
        hits = mgr.search_sync(IndexType.SEMANTIC, "ignored", 3,
                               query_embedding=q)
        assert hits and hits[0]["content"] == DOCS[0]

    def test_hybrid_batch_precomputed_embeddings_and_padding(self, mgr):
        # 3 queries -> bucket 4: exercises both the query_embedding path
        # and the sparse-side pad-to-bucket path
        qe = np.stack([np.asarray(mgr.generate_semantic_embedding(t))
                       for t in DOCS[:3]])
        out = mgr.hybrid_search_batch_sync(list(DOCS[:3]), 4,
                                           query_embedding=qe)
        assert len(out) == 3 and all(len(h) > 0 for h in out)
        assert out[0][0]["content"] == DOCS[0]

    def test_hybrid_batch_sparse_disabled(self):
        m = make_mgr(enable_sparse=False)
        out = m.hybrid_search_batch_sync(list(DOCS[:2]), 3)
        assert len(out) == 2 and out[0][0]["content"] == DOCS[0]
        m.close()

    def test_capacity_divergence_detected(self, mgr):
        class StubSparse:
            capacity = -1   # never equals the semantic capacity

            def encode_query(self, texts):
                n = len(texts)
                return (np.full((n, 1), -1, np.int32),
                        np.zeros((n, 1), np.float32))

        real = mgr.sparse
        mgr.sparse = StubSparse()
        try:
            with pytest.raises(IndexingError, match="capacities diverged"):
                mgr.hybrid_search_batch_sync(["q"], 3)
        finally:
            mgr.sparse = real


class TestFusedPreconditions:
    def test_fused_requires_flax_embedder(self):
        m = make_mgr(ingest=False, fused_rerank=False)
        # no token table at all
        with pytest.raises(IndexingError, match="fused_rerank"):
            m.fused_retrieve_batch_sync(["q"])
        m.close()

    def test_fused_rejects_hashing_embedder(self):
        from advanced_rag_tpu.models.embedder import HashingEmbedder

        cfg = PipelineConfig(fused_rerank=True)
        cfg.semantic_dim = 32
        m = MultiIndexManager(cfg, embedder=HashingEmbedder(dim=32))
        with pytest.raises(IndexingError, match="flax embedder"):
            m.fused_retrieve_batch_sync(["q"])
        m.close()

    def test_fused_empty_queries_and_corpus(self):
        m = make_mgr(ingest=False, embedder=small_neural(),
                     fused_rerank=True)
        assert m.fused_retrieve_batch_sync([]) == []
        assert m.fused_retrieve_batch_sync(["q"]) == [[]]
        m.close()

    def test_fused_closed_raises(self):
        m = make_mgr(ingest=False, embedder=small_neural(),
                     fused_rerank=True)
        m.close()
        with pytest.raises(IndexingError, match="closed"):
            m.fused_retrieve_batch_sync(["q"])

    def test_fused_pair_length_guard(self):
        from advanced_rag_tpu.models.cross_encoder import CrossEncoderReranker

        m = make_mgr(embedder=small_neural(), fused_rerank=True)
        rr = CrossEncoderReranker(config=SMALL_ENC, seed=1)
        with pytest.raises(IndexingError, match="exceeds the reranker"):
            m.fused_retrieve_batch_sync(["q"], reranker=rr, q_max_len=512)
        m.close()

    def test_fused_rejects_partitioned_tier(self):
        m = make_mgr(embedder=small_neural(), fused_rerank=True)
        m.semantic.build_ivf(nlist=2)
        with pytest.raises(IndexingError, match="bf16/f32/SQ8"):
            m.fused_retrieve_batch_sync(["q"])
        m.close()

    def test_fused_postings_rung(self):
        from advanced_rag_tpu.models.cross_encoder import CrossEncoderReranker

        m = make_mgr(embedder=small_neural(), fused_rerank=True)
        m.sparse.build_postings()
        assert m.sparse.has_postings
        rr = CrossEncoderReranker(config=SMALL_ENC, seed=1)
        out = m.fused_retrieve_batch_sync(list(DOCS[:2]), reranker=rr,
                                          q_max_len=24)
        assert len(out) == 2 and all(len(h) > 0 for h in out)
        m.close()


class TestAdminEdges:
    def test_delete_by_filter_requires_filters(self, mgr):
        with pytest.raises(ValidationError, match="requires filters"):
            mgr.delete_by_filter({})

    def test_reset_state_with_domain(self):
        m = make_mgr(enable_domain=True)
        assert m.domain is not None and m.store.n_valid() > 0
        m.reset_state()
        assert m.store.n_valid() == 0 and m.semantic.size == 0
        assert m.domain.size == 0
        m.close()

    def test_search_closed_raises(self):
        m = make_mgr(ingest=False)
        m.close()
        with pytest.raises(IndexingError, match="closed"):
            m.search_sync(IndexType.SEMANTIC, "q", 3)


class TestMaintenanceDaemon:
    def test_loop_survives_tick_errors_and_stops(self):
        m = make_mgr()
        calls = {"n": 0}

        def boom():
            calls["n"] += 1
            raise RuntimeError("transient")

        m.maintenance_tick = boom
        m.start_maintenance(interval_s=0.02)
        m.start_maintenance(interval_s=0.02)   # idempotent second start
        deadline = time.time() + 2.0
        while calls["n"] < 2 and time.time() < deadline:
            time.sleep(0.02)
        assert calls["n"] >= 2                 # survived the first error
        thread = m._maint_thread
        assert thread.is_alive()
        m.stop_maintenance()
        assert not thread.is_alive()
        m.close()

    def test_loop_exits_when_closed(self):
        m = make_mgr(ingest=False)
        m.start_maintenance(interval_s=0.02)
        m._closed = True
        time.sleep(0.1)
        assert not m._maint_thread.is_alive()
        m._closed = False
        m.stop_maintenance()
        m.close()


def _many_docs(n):
    return [ChunkRecord(chunk_id=f"m{i}", doc_id=f"doc{i % 7}",
                        content=f"{DOCS[i % len(DOCS)]} variant {i}")
            for i in range(n)]


class TestTierRungs:
    """Hybrid dispatch rung selection per tier (manager.py impl ladder)."""

    def test_hybrid_with_domain_index(self):
        mgr = make_mgr(enable_domain=True)
        res = mgr.hybrid_search_batch_sync(
            ["dense retrieval vector space"], k=3)
        assert res[0] and all("chunk_id" in h for h in res[0])
        # 3-method fusion: dense + sparse + domain all contribute
        assert any(h["method_count"] >= 2 for h in res[0])

    def test_hybrid_ivf_rung_with_streaming_tail(self):
        mgr = make_mgr(ingest=False)
        mgr.index_chunks(_many_docs(40))
        mgr.semantic.build_ivf(nlist=4)
        # stream past the build so the fused program exact-scans a tail
        mgr.index_chunks([ChunkRecord(chunk_id=f"t{i}", doc_id="tail",
                                      content=f"streamed tail row {i}")
                          for i in range(6)])
        assert mgr.semantic.has_ivf
        res = mgr.hybrid_search_batch_sync(["streamed tail row"], k=5)
        got = {h["chunk_id"] for h in res[0]}
        assert got & {f"t{i}" for i in range(6)}  # tail rows searchable

    def test_hybrid_pq_rung_exact_refinement(self):
        cfg = PipelineConfig()
        cfg.semantic_dim = 32
        cfg.semantic_dtype = "pq"
        mgr = MultiIndexManager(cfg)
        mgr.index_chunks(_many_docs(48))
        out = mgr.build_semantic(pq=True)
        assert out.get("pq_built") and mgr.semantic.has_pq
        # deep-candidate exact re-fusion (BACKLOG #2): with MMR...
        res = mgr.hybrid_search_batch_sync(
            ["sparse lexical matching variant 1"], k=4, use_mmr=True)
        assert res[0]
        # ...and the no-MMR branch of _refuse_exact
        res2 = mgr.hybrid_search_batch_sync(
            ["reciprocal rank fusion variant 2"], k=4, use_mmr=False)
        assert res2[0]
        # exact dense rank: the literal row should surface
        texts = [h["content"] for h in res2[0]]
        assert any("reciprocal rank fusion" in t for t in texts)

    def test_hybrid_pq_refine_disabled(self):
        cfg = PipelineConfig()
        cfg.semantic_dim = 32
        cfg.semantic_dtype = "pq"
        cfg.semantic_refine = 1   # raw single-dispatch PQ ranks
        mgr = MultiIndexManager(cfg)
        mgr.index_chunks(_many_docs(48))
        mgr.build_semantic(pq=True)
        res = mgr.hybrid_search_batch_sync(["systolic arrays"], k=4)
        assert res[0]

    def test_build_semantic_opq_skips_ivf(self):
        cfg = PipelineConfig()
        cfg.semantic_dim = 32
        cfg.semantic_dtype = "pq"
        cfg.semantic_opq = True
        mgr = MultiIndexManager(cfg)
        mgr.index_chunks(_many_docs(48))
        out = mgr.build_semantic(pq=True, ivf=True)
        assert out.get("pq_built")
        assert out.get("ivf_skipped") == "opq rotation active"
        assert mgr.semantic._pq_rot is not None

    def test_build_semantic_ivf_branch(self):
        mgr = make_mgr(ingest=False)
        mgr.index_chunks(_many_docs(40))
        out = mgr.build_semantic(ivf=True)
        assert out.get("ivf_built") and mgr.semantic.has_ivf


class TestMaintenanceTiers:
    """maintenance_tick branch coverage per tier (Milvus-compaction
    equivalent, manager.py:_maintenance_tick_locked)."""

    def test_pq_tier_auto_build_and_rebuild(self, monkeypatch):
        from advanced_rag_tpu.utils import constants as C
        monkeypatch.setattr(C.IndexConstants, "IVF_AUTO_THRESHOLD", 32)
        cfg = PipelineConfig()
        cfg.semantic_dim = 32
        cfg.semantic_dtype = "pq"
        mgr = MultiIndexManager(cfg)
        mgr.index_chunks(_many_docs(48))
        acts = mgr.maintenance_tick()
        assert acts.get("pq_built")
        assert mgr.semantic.has_pq and mgr.semantic.has_ivfpq
        # stream a tail past REBUILD_TAIL_FRACTION -> ivfpq re-pack
        mgr.index_chunks([ChunkRecord(chunk_id=f"pqtail{i}", doc_id="x",
                                      content=f"tail row {i}")
                          for i in range(16)])
        assert mgr.semantic.ivf_needs_rebuild
        acts2 = mgr.maintenance_tick()
        assert acts2["ivf_rebuilt"] and acts2["ivf_rows"] == 64

    def test_bf16_tier_auto_build_and_rebuild(self, monkeypatch):
        from advanced_rag_tpu.utils import constants as C
        monkeypatch.setattr(C.IndexConstants, "IVF_AUTO_THRESHOLD", 32)
        mgr = make_mgr(ingest=False)
        mgr.index_chunks(_many_docs(40))
        acts = mgr.maintenance_tick()
        assert acts["ivf_rebuilt"] and mgr.semantic.has_ivf
        mgr.index_chunks([ChunkRecord(chunk_id=f"ivftail{i}", doc_id="x",
                                      content=f"tail row {i}")
                          for i in range(16)])
        assert mgr.semantic.ivf_needs_rebuild
        acts2 = mgr.maintenance_tick()
        assert acts2["ivf_rebuilt"] and acts2["ivf_rows"] == 56

    def test_postings_compaction_after_deletes(self):
        mgr = make_mgr(ingest=False)
        mgr.index_chunks(_many_docs(40))
        mgr.sparse.build_postings()
        assert mgr.sparse.has_postings
        # delete >10% of rows -> stale postings slots -> compaction
        deleted = mgr.delete_by_filter({"doc_id": "doc0"})
        assert deleted >= 5
        assert mgr.sparse.postings_stale_fraction > 0.10
        acts = mgr.maintenance_tick()
        assert acts.get("postings_compacted")
        assert mgr.sparse.postings_stale_fraction == 0.0


class TestHybridValidation:
    """hybrid_search_batch_sync guard clauses."""

    def test_closed_raises(self):
        m = make_mgr(ingest=False)
        m.close()
        with pytest.raises(IndexingError):
            m.hybrid_search_batch_sync(["q"], k=3)

    def test_nonpositive_k_rejected(self, mgr):
        with pytest.raises(ValidationError):
            mgr.hybrid_search_batch_sync(["q"], k=0)

    def test_empty_query_list(self, mgr):
        assert mgr.hybrid_search_batch_sync([], k=3) == []

    def test_empty_corpus_returns_empty_per_query(self):
        m = make_mgr(ingest=False)
        assert m.hybrid_search_batch_sync(["a", "b"], k=3) == [[], []]

    def test_precomputed_1d_query_embedding(self, mgr):
        qe = mgr.generate_semantic_embedding(DOCS[0])
        res = mgr.hybrid_search_batch_sync([DOCS[0]], k=3,
                                           query_embedding=qe)
        assert res[0] and res[0][0]["chunk_id"] == "c0"

    def test_empty_chunkrecord_content_captured(self, mgr):
        report = mgr.index_chunks(
            [ChunkRecord(chunk_id="e0", doc_id="d", content="")])
        assert report["errors"] and report["indexed"] == 0


class TestIngestWaitDeadlines:
    """Bounded in-flight waits (ADVICE r1: claims must not leak and
    waits must not spin forever)."""

    def test_duplicate_wait_times_out_and_releases_claims(self):
        mgr = make_mgr()
        mgr.INGEST_WAIT_DEADLINE_S = 0.05
        # simulate another ingest that claimed row 0 and never commits
        row0 = mgr.store.rows_for_chunk_ids(["c0"])[0] \
            if hasattr(mgr.store, "rows_for_chunk_ids") else 0
        with mgr._write_cv:
            mgr._inflight_rows.add(row0)
        dup = ChunkRecord(chunk_id="c0", doc_id="d0", content=DOCS[0])
        with pytest.raises(TimeoutError, match="duplicate rows"):
            mgr.index_chunks([dup])
        # the failed ingest must not leak ITS OWN claims (none here) and
        # must leave the foreign claim untouched
        assert mgr._inflight_rows == {row0}
        with mgr._write_cv:
            mgr._inflight_rows.clear()

    def test_ordered_commit_wait_times_out_and_releases_claims(self):
        mgr = make_mgr()
        mgr.INGEST_WAIT_DEADLINE_S = 0.05
        # a stuck lower-row claim from a phantom ingest blocks the
        # ordered fused commit (phase 3) of any later batch
        with mgr._write_cv:
            mgr._inflight_rows.add(0)
        fresh = ChunkRecord(chunk_id="z9", doc_id="dz",
                            content="a brand new row far past row zero")
        with pytest.raises(TimeoutError, match="lower-row"):
            mgr.index_chunks([fresh])
        # the finally must have released the new batch's claims
        assert mgr._inflight_rows == {0}
        with mgr._write_cv:
            mgr._inflight_rows.clear()
        # and the retry succeeds once the stuck claim clears
        report = mgr.index_chunks([fresh])
        assert report["indexed"] == 1 and not report["errors"]
