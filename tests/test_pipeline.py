"""Pipeline layer: diagnostics, chunking, query ops, rankers, experiments,
evaluation, compliance, end-to-end orchestrator (reference test strategy
SURVEY.md §4 — pure-math unit tests + end-to-end with the real device
index on the virtual CPU mesh)."""

import numpy as np
import pytest

from advanced_rag_tpu.pipeline import (
    AdaptiveChunker,
    AdvancedRAGPipeline,
    AuditEventType,
    ComplianceManager,
    DocumentDiagnostics,
    ExperimentManager,
    LearnedHybridAdapter,
    LearnedRanker,
    QueryClassifier,
    QueryDecomposer,
    QueryRewriter,
    RAGEvaluator,
    SemanticEnricher,
)
from advanced_rag_tpu.utils.exceptions import ComplianceError


class TestDiagnostics:
    def test_entropy_bounds(self):
        d = DocumentDiagnostics()
        assert d.shannon_entropy([]) == 0.0
        assert d.shannon_entropy(["a"] * 10) == 0.0
        uniform = [f"w{i}" for i in range(64)]
        assert d.shannon_entropy(uniform) == pytest.approx(1.0)

    def test_redundancy_detects_repeats(self):
        d = DocumentDiagnostics()
        rep, _ = d.redundancy(["a", "b"] * 50)
        uniq, _ = d.redundancy([f"w{i}" for i in range(100)])
        assert rep > 0.5 > uniq

    def test_domain_density(self):
        d = DocumentDiagnostics()
        m = d.analyze_document(
            "The algorithm uses a cache and a compiler on the gpu runtime."
        )
        assert m.domain_scores["technical"] > 0
        assert m.domain_density == max(m.domain_scores.values())

    def test_coherence(self):
        d = DocumentDiagnostics()
        coherent = d.coherence(["the cat sat here", "the cat sat there"])
        incoherent = d.coherence(["alpha beta gamma", "delta epsilon zeta"])
        assert coherent > incoherent

    def test_analyze_document_full(self):
        m = DocumentDiagnostics().analyze_document(
            "Systems research. " * 5 + "Novel words appear here often."
        )
        assert 0 <= m.entropy <= 1
        assert m.token_count > 0
        assert m.sentence_count >= 2


class TestChunker:
    def test_empty(self):
        assert AdaptiveChunker().chunk_document("") == []

    def test_sizing_heuristics(self):
        from advanced_rag_tpu.pipeline.diagnostics import DiagnosticMetrics

        c = AdaptiveChunker()
        big = c.target_chunk_size(DiagnosticMetrics(entropy=0.9, coherence=0.9))
        small = c.target_chunk_size(DiagnosticMetrics(entropy=0.2, redundancy=0.7,
                                                      coherence=0.1))
        assert big > c.base_chunk_size
        assert small < c.base_chunk_size
        assert small >= c.min_chunk_size

    def test_chunking_covers_text(self):
        text = ". ".join(f"Sentence number {i} about topic {i % 7}"
                         for i in range(200)) + "."
        chunks = AdaptiveChunker(base_chunk_size=64).chunk_document(text)
        assert len(chunks) > 1
        assert all(ch.metadata.token_count > 0 for ch in chunks)
        # idempotent ids
        again = AdaptiveChunker(base_chunk_size=64).chunk_document(text)
        assert [c.chunk_id for c in chunks] == [c.chunk_id for c in again]

    def test_overlap(self):
        text = ". ".join(f"Sentence {i} unique token tok{i}" for i in range(60)) + "."
        chunks = AdaptiveChunker(base_chunk_size=40,
                                 overlap_ratio=0.3).chunk_document(text)
        assert len(chunks) >= 2
        # consecutive chunks share at least one sentence token
        a = set(chunks[0].content.split())
        b = set(chunks[1].content.split())
        assert a & b


class TestQueryOps:
    def test_rewriter(self):
        r = QueryRewriter()
        assert "retrieval augmented generation" in r.rewrite("what is RAG?")
        assert r.rewrite("plain query") == "plain query"

    def test_decomposer(self):
        d = QueryDecomposer()
        res = d.decompose("explain dense retrieval and compare sparse scoring methods")
        assert res.is_complex and len(res.sub_queries) == 2
        simple = d.decompose("short query")
        assert not simple.is_complex

    def test_classifier(self):
        c = QueryClassifier()
        assert c.classify("getting an error when indexing") == "troubleshooting"
        assert c.classify("summarize the architecture") == "summary"
        assert c.classify("what is a vector index?") == "faq"
        assert c.classify("x " * 150) == "analysis"
        assert c.classify("vector databases") == "default"


class TestRankers:
    def test_learned_ranker_update(self):
        r = LearnedRanker()
        res = {"score": 0.9, "method_count": 2, "timestamp": 0.0}
        before = r.score_sync([res])[0]
        for _ in range(20):
            r.update_from_feedback(res, positive=False)
        after = r.score_sync([res])[0]
        assert after < before

    def test_adapter_normalizes(self):
        a = LearnedHybridAdapter()
        d, s = a("some medium length query here", 0.7, 0.3)
        assert d + s == pytest.approx(1.0)
        assert 0.1 <= d <= 0.9

    def test_adapter_learns(self):
        a = LearnedHybridAdapter()
        a.fit_from_feedback([("sparse", True)] * 30 + [("semantic", False)] * 30)
        d, s = a("medium length query words here", 0.5, 0.5)
        assert s > d


class TestExperiments:
    def test_greedy_picks_best(self):
        m = ExperimentManager(epsilon=0.0)
        m.record_outcome("a", True, 1.0)
        m.record_outcome("b", False, 0.0)
        assert m.choose_variant() == "a"

    def test_auto_register_and_report(self):
        m = ExperimentManager(epsilon=0.0)
        m.record_outcome("new", True)
        assert m.report()[0]["name"] == "new"


class TestEvaluator:
    def test_rank_metrics(self):
        e = RAGEvaluator()
        retrieved = ["a", "b", "c", "d"]
        relevant = ["b", "x"]
        assert e.precision_at_k(retrieved, relevant, 4) == pytest.approx(0.25)
        assert e.recall_at_k(retrieved, relevant, 4) == pytest.approx(0.5)
        assert e.mrr(retrieved, relevant) == pytest.approx(0.5)
        assert 0 < e.ndcg_at_k(retrieved, relevant, 4) < 1

    def test_evaluate_retrieval(self):
        e = RAGEvaluator()
        results = [
            {"chunk_id": "a", "content": "vector search on tpu", "score": 0.9},
            {"chunk_id": "b", "content": "sparse lexical scoring", "score": 0.5},
        ]
        m = e.evaluate_retrieval("vector search", results, relevant_ids=["a"])
        assert m.precision_at_k > 0
        assert 0 <= m.hallucination_risk <= 1
        assert m.coverage > 0
        assert len(e.score_history) == 1

    def test_empty_results_max_risk(self):
        m = RAGEvaluator().evaluate_retrieval("q", [])
        assert m.hallucination_risk == 1.0

    def test_drift_detects_shift(self):
        e = RAGEvaluator(history_maxlen=100)
        rng = np.random.default_rng(0)
        for _ in range(20):
            e.embedding_history.append(
                rng.standard_normal(8).astype(np.float32) + np.array([5.0] + [0] * 7,
                                                                     np.float32))
        for _ in range(20):
            e.embedding_history.append(
                rng.standard_normal(8).astype(np.float32) + np.array([-5.0] + [0] * 7,
                                                                     np.float32))
        rep = e.detect_drift()
        assert rep.embedding_divergence > 0.5
        assert rep.drift_detected
        assert rep.recommendations


class TestCompliance:
    def test_versioning_and_integrity(self):
        c = ComplianceManager()
        v1 = c.create_version("d1", "content one")
        v2 = c.create_version("d1", "content two")
        assert (v1.version, v2.version) == (1, 2)
        assert c.verify_data_integrity("d1", "content two")
        assert not c.verify_data_integrity("d1", "content one")

    def test_legal_hold_blocks_forget(self):
        c = ComplianceManager()
        c.create_version("d1", "x")
        c.apply_legal_hold("d1")
        with pytest.raises(ComplianceError):
            c.forget_document("d1")
        c.release_legal_hold("d1")
        c.forget_document("d1")
        assert "d1" in c.forgotten

    def test_audit_query_filters(self):
        c = ComplianceManager()
        c.log_ingestion("d1", 3)
        c.log_retrieval("query", ["d1"])
        logs = c.query_audit_logs(event_type=AuditEventType.INGESTION)
        assert len(logs) == 1 and logs[0].doc_id == "d1"
        report = c.generate_compliance_report()
        assert report["total_audit_events"] >= 2

    def test_lineage(self):
        c = ComplianceManager()
        c.add_lineage("child", ["p1", "p2"])
        tree = c.get_lineage_tree("child")
        assert {p["doc_id"] for p in tree["parents"]} == {"p1", "p2"}


class TestEnricher:
    def test_entities_and_topics(self):
        r = SemanticEnricher().enrich(
            "JAX compiles programs for Google TPU hardware. TPU programs use XLA."
        )
        assert "TPU" in r.entities or "JAX" in r.entities
        assert r.topics


DOCS = [
    {"doc_id": "tpu", "content": "TPU systolic arrays excel at matrix "
     "multiplication. The MXU processes bfloat16 tiles. XLA compiles and "
     "fuses operations for high throughput on the matrix unit."},
    {"doc_id": "rag", "content": "Retrieval augmented generation combines "
     "a vector index with a language model. Hybrid retrieval fuses dense "
     "embeddings with sparse BM25 scores using reciprocal rank fusion."},
    {"doc_id": "ops", "content": "Error handling uses circuit breakers and "
     "timeouts. When the index fails, the service degrades gracefully and "
     "returns empty results instead of crashing."},
]


class TestPipelineEndToEnd:
    @pytest.fixture(scope="class")
    def pipe(self):
        p = AdvancedRAGPipeline()
        report = p.ingest_documents(DOCS)
        assert report["indexed"] > 0
        return p

    def test_retrieve_relevant(self, pipe):
        out = pipe.retrieve("how does hybrid retrieval fuse dense and sparse?")
        assert out["results"]
        assert out["results"][0].doc_id == "rag"
        assert out["metrics"].num_results > 0

    def test_retrieve_with_filter(self, pipe):
        out = pipe.retrieve("matrix multiplication", filters={"doc_id": "tpu"})
        assert out["results"]
        assert all(r.doc_id == "tpu" for r in out["results"])

    def test_rewriting_applied(self, pipe):
        out = pipe.retrieve("what is rag?")
        assert "retrieval augmented generation" in out["rewritten_query"]

    def test_plan_and_execute(self, pipe):
        out = pipe.plan_and_execute(
            "explain tpu matrix units and describe hybrid retrieval fusion"
        )
        assert out["is_complex"]
        assert len(out["sub_queries"]) == 2
        doc_ids = {r.doc_id for r in out["results"]}
        assert {"tpu", "rag"} <= doc_ids

    def test_performance_report(self, pipe):
        pipe.retrieve("anything at all")
        rep = pipe.get_performance_report()
        assert rep["retrieve_ms"]["count"] >= 1
        assert 0 <= rep["sla_compliance"] <= 1
        assert rep["index"]["store"]["valid"] > 0

    def test_drift_report(self, pipe):
        rep = pipe.detect_drift(["tpu matmul", "hybrid fusion"])
        assert 0 <= rep.magnitude <= 1

    def test_warm_up_compiles_all_batch_buckets(self, pipe):
        """warm_up must cover every pow2 micro-batch bucket a burst can
        route a query into — is_warm gates the strict latency budget."""
        r = pipe.retriever
        r._warm_keys.clear()
        r._warm_buckets.clear()
        q = "how does hybrid retrieval fuse dense and sparse?"
        assert not r.is_warm(q)
        pipe.warm_up()
        assert r.is_warm("warm up", pipe.config.top_k)
        key = r._program_key("warm up", pipe.config.top_k)
        top = r._pow2(r.config.micro_batch_size)
        want, need = set(), 1
        while need <= top:
            want.add(need)
            need *= 2
        assert want <= r._warm_buckets[key]

    def test_forget_document(self):
        p = AdvancedRAGPipeline()
        p.ingest_documents(DOCS)
        removed = p.forget_document("ops")
        assert removed > 0
        out = p.retrieve("circuit breakers timeouts degrade")
        assert all(r.doc_id != "ops" for r in out["results"])
        # forgetting under legal hold raises
        p.compliance.apply_legal_hold("tpu")
        with pytest.raises(ComplianceError):
            p.forget_document("tpu")

    def test_quality_flags(self):
        p = AdvancedRAGPipeline()
        rep = p.ingest_documents(["", "tiny", "word " * 100])
        flags = {f["flag"] for f in rep["quality_flags"]}
        assert "empty_document" in flags
        assert "very_short_document" in flags
        assert "high_redundancy" in flags or "low_vocabulary_diversity" in flags


class TestReferenceAPISurface:
    def test_reference_public_names_importable(self):
        """Every name the reference exports from its package root
        (reference __init__.py:72-112) resolves here — imports written
        against the reference keep working after switching."""
        import advanced_rag_tpu as a

        reference_all = [
            "AdvancedRAGPipeline", "PipelineConfig", "PipelineStage",
            "RetrievalResult", "DocumentDiagnostics", "DiagnosticMetrics",
            "AdaptiveChunker", "ChunkMetadata", "Chunk",
            "MilvusIndexManager", "IndexType", "IndexConfig",
            "HybridRetriever", "RetrievalConfig", "CrossEncoderReranker",
            "LearnedRanker", "LearnedRankerConfig", "SemanticEnricher",
            "EnrichmentResult", "QueryDecomposer", "DecompositionResult",
            "ExperimentManager", "RAGEvaluator", "EvaluationMetrics",
            "DriftReport", "ComplianceManager", "AuditLog",
            "DocumentVersion", "AuditEventType",
        ]
        missing = [n for n in reference_all if not hasattr(a, n)]
        assert not missing, missing

    def test_milvus_manager_alias_surface(self):
        import advanced_rag_tpu as a

        assert a.MilvusIndexManager is a.MultiIndexManager
        m = a.MilvusIndexManager(connect=False)
        for meth in ("index_chunks", "search", "search_sync",
                     "delete_by_filter", "get_collection_stats", "close",
                     "_generate_semantic_embedding"):
            assert hasattr(m, meth), meth
        m.close()


class TestEndToEndRelevance:
    def test_known_relevance_corpus(self):
        """Full pipeline (rewrite -> hybrid -> rerank -> evaluator) on a
        corpus with KNOWN topic relevance: topical queries must rank
        their topic's chunks on top (P@10 >= 0.8, MRR >= 0.9 mean)."""
        import numpy as np

        from advanced_rag_tpu.config import PipelineConfig
        from advanced_rag_tpu.pipeline.orchestrator import AdvancedRAGPipeline

        rng = np.random.default_rng(0)
        topics = {
            "solar": "photovoltaic panels inverters irradiance grid feed",
            "bees": "hive queen brood nectar pollen swarm apiary",
        }
        docs = []
        for topic, vocab in topics.items():
            words = vocab.split()
            for d in range(10):
                body = " ".join(rng.choice(words, 20).tolist())
                docs.append({"doc_id": f"{topic}{d}",
                             "content": f"{topic} note {d}: {body}."})
        p = AdvancedRAGPipeline(PipelineConfig())
        p.ingest_documents(docs)
        precs, mrrs = [], []
        for topic, vocab in topics.items():
            mgr = p.index_manager
            rel = [cid for cid, row in mgr.store._chunk_row.items()
                   if mgr.store.doc_ids[row].startswith(topic)]
            assert rel
            out = p.retrieve(" ".join(vocab.split()[:4]), top_k=10,
                             relevant_ids=rel)
            precs.append(out["metrics"].precision_at_k)
            mrrs.append(out["metrics"].mrr)
        assert float(np.mean(precs)) >= 0.8, precs
        assert float(np.mean(mrrs)) >= 0.9, mrrs

    def test_explicit_top_k_is_honored(self):
        """An explicit top_k returns that many results through the
        rerank stage (reference service.py:378-426 returns the
        requested top_k); without one the configured rerank_top_k
        serves (chat contexts)."""
        from advanced_rag_tpu.config import PipelineConfig
        from advanced_rag_tpu.pipeline.orchestrator import AdvancedRAGPipeline

        docs = [{"doc_id": f"d{i}",
                 "content": f"document {i} about retrieval topic "
                            f"alpha{i % 3} beta{i % 5} gamma."}
                for i in range(30)]
        p = AdvancedRAGPipeline(PipelineConfig())
        p.ingest_documents(docs)
        out = p.retrieve("retrieval topic alpha1 beta2", top_k=12)
        assert len(out["results"]) == 12
        out_default = p.retrieve("retrieval topic alpha1 beta2")
        assert len(out_default["results"]) == p.config.rerank_top_k

    def test_configured_weights_reach_the_search(self):
        """RetrievalConfig.dense/sparse_weight (RAG_*_WEIGHT env) must
        flow into the actual search for profiles that don't specialize
        weights — previously the profile class constants silently
        overrode the deployment's configured operating point."""
        from advanced_rag_tpu.config import PipelineConfig
        from advanced_rag_tpu.pipeline.orchestrator import AdvancedRAGPipeline

        cfg = PipelineConfig()
        cfg.retrieval.dense_weight = 0.0     # sparse-only operating point
        cfg.retrieval.sparse_weight = 1.0
        p = AdvancedRAGPipeline(cfg)
        # two docs: one shares the query's exact words (lexical win),
        # one is lexically disjoint
        p.ingest_documents([
            {"doc_id": "lex", "content": "zanzibar quorum flotilla "
                                         "gossamer ratchet."},
            {"doc_id": "sem", "content": "completely unrelated text "
                                         "about nothing specific."}])
        captured = {}
        orig = p.index_manager.hybrid_search_batch_sync

        def spy(queries, k, *a, **kw):
            captured["dense_weight"] = kw.get("dense_weight")
            captured["sparse_weight"] = kw.get("sparse_weight")
            return orig(queries, k, *a, **kw)

        p.index_manager.hybrid_search_batch_sync = spy
        hits, _ = p.retriever.retrieve_sync_ex("zanzibar quorum", 2, None)
        assert captured["dense_weight"] == 0.0
        assert captured["sparse_weight"] == 1.0
        assert hits and hits[0]["doc_id"] == "lex"

    def test_enable_mmr_flag_reaches_retriever(self):
        """PipelineConfig(enable_mmr=False) must turn MMR off in the
        retrieval config (previously only the service env wiring did)."""
        from advanced_rag_tpu.config import PipelineConfig

        assert PipelineConfig(enable_mmr=False).retrieval.use_mmr is False
        assert PipelineConfig().retrieval.use_mmr is True

    def test_fused_sig_honors_max_top_k(self):
        """An explicit top_k clamps to config.retrieval.max_top_k, not
        a hardcoded 64 (ADVICE r4: retrieve(top_k=100) silently
        returned 64 results)."""
        p = AdvancedRAGPipeline()
        cap = p.config.retrieval.max_top_k
        assert cap > 64  # reference MAX_TOP_K=100 (constants.py:49)
        k_out, k_rerank = p._fused_sig(cap + 50)
        assert k_out == cap
        assert p._fused_sig(100)[0] == min(100, cap)
        assert p._fused_sig(48) == (48, 48)

    def test_fused_warm_invalidated_on_compile_state_change(self):
        """_fused_warm must not report warm after the fused program's
        compile-relevant state changes (reranker rewired, capacity
        growth, tier flip) — the retrace would 504 under the strict
        budget (ADVICE r4)."""
        p = AdvancedRAGPipeline()
        sig = p._fused_sig(8)
        p._fused_warm[sig] = p._fused_state()
        assert p._fused_warm.get(sig) == p._fused_state()
        # rewiring the reranker changes the fingerprint
        class _FakeRR:
            model = object()
        p.retriever.reranker = _FakeRR()
        assert p._fused_warm.get(sig) != p._fused_state()

    def test_warm_up_parallel_covers_same_buckets(self):
        """parallel=True (threaded compile overlap, the serving
        default) must warm exactly the buckets the serial path does."""
        pipe = AdvancedRAGPipeline()
        pipe.ingest_documents(DOCS)
        r = pipe.retriever
        r._warm_keys.clear()
        r._warm_buckets.clear()
        pipe.warm_up(parallel=True)
        assert r.is_warm("warm up", pipe.config.top_k)
        key = r._program_key("warm up", pipe.config.top_k)
        top = r._pow2(r.config.micro_batch_size)
        want, need = set(), 1
        while need <= top:
            want.add(need)
            need *= 2
        assert want <= r._warm_buckets[key]


class TestMutationHardening:
    """Pin behaviors whose mutants survived the round-5 mutation run
    (scripts/mutation_score.py): exact values, boundaries, and
    off-by-one geometry that the broader tests only smoke-covered."""

    def test_enricher_keyword_scores_exact(self):
        from advanced_rag_tpu.pipeline.enrichment import SemanticEnricher

        r = SemanticEnricher().enrich("alpha alpha beta")
        assert r.keyword_scores["alpha"] == pytest.approx(2 / 3)
        assert r.keyword_scores["beta"] == pytest.approx(1 / 3)
        # stopwords never become topics
        r2 = SemanticEnricher().enrich("the the the alpha")
        assert "the" not in r2.topics

    def test_experiments_success_rate_and_config_update(self):
        from advanced_rag_tpu.pipeline.experiments import ExperimentManager

        m = ExperimentManager(epsilon=0.0)
        m.record_outcome("a", True)
        m.record_outcome("a", False)
        assert m.variants["a"].success_rate == pytest.approx(0.5)
        assert m.variants["a"].total_reward == pytest.approx(1.0)
        # re-register with config MERGES into the existing variant
        m.register("a", {"x": 1})
        m.register("a", {"y": 2})
        assert m.variants["a"].config == {"x": 1, "y": 2}

    def test_experiments_greedy_picks_best(self):
        from advanced_rag_tpu.pipeline.experiments import ExperimentManager

        m = ExperimentManager(epsilon=0.0)
        for _ in range(3):
            m.record_outcome("good", True, reward=1.0)
            m.record_outcome("bad", False, reward=0.0)
        assert all(m.choose_variant() == "good" for _ in range(5))

    def test_ranker_recency_half_life_exact(self):
        import time as _t

        from advanced_rag_tpu.pipeline.ranker import LearnedRanker

        lr = LearnedRanker()
        now = _t.time()
        half = lr.config.recency_half_life_days
        base, methods, recency = lr.featurize(
            {"score": 0.7, "method_count": 2,
             "timestamp": now - half * 86400.0}, now=now)
        assert (base, methods) == (0.7, 2.0)
        assert recency == pytest.approx(0.5, abs=1e-6)
        # future timestamps clamp to age 0 -> recency exactly 1
        _, _, fresh = lr.featurize({"timestamp": now + 10}, now=now)
        assert fresh == pytest.approx(1.0)

    def test_adapter_query_length_boundaries(self):
        from advanced_rag_tpu.pipeline.ranker import LearnedHybridAdapter

        ad = LearnedHybridAdapter()
        # defaults: d_rate = s_rate = 0.5 -> d = 0.5, s = 0.5
        d3, s3 = ad("one two three", 0.5, 0.5)        # <=3 words: s*1.2
        assert (d3, s3) == (pytest.approx(0.5 / 1.1),
                            pytest.approx(0.6 / 1.1))
        d4, s4 = ad("one two three four", 0.5, 0.5)   # no boost
        assert d4 == pytest.approx(0.5) and s4 == pytest.approx(0.5)
        d12, s12 = ad(" ".join(["w"] * 12), 0.5, 0.5)  # >=12: d*1.2
        assert (d12, s12) == (pytest.approx(0.6 / 1.1),
                              pytest.approx(0.5 / 1.1))

    def test_rewriter_expands_only_known_abbreviations(self):
        from advanced_rag_tpu.pipeline.query_ops import QueryRewriter

        rw = QueryRewriter()
        assert rw.rewrite("what is RAG?") == \
            "what is retrieval augmented generation"
        assert rw.rewrite("plain words stay") == "plain words stay"
        # punctuation stripped for lookup, disabled config passes through
        rw.config.enabled = False
        assert rw.rewrite("what is RAG?") == "what is RAG?"

    def test_coherence_exact_bounds(self):
        from advanced_rag_tpu.pipeline.diagnostics import DocumentDiagnostics

        d = DocumentDiagnostics()
        same = d.analyze_document("alpha beta gamma. alpha beta gamma.")
        assert same.coherence == pytest.approx(1.0)
        disjoint = d.analyze_document("alpha beta gamma. delta epsilon zeta.")
        assert disjoint.coherence == pytest.approx(0.0)

    def test_complexity_monotonic_in_sentence_length(self):
        from advanced_rag_tpu.pipeline.diagnostics import DocumentDiagnostics

        d = DocumentDiagnostics()
        short = d.analyze_document("cat. dog. fox. owl.")
        words = " ".join(f"w{i}" for i in range(40))
        long = d.analyze_document(f"{words}. {words}.")
        assert 0.0 <= short.complexity <= 1.0
        assert long.complexity > short.complexity

    def test_chunker_sentence_overlap_geometry(self):
        from advanced_rag_tpu.pipeline.chunking import AdaptiveChunker

        # 6 sentences x 10 tokens, target 30, overlap 0.5 -> chunks of 3
        # sentences stepping back exactly ONE sentence (budget 15 fits
        # one 10-token sentence, not two)
        sents = [" ".join(f"s{i}w{j}" for j in range(10)) + "."
                 for i in range(6)]
        text = " ".join(sents)
        ck = AdaptiveChunker(base_chunk_size=30, max_chunk_size=30,
                             min_chunk_size=30, overlap_ratio=0.5)
        pieces = ck.chunk_document(text, doc_id="d")
        starts = [p.content.split()[0] for p in pieces]
        # chunk 0 covers s0-s2; chunk 1 must start at s2 (one back)
        assert starts[0] == "s0w0"
        assert starts[1] == "s2w0"

    def test_lineage_tree_depth_cutoff(self):
        c = ComplianceManager()
        c.add_lineage("b", ["a"])
        c.add_lineage("c", ["b"])
        tree = c.get_lineage_tree("c", max_depth=1)
        assert tree["parents"][0]["doc_id"] == "b"
        # depth cap: b's own parents are NOT expanded at max_depth=1
        assert tree["parents"][0]["parents"] == []

    def test_verify_integrity_unknown_doc_is_false(self):
        c = ComplianceManager()
        assert c.verify_data_integrity("nope", "anything") is False

    def test_window_chunking_strategy(self):
        """strategy='window': fixed base-size word windows at
        stride base*(1-overlap), diagnostics sizing NOT applied —
        the encoder-geometry ingest mode (RAG_CHUNK_STRATEGY=window)."""
        from advanced_rag_tpu.pipeline.chunking import AdaptiveChunker

        words = " ".join(f"w{i}" for i in range(300))
        ck = AdaptiveChunker(base_chunk_size=110, overlap_ratio=0.273,
                             strategy="window")
        pieces = ck.chunk_document(words, doc_id="d")
        # stride = 110*(1-0.273) = 80 -> starts at w0, w80, w160, w240
        starts = [p.content.split()[0] for p in pieces]
        assert starts == ["w0", "w80", "w160", "w240"]
        assert len(pieces[0].content.split()) == 110
        # config plumbs through the pipeline
        from advanced_rag_tpu.config import PipelineConfig
        pipe = AdvancedRAGPipeline(PipelineConfig(
            chunk_strategy="window", chunk_base_size=110,
            chunk_overlap=0.273))
        assert pipe.chunker.strategy == "window"
        with pytest.raises(ValueError):
            AdaptiveChunker(strategy="nope")

    def test_drift_affected_queries_filter(self):
        """evaluation.py:343: the affected set contains exactly the
        high-risk / low-top-score queries from recent history."""
        e = RAGEvaluator(history_maxlen=100)
        rng = np.random.default_rng(0)
        for _ in range(20):
            e.embedding_history.append(
                rng.standard_normal(8).astype(np.float32)
                + np.array([5.0] + [0] * 7, np.float32))
        for _ in range(20):
            e.embedding_history.append(
                rng.standard_normal(8).astype(np.float32)
                + np.array([-5.0] + [0] * 7, np.float32))
        import time as _t

        now = _t.time()
        e.query_history.extend([
            {"query": "risky", "hallucination_risk": 0.9,
             "top_score": 0.9, "timestamp": now},
            {"query": "weak", "hallucination_risk": 0.0,
             "top_score": 0.1, "timestamp": now},
            {"query": "clean", "hallucination_risk": 0.1,
             "top_score": 0.9, "timestamp": now},
        ])
        rep = e.detect_drift()
        assert "risky" in rep.affected_queries      # risk > 0.5
        assert "weak" in rep.affected_queries       # top_score < 0.3
        assert "clean" not in rep.affected_queries

    def test_decomposer_drops_single_word_parts(self):
        """query_ops decompose: ' and '-split parts need >= 2 words —
        a dangling conjunct must not become its own sub-query."""
        d = QueryDecomposer()
        res = d.decompose("explain dense retrieval ranking methods and x")
        assert res.sub_queries == [
            "explain dense retrieval ranking methods and x"]
        assert not res.is_complex

    def test_diagnostics_python_path_parity(self):
        """Non-ASCII text forces the PYTHON diagnostics path (the C++
        fast path is ASCII-only); its coherence/complexity must agree
        with the native path on the equivalent ASCII text — kills the
        mutants hiding behind the native shadow (diagnostics.py
        python-path lines) and guards native/python parity."""
        d = DocumentDiagnostics()
        ascii_text = ("alpha beta gamma delta. alpha beta gamma delta. "
                      "epsilon zeta eta theta.")
        uni_text = ascii_text + " café."
        m_ascii = d.analyze_document(ascii_text)
        m_uni = d.analyze_document(uni_text)
        assert abs(m_ascii.coherence - m_uni.coherence) < 0.35
        assert 0.0 <= m_uni.complexity <= 1.0
        assert m_uni.entropy > 0
        # python-path coherence exactness (same inputs as the native
        # test above, via the public helper)
        assert d.coherence(["a b c", "a b c"]) == pytest.approx(1.0)
        assert d.coherence(["a b c", "x y z"]) == pytest.approx(0.0)


class TestBoundaryExactMath:
    """Mutation batch 3: boundary-exact pins across the pipeline layer.
    Every assert is chosen to distinguish the shipped operator from its
    nearest mutant (cmp flips at the exact threshold, +/- and */÷ swaps
    via closed-form expectations, off-by-one int literals)."""

    # -- rank metrics (evaluation.py) ----------------------------------

    def test_rank_metrics_closed_form(self):
        ev = RAGEvaluator
        assert ev.mrr(["x", "y", "g"], ["g"]) == pytest.approx(1.0 / 3.0)
        assert ev.mrr(["x", "y"], ["g"]) == 0.0
        assert ev.precision_at_k(["g1", "x", "g2", "y"], ["g1", "g2"], 3) \
            == pytest.approx(2.0 / 3.0)
        # k beyond the list: denominator is len(top), not k
        assert ev.precision_at_k(["g1", "x"], ["g1"], 5) == pytest.approx(0.5)
        assert ev.recall_at_k(["g1", "x"], ["g1", "g2"], 2) == pytest.approx(0.5)
        dcg = 1.0 + 0.5                      # hits at ranks 1 and 3
        ideal = 1.0 + 1.0 / np.log2(3.0)
        assert ev.ndcg_at_k(["g1", "x", "g2"], ["g1", "g2"], 3) \
            == pytest.approx(dcg / ideal)

    def test_confidence_and_hallucination_closed_form(self):
        from advanced_rag_tpu.pipeline.evaluation import EC

        conf, unc = RAGEvaluator.confidence(np.array([0.8, 0.6]))
        assert conf == pytest.approx(0.8 * 1.2)
        assert unc == pytest.approx(1.0 - 0.8 * 1.2)
        ev = RAGEvaluator()
        # all-good signals: every term zero
        assert ev.hallucination_risk(
            "q", np.array([1.0, 1.0]), diversity=1.0,
            contents=["c"], coverage=1.0) == pytest.approx(0.0)
        # zero-variance all-bad: risk = sum of the non-variance weights
        expected = (EC.HALLUCINATION_DIVERSITY_WEIGHT
                    + EC.HALLUCINATION_TOP_SCORE_WEIGHT
                    + EC.HALLUCINATION_COVERAGE_WEIGHT)
        assert ev.hallucination_risk(
            "q", np.array([0.0, 0.0]), diversity=0.0,
            contents=["c"], coverage=0.0) == pytest.approx(expected)

    def test_coverage_and_diversity_closed_form(self):
        assert RAGEvaluator.query_coverage("alpha beta", ["alpha only"]) \
            == pytest.approx(0.5)
        assert RAGEvaluator.pairwise_diversity(
            None, ["a b", "a b"]) == pytest.approx(0.0)
        assert RAGEvaluator.pairwise_diversity(
            None, ["a b", "c d"]) == pytest.approx(1.0)
        same = np.tile(np.array([[1.0, 0.0]]), (3, 1))
        assert RAGEvaluator.pairwise_diversity(same) == pytest.approx(0.0)

    # -- rankers -------------------------------------------------------

    def test_ranker_featurize_closed_form(self):
        r = LearnedRanker()
        now = 1_000_000.0
        half = r.config.recency_half_life_days
        base, methods, rec = r.featurize(
            {"score": 0.25, "method_count": 3,
             "timestamp": now - half * 86400.0}, now=now)
        assert (base, methods) == (0.25, 3.0)
        assert rec == pytest.approx(0.5)          # exactly one half-life
        # future timestamps clamp to age 0, missing methods default to 1
        _, m1, rec1 = r.featurize({"score": 1.0, "timestamp": now + 999},
                                  now=now)
        assert (m1, rec1) == (1.0, pytest.approx(1.0))
        assert r.featurize({"score": 0, "methods": ["a", "b"],
                            "timestamp": now}, now=now)[1] == 2.0

    def test_ranker_sgd_step_closed_form(self):
        import time as _time

        r = LearnedRanker()
        w0 = r.weights.copy()
        # far-future timestamp => recency exactly 1.0 regardless of clock
        res = {"score": 2.0, "method_count": 1,
               "timestamp": _time.time() + 1e6}
        feats = np.array([2.0, 1.0, 1.0])
        pred = 1.0 / (1.0 + np.exp(-feats @ w0))
        expected = w0 - r.config.learning_rate * (pred - 1.0) * feats
        r.update_from_feedback(res, positive=True)
        assert np.allclose(r.weights, expected, atol=1e-12)
        assert len(r.examples) == 1 and r.examples[0].label == 1.0

    def test_adapter_word_count_boundaries(self):
        a = LearnedHybridAdapter()          # default rates: 0.5/0.5
        d, s = a("one two three four", 0.6, 0.4)   # 4 words: no boost
        assert d == pytest.approx(0.6) and s == pytest.approx(0.4)
        d3, s3 = a("one two three", 0.6, 0.4)      # exactly 3: sparse x1.2
        assert s3 == pytest.approx(0.48 / (0.6 + 0.48))
        d12, _ = a(" ".join(["w"] * 12), 0.6, 0.4)  # exactly 12: dense x1.2
        assert d12 == pytest.approx(0.72 / (0.72 + 0.4))
        assert d3 + s3 == pytest.approx(1.0)

    # -- chunking geometry ---------------------------------------------

    def test_window_strategy_exact_geometry(self):
        ch = AdaptiveChunker(base_chunk_size=4, overlap_ratio=0.25,
                             strategy="window")
        words = [f"w{i}" for i in range(10)]
        chunks = ch.chunk_document(" ".join(words))
        # stride = round(4 * 0.75) = 3 -> windows at 0, 3, 6 (6+4 >= 10 stops)
        assert [c.content for c in chunks] == [
            "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
        assert [c.metadata.token_count for c in chunks] == [4, 4, 4]
        assert chunks[0].metadata.start_char == 0

    def test_sentence_packing_exact_boundaries(self):
        text = ("alpha one two. beta three four. "
                "gamma five six. delta seven eight.")
        # target 6 fits exactly two 3-token sentences; overlap budget
        # int(6*0.1) = 0 steps back zero sentences
        ch = AdaptiveChunker(base_chunk_size=6, min_chunk_size=1,
                             max_chunk_size=100, overlap_ratio=0.1)
        chunks = ch.chunk_document(text)
        assert len(chunks) == 2
        assert [c.metadata.token_count for c in chunks] == [6, 6]
        assert "alpha" in chunks[0].content and "three" in chunks[0].content
        assert "five" not in chunks[0].content
        # overlap budget int(6*0.5) = 3 steps back exactly one sentence
        ch2 = AdaptiveChunker(base_chunk_size=6, min_chunk_size=1,
                              max_chunk_size=100, overlap_ratio=0.5)
        chunks2 = ch2.chunk_document(text)
        assert len(chunks2) == 3
        assert "beta" in chunks2[0].content and "beta" in chunks2[1].content

    # -- query ops -----------------------------------------------------

    def test_decomposer_exact_boundaries(self):
        qd = QueryDecomposer()              # min_complex_words = 6
        r5 = qd.decompose("alpha beta gamma delta epsilon")
        assert not r5.is_complex and r5.sub_queries == [
            "alpha beta gamma delta epsilon"]
        r6 = qd.decompose("alpha beta and gamma delta epsilon")
        assert r6.is_complex and r6.sub_queries == [
            "alpha beta", "gamma delta epsilon"]
        # two-word parts survive the >= 2 filter
        r2w = qd.decompose("alpha beta and gamma delta and epsilon zeta")
        assert r2w.is_complex and len(r2w.sub_queries) == 3
        # one-word parts are dropped; a single survivor is not complex
        r1w = qd.decompose("x and y and alpha beta gamma")
        assert not r1w.is_complex

    def test_classifier_analysis_length_boundary(self):
        qc = QueryClassifier()
        q200 = ("zz " * 66) + "zz"          # exactly 200 chars, no keywords
        assert len(q200) == 200
        assert qc.classify(q200) == "analysis"
        assert qc.classify(q200[:199]) == "default"

    # -- enrichment / experiments --------------------------------------

    def test_enricher_exact_scores_and_caps(self):
        e = SemanticEnricher(max_entities=1, max_topics=2)
        res = e.enrich("apple apple banana Paris Paris London")
        assert res.entities == ["Paris"]            # capped at exactly 1
        assert len(res.topics) == 2
        assert res.keyword_scores["apple"] == pytest.approx(2.0 / 6.0)

    def test_epsilon_greedy_exact_selection(self):
        import random as _random

        em = ExperimentManager(epsilon=0.0, rng=_random.Random(0))
        em.register("a")
        em.register("b")
        em.record_outcome("a", False)
        em.record_outcome("b", True)
        em.record_outcome("b", True)
        assert all(em.choose_variant() == "b" for _ in range(10))
        assert em.variants["b"].mean_reward == pytest.approx(1.0)
        assert em.variants["b"].success_rate == pytest.approx(1.0)
        # exact tie: lexicographic winner
        em2 = ExperimentManager(epsilon=0.0, rng=_random.Random(0))
        em2.record_outcome("b", True)
        em2.record_outcome("a", True)
        assert em2.choose_variant() == "a"
