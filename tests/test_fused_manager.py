"""Manager-level one-dispatch retrieve+rerank (config.fused_rerank).

The token table ingests through the same fused single-dispatch append
as every other family, survives checkpoint restore by deterministic
re-tokenization, and fused_retrieve_batch_sync returns candidates that
agree with the staged hybrid+rerank path.
"""

import numpy as np
import pytest

from advanced_rag_tpu.config import PipelineConfig
from advanced_rag_tpu.index.corpus import ChunkRecord
from advanced_rag_tpu.index.manager import MultiIndexManager
from advanced_rag_tpu.models.cross_encoder import CrossEncoderReranker
from advanced_rag_tpu.models.embedder import NeuralEmbedder
from advanced_rag_tpu.models.encoder import EncoderConfig
from advanced_rag_tpu.models.tokenizer import HashingTokenizer, TokenizerConfig
from advanced_rag_tpu.utils.exceptions import IndexingError

CFG = EncoderConfig(vocab_size=2048, hidden_dim=32, num_layers=1,
                    num_heads=4, mlp_dim=64, max_len=96)

DOCS = [
    "dense retrieval embeds queries into one vector space",
    "sparse lexical matching weighs rare terms heavily",
    "reciprocal rank fusion merges ranked candidate lists",
    "systolic arrays stream matrix tiles through the chip",
    "circuit breakers shed load from failing dependencies",
    "checkpoints persist index state across restarts",
    "product quantization compresses vectors to bytes",
    "drift detection compares embedding distributions",
]


def make_manager(**cfg_kw):
    cfg = PipelineConfig(fused_rerank=True, **cfg_kw)
    cfg.semantic_dim = 32
    tok = HashingTokenizer(TokenizerConfig(vocab_size=2048, max_len=32))
    emb = NeuralEmbedder(dim=32, config=CFG, tokenizer=tok)
    mgr = MultiIndexManager(cfg, embedder=emb)
    recs = [ChunkRecord(chunk_id=f"c{i}", doc_id=f"d{i}", content=t)
            for i, t in enumerate(DOCS)]
    mgr.index_chunks(recs)
    return mgr


@pytest.fixture(scope="module")
def manager():
    return make_manager()


@pytest.fixture(scope="module")
def reranker():
    return CrossEncoderReranker(config=CFG, seed=3)


def test_token_table_ingests_with_fused_append(manager):
    assert manager.token_table is not None
    assert manager.token_table.size == len(DOCS)
    host = manager.token_table._host[: len(DOCS)]
    dev = np.asarray(manager.token_table.tokens)[: len(DOCS)]
    np.testing.assert_array_equal(host, dev)
    assert (host[:, 0] == 1).all()          # [CLS] framing


def test_fused_retrieve_returns_ranked_hits(manager, reranker):
    out = manager.fused_retrieve_batch_sync(
        ["how are ranked lists merged?", "what compresses vectors?"],
        k_final=3, reranker=reranker, k_rerank=6)
    assert len(out) == 2
    for hits in out:
        assert 1 <= len(hits) <= 3
        rrs = [h["rerank_score"] for h in hits]
        assert rrs == sorted(rrs, reverse=True)
        assert all(h["method"] == "fused_rerank" for h in hits)


def test_fused_candidates_match_staged_hybrid(manager, reranker):
    """The fused program's pre-rerank candidate pool must contain what
    the staged hybrid search returns for the same knobs."""
    q = "sparse lexical matching"
    staged = manager.hybrid_search_batch_sync([q], 6, use_mmr=True)[0]
    fused = manager.fused_retrieve_batch_sync(
        [q], k_final=6, reranker=reranker, k_rerank=6)[0]
    staged_rows = {h["row"] for h in staged}
    fused_rows = {h["row"] for h in fused}
    assert fused_rows <= staged_rows | fused_rows  # sanity
    assert len(staged_rows & fused_rows) >= min(3, len(staged_rows))


def test_filters_apply(manager, reranker):
    out = manager.fused_retrieve_batch_sync(
        ["anything at all"], k_final=4, reranker=reranker,
        filters={"doc_id": "d3"})
    rows = [h["row"] for h in out[0]]
    assert rows == [3]


def test_requires_flag_and_flax_embedder(reranker):
    mgr = MultiIndexManager(PipelineConfig())
    mgr.index_chunks([ChunkRecord(chunk_id="x", doc_id="x", content="hi there")])
    with pytest.raises(IndexingError):
        mgr.fused_retrieve_batch_sync(["q"], reranker=reranker)


def test_checkpoint_rebuilds_token_table(tmp_path, reranker):
    from advanced_rag_tpu.utils.checkpoint import load_index, save_index

    mgr = make_manager()
    save_index(mgr, tmp_path)
    cfg = PipelineConfig(fused_rerank=True)
    cfg.semantic_dim = 32
    tok = HashingTokenizer(TokenizerConfig(vocab_size=2048, max_len=32))
    mgr2 = MultiIndexManager(
        cfg, embedder=NeuralEmbedder(dim=32, config=CFG, tokenizer=tok))
    load_index(mgr2, tmp_path)
    assert mgr2.token_table.size == len(DOCS)
    out = mgr2.fused_retrieve_batch_sync(
        ["reciprocal rank fusion"], k_final=3, reranker=reranker)
    assert out[0]


def test_pipeline_uses_fused_path(reranker):
    """AdvancedRAGPipeline routes retrieve through the one-dispatch
    program when configured, and falls back otherwise."""
    from advanced_rag_tpu.pipeline import AdvancedRAGPipeline

    mgr = make_manager()
    pipe = AdvancedRAGPipeline(mgr.config, index_manager=mgr)
    pipe.retriever.reranker = reranker
    assert pipe._use_fused_path()
    out = pipe.retrieve("how are ranked lists merged?", top_k=5)
    assert out["results"]
    assert out["results"][0].metadata["method"] == "fused_rerank"

    # no reranker -> classic staged path
    pipe.retriever.reranker = None
    assert not pipe._use_fused_path()
    out2 = pipe.retrieve("how are ranked lists merged?", top_k=5)
    assert out2["results"]


def test_fused_sparse_disabled_dense_only(reranker):
    """sparse_on=False: the program gets placeholder sparse args
    (manager.py fused sparse-off branch) and still ranks correctly."""
    cfg = PipelineConfig(fused_rerank=True)
    cfg.semantic_dim = 32
    tok = HashingTokenizer(TokenizerConfig(vocab_size=2048, max_len=32))
    emb = NeuralEmbedder(dim=32, config=CFG, tokenizer=tok)
    mgr = MultiIndexManager(cfg, embedder=emb, enable_sparse=False)
    mgr.index_chunks([ChunkRecord(chunk_id=f"c{i}", doc_id=f"d{i}", content=t)
                      for i, t in enumerate(DOCS)])
    out = mgr.fused_retrieve_batch_sync(
        ["dense retrieval vector space"], k_final=3, reranker=reranker,
        k_rerank=6)
    assert out[0] and all(h["chunk_id"].startswith("c") for h in out[0])


# ---- exact candidate rescoring (ops/rescore.py) -------------------------

def test_rescore_matches_tier_scores(manager):
    """A candidate's exact rescore must equal the score its tier would
    give it: BM25 column vs the sparse tier's own top-k, dense column
    vs the dense tier's — the consistency contract in the rescore
    docstring (the serve-time base key equals tier truth)."""
    q = "sparse lexical matching weighs terms"
    s_scores, s_rows = manager.sparse.search_texts(
        [q], 4, manager._row_mask(None))
    s_scores, s_rows = np.asarray(s_scores)[0], np.asarray(s_rows)[0]
    d_hits = manager.search_sync("semantic", q, 4)
    d_rows = np.asarray([[h["row"] for h in d_hits]], np.int32)
    d_tier = np.asarray([h["score"] for h in d_hits], np.float32)

    dense, bm25 = manager.rescore_candidates_sync([q], s_rows[None, :])
    keep = s_rows >= 0
    np.testing.assert_allclose(bm25[0][keep], s_scores[keep],
                               rtol=2e-2, atol=1e-3)
    dense2, _ = manager.rescore_candidates_sync([q], d_rows)
    np.testing.assert_allclose(dense2[0], d_tier, rtol=2e-2, atol=5e-3)


def test_rescore_pads_and_validates(manager):
    dense, bm25 = manager.rescore_candidates_sync(
        ["anything"], np.asarray([[0, -1, 3]], np.int32))
    assert dense.shape == (1, 3) and bm25.shape == (1, 3)
    assert dense[0, 1] == 0.0 and bm25[0, 1] == 0.0
    with pytest.raises(Exception):
        manager.rescore_candidates_sync(["a", "b"],
                                        np.zeros((1, 3), np.int32))


def test_fused_exact_base_orders_by_zmix(manager, reranker):
    """rerank_base='exact' with alpha=0: the fused program's final
    order must equal the host-side exact z-mix ranking of the same
    candidate pool (ops/rescore.py zmix_base contract)."""
    q = "reciprocal rank fusion merges lists"
    K = 6
    fused = manager.fused_retrieve_batch_sync(
        [q], k_final=K, reranker=reranker, k_rerank=K,
        rerank_alpha=0.0, rerank_mode="residual", rerank_base="exact",
        rescore_mix=0.5, use_mmr=False)[0]
    # candidate pool = same program with base='fused', alpha=0 keeps
    # the hybrid order; both runs share the hybrid stage exactly
    base = manager.fused_retrieve_batch_sync(
        [q], k_final=K, reranker=reranker, k_rerank=K,
        rerank_alpha=0.0, rerank_mode="residual", rerank_base="fused",
        use_mmr=False)[0]
    rows = np.asarray([[h["row"] for h in base]], np.int32)
    dense, bm25 = manager.rescore_candidates_sync([q], rows)

    def z(x):
        return (x - x.mean()) / (x.std() + 1e-9)

    key = z(0.5 * z(dense[0]) + 0.5 * z(bm25[0]))
    want = [int(rows[0][j]) for j in np.argsort(-key)]
    got = [h["row"] for h in fused]
    assert got == want[: len(got)]


def test_host_rerank_residual_key(manager, reranker):
    """Host rerank path (pipeline/retrieval.py): with rerank_alpha=0 in
    residual mode the CE cannot change the exact-base order, and the
    config knobs flow from PipelineConfig through the retriever."""
    from advanced_rag_tpu.pipeline.retrieval import HybridRetriever

    manager.config.rerank_mode = "residual"
    manager.config.rerank_base = "exact"
    manager.config.rerank_alpha = 0.0
    try:
        retr = HybridRetriever(manager, manager.config.retrieval)
        retr.reranker = reranker
        q = "sparse lexical matching"
        hits = manager.hybrid_search_batch_sync([q], 6, use_mmr=False)[0]
        out = retr.rerank_sync(q, hits, 6)
        rows = np.asarray([[h["row"] for h in hits]], np.int32)
        dense, bm25 = manager.rescore_candidates_sync([q], rows)

        def z(x):
            return (x - x.mean()) / (x.std() + 1e-9)

        key = z(0.5 * z(dense[0]) + 0.5 * z(bm25[0]))
        want = [int(rows[0][j]) for j in np.argsort(-key)]
        assert [h["row"] for h in out] == want[: len(out)]
    finally:
        manager.config.rerank_alpha = 0.5


def test_fused_exact_postings_base_matches_exact(manager, reranker):
    """rerank_base='exact_postings' serves the SAME rank key as 'exact'
    once the inverted postings are built with an untruncated cap (the
    ops/rescore.py equality contract) — the memory-scalable variant the
    10M tier serves (no O(N) doc-major term table)."""
    manager.sparse.build_postings(cap=len(DOCS))
    try:
        q = "sparse lexical matching"
        K = 6
        kw = dict(k_final=K, reranker=reranker, k_rerank=K,
                  rerank_alpha=0.0, rerank_mode="residual",
                  rescore_mix=0.5, use_mmr=False)
        a = manager.fused_retrieve_batch_sync([q], rerank_base="exact", **kw)[0]
        b = manager.fused_retrieve_batch_sync(
            [q], rerank_base="exact_postings", **kw)[0]
        assert [h["row"] for h in a] == [h["row"] for h in b]
    finally:
        manager.sparse._post_rows = None
        manager.sparse._post_tf = None


def test_fused_exact_postings_requires_postings(manager, reranker):
    assert manager.sparse.post_rows is None
    with pytest.raises(IndexingError, match="postings"):
        manager.fused_retrieve_batch_sync(
            ["anything"], k_final=4, reranker=reranker, k_rerank=4,
            rerank_alpha=0.0, rerank_base="exact_postings")


def test_fused_doc_dedupe_returns_distinct_docs(reranker):
    """doc_dedupe=True: the reranked slate holds the best-ranked chunk
    per DISTINCT doc, so k_final rows are k_final distinct documents —
    chunk-row slates (doc_dedupe=False) can spend every slot on one
    doc's near-identical chunks (VERDICT r4 #3: the fused path's doc
    recall was capped below the unfused per-doc-slate protocol)."""
    cfg = PipelineConfig(fused_rerank=True)
    cfg.semantic_dim = 32
    tok = HashingTokenizer(TokenizerConfig(vocab_size=2048, max_len=32))
    emb = NeuralEmbedder(dim=32, config=CFG, tokenizer=tok)
    mgr = MultiIndexManager(cfg, embedder=emb)
    recs = []
    # doc "dup" has 4 near-identical chunks that dominate the query;
    # three other docs share a weaker term overlap
    for i in range(4):
        recs.append(ChunkRecord(
            chunk_id=f"dup{i}", doc_id="dup",
            content=f"reciprocal rank fusion merges ranked lists v{i}"))
    for i, t in enumerate([
            "rank fusion background reading material",
            "ranked retrieval evaluation metrics overview",
            "fusion reactors are unrelated to ranking"]):
        recs.append(ChunkRecord(chunk_id=f"o{i}", doc_id=f"other{i}",
                                content=t))
    mgr.index_chunks(recs)
    q = "reciprocal rank fusion merges ranked lists"

    plain = mgr.fused_retrieve_batch_sync(
        [q], k_final=4, reranker=reranker, k_rerank=4, use_mmr=False,
        doc_dedupe=False)[0]
    deduped = mgr.fused_retrieve_batch_sync(
        [q], k_final=4, reranker=reranker, k_rerank=4, use_mmr=False,
        doc_dedupe=True)[0]

    # chunk-row slate: the dup doc's chunks crowd the slate
    assert sum(h["doc_id"] == "dup" for h in plain) >= 2
    # doc-distinct slate: every row is a different doc, dup kept once
    docs = [h["doc_id"] for h in deduped]
    assert len(docs) == len(set(docs)) == 4
    assert "dup" in docs
    mgr.close()


def test_pipeline_fused_path_micro_batches(reranker):
    """Concurrent fused retrieves coalesce into one program dispatch
    (round-5: the fused path previously bypassed the micro-batcher —
    the device ran batch-1 programs at ~1/6th its batched throughput)."""
    import concurrent.futures

    from advanced_rag_tpu.pipeline import AdvancedRAGPipeline

    mgr = make_manager()
    pipe = AdvancedRAGPipeline(mgr.config, index_manager=mgr)
    pipe.retriever.reranker = reranker
    assert pipe._use_fused_path()
    calls = []
    orig = mgr.fused_retrieve_batch_sync

    def spy(queries, *a, **kw):
        calls.append(len(queries))
        return orig(queries, *a, **kw)

    mgr.fused_retrieve_batch_sync = spy
    # warm the single-query shape so the batched burst isn't serialized
    # behind a compile
    pipe.retrieve(DOCS[0], top_k=4)
    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        outs = list(pool.map(
            lambda q: pipe.retrieve(q, top_k=4),
            [f"{t} run {i}" for i, t in enumerate(DOCS)]))
    assert all(o["results"] for o in outs)
    assert all(o["results"][0].metadata["method"] == "fused_rerank"
               for o in outs)
    # at least one dispatch carried multiple queries
    assert max(calls) > 1, calls
    stats = pipe.get_performance_report().get("fused_micro_batcher", {})
    assert stats.get("requests", 0) >= len(DOCS)
    pipe.close()
