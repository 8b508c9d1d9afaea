"""Stage-by-stage ablation of the service-path quality gap (VERDICT r4 #1).

artifacts/QUALITY_SERVICE.json measured /retrieve at R@10 0.5156 vs
0.6667 manager-direct (delta -0.151) with identical model artifacts.
The serving stack differs from the manager-direct protocol
(scripts/bench_quality_real.py) in exactly these stages:

  (a) CHUNKING   — AdaptiveChunker sentence-packing (base 110) vs the
                   bench's 110-word stride-80 sliding windows;
  (b) STATICS    — /retrieve?top_k=48 compiles (k_out=48, k_rerank=48):
                   the CE reranks a depth-48 chunk slate, while the
                   manager protocol reranks the dev-picked depth-20;
  (c) REWRITING  — QueryRewriter expands abbreviations pre-retrieval;
  (d) SLATE      — the fused program reranks top-K chunk ROWS (dup docs
                   collapse later), the unfused protocol reranks K
                   DISTINCT docs.

This script measures each stage in isolation, manager-direct (no HTTP,
no service process), on the identical corpus/query/ckpt protocol, and
writes artifacts/ABLATE_SERVICE.json.  The convicted stage gets fixed in
the product; bench_quality_service.py then re-validates end-to-end.

Usage: python scripts/ablate_service_quality.py [--queries 384]
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
import time
from pathlib import Path

import numpy as np

REPO = Path(_repo)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=384)
    ap.add_argument("--max-docs", type=int, default=24000)
    ap.add_argument("--skip-windows", action="store_true",
                    help="only run the adaptive-chunk rows")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from scripts.bench_quality_real import harvest_docstrings, window_corpus

    quality = json.loads((REPO / "QUALITY_REAL.json").read_text())
    rk = quality["tiers"].get("fused_reranked") or \
        quality["tiers"]["trained_reranked"]
    weights = rk.get("weights", [0.5, 0.5])
    alpha = float(rk.get("alpha", 0.5))
    mode = rk.get("mode", "residual")
    base = rk.get("base", "exact")
    mix = float(rk.get("mix", 0.35))

    print("harvesting (QUALITY_REAL protocol)...", flush=True)
    docs = harvest_docstrings(args.max_docs)
    rng = np.random.default_rng(0)
    order = rng.permutation(len(docs))
    n_eval = min(args.queries, len(docs) // 4)
    eval_idx = sorted(order[:n_eval].tolist())
    queries = [docs[i][1] for i in eval_idx]
    gold_doc = [docs[i][0] for i in eval_idx]
    test_q, test_gold = queries[1::2], gold_doc[1::2]
    bodies = [d[2] for d in docs]
    print(f"{len(docs)} docs, {len(test_q)} test-half queries", flush=True)

    # ---- serving model artifacts (the ckpts the service loads) -------
    from advanced_rag_tpu.models.cross_encoder import CrossEncoderReranker
    from advanced_rag_tpu.models.embedder import NeuralEmbedder
    from advanced_rag_tpu.models.tokenizer import (
        HashingTokenizer, TokenizerConfig)
    from advanced_rag_tpu.train.loop import load_biencoder
    from advanced_rag_tpu.train.rerank import load_reranker

    enc_cfg, out_dim, bi_params = load_biencoder(
        REPO / "artifacts" / "biencoder_ckpt")
    tok = HashingTokenizer(TokenizerConfig(
        vocab_size=enc_cfg.vocab_size, max_len=enc_cfg.max_len))
    emb = NeuralEmbedder(dim=out_dim, config=enc_cfg, params=bi_params,
                         tokenizer=tok)
    ce_cfg, ce_params, layout = load_reranker(
        REPO / "artifacts" / "reranker_ckpt")
    rr = CrossEncoderReranker(config=ce_cfg, params=ce_params,
                              tokenizer=tok, **layout)
    d_len = layout.get("d_len", 88)

    # ---- corpora ------------------------------------------------------
    def windows_corpus():
        ct, row_doc, _ = window_corpus(bodies, summaries=None)
        return ct, [docs[int(r)][0] for r in row_doc]

    def adaptive_corpus():
        """EXACTLY the service ingest text path: diagnostics ->
        AdaptiveChunker at the bench env knobs (base 110/max 160/min 32).
        """
        from advanced_rag_tpu.pipeline.chunking import AdaptiveChunker
        from advanced_rag_tpu.pipeline.diagnostics import DocumentDiagnostics

        diag = DocumentDiagnostics()
        chunker = AdaptiveChunker(base_chunk_size=110, max_chunk_size=160,
                                  min_chunk_size=32)
        ct, cd = [], []
        t0 = time.perf_counter()
        for i, body in enumerate(bodies):
            m = diag.analyze_document(body)
            for c in chunker.chunk_document(body, doc_id=docs[i][0],
                                            metrics=m):
                ct.append(c.content)
                cd.append(docs[i][0])
        print(f"  adaptive chunking: {len(ct)} chunks in "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        return ct, cd

    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager

    def build(chunk_texts, chunk_docs):
        cfg = PipelineConfig(fused_rerank=True, fused_token_len=d_len)
        mgr = MultiIndexManager(cfg, embedder=emb)
        recs = [ChunkRecord(chunk_id=str(r), doc_id=chunk_docs[r],
                            content=chunk_texts[r])
                for r in range(len(chunk_texts))]
        t0 = time.perf_counter()
        for i in range(0, len(recs), 512):
            mgr.index_chunks(recs[i:i + 512])
        print(f"  ingest {len(recs)} chunks in "
              f"{time.perf_counter()-t0:.0f}s", flush=True)
        return mgr

    def eval_fused(mgr, k_rerank, k_final, qs=None, tag="", dedupe=False,
                   alpha_=None):
        qs = qs if qs is not None else test_q
        hits_n, rr_sum = 0, 0.0
        t0 = time.perf_counter()
        for qi in range(0, len(qs), 8):
            batch = qs[qi:qi + 8]
            out = mgr.fused_retrieve_batch_sync(
                list(batch), k_final=k_final, k_rerank=k_rerank,
                reranker=rr, dense_weight=weights[0],
                sparse_weight=weights[1], use_mmr=False,
                rerank_alpha=alpha if alpha_ is None else alpha_,
                rerank_mode=mode, rerank_base=base,
                rescore_mix=mix, doc_dedupe=dedupe)
            for b, hs in enumerate(out):
                seen, ranked = set(), []
                for h in hs:
                    if h["doc_id"] not in seen:
                        seen.add(h["doc_id"])
                        ranked.append(h["doc_id"])
                ranked = ranked[:10]
                want = test_gold[qi + b]
                if want in ranked:
                    hits_n += 1
                    rr_sum += 1.0 / (ranked.index(want) + 1)
        n = len(qs)
        row = {"recall_at_10": round(hits_n / n, 4),
               "mrr_at_10": round(rr_sum / n, 4),
               "s_total": round(time.perf_counter() - t0, 1)}
        print(f"  {tag}: {row}", flush=True)
        return row

    from advanced_rag_tpu.pipeline.query_ops import QueryRewriter
    rew = QueryRewriter()
    test_q_rw = [rew.rewrite(q) for q in test_q]
    n_changed = sum(a != b for a, b in zip(test_q, test_q_rw))
    print(f"rewriter changed {n_changed}/{len(test_q)} queries", flush=True)

    results = {"knobs": {"weights": weights, "alpha": alpha, "mode": mode,
                         "base": base, "mix": mix},
               "n_docs": len(docs), "n_queries": len(test_q),
               "rewriter_changed_queries": n_changed, "rows": {}}
    R = results["rows"]

    if not args.skip_windows:
        print("building WINDOWS manager (bench protocol corpus)...",
              flush=True)
        mgr_w = build(*windows_corpus())
        R["win_k20"] = eval_fused(mgr_w, 20, 20, tag="win_k20 (baseline)")
        R["win_k48"] = eval_fused(mgr_w, 48, 48, tag="win_k48 (serving statics)")
        R["win_k48_rw"] = eval_fused(mgr_w, 48, 48, qs=test_q_rw,
                                     tag="win_k48_rw (rewritten queries)")
        R["win_k20_dd"] = eval_fused(mgr_w, 20, 20, dedupe=True,
                                     tag="win_k20_dd (doc-distinct slate)")
        R["win_k48_dd"] = eval_fused(mgr_w, 48, 48, dedupe=True,
                                     tag="win_k48_dd")
        mgr_w.close()
        del mgr_w

    print("building ADAPTIVE manager (service ingest corpus)...",
          flush=True)
    mgr_a = build(*adaptive_corpus())
    R["ada_k20"] = eval_fused(mgr_a, 20, 20, tag="ada_k20 (chunking only)")
    R["ada_k48"] = eval_fused(mgr_a, 48, 48, tag="ada_k48 (~service row)")
    R["ada_k20_dd"] = eval_fused(mgr_a, 20, 20, dedupe=True,
                                 tag="ada_k20_dd")
    R["ada_k32_dd"] = eval_fused(mgr_a, 32, 32, dedupe=True,
                                 tag="ada_k32_dd")
    R["ada_k48_dd"] = eval_fused(mgr_a, 48, 48, dedupe=True,
                                 tag="ada_k48_dd (~service row round 5)")
    R["ada_k48_dd_a25"] = eval_fused(mgr_a, 48, 48, dedupe=True,
                                     alpha_=0.25,
                                     tag="ada_k48_dd_a25 (softer CE)")
    mgr_a.close()

    art = REPO / "artifacts" / "ABLATE_SERVICE.json"
    art.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))
    print(f"-> {art}")


if __name__ == "__main__":
    main()
