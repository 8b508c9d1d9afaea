"""Retrieval quality at 100k+ rows through the SERVED index tiers
(VERDICT r3 next #4 — BASELINE config 2's shape).

QUALITY_REAL.json measures quality on the ~24k harvested real-text
passages with the bf16 tier only; quantization's quality cost was known
only on synthetic manifolds (PARITY_HNSW.json).  This bench measures
R@10 / MRR@10 of the SAME harvested corpus and query protocol at
>=100k rows — every real passage padded with distractor passages
assembled from real harvested sentences (realistic lexical competition;
no external corpus is fetchable here, zero egress) — across the three
tiers production actually serves:

  bf16    exact bf16 scan              (2 B/dim per row)
  sq8     int8 codes + row scale       (1 B/dim; ops/quant.py)
  ivfpq   residual IVF-PQ + exact refine (ops/ivfpq.py, nprobe tuned
          to the config recall target)

Each tier reports two rows:
  hybrid        dense + BM25 RRF fusion at the dev-picked weights
  production    the full serving rank key: depth-20 hybrid ->
                exact per-tier rescore (z-mixed; skipped on ivfpq,
                where candidates keep their refined ADC order as the
                base) -> trained cross-encoder residual at the
                dev-picked alpha (artifacts from bench_quality_real.py)

The bi-encoder, reranker, and rank-key knobs come from
artifacts/biencoder_ckpt, artifacts/reranker_ckpt, QUALITY_REAL.json —
run scripts/bench_quality_real.py first (this bench must evaluate the
SAME model production serves; --hash falls back to the training-free
hashing embedder).

Writes artifacts/QUALITY_100K.json and prints one summary table.
Reference counterpart: Milvus sparse+HNSW search at any collection
size, /root/reference/src/advanced_rag/indexing.py:445-551 +
retrieval.py:421-491; quality bar README.md:303-307.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_repo = str(_Path(__file__).resolve().parent.parent)
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import json
import re
import time
from pathlib import Path

import numpy as np

from scripts.bench_quality_real import (
    evaluate, harvest_docstrings, window_corpus)

REPO = Path(_repo)


def make_distractors(bodies: list, n: int, rng) -> list:
    """``n`` distractor passages, each 5 sentences sampled from
    DISTINCT random real bodies — real English with the corpus's own
    vocabulary (so BM25 and the dense tower face genuine lexical
    competition), but never the gold answer to any query."""
    sent_re = re.compile(r"(?<=[.!?])\s+")
    pools = []
    for b in bodies:
        # drop each body's first sentence: that is the content its
        # summary-line query most directly names, and a distractor
        # carrying it would be an unlabeled true positive
        sents = [s.strip() for s in sent_re.split(b)[1:]
                 if 40 <= len(s.strip()) <= 300]
        pools.extend(sents)
    pools = np.asarray(pools, dtype=object)
    out = []
    for i in range(n):
        take = rng.choice(len(pools), size=5, replace=False)
        # one encoder-window's worth of text: distractors compete at
        # the same granularity the real corpus is indexed at
        words = " ".join(str(pools[j]) for j in take).split()
        out.append(" ".join(words[:110]))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--real-docs", type=int, default=24000)
    ap.add_argument("--queries", type=int, default=384)
    ap.add_argument("--hash", action="store_true",
                    help="training-free hashing embedder instead of "
                         "artifacts/biencoder_ckpt")
    ap.add_argument("--no-rerank", action="store_true",
                    help="skip the production-rank-key rows")
    ap.add_argument("--tiers", default="bf16,sq8,ivfpq")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager
    from advanced_rag_tpu.utils.cache import EmbeddingCache

    rng = np.random.default_rng(0)
    print("harvesting docstrings...", flush=True)
    docs = harvest_docstrings(args.real_docs)
    n_real = len(docs)
    bodies = [d[2] for d in docs]
    # chunked protocol (matches bench_quality_real.py and the serving
    # chunker): real bodies index as encoder-sized windows, distractors
    # as single-window docs of their own; --rows targets CHUNK rows
    # (the vectors the tier actually holds)
    real_chunks, real_row_doc, _ = window_corpus(bodies)
    n_pad = max(args.rows - len(real_chunks), 0)
    print(f"{n_real} real passages -> {len(real_chunks)} windows; "
          f"assembling {n_pad} distractors", flush=True)
    t0 = time.perf_counter()
    texts = list(real_chunks) + make_distractors(bodies, n_pad, rng)
    row_doc = np.concatenate([
        real_row_doc,
        n_real + np.arange(n_pad, dtype=np.int32)]).astype(np.int32)
    print(f"  distractors {time.perf_counter()-t0:.0f}s", flush=True)

    # same query protocol as QUALITY_REAL: summary line -> its body,
    # eval rows drawn by the same seed-0 permutation of the REAL docs
    order = rng_perm = np.random.default_rng(0).permutation(n_real)
    n_eval = min(args.queries, n_real // 4)
    eval_rows = sorted(order[:n_eval].tolist())
    queries = [docs[i][1] for i in eval_rows]
    truth = eval_rows
    del rng_perm

    # serving model + rank-key knobs from the quality-real artifacts
    knobs = {"weights": [0.5, 0.5], "mix": 0.5, "alpha": 0.5,
             "mode": "residual", "base": "exact"}
    qr = REPO / "QUALITY_REAL.json"
    if qr.exists():
        tiers_prev = json.loads(qr.read_text()).get("tiers", {})
        src = tiers_prev.get("fused_reranked") or tiers_prev.get(
            "trained_reranked") or {}
        for k in knobs:
            if k in src:
                knobs[k] = src[k]
    print(f"rank-key knobs: {knobs}", flush=True)

    if args.hash:
        embedder, model_tag = None, "hashing"
    else:
        from advanced_rag_tpu.models.embedder import NeuralEmbedder
        from advanced_rag_tpu.models.tokenizer import (
            HashingTokenizer, TokenizerConfig)
        from advanced_rag_tpu.train import load_biencoder

        enc_cfg, out_dim, params = load_biencoder(
            REPO / "artifacts/biencoder_ckpt")
        tok = HashingTokenizer(TokenizerConfig(
            vocab_size=enc_cfg.vocab_size, max_len=enc_cfg.max_len))
        embedder = NeuralEmbedder(dim=out_dim, config=enc_cfg,
                                  params=params, tokenizer=tok)
        model_tag = "trained biencoder_ckpt"

    reranker = None
    if not args.no_rerank:
        from advanced_rag_tpu.models.cross_encoder import (
            CrossEncoderReranker)
        from advanced_rag_tpu.train.rerank import load_reranker

        ce_cfg, ce_params, layout = load_reranker(
            REPO / "artifacts/reranker_ckpt")
        reranker = CrossEncoderReranker(config=ce_cfg, params=ce_params,
                                        **layout)

    # ONE embedder + ONE big shared cache across tier builds: the first
    # ingest pays the encoder forward passes, later tiers replay them
    # from host memory (the tiers must index IDENTICAL vectors anyway —
    # the comparison is the quantizer, not embedding noise)
    shared_cache = EmbeddingCache(capacity=args.rows + 1024,
                                  ttl_seconds=24 * 3600.0)

    dw, sw = float(knobs["weights"][0]), float(knobs["weights"][1])
    DEPTH = 20

    def _z(v):
        v = np.asarray(v, np.float64)
        s = v.std()
        return (v - v.mean()) / (s if s > 1e-9 else 1.0)

    def production_search(mgr, tier):
        """Depth-20 hybrid -> per-tier base key -> CE residual: the
        serving rank key (ops/e2e.py semantics, host-composed here so
        one code path covers the PQ tier, whose candidates keep their
        refined ADC order as the base — rescore needs flat rows)."""
        can_rescore = tier in ("bf16", "sq8")

        def run(batch):
            out = mgr.hybrid_search_batch_sync(
                list(batch), DEPTH * 3, use_mmr=False,
                dense_weight=dw, sparse_weight=sw)
            # slate = best-ranked chunk row per distinct parent doc
            # (the app-layer dedupe production applies above the index)
            cand = []
            for hits in out:
                c_, cd_ = [], set()
                for h in hits:
                    r_ = int(h["row"])
                    d_ = int(row_doc[r_])
                    if d_ not in cd_:
                        cd_.add(d_)
                        c_.append((r_, float(h["score"])))
                        if len(c_) >= DEPTH:
                            break
                cand.append(c_)
            flat_q = [batch[b] for b, c in enumerate(cand) for _ in c]
            flat_d = [texts[r] for c in cand for r, _ in c]
            ce = reranker.score_pairs(flat_q, flat_d)
            if can_rescore:
                rows_mat = np.full((len(cand), DEPTH), -1, np.int32)
                for b, c in enumerate(cand):
                    rows_mat[b, :len(c)] = [r for r, _ in c]
                d_ex, s_ex = mgr.rescore_candidates_sync(
                    list(batch), rows_mat)
            ranked_out, pos = [], 0
            mix = float(knobs["mix"])
            alpha = float(knobs["alpha"])
            for b, c in enumerate(cand):
                n_c = len(c)
                if can_rescore:
                    base = _z(mix * _z(d_ex[b, :n_c])
                              + (1.0 - mix) * _z(s_ex[b, :n_c]))
                else:
                    base = _z([s for _, s in c])
                ce_q = np.asarray(ce[pos:pos + n_c], np.float64)
                pos += n_c
                if knobs["mode"] == "residual":
                    s = base + alpha * ce_q
                else:
                    s = alpha * _z(ce_q) + (1.0 - alpha) * base
                ranked_out.append(
                    [int(row_doc[c[j][0]]) for j in np.argsort(-s)[:10]])
            return ranked_out
        return run

    results = {"rows": len(texts), "n_real": n_real, "n_queries": n_eval,
               "model": model_tag, "knobs": knobs, "tiers": {},
               "protocol": {"chunked": True, "doc_level_eval": True,
                            "real_windows": len(real_chunks)}}
    dtype_of = {"bf16": "bfloat16", "sq8": "int8", "ivfpq": "pq"}

    for tier in args.tiers.split(","):
        print(f"=== tier {tier}: ingest {len(texts)} rows", flush=True)
        cfg = PipelineConfig(semantic_dtype=dtype_of[tier])
        mgr = MultiIndexManager(cfg, embedder=embedder,
                                semantic_cache_=shared_cache)
        t0 = time.perf_counter()
        recs = [ChunkRecord(chunk_id=str(i),
                            doc_id=(docs[int(row_doc[i])][0]
                                    if row_doc[i] < n_real
                                    else f"pad{int(row_doc[i])}"),
                            content=texts[i])
                for i in range(len(texts))]
        for i in range(0, len(recs), 2048):
            mgr.index_chunks(recs[i:i + 2048])
        ingest_s = round(time.perf_counter() - t0, 1)
        print(f"  ingest {ingest_s}s", flush=True)
        row = {"ingest_s": ingest_s}
        if tier == "ivfpq":
            t0 = time.perf_counter()
            mgr.semantic.build_pq()
            if mgr.semantic._pq_rot is None:
                mgr.semantic.build_ivfpq()
            nprobe, probe_recall = mgr.semantic.tune_nprobe(
                recall_target=0.95, k=10, sample=64)
            row.update({"build_s": round(time.perf_counter() - t0, 1),
                        "nprobe": int(nprobe),
                        "probe_recall": round(float(probe_recall), 4)})
            print(f"  ivfpq built: nprobe {nprobe} "
                  f"(probe recall {probe_recall:.3f})", flush=True)

        def hybrid_run(batch, mgr=mgr):
            out = mgr.hybrid_search_batch_sync(
                list(batch), 48, use_mmr=False,
                dense_weight=dw, sparse_weight=sw)
            ranked = []
            for hits in out:
                seen, docs_r = set(), []
                for h in hits:
                    d_ = int(row_doc[int(h["row"])])
                    if d_ not in seen:
                        seen.add(d_)
                        docs_r.append(d_)
                        if len(docs_r) >= 10:
                            break
                ranked.append(docs_r)
            return ranked

        row["hybrid"] = evaluate(hybrid_run, queries, truth)
        print(f"  hybrid: {row['hybrid']}", flush=True)
        if reranker is not None:
            row["production"] = evaluate(
                production_search(mgr, tier), queries, truth)
            row["production"]["base"] = (
                "exact_rescore" if tier in ("bf16", "sq8")
                else "refined_adc")
            print(f"  production: {row['production']}", flush=True)
        results["tiers"][tier] = row
        mgr.close()
        del mgr, recs

    Path(REPO / "artifacts").mkdir(exist_ok=True)
    out_path = REPO / "artifacts/QUALITY_100K.json"
    out_path.write_text(json.dumps(results, indent=1))
    print(json.dumps({"metric": "quality_100k_recall_at_10",
                      "tiers": {t: r["hybrid"]["recall_at_10"]
                                for t, r in results["tiers"].items()},
                      "rows": len(texts)}))
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
