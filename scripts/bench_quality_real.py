"""Retrieval quality on REAL text with a trained model (VERDICT r1 #8).

No external corpus is fetchable in this environment (zero egress), so
the corpus is harvested from installed-package docstrings — thousands
of real English technical passages with natural topical structure.
Each docstring's summary line becomes a QUERY; the docstring body is
the DOCUMENT; ground truth is retrieving the body given its summary
(plus MRR of where it lands).  This replaces the hashing-embedder
proxy numbers with measurements on (a) real text and (b) a bi-encoder
TRAINED in-framework (train/contrastive.py) on a disjoint split.

Tiers compared at identical corpus/queries:
  - bm25: sparse only
  - hash_hybrid: hashing embedder + BM25 + RRF (the training-free path)
  - trained_hybrid: in-framework contrastively-trained bi-encoder +
    BM25 + RRF (the "real model" path)

Usage: python scripts/bench_quality_real.py [--cpu] [--max-docs 8000]
       [--train-steps 2000] [--no-train]
Writes QUALITY_REAL.json and prints a summary table.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_repo = str(_Path(__file__).resolve().parent.parent)
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import inspect
import json
import re
import time
from pathlib import Path

import numpy as np

PACKAGES = ["numpy", "scipy", "jax", "flax", "optax", "aiohttp",
            "torch", "transformers", "chex", "einops",
            # round-4 harvest expansion (VERDICT r3 next #3/#5: the
            # dense tower and the reranker were data-starved at 8k docs)
            "pandas", "sklearn", "matplotlib", "sympy", "networkx",
            "PIL", "cryptography", "rich", "click", "pydantic",
            "datasets", "huggingface_hub", "tokenizers", "absl",
            "requests", "setuptools"]


def harvest_docstrings(max_docs: int, min_chars: int = 300) -> list:
    """(doc_id, summary, body) triples from installed-package APIs.

    Walks submodules recursively (``pkgutil.walk_packages``) — the
    shallow top-level scan found only ~400 usable passages, starving
    the contrastive trainer; the deep walk finds thousands."""
    import contextlib
    import importlib
    import io
    import pkgutil
    import warnings

    seen_text: set = set()
    out: list = []

    def visit(obj, qualname: str) -> None:
        doc = inspect.getdoc(obj)
        if not doc or len(doc) < min_chars:
            return
        lines = doc.split("\n")
        summary = lines[0].strip()
        body = "\n".join(lines[1:]).strip()
        if len(summary) < 20 or len(body) < min_chars // 2:
            return
        key = doc[:200]
        if key in seen_text:
            return
        seen_text.add(key)
        out.append((qualname, summary, body[:4000]))

    for pkg_name in PACKAGES:
        try:
            pkg = importlib.import_module(pkg_name)
        except Exception:
            continue
        visit(pkg, pkg_name)
        mods = [pkg]
        if hasattr(pkg, "__path__"):
            # deep walk; imports of heavy/broken submodules are skipped,
            # their stdout/stderr chatter suppressed
            with warnings.catch_warnings(), \
                    contextlib.redirect_stdout(io.StringIO()), \
                    contextlib.redirect_stderr(io.StringIO()):
                warnings.simplefilter("ignore")
                for info in pkgutil.walk_packages(
                        pkg.__path__, prefix=f"{pkg_name}.",
                        onerror=lambda _: None):
                    base = info.name.rsplit(".", 1)[-1]
                    if base.startswith("_") or ".tests" in info.name \
                            or ".test_" in info.name:
                        continue
                    if len(out) >= max_docs:
                        break
                    try:
                        mods.append(importlib.import_module(info.name))
                    except BaseException:  # some submodules sys.exit()
                        continue
        for mod in mods:
            for name in dir(mod):
                if name.startswith("_") or len(out) >= max_docs:
                    continue
                try:
                    obj = getattr(mod, name)
                except Exception:
                    continue
                if callable(obj) or inspect.ismodule(obj):
                    visit(obj, f"{mod.__name__}.{name}")
        if len(out) >= max_docs:
            break
    return out[:max_docs]


def window_corpus(bodies, summaries=None, window_words: int = 110,
                  window_stride: int = 80, max_windows: int = 8):
    """Passage windows + parent map: (chunk_texts, row_doc, gold_rows).

    Production ingests documents through the chunker into windows sized
    to the encoder (reference pipeline.py chunk stage); quality benches
    index the same windows and evaluate at the document level.
    ``gold_rows[i]`` is doc *i*'s window sharing the most content terms
    with ``summaries[i]`` — the distant-supervision training positive —
    or the first window when ``summaries`` is None (eval-only corpora).
    """
    stop = set("the a an of to in for and or is are with on from by"
               " as at this that be it its if not".split())
    term_re = re.compile(r"[a-z0-9_]+")
    W, S = window_words, window_stride
    chunk_texts: list = []
    row_doc: list = []
    gold_rows: list = []
    for i, body in enumerate(bodies):
        words = body.split()
        starts = list(range(0, max(len(words) - W // 2, 1),
                            S))[:max_windows]
        qterms = set()
        if summaries is not None:
            qterms = {w for w in term_re.findall(summaries[i].lower())
                      if len(w) > 3 and w not in stop}
        best_row, best_ov = len(chunk_texts), -1.0
        for st in starts:
            text = " ".join(words[st:st + W])
            row = len(chunk_texts)
            chunk_texts.append(text)
            row_doc.append(i)
            if qterms:
                cterms = set(term_re.findall(text.lower()))
                ov = len(qterms & cterms) / max(len(qterms), 1)
                if ov > best_ov:
                    best_ov, best_row = ov, row
        gold_rows.append(best_row)
    return (chunk_texts, np.asarray(row_doc, np.int32),
            np.asarray(gold_rows, np.int32))


def evaluate(search_fn, queries, truth_rows, k: int = 10) -> dict:
    hits, rr = 0, 0.0
    lat = []
    for qi in range(0, len(queries), 8):
        batch = queries[qi:qi + 8]
        t0 = time.perf_counter()
        rows = search_fn(batch)                   # [B, k] row ids
        lat.append((time.perf_counter() - t0) / len(batch) * 1e3)
        for b, ranked in enumerate(rows):
            want = truth_rows[qi + b]
            ranked = [r for r in ranked if r >= 0][:k]
            if want in ranked:
                hits += 1
                rr += 1.0 / (ranked.index(want) + 1)
    n = len(queries)
    return {"recall_at_10": round(hits / n, 4),
            "mrr_at_10": round(rr / n, 4),
            "ms_per_query": round(float(np.mean(lat)), 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-docs", type=int, default=24000)
    ap.add_argument("--train-steps", type=int, default=3000)
    ap.add_argument("--hard-neg-steps", type=int, default=1200,
                    help="stage-2 contrastive steps with self-mined "
                         "hard negatives (0 disables)")
    ap.add_argument("--no-train", action="store_true")
    # bi-encoder geometry (VERDICT r3 next #3: the dense tower was
    # capacity- and truncation-limited — BM25 scores the FULL body while
    # a 128-token encoder sees its head; defaults match round 3)
    ap.add_argument("--hidden-dim", type=int, default=128)
    ap.add_argument("--num-layers", type=int, default=4)
    ap.add_argument("--num-heads", type=int, default=4)
    ap.add_argument("--mlp-dim", type=int, default=512)
    ap.add_argument("--max-len", type=int, default=128)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--out-dim", type=int, default=256)
    ap.add_argument("--hard-neg-rounds", type=int, default=1,
                    help="ANCE-style re-mine+retrain iterations")
    ap.add_argument("--batch-size", type=int, default=128,
                    help="contrastive batch (in-batch negative count)")
    ap.add_argument("--no-lexical-pool", action="store_true",
                    help="disable the bi-encoder's learned hashed-BoW "
                         "channel (models/encoder.py lexical_pool)")
    ap.add_argument("--queries", type=int, default=384)
    ap.add_argument("--rerank-steps", type=int, default=4000)
    ap.add_argument("--rerank-pairs", type=int, default=40000)
    ap.add_argument("--no-rerank", action="store_true")
    ap.add_argument("--skip-hash-tiers", action="store_true",
                    help="skip the training-free manager build (reuse "
                         "previously recorded bm25/hash_hybrid rows)")
    # production chunking protocol (VERDICT r3 next #3): index passage
    # WINDOWS sized to the encoder, evaluate at the DOCUMENT level.
    # --whole-doc restores the round-3 one-chunk-per-doc protocol.
    ap.add_argument("--whole-doc", action="store_true",
                    help="index whole bodies as single chunks "
                         "(round-3 protocol)")
    ap.add_argument("--window-words", type=int, default=110)
    ap.add_argument("--window-stride", type=int, default=80)
    ap.add_argument("--max-windows", type=int, default=8)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    print("harvesting docstrings...", flush=True)
    docs = harvest_docstrings(args.max_docs)
    rng = np.random.default_rng(0)
    order = rng.permutation(len(docs))
    n_eval = min(args.queries, len(docs) // 4)
    eval_idx = set(order[:n_eval].tolist())
    print(f"{len(docs)} passages; {n_eval} eval queries", flush=True)

    bodies = [d[2] for d in docs]
    queries = [docs[i][1] for i in sorted(eval_idx)]
    truth = list(sorted(eval_idx))

    # ---- passage windows (production chunking protocol) ---------------
    # The round-3 protocol indexed each whole body as ONE chunk: BM25
    # scored every term of a 4000-char body while the encoder read only
    # its first max_len tokens — a structural handicap no training run
    # fixes.  Production ingests documents through the chunker into
    # windows sized to the encoder (reference pipeline.py chunk stage,
    # chunking.py); this bench now does the same and evaluates at the
    # DOCUMENT level: chunk hits dedupe to their parent doc, truth stays
    # "retrieve the right document".  BM25 keeps full coverage (every
    # window is indexed); the dense tower now sees every window too.
    chunked = not args.whole_doc
    if chunked:
        # training positives (gold windows) are distant supervision;
        # used ONLY to pick training pairs/slate golds, never in eval
        chunk_texts, row_doc, doc_gold_row = window_corpus(
            bodies, summaries=[d[1] for d in docs],
            window_words=args.window_words,
            window_stride=args.window_stride,
            max_windows=args.max_windows)
        print(f"chunked protocol: {len(chunk_texts)} windows over "
              f"{len(docs)} docs ({len(chunk_texts) / len(docs):.1f}/doc)",
              flush=True)
    else:
        chunk_texts = bodies
        row_doc = np.arange(len(docs), dtype=np.int32)
        doc_gold_row = np.arange(len(docs), dtype=np.int32)
    # per-doc training/gold passage text (== body in --whole-doc mode)
    gold_texts = [chunk_texts[int(doc_gold_row[i])]
                  for i in range(len(docs))]

    results = {"corpus": "installed-package docstrings",
               "n_docs": len(docs), "n_queries": n_eval, "tiers": {},
               # protocol v1 = whole-doc chunks (rounds 1-3, retired);
               # v2 = chunked doc-level eval (round 4+).  Tables that
               # mix rows across versions are invalid (VERDICT r4 weak
               # #6); gen_perf_tables.py stamps this into captions.
               "protocol_version": 2 if chunked else 1,
               "protocol": {"chunked": chunked,
                            "n_chunks": len(chunk_texts),
                            "window_words": args.window_words,
                            "window_stride": args.window_stride,
                            "doc_level_eval": chunked},
               # VERDICT r3 weak #8: attribution belongs in the artifact
               "latency_note": (
                   "ms_per_query columns amortize first-call XLA compiles"
                   " across each tier's 8-query batches and include the"
                   " dev tunnel's ~25 ms/dispatch RTT (multiple"
                   " dispatches per batch on the unfused paths); serving"
                   " latency is what bench.py measures on staged corpora"
                   " with warmed programs, not these columns")}

    # ---- shared sparse structures (index layer) -----------------------
    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.index.corpus import ChunkRecord
    from advanced_rag_tpu.index.manager import MultiIndexManager

    def build_manager(embedder=None, **cfg_kw):
        cfg = PipelineConfig(**cfg_kw)
        mgr = MultiIndexManager(cfg, embedder=embedder)
        recs = [ChunkRecord(chunk_id=str(r),
                            doc_id=docs[int(row_doc[r])][0],
                            content=chunk_texts[r])
                for r in range(len(chunk_texts))]
        for i in range(0, len(recs), 512):
            mgr.index_chunks(recs[i:i + 512])
        return mgr

    def dedupe_docs(hits, limit):
        """Chunk hits -> ranked distinct parent-doc indices."""
        seen, out = set(), []
        for h in hits:
            d_ = int(row_doc[int(h["row"])])
            if d_ not in seen:
                seen.add(d_)
                out.append(d_)
                if len(out) >= limit:
                    break
        return out

    def searcher(mgr, weights=None):
        kw = {}
        if weights is not None:
            kw = {"dense_weight": weights[0], "sparse_weight": weights[1]}
        k_chunks = 48 if chunked else 10

        def run(batch):
            out = mgr.hybrid_search_batch_sync(list(batch), k_chunks,
                                               use_mmr=False, **kw)
            return [dedupe_docs(hits, 10) for hits in out]
        return run

    if args.skip_hash_tiers:
        prev = Path("QUALITY_REAL.json")
        if prev.exists():
            old = json.loads(prev.read_text())
            # only reuse rows measured under the SAME protocol — a rerun
            # with different --max-docs/--queries must not silently mix
            # incomparable tiers in one artifact
            if (old.get("n_docs") == len(docs)
                    and old.get("n_queries") == n_eval
                    and old.get("protocol", {}).get("chunked")
                    == chunked):
                for tier in ("bm25", "hash_hybrid"):
                    if tier in old.get("tiers", {}):
                        row = dict(old["tiers"][tier])
                        row["reused_from_previous_run"] = True
                        results["tiers"][tier] = row
            else:
                print("previous QUALITY_REAL.json used a different "
                      "corpus/query count; not reusing its rows",
                      flush=True)
        print("skipping hash-tier manager build", flush=True)
    else:
        print("building hash-hybrid manager...", flush=True)
        t0 = time.perf_counter()
        mgr = build_manager()
        print(f"  ingest {time.perf_counter()-t0:.0f}s", flush=True)

        results["tiers"]["bm25"] = evaluate(
            searcher(mgr, weights=(0.0, 1.0)), queries, truth)
        print("bm25:", results["tiers"]["bm25"], flush=True)
        results["tiers"]["hash_hybrid"] = evaluate(
            searcher(mgr), queries, truth)
        print("hash_hybrid:", results["tiers"]["hash_hybrid"], flush=True)

    # ---- trained bi-encoder tier --------------------------------------
    if not args.no_train:
        from advanced_rag_tpu.models.embedder import NeuralEmbedder
        from advanced_rag_tpu.models.encoder import (
            EncoderConfig, init_bi_encoder)
        from advanced_rag_tpu.models.tokenizer import (
            HashingTokenizer, TokenizerConfig)
        from advanced_rag_tpu.train import (
            TrainConfig, build_train_mesh, make_optimizer, make_train_step)

        # 64-token doc truncation starved the encoder of the body text
        # (queries are the bodies' SUMMARY lines — the distinguishing
        # content sits deep in the body); 128 tokens + a 32k hash vocab
        # (fewer collisions) measurably lift dense recall
        L = args.max_len
        enc_cfg = EncoderConfig(vocab_size=args.vocab,
                                hidden_dim=args.hidden_dim,
                                num_layers=args.num_layers,
                                num_heads=args.num_heads,
                                mlp_dim=args.mlp_dim,
                                max_len=L,
                                lexical_pool=not args.no_lexical_pool)
        tok = HashingTokenizer(TokenizerConfig(vocab_size=args.vocab,
                                               max_len=L))
        tcfg = TrainConfig(learning_rate=5e-4, warmup_steps=50,
                           total_steps=args.train_steps)
        mesh = build_train_mesh(1, tcfg)
        model, params = init_bi_encoder(enc_cfg, out_dim=args.out_dim, seed=0)
        step, params, opt_state = make_train_step(
            model, make_optimizer(tcfg), tcfg, mesh, params)
        # train pairs: (summary -> gold passage) from NON-eval docs only
        # (gold passage == whole body in --whole-doc mode, else the
        # window sharing the most content terms with the summary)
        train_pool = [(docs[i][1], gold_texts[i]) for i in range(len(docs))
                      if i not in eval_idx]
        print(f"training bi-encoder: {args.train_steps} steps over "
              f"{len(train_pool)} pairs", flush=True)

        # pre-tokenize the whole pool ONCE (the per-step Python tokenize
        # loop was the wall-clock bottleneck, not the TPU)
        pq_ids, pq_mask = tok.encode_batch([p[0] for p in train_pool], L)
        pd_ids, pd_mask = tok.encode_batch([p[1] for p in train_pool], L)

        def pair_batch(sel):
            return {"q_ids": jnp.asarray(pq_ids[sel]),
                    "q_mask": jnp.asarray(pq_mask[sel]),
                    "d_ids": jnp.asarray(pd_ids[sel]),
                    "d_mask": jnp.asarray(pd_mask[sel])}

        t0 = time.perf_counter()
        bsz = min(args.batch_size, len(train_pool))
        for s in range(args.train_steps):
            sel = rng.integers(0, len(train_pool), bsz)
            params, opt_state, metrics = step(params, opt_state,
                                              pair_batch(sel))
            if s % 100 == 0:
                print(f"  step {s}: loss {float(metrics['loss']):.3f} "
                      f"acc {float(metrics.get('accuracy', 0.0)):.2f}",
                      flush=True)
        results["train_s"] = round(time.perf_counter() - t0, 1)
        results["final_loss"] = round(float(metrics["loss"]), 4)

        emb = NeuralEmbedder(dim=args.out_dim, config=enc_cfg, params=params,
                             tokenizer=tok)
        print("building trained-hybrid manager...", flush=True)
        mgr2 = build_manager(embedder=emb)

        # ---- stage 2: hard-negative curriculum (VERDICT r3 next #3) --
        # In-batch negatives teach topic separation; the dense tower's
        # remaining gap to BM25 is NEAR-MISS ranking, so stage 2 mines
        # each train query's top-k from the stage-1 retriever itself
        # (ANCE-style self-negatives; BM25 in the hybrid mix supplies
        # the lexical distractors dense keeps losing to), filters
        # false negatives, and continues training with the mined docs
        # as extra InfoNCE columns (train/contrastive.py _info_nce).
        if args.hard_neg_steps > 0:
            from advanced_rag_tpu.train import filter_false_negatives

            H = 3                      # mined negatives per query
            pool_rows = [i for i in range(len(docs)) if i not in eval_idx]
            qtexts = [docs[i][1] for i in pool_rows]
            # all-corpus chunk tokens once (negatives may be any chunk
            # row); pq/pd tokenizations share pool_rows' order, so `sel`
            # indexes pairs and mined slates alike
            pb_ids, pb_mask = tok.encode_batch(chunk_texts, L)
            hn_t0 = time.perf_counter()
            for rnd in range(max(args.hard_neg_rounds, 1)):
                # each round re-mines from the CURRENT model (the ANCE
                # loop: negatives track the decision boundary as it
                # moves; one-shot mining goes stale after ~1k steps)
                print(f"mining hard negatives round {rnd} for "
                      f"{len(pool_rows)} queries", flush=True)
                t0 = time.perf_counter()
                neg_rows = np.zeros((len(pool_rows), H), np.int64)
                k_mine = (H + 5) * (3 if chunked else 1)
                for qi in range(0, len(qtexts), 64):
                    out = mgr2.hybrid_search_batch_sync(
                        qtexts[qi:qi + 64], k_mine, use_mmr=False,
                        dense_weight=0.5, sparse_weight=0.5)
                    for b_, hits in enumerate(out):
                        gold = pool_rows[qi + b_]
                        cands, cdocs = [], set()
                        for h in hits:
                            r_ = int(h["row"])
                            d_ = int(row_doc[r_])
                            if (d_ != gold and d_ not in cdocs
                                    and filter_false_negatives(
                                        gold_texts[gold],
                                        [chunk_texts[r_]], 0.8)):
                                cands.append(r_)   # chunk row
                                cdocs.add(d_)
                        while len(cands) < H:    # degenerate slate top-up
                            j = int(rng.integers(0, len(chunk_texts)))
                            if int(row_doc[j]) != gold:
                                cands.append(j)
                        neg_rows[qi + b_] = cands[:H]
                print(f"  mined in {time.perf_counter()-t0:.0f}s",
                      flush=True)

                for s in range(args.hard_neg_steps):
                    sel = rng.integers(0, len(pool_rows), bsz)
                    nsel = neg_rows[sel].reshape(-1)
                    batch = {"q_ids": jnp.asarray(pq_ids[sel]),
                             "q_mask": jnp.asarray(pq_mask[sel]),
                             "d_ids": jnp.asarray(pd_ids[sel]),
                             "d_mask": jnp.asarray(pd_mask[sel]),
                             "n_ids": jnp.asarray(pb_ids[nsel]),
                             "n_mask": jnp.asarray(pb_mask[nsel])}
                    params, opt_state, metrics = step(params, opt_state,
                                                      batch)
                    if s % 200 == 0:
                        print(f"  hard-neg r{rnd} step {s}: loss "
                              f"{float(metrics['loss']):.3f} acc "
                              f"{float(metrics.get('accuracy', 0.0)):.2f}",
                              flush=True)
                emb = NeuralEmbedder(dim=args.out_dim, config=enc_cfg,
                                     params=params, tokenizer=tok)
                print(f"rebuilding trained-hybrid manager (round {rnd} "
                      "params)...", flush=True)
                mgr2.close()
                mgr2 = build_manager(embedder=emb)
            results["hard_neg_train_s"] = round(
                time.perf_counter() - hn_t0, 1)
            results["hard_neg_rounds"] = max(args.hard_neg_rounds, 1)
            results["hard_neg_final_loss"] = round(float(metrics["loss"]), 4)

        # persist the serving bi-encoder (consumed by RAG_EMBEDDER=ckpt:
        # and scripts/bench_quality_100k.py — the 100k-tier bench must
        # evaluate the SAME model production serves)
        from advanced_rag_tpu.train import save_biencoder
        Path("artifacts").mkdir(exist_ok=True)
        save_biencoder(params, enc_cfg, args.out_dim,
                       Path("artifacts/biencoder_ckpt").resolve())
        results["biencoder_ckpt"] = "artifacts/biencoder_ckpt"
        results["tiers"]["trained_hybrid"] = evaluate(
            searcher(mgr2), queries, truth)
        print("trained_hybrid:", results["tiers"]["trained_hybrid"],
              flush=True)
        results["tiers"]["trained_dense_only"] = evaluate(
            searcher(mgr2, weights=(1.0, 0.0)), queries, truth)
        print("trained_dense_only:",
              results["tiers"]["trained_dense_only"], flush=True)

        # ---- adaptive fusion weights (dev/test split) ----------------
        # The fixed dense-heavy default (0.7/0.3) under-weights BM25 on
        # this lexical-leaning corpus; the framework's adaptive-weights
        # hook (reference retrieval.py:308-320) exists exactly for this.
        # Honest protocol: pick weights on a dev half, report the test
        # half — weights are never tuned on the reported queries.
        dev_q, dev_t = queries[0::2], truth[0::2]
        test_q, test_t = queries[1::2], truth[1::2]
        sweep = [(0.7, 0.3), (0.5, 0.5), (0.3, 0.7), (0.2, 0.8),
                 (0.1, 0.9), (0.0, 1.0)]
        dev_scores = {}
        for w in sweep:
            dev_scores[w] = evaluate(searcher(mgr2, weights=w),
                                     dev_q, dev_t)["recall_at_10"]
            print(f"  dev sweep {w}: R@10 {dev_scores[w]}", flush=True)
        best = max(dev_scores, key=dev_scores.get)
        adapted = evaluate(searcher(mgr2, weights=best), test_q, test_t)
        adapted["weights"] = list(best)
        results["tiers"]["trained_hybrid_adapted"] = adapted
        # head-to-head on the SAME test half
        results["tiers"]["bm25_test_half"] = evaluate(
            searcher(mgr2, weights=(0.0, 1.0)), test_q, test_t)
        print("trained_hybrid_adapted:", adapted, flush=True)
        print("bm25_test_half:", results["tiers"]["bm25_test_half"],
              flush=True)

        # ---- supervised cross-encoder rerank (pipeline stage 5) ------
        # The tiers above never exercise the rerank stage.  Train the
        # cross-encoder DIRECTLY on (summary -> body) supervision with
        # hard negatives mined from the trained retriever's own top-k
        # (train/rerank.py — the standard ms-marco recipe the
        # reference's placeholder reranker stands in for,
        # retrieval.py:651-681), then rerank the adapted hybrid's
        # top-20 on the test half.
        if not args.no_rerank:
            from advanced_rag_tpu.models.cross_encoder import (
                CrossEncoderReranker)
            from advanced_rag_tpu.train import (
                RerankTrainConfig, filter_false_negatives, train_reranker)

            # Static-slot pair layout shared by training, the host
            # reranker, and the fused on-device program: 32 query slots
            # + 88 doc slots + [SEP] = 121 <= max_len 128.
            # static-slot pair layout scales with the encoder window:
            # 32 query slots + doc slots + [SEP] <= max_len (88 doc
            # tokens at the round-3 default 128; 216 at 256 — the CE
            # then reads 2.5x more of the body it is ranking)
            Q_LEN = 32
            D_LEN = L - Q_LEN - 8
            DEPTH = 20   # mining depth == serve-time rerank depth

            train_rows = [i for i in range(len(docs)) if i not in eval_idx]
            train_rows = train_rows[:args.rerank_pairs]

            # ---- K=2 CROSS-FIT mining (distribution-matched slates) --
            # Mining with the serving retriever hands the CE slates the
            # (overfit) retriever already solves — base top-1 0.71 on
            # its own training queries vs ~0.4 on unseen ones — so the
            # CE learns nothing transferable.  Each half's negatives
            # are mined by a bi-encoder trained on the OTHER half: the
            # base-score distribution at training matches serving.
            # Serving base key: the candidates EXACTLY re-scored per
            # tier (ops/rescore.py) and z-blended — measured +0.11
            # MRR@10 over the fused RRF order on this corpus.  The CE
            # trains as a residual on the SAME key, so training and
            # serving optimize one function.  MIX is fixed for training
            # (the dev sweep later picks the serve-time mix around it).
            MIX = 0.5

            def _zv(v):
                v = np.asarray(v, np.float64)
                s = v.std()
                return (v - v.mean()) / (s if s > 1e-9 else 1.0)

            def mine_with(mgr_, rows, bs=64):
                """Mined slates + their exact-rescore base scores, fully
                BATCHED: one search dispatch + one rescore dispatch per
                ``bs`` queries.  (Round 3 rescored one query per
                dispatch — at this round's 5x slate count that would be
                tens of thousands of tunnel round-trips.)"""
                mined_, based_ = [], []
                qtexts = [docs[i][1] for i in rows]
                k_mine = DEPTH * (3 if chunked else 1)
                for qi in range(0, len(qtexts), bs):
                    batch_q = qtexts[qi:qi + bs]
                    out = mgr_.hybrid_search_batch_sync(
                        batch_q, k_mine, use_mmr=False,
                        dense_weight=best[0], sparse_weight=best[1])
                    slates = []
                    rows_mat = np.full((len(out), DEPTH + 1), -1, np.int32)
                    for b, hits in enumerate(out):
                        gold = rows[qi + b]          # doc index
                        gold_row = int(doc_gold_row[gold])
                        # near-duplicates of the gold body (28% of this
                        # corpus has a Jaccard>0.8 twin) are FALSE
                        # negatives — the round-2 coin-flip accuracy.
                        # Chunked: one representative (best-ranked)
                        # chunk row per distinct non-gold doc.
                        neg_rows, nd_ = [], set()
                        for h in hits:
                            r_ = int(h["row"])
                            d_ = int(row_doc[r_])
                            if (d_ != gold and d_ not in nd_
                                    and filter_false_negatives(
                                        gold_texts[gold],
                                        [chunk_texts[r_]], 0.8)):
                                neg_rows.append(r_)
                                nd_.add(d_)
                                if len(neg_rows) >= DEPTH - 1:
                                    break
                        slate = [gold_row] + neg_rows
                        rows_mat[b, :len(slate)] = slate
                        slates.append((gold, neg_rows))
                    d_, s_ = mgr_.rescore_candidates_sync(batch_q, rows_mat)
                    for b, (gold, neg_rows) in enumerate(slates):
                        n_ = 1 + len(neg_rows)
                        base = _zv(MIX * _zv(d_[b, :n_])
                                   + (1.0 - MIX) * _zv(s_[b, :n_]))
                        mined_.append([chunk_texts[r_] for r_ in neg_rows])
                        based_.append((float(base[0]),
                                       [float(x) for x in base[1:]]))
                return mined_, based_

            def train_fold_bi(rows, seed):
                m_, p_ = init_bi_encoder(enc_cfg, out_dim=args.out_dim, seed=seed)
                st_, p_, os_ = make_train_step(
                    m_, make_optimizer(tcfg), tcfg, mesh, p_)
                pool_rows = list(rows)
                fq_ids, fq_mask = tok.encode_batch(
                    [docs[i][1] for i in pool_rows], L)
                fd_ids, fd_mask = tok.encode_batch(
                    [gold_texts[i] for i in pool_rows], L)
                r_ = np.random.default_rng(seed)
                for _s in range(args.train_steps):
                    sel_ = r_.integers(0, len(pool_rows), 128)
                    p_, os_, _m = st_(p_, os_, {
                        "q_ids": jnp.asarray(fq_ids[sel_]),
                        "q_mask": jnp.asarray(fq_mask[sel_]),
                        "d_ids": jnp.asarray(fd_ids[sel_]),
                        "d_mask": jnp.asarray(fd_mask[sel_])})
                return p_

            half = len(train_rows) // 2
            foldA, foldB = train_rows[:half], train_rows[half:]
            negs_by_row, base_by_row = {}, {}
            t0 = time.perf_counter()
            for k_, (tr_f, mine_f) in enumerate(
                    [(foldA, foldB), (foldB, foldA)]):
                print(f"cross-fit fold {k_}: train {len(tr_f)}, "
                      f"mine {len(mine_f)}", flush=True)
                pk = train_fold_bi(tr_f, seed=30 + k_)
                mgrk = build_manager(embedder=NeuralEmbedder(
                    dim=args.out_dim, config=enc_cfg, params=pk, tokenizer=tok))
                negk, basek = mine_with(mgrk, mine_f)
                for i_, r_ in enumerate(mine_f):
                    negs_by_row[r_] = negk[i_]
                    base_by_row[r_] = basek[i_]
                del mgrk, pk
            print(f"  cross-fit mining {time.perf_counter()-t0:.0f}s",
                  flush=True)

            pairs = [(docs[i][1], gold_texts[i]) for i in train_rows]
            mined = [negs_by_row[i] for i in train_rows]
            based = [base_by_row[i] for i in train_rows]
            # lexical_match: DrQA-style exact-match channel — the
            # learnable lexical prior a from-scratch CE on a hashed
            # vocab cannot recover from listwise supervision alone
            # (models/encoder.py cross_segment_match)
            from dataclasses import replace as _dc_replace
            # dropout + early stop on the held-out half: the round-3
            # checkpoint overfit (train 0.875 / held-out 0.3125,
            # VERDICT r3 weak #5); this round also feeds ~5x the slates
            ce_cfg = _dc_replace(enc_cfg, lexical_match=True, dropout=0.1)
            print(f"training reranker: {args.rerank_steps} steps "
                  f"(warm-started bi-encoder trunk, residual objective, "
                  f"lexical-match channel, dropout 0.1, early stop)",
                  flush=True)
            t0 = time.perf_counter()
            _, ce_params, hist = train_reranker(
                pairs, mined,
                encoder_config=ce_cfg,
                train_config=TrainConfig(learning_rate=3e-4,
                                         warmup_steps=100,
                                         total_steps=args.rerank_steps),
                rerank_config=RerankTrainConfig(
                    steps=args.rerank_steps, queries_per_batch=8,
                    candidates_per_query=DEPTH, log_every=200,
                    q_len=Q_LEN, d_len=D_LEN, residual=True,
                    label_smoothing=0.05, early_stop_patience=4),
                mesh=mesh, tokenizer=tok,
                warm_start_params=params,
                base_scores=based,
            )
            results["rerank_train_s"] = round(time.perf_counter() - t0, 1)
            results["rerank_history"] = hist[-1]
            print(f"  trained in {results['rerank_train_s']}s, "
                  f"train acc {hist[-1]['accuracy']:.2f}, held-out "
                  f"slate acc {hist[-1]['eval_accuracy']:.2f} vs "
                  f"base-only floor "
                  f"{hist[-1].get('eval_base_accuracy', float('nan')):.2f}",
                  flush=True)

            from advanced_rag_tpu.train import save_reranker
            ckpt_dir = Path("artifacts")
            ckpt_dir.mkdir(exist_ok=True)
            save_reranker(ce_params, ce_cfg,
                          (ckpt_dir / "reranker_ckpt").resolve(),
                          q_len=Q_LEN, d_len=D_LEN)
            results["reranker_ckpt"] = "artifacts/reranker_ckpt"

            rr = CrossEncoderReranker(config=ce_cfg, params=ce_params,
                                      tokenizer=tok, q_len=Q_LEN,
                                      d_len=D_LEN)

            _z = _zv

            def collect(queries_, truth_, depth=20):
                """Per query: (rows, z(fused), z(dense), z(bm25),
                z(CE), raw CE, gold) over the hybrid top-``depth``."""
                rows_out, lat = [], []
                k_coll = depth * (3 if chunked else 1)
                for qi in range(0, len(queries_), 8):
                    batch = queries_[qi:qi + 8]
                    t0 = time.perf_counter()
                    out = mgr2.hybrid_search_batch_sync(
                        list(batch), k_coll, use_mmr=False,
                        dense_weight=best[0], sparse_weight=best[1])
                    # chunked: slate = best-ranked chunk row per
                    # distinct doc (the app-layer dedupe production
                    # applies above the chunk index)
                    cand = []
                    for hitrow in out:
                        c_, cd_ = [], set()
                        for h in hitrow:
                            r_ = int(h["row"])
                            d_ = int(row_doc[r_])
                            if d_ not in cd_:
                                cd_.add(d_)
                                c_.append((r_, float(h["score"])))
                                if len(c_) >= depth:
                                    break
                        cand.append(c_)
                    flat_q = [batch[b] for b, c in enumerate(cand)
                              for _ in c]
                    flat_d = [chunk_texts[r] for c in cand for r, _ in c]
                    ce = rr.score_pairs(flat_q, flat_d)
                    # exact per-tier rescore of every slate (the serve
                    # base key, ops/rescore.py)
                    rows_mat = np.full((len(cand), depth), -1, np.int32)
                    for b, c in enumerate(cand):
                        rows_mat[b, :len(c)] = [r for r, _ in c]
                    d_ex, s_ex = mgr2.rescore_candidates_sync(
                        list(batch), rows_mat)
                    lat.append((time.perf_counter() - t0)
                               / len(batch) * 1e3)
                    pos = 0
                    for b, c in enumerate(cand):
                        n_c = len(c)
                        rows_out.append((
                            [r for r, _ in c],
                            _z([s for _, s in c]),
                            _z(d_ex[b, :n_c]),
                            _z(s_ex[b, :n_c]),
                            _z(ce[pos:pos + n_c]),
                            np.asarray(ce[pos:pos + n_c], np.float64),
                            truth_[qi + b]))
                        pos += n_c
                return rows_out, round(float(np.mean(lat)), 2)

            def metrics_for(key, collected, k=10):
                """key = (base, mix, mode, alpha); base 'fused'|'exact'."""
                base_kind, mix, mode, alpha = key
                hits, rrsum = 0, 0.0
                for rows_, zf, zd, zs, zc, ce_raw, want in collected:
                    if base_kind == "exact":
                        zr = _z(mix * zd + (1.0 - mix) * zs)
                    else:
                        zr = zf
                    if mode == "residual":
                        s = zr + alpha * ce_raw
                    elif mode == "ce_only":
                        s = ce_raw
                    else:
                        s = alpha * zc + (1.0 - alpha) * zr
                    ranked = [int(row_doc[rows_[j]])
                              for j in np.argsort(-s)[:k]]
                    if want in ranked:
                        hits += 1
                        rrsum += 1.0 / (ranked.index(want) + 1)
                n = len(collected)
                return {"recall_at_10": round(hits / n, 4),
                        "mrr_at_10": round(rrsum / n, 4)}

            # serving key picked on the dev half (never on the reported
            # queries) over base (fused RRF order vs exact rescore at
            # several mixes) x mode (zblend vs the residual key the CE
            # was trained for) x alpha — with alpha=0 rows (no CE) in
            # the sweep, so the rerank stage can only help on dev
            print("collecting CE scores (dev half)...", flush=True)
            dev_coll, _ = collect(dev_q, dev_t)
            sweep2 = [("fused", 0.0, "zblend", a)
                      for a in (0.0, 0.2, 0.4, 0.6)]
            for mix in (0.35, 0.5, 0.65):
                sweep2 += [("exact", mix, "residual", g)
                           for g in (0.0, 0.25, 0.5, 1.0, 2.0)]
                sweep2 += [("exact", mix, "zblend", a)
                           for a in (0.2, 0.4)]
            dev_by_key = {}
            for key in sweep2:
                m = metrics_for(key, dev_coll)
                dev_by_key[key] = (m["mrr_at_10"], m["recall_at_10"])
                print(f"  dev {key}: {m}", flush=True)
            best_key = max(dev_by_key, key=dev_by_key.get)
            base_kind, best_mix, best_mode, best_alpha = best_key
            test_coll, ms_q = collect(test_q, test_t)
            reranked = metrics_for(best_key, test_coll)
            reranked.update({"ms_per_query": ms_q, "weights": list(best),
                             "base": base_kind, "mix": best_mix,
                             "mode": best_mode, "alpha": best_alpha,
                             "ce_only_test": metrics_for(
                                 ("exact", 0.5, "ce_only", 1.0),
                                 test_coll)})
            results["tiers"]["trained_reranked"] = reranked
            print("trained_reranked:", reranked, flush=True)

            # the exact-rescore base ALONE (no CE): isolates how much
            # of the rerank lift is tier rescoring vs the model — the
            # mix is picked on dev among alpha=0 rows
            base_only = max(
                (k_ for k_ in dev_by_key
                 if k_[0] == "exact" and k_[3] == 0.0),
                key=dev_by_key.get)
            rescored = metrics_for(base_only, test_coll)
            rescored.update({"mix": base_only[1], "weights": list(best)})
            results["tiers"]["trained_rescored"] = rescored
            print("trained_rescored:", rescored, flush=True)

            # ---- fused one-dispatch path with the trained CE ----------
            # The flagship RAG_FUSED_E2E program (ops/e2e.py) embeds,
            # hybrid-searches, gathers candidate token rows in HBM and
            # reranks in ONE dispatch; quality must match the unfused
            # protocol above (same depth-20 slate, same dev-picked
            # blend, served via the in-program rerank_alpha).
            print("building fused-rerank manager...", flush=True)
            mgr3 = build_manager(embedder=emb, fused_rerank=True,
                                 fused_token_len=D_LEN)

            def fused_search(k_rerank, doc_dedupe):
                def run(batch):
                    # chunked: the device program ranks chunk rows; doc
                    # dedupe is the app layer's job (or in-program with
                    # doc_dedupe=True), so ask for the full reranked
                    # slate and dedupe host-side
                    out = mgr3.fused_retrieve_batch_sync(
                        list(batch), k_final=(k_rerank if chunked else 10),
                        k_rerank=k_rerank, reranker=rr,
                        dense_weight=best[0], sparse_weight=best[1],
                        use_mmr=False, rerank_alpha=best_alpha,
                        rerank_mode=("residual"
                                     if best_mode == "residual"
                                     else "zblend"),
                        rerank_base=base_kind, rescore_mix=best_mix,
                        doc_dedupe=doc_dedupe)
                    return [dedupe_docs(hits, 10) for hits in out]
                return run

            fused_row = evaluate(fused_search(DEPTH, False), test_q, test_t)
            fused_row.update({"weights": list(best), "base": base_kind,
                              "mix": best_mix,
                              "mode": best_mode, "alpha": best_alpha})
            results["tiers"]["fused_reranked"] = fused_row
            print("fused_reranked:", fused_row, flush=True)

            if chunked:
                # fused parity with the unfused protocol (VERDICT r4
                # #3): doc_dedupe=True makes the in-program slate
                # doc-distinct — the same slate semantics collect()
                # builds host-side — so this tier should match
                # trained_reranked within noise
                dd_row = evaluate(fused_search(DEPTH, True),
                                  test_q, test_t)
                dd_row.update({"weights": list(best), "base": base_kind,
                               "mix": best_mix, "mode": best_mode,
                               "alpha": best_alpha, "doc_dedupe": True})
                results["tiers"]["fused_reranked_dd"] = dd_row
                print("fused_reranked_dd:", dd_row, flush=True)

                # ---- dev-picked fused SERVING shape ------------------
                # The service retrieves a deeper slate (top_k=48) than
                # the depth-20 protocol; pick (k_rerank, doc_dedupe) on
                # the DEV half and record it for the serving bench
                # (scripts/bench_quality_service.py reads it) — the
                # service then runs the shape this corpus actually
                # prefers instead of an arbitrary static.
                shape_dev = {}
                for kk in (DEPTH, 48):
                    for dd in (False, True):
                        m = evaluate(fused_search(kk, dd), dev_q, dev_t)
                        shape_dev[(kk, dd)] = (m["mrr_at_10"],
                                               m["recall_at_10"])
                        print(f"  dev fused shape k={kk} dd={dd}: {m}",
                              flush=True)
                best_shape = max(shape_dev, key=shape_dev.get)
                serve_row = evaluate(fused_search(*best_shape),
                                     test_q, test_t)
                serve_row.update({
                    "weights": list(best), "base": base_kind,
                    "mix": best_mix, "mode": best_mode,
                    "alpha": best_alpha, "k_rerank": best_shape[0],
                    "doc_dedupe": best_shape[1]})
                results["tiers"]["fused_serving"] = serve_row
                print("fused_serving:", serve_row, flush=True)

    Path("QUALITY_REAL.json").write_text(json.dumps(results, indent=1))
    print("-> QUALITY_REAL.json")


if __name__ == "__main__":
    main()
