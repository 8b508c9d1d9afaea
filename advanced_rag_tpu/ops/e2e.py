"""Fully device-resident retrieve: embed -> hybrid -> rerank, ONE dispatch.

The reference's end-to-end retrieve path hops process boundaries at
every stage — embedding API call, Milvus gRPC search, host RRF, GPU
reranker (SURVEY.md §3.2; stage budgets ARCHITECTURE.md:323-328 total
~80 ms).  The TPU-native inversion keeps the entire hot path on one
chip: the corpus token table lives in HBM next to the index, so the
cross-encoder rerank can GATHER its candidate documents on device from
the hybrid search output — no host round trip between search and
rerank.  The program below is a single jitted computation:

    query tokens ──BiEncoder──> q_dense ──hybrid_retrieve──> cand ids
        │                                        │ (device gather)
        └──────────[CLS] q [SEP] doc [SEP] pair build [Q*K, L]
                                  │
                          CrossEncoder ──> top-k_final re-ranked rows

Latency therefore pays exactly one dispatch + one device->host copy of
the final (ids, scores) — on a tunneled chip that is one RTT instead
of three (measured ~25 ms each, BACKLOG #3).

Pair layout note: slots are static — [CLS] q-tokens[Lq] [SEP]
doc-tokens[Ld] [SEP] — so a short query leaves masked PAD holes before
the first [SEP] instead of shifting the doc tokens left.  Attention
masks make the holes invisible; position embeddings differ from the
host tokenizer's packed layout, which matters only for checkpoint
import (models trained in-framework — train/distill.py — see the same
layout at train and serve time).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .hybrid import hybrid_retrieve
from .rescore import exact_tier_scores, exact_tier_scores_postings


class E2EResult(NamedTuple):
    ids: jnp.ndarray            # [Q, k_final] i32 reranked rows (-1 pad)
    ce_scores: jnp.ndarray      # [Q, k_final] f32 cross-encoder scores
    fused_scores: jnp.ndarray   # [Q, k_final] f32 hybrid RRF scores
    cand_ids: jnp.ndarray       # [Q, k_rerank] pre-rerank candidates
    cand_scores: jnp.ndarray    # [Q, k_rerank]
    q_dense: jnp.ndarray        # [Q, D] query embedding (drift/eval reuse)


def make_retrieve_rerank(
    bi_model: Any,
    ce_model: Any,
    *,
    k_cand: int = 40,
    k_out: int = 24,
    k_rerank: int = 16,
    k_final: int = 8,
    pad_id: int = 0,
    sep_id: int = 2,
    metric: str = "ip",
    dense_impl: str = "scan",
    sparse_impl: str = "xla",
    use_mmr: bool = True,
    rrf_k: int = 60,
    rerank_mode: str = "zblend",
    rerank_base: str = "fused",
    doc_dedupe: bool = False,
    **hybrid_static: Any,
):
    """Build the jitted one-dispatch program.

    ``bi_model``/``ce_model`` are the Flax modules (encoder.py); their
    params are runtime arguments so re-jitting is per-shape only.
    ``doc_tokens`` is the [N, Ld] device token table (uint16/int32,
    pad_id-padded) — the text column of the corpus, resident in HBM.
    Returns ``program(params_bi, params_ce, q_ids, q_mask, q_sp_idx,
    q_sp_tf, doc_tokens, index_arrays...) -> E2EResult``.

    ``doc_dedupe=True`` makes the rerank slate DOC-DISTINCT: the hybrid
    search over-retrieves a k_out-deep chunk pool and the slate keeps
    the best-ranked chunk per distinct parent document (matched via the
    corpus ``doc_hash_lo/hi`` device columns, passed as runtime args).
    Production answers are document-level (the app layer dedupes chunk
    hits by doc_id), so a chunk-row slate of K spends CE capacity on
    duplicate docs and caps doc recall at however many distinct docs
    the top-K chunks happen to span (~0.65*K measured on the real-text
    corpus) — the unfused host protocol never had this cap because it
    built per-doc slates before the CE (scripts/bench_quality_real.py
    collect()).  Reference behavior being matched: retrieval returns
    top_k chunks of distinct relevance, reference retrieval.py:421-491.
    """
    if k_rerank > k_out:
        raise ValueError(f"k_rerank ({k_rerank}) must be <= k_out ({k_out})")
    if k_final > k_rerank:
        raise ValueError(f"k_final ({k_final}) must be <= k_rerank ({k_rerank})")

    def program(
        params_bi: Any,
        params_ce: Any,
        q_ids: jnp.ndarray,        # [Q, Lq] i32  ([CLS] q [SEP] framed)
        q_mask: jnp.ndarray,       # [Q, Lq] f32
        q_sp_idx: jnp.ndarray,     # [Q, T] i32   sparse query terms
        q_sp_tf: jnp.ndarray,      # [Q, T] f32
        doc_tokens: jnp.ndarray,   # [N, Ld] token table in HBM
        emb: jnp.ndarray,
        doc_idx: jnp.ndarray,
        doc_tf: jnp.ndarray,
        doc_len: jnp.ndarray,
        df: jnp.ndarray,
        n_docs: jnp.ndarray,
        valid: Optional[jnp.ndarray],
        weights: jnp.ndarray,
        mmr_lambda: jnp.ndarray,
        post_rows: Optional[jnp.ndarray] = None,
        post_tf: Optional[jnp.ndarray] = None,
        post_tfw: Optional[jnp.ndarray] = None,
        emb_scale: Optional[jnp.ndarray] = None,
        rerank_alpha: Optional[jnp.ndarray] = None,
        rescore_mix: Optional[jnp.ndarray] = None,
        doc_lo: Optional[jnp.ndarray] = None,   # [N] i32 doc-hash cols
        doc_hi: Optional[jnp.ndarray] = None,   # (required w/ doc_dedupe)
    ) -> E2EResult:
        # 1. query embedding on the MXU (replaces indexing.py:553-599)
        q_dense = bi_model.apply(params_bi, q_ids, q_mask)     # [Q, D] f32

        # 2. fused hybrid search (replaces indexing.py:445-551 + RRF/MMR)
        res = hybrid_retrieve(
            emb, doc_idx, doc_tf, doc_len, df, n_docs,
            q_dense, q_sp_idx, q_sp_tf, valid, weights, mmr_lambda,
            post_rows=post_rows, post_tf=post_tf, post_tfw=post_tfw,
            emb_scale=emb_scale,
            k_cand=k_cand, k_out=k_out, metric=metric,
            dense_impl=dense_impl, sparse_impl=sparse_impl,
            use_mmr=use_mmr, rrf_k=rrf_k, **hybrid_static,
        )
        if doc_dedupe:
            if doc_lo is None or doc_hi is None:
                raise ValueError(
                    "doc_dedupe=True requires the doc_lo/doc_hi corpus "
                    "hash columns")
            # best-ranked chunk per distinct doc, in rank order, over
            # the full k_out pool.  K0^2 compare is trivial (K0 <= a few
            # hundred) and stays on device — no host round trip.
            pool = res.ids                                     # [Q, K0]
            K0 = pool.shape[1]
            pvalid = pool >= 0
            psafe = jnp.clip(pool, 0, None)
            plo = doc_lo[psafe]
            phi = doc_hi[psafe]                                # [Q, K0]
            same = ((plo[:, :, None] == plo[:, None, :])
                    & (phi[:, :, None] == phi[:, None, :])
                    & pvalid[:, None, :])                      # [Q, K0, K0]
            earlier = jnp.tril(
                jnp.ones((K0, K0), jnp.bool_), k=-1)           # j < i
            is_dup = jnp.any(same & earlier[None], axis=-1)    # [Q, K0]
            keep = pvalid & ~is_dup
            ranks = jnp.arange(K0, dtype=jnp.int32)[None, :]
            penalty = jnp.where(keep, ranks, K0 + ranks)
            # smallest penalties first == keepers in original rank order
            _, sel = jax.lax.top_k(-penalty, k_rerank)         # [Q, K]
            cand = jnp.take_along_axis(pool, sel, axis=1)
            cand_s = jnp.take_along_axis(res.scores, sel, axis=1)
            keep_sel = jnp.take_along_axis(keep, sel, axis=1)
            cand = jnp.where(keep_sel, cand, -1)
        else:
            cand = res.ids[:, :k_rerank]                       # [Q, K]
            cand_s = res.scores[:, :k_rerank]

        # 3. device-side candidate document gather (the step that is a
        #    host round trip in every client/server design)
        safe = jnp.clip(cand, 0, None)
        dtok = doc_tokens[safe].astype(jnp.int32)              # [Q, K, Ld]

        # 4. static-slot pair build: [CLS] q [SEP] ... already framed in
        #    q_ids; append doc tokens + trailing [SEP]
        Q, Lq = q_ids.shape
        K = cand.shape[1]
        Ld = dtok.shape[-1]
        qi = jnp.broadcast_to(q_ids[:, None, :], (Q, K, Lq))
        qm = jnp.broadcast_to(q_mask[:, None, :], (Q, K, Lq))
        dmask = (dtok != pad_id).astype(jnp.float32)           # [Q, K, Ld]
        sep = jnp.full((Q, K, 1), sep_id, jnp.int32)
        pair_ids = jnp.concatenate([qi, dtok, sep], axis=-1)   # [Q, K, L]
        pair_mask = jnp.concatenate(
            [qm, dmask, jnp.ones((Q, K, 1), jnp.float32)], axis=-1)
        pair_seg = jnp.concatenate(
            [jnp.zeros((Q, K, Lq), jnp.int32),
             jnp.ones((Q, K, Ld + 1), jnp.int32)], axis=-1)
        L = Lq + Ld + 1

        # 5. cross-encoder over all (query, candidate) pairs in ONE
        #    forward pass (replaces retrieval.py:651-681)
        ce = ce_model.apply(
            params_ce,
            pair_ids.reshape(Q * K, L),
            pair_mask.reshape(Q * K, L),
            pair_seg.reshape(Q * K, L),
        ).reshape(Q, K)                                        # f32
        validm = cand >= 0
        ce = jnp.where(validm, ce, -jnp.inf)

        # 6. final rank.  With ``rerank_alpha`` (runtime scalar, no
        #    recompile per value) the rank key combines the CE and a
        #    retrieval base score; alpha=0 degenerates to the base
        #    order, so a dev-picked alpha can only help (the same
        #    protocol the quality bench uses off-device).  Static
        #    ``rerank_mode``:
        #      "zblend"   alpha*z(ce) + (1-alpha)*base
        #      "residual" base + alpha*ce_raw — matches the residual
        #                 TRAINING objective (train/rerank.py: slate-z
        #                 base added to the CE logits), so a
        #                 residual-trained checkpoint serves the exact
        #                 function it optimized
        #    Static ``rerank_base`` picks the base:
        #      "fused"    z(RRF fused score) — merge order
        #      "exact"    z(mix*z(dense_exact) + (1-mix)*z(bm25_exact))
        #                 from ops/rescore.py: the candidates re-scored
        #                 exactly per tier; ``rescore_mix`` is the
        #                 runtime dense weight.  Measured +0.11 MRR@10
        #                 over the fused order on the real-text bench.
        #      "exact_postings"  same blend, BM25 column rescored from
        #                 the inverted postings instead of the doc-major
        #                 term table — no O(N) sparse structure, so the
        #                 full hybrid rank key serves at ANY corpus size
        #                 (the 10M tier; VERDICT r3 missing #1).
        #                 Requires sparse_impl="postings".
        if rerank_alpha is None:
            rank_key = ce
        else:
            nv = jnp.maximum(jnp.sum(validm, 1, keepdims=True), 1)

            def _znorm(x):
                xz = jnp.where(validm, x, 0.0)
                mean = jnp.sum(xz, 1, keepdims=True) / nv
                var = jnp.sum(
                    jnp.where(validm, (x - mean) ** 2, 0.0),
                    1, keepdims=True) / nv
                return (x - mean) * jax.lax.rsqrt(var + 1e-9)

            if rerank_base in ("exact", "exact_postings"):
                if rerank_base == "exact_postings":
                    if post_rows is None or post_tf is None:
                        raise ValueError(
                            'rerank_base="exact_postings" requires '
                            "post_rows/post_tf (sparse_impl=postings)")
                    d_ex, s_ex = exact_tier_scores_postings(
                        cand, q_dense, q_sp_idx, q_sp_tf, emb,
                        post_rows, post_tf, doc_len, df, n_docs,
                        valid=valid, emb_scale=emb_scale)
                else:
                    d_ex, s_ex = exact_tier_scores(
                        cand, q_dense, q_sp_idx, q_sp_tf, emb,
                        doc_idx, doc_tf, doc_len, df, n_docs,
                        valid=valid, emb_scale=emb_scale)
                mix = (rescore_mix if rescore_mix is not None
                       else jnp.float32(0.5))
                base = _znorm(mix * _znorm(d_ex)
                              + (1.0 - mix) * _znorm(s_ex))
            else:
                base = _znorm(cand_s)

            if rerank_mode == "residual":
                safe_ce = jnp.where(validm, ce, 0.0)
                rank_key = base + rerank_alpha * safe_ce
            else:
                rank_key = (rerank_alpha * _znorm(ce)
                            + (1.0 - rerank_alpha) * base)
            rank_key = jnp.where(validm, rank_key, -jnp.inf)
        top_s, top_j = jax.lax.top_k(rank_key, k_final)
        final_ids = jnp.take_along_axis(cand, top_j, axis=1)
        final_ce = jnp.take_along_axis(ce, top_j, axis=1)
        final_fused = jnp.take_along_axis(cand_s, top_j, axis=1)
        final_ids = jnp.where(jnp.isfinite(top_s), final_ids, -1)

        return E2EResult(final_ids, final_ce, final_fused, cand, cand_s,
                         q_dense)

    return jax.jit(program)


__all__ = ["make_retrieve_rerank", "E2EResult"]
