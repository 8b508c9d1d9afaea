"""Exact per-candidate tier rescoring for the rerank stage.

Rank-based RRF fusion (ops/fusion.py, reference retrieval.py:421-491)
is the right tool for MERGING heterogeneous top-k lists, but it
deliberately discards score magnitudes — and the magnitudes carry most
of the precision signal: measured on the real-text quality bench, the
RRF candidate order scores MRR@10 0.45 while re-sorting the SAME
candidates by a z-blend of their exact tier scores reaches 0.56
(QUALITY_REAL.json, trained_rescored vs the fused order).

So the rerank stage re-scores its k_rerank candidates EXACTLY per
tier — a dense dot against the stored embeddings and a full BM25
against the doc-major term table — and ranks by a z-normalized blend.
Candidates stay device-resident: both rescores are gathers over [Q, K]
rows (K ~ 20), noise next to the corpus-wide scan that produced them.
The cross-encoder then serves as a RESIDUAL on this base (ops/e2e.py
``rerank_mode="residual"``), matching its training objective
(train/rerank.py RerankTrainConfig.residual).

Replaces: the reference has no equivalent — its rerank stage receives
only the fused score (retrieval.py:518-563) and its cross-encoder is a
placeholder (:675-681).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .sparse import idf_weights


def _dense_rescore(
    safe: jnp.ndarray,          # [Q, K] clipped candidate rows
    q_dense: jnp.ndarray,       # [Q, D]
    emb: jnp.ndarray,           # [N, D]
    emb_scale: Optional[jnp.ndarray],
) -> jnp.ndarray:
    e = emb[safe]                                        # [Q, K, D]
    dense = jnp.einsum("qd,qkd->qk", q_dense.astype(jnp.float32),
                       e.astype(jnp.float32))
    if emb_scale is not None:
        # SQ8 rows: int8 codes * per-row scale (ops/quant.py:16)
        dense = dense * emb_scale[safe].astype(jnp.float32)
    return dense


def _live_avg_len(doc_len, n_docs, valid):
    if valid is not None:
        v = valid.astype(jnp.float32)
        return jnp.sum(doc_len.astype(jnp.float32) * v) / jnp.maximum(
            jnp.sum(v), 1.0)
    # appends zero-fill doc_len past the live prefix, so the live
    # average is sum / n_docs (not / capacity)
    return jnp.sum(doc_len.astype(jnp.float32)) / jnp.maximum(
        n_docs.astype(jnp.float32), 1.0)


def exact_tier_scores(
    cand: jnp.ndarray,          # [Q, K] i32 candidate rows (-1 pad)
    q_dense: jnp.ndarray,       # [Q, D] f32 query embeddings
    q_idx: jnp.ndarray,         # [Q, T] i32 sparse query terms (-1 pad)
    q_tf: jnp.ndarray,          # [Q, T] f32
    emb: jnp.ndarray,           # [N, D] stored embeddings (f32/bf16/int8)
    doc_idx: jnp.ndarray,       # [N, P] i32 doc-major term table
    doc_tf: jnp.ndarray,        # [N, P]
    doc_len: jnp.ndarray,       # [N] f32
    df: jnp.ndarray,            # [V]
    n_docs: jnp.ndarray,        # scalar f32 live corpus size
    valid: Optional[jnp.ndarray] = None,   # [N] bool live-row mask
    emb_scale: Optional[jnp.ndarray] = None,   # [N] f32 SQ8 row scales
    k1: float = 1.2,
    b: float = 0.75,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (dense [Q, K], bm25 [Q, K]) exact scores of each candidate.

    Same BM25 weighting as the corpus-wide scan (ops/sparse.py:
    sparse_topk) — Robertson-Sparck-Jones idf, k1/b tf saturation,
    avg-length normalization over the LIVE corpus — so a candidate's
    rescore equals the score the sparse tier would have given it.
    Padded candidates (row -1) come back as 0; mask downstream.
    Traceable: safe to call inside a jitted program (ops/e2e.py) or
    standalone under jit (index/manager.py rescore path).
    """
    safe = jnp.clip(cand, 0, None)                       # [Q, K]
    dense = _dense_rescore(safe, q_dense, emb, emb_scale)

    # -- BM25: full-body score of each candidate -----------------------
    q_w = q_tf.astype(jnp.float32) * jnp.where(
        q_idx >= 0, idf_weights(df, n_docs)[jnp.clip(q_idx, 0)], 0.0
    )                                                    # [Q, T]
    di = doc_idx[safe]                                   # [Q, K, P]
    dt = doc_tf[safe].astype(jnp.float32)
    dl = doc_len[safe].astype(jnp.float32)
    avg_len = _live_avg_len(doc_len, n_docs, valid)
    k1f, bf = jnp.float32(k1), jnp.float32(b)
    denom = dt + k1f * (1.0 - bf + bf * dl[:, :, None]
                        / jnp.maximum(avg_len, 1.0))
    tfw = dt * (k1f + 1.0) / jnp.maximum(denom, 1e-6)    # [Q, K, P]
    tfw = jnp.where(di >= 0, tfw, 0.0)
    # [Q, K, P, T] one-shot compare: K*P*T ~ 20*256*32 per query — tiny
    eq = di[:, :, :, None] == q_idx[:, None, None, :]
    hit = jnp.sum(tfw[:, :, :, None] * eq.astype(jnp.float32), axis=2)
    bm25 = jnp.sum(hit * q_w[:, None, :], axis=-1)       # [Q, K]

    ok = (cand >= 0).astype(jnp.float32)
    return dense * ok, bm25 * ok


def exact_tier_scores_postings(
    cand: jnp.ndarray,          # [Q, K] i32 candidate rows (-1 pad)
    q_dense: jnp.ndarray,       # [Q, D] f32 query embeddings
    q_idx: jnp.ndarray,         # [Q, T] i32 sparse query terms (-1 pad)
    q_tf: jnp.ndarray,          # [Q, T] f32
    emb: jnp.ndarray,           # [N, D] stored embeddings (f32/bf16/int8)
    post_rows: jnp.ndarray,     # [V, L] i32 inverted postings (-1 pad)
    post_tf: jnp.ndarray,       # [V, L] term frequencies
    doc_len: jnp.ndarray,       # [N] f32
    df: jnp.ndarray,            # [V]
    n_docs: jnp.ndarray,        # scalar f32 live corpus size
    valid: Optional[jnp.ndarray] = None,   # [N] bool live-row mask
    emb_scale: Optional[jnp.ndarray] = None,   # [N] f32 SQ8 row scales
    k1: float = 1.2,
    b: float = 0.75,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact candidate rescore backed by the INVERTED postings index.

    Same contract as :func:`exact_tier_scores`, but the BM25 column is
    a candidate-local gather from ``post_rows``/``post_tf`` instead of
    a doc-major ``[N, P]`` term table.  BM25 touches only query terms,
    so membership of each candidate in each query term's postings row
    recovers the exact tf — no per-document term storage is needed.
    That removes the rescore path's only O(N) sparse structure: at 10M
    rows the doc-major table costs 3.2 GB of HBM next to the codes and
    postings (the round-3 bench had to serve a dense-only rank key at
    that tier, VERDICT r3 missing #1); this variant serves the full
    hybrid key at ANY corpus size for zero extra memory.

    Equality: scores match :func:`exact_tier_scores` whenever no query
    term's document frequency exceeds the postings cap ``L`` (tested in
    tests/test_ops_hybrid.py); beyond the cap a dropped (doc, term)
    slot scores 0 — the SAME documented underestimate as the postings
    scan tier (ops/postings.py), so a candidate's rescore still equals
    the score the serving sparse tier would have given it.

    Cost: one [Q, T, L] postings gather + a T-step scan of [Q, L, K]
    compares (the one-shot [Q, T, L, K] broadcast would transiently
    peak at GBs at the 10M tier's L ~ 40k).
    """
    safe = jnp.clip(cand, 0, None)                       # [Q, K]
    dense = _dense_rescore(safe, q_dense, emb, emb_scale)

    q_w = q_tf.astype(jnp.float32) * jnp.where(
        q_idx >= 0, idf_weights(df, n_docs)[jnp.clip(q_idx, 0)], 0.0
    )                                                    # [Q, T]
    rows = post_rows[jnp.clip(q_idx, 0)]                 # [Q, T, L]
    ptf = post_tf[jnp.clip(q_idx, 0)].astype(jnp.float32)
    rows = jnp.where((q_idx >= 0)[:, :, None], rows, -1)

    def step(_, xs):
        r_t, f_t = xs                                    # [Q, L] each
        eq = ((r_t[:, :, None] == safe[:, None, :])
              & (r_t >= 0)[:, :, None])                  # [Q, L, K]
        return None, jnp.sum(jnp.where(eq, f_t[:, :, None], 0.0), axis=1)

    _, tf_tqk = lax.scan(step, None, (jnp.swapaxes(rows, 0, 1),
                                      jnp.swapaxes(ptf, 0, 1)))
    tf = jnp.moveaxis(tf_tqk, 0, 2)                      # [Q, K, T]

    dl = doc_len[safe].astype(jnp.float32)               # [Q, K]
    avg_len = _live_avg_len(doc_len, n_docs, valid)
    k1f, bf = jnp.float32(k1), jnp.float32(b)
    denom = tf + k1f * (1.0 - bf + bf * dl[:, :, None]
                        / jnp.maximum(avg_len, 1.0))
    tfw = tf * (k1f + 1.0) / jnp.maximum(denom, 1e-6)    # [Q, K, T]
    bm25 = jnp.sum(tfw * q_w[:, None, :], axis=-1)       # [Q, K]

    ok = (cand >= 0).astype(jnp.float32)
    return dense * ok, bm25 * ok


def zmix_base(
    dense: jnp.ndarray,         # [Q, K] exact dense scores
    bm25: jnp.ndarray,          # [Q, K] exact BM25 scores
    validm: jnp.ndarray,        # [Q, K] bool candidate-valid mask
    mix: jnp.ndarray,           # scalar f32: dense weight in [0, 1]
) -> jnp.ndarray:
    """Slate-z-normalized blend: z(mix*z(dense) + (1-mix)*z(bm25)).

    The outer z matches train/rerank.py make_rerank_batch, which
    z-normalizes the base scores per slate — so a residual-trained
    cross-encoder serves the exact function it optimized.
    """
    nv = jnp.maximum(jnp.sum(validm, 1, keepdims=True), 1)

    def _z(x):
        xz = jnp.where(validm, x, 0.0)
        mean = jnp.sum(xz, 1, keepdims=True) / nv
        var = jnp.sum(jnp.where(validm, (x - mean) ** 2, 0.0),
                      1, keepdims=True) / nv
        return (x - mean) * jax.lax.rsqrt(var + 1e-9)

    blend = mix * _z(dense) + (1.0 - mix) * _z(bm25)
    return _z(blend)


__all__ = ["exact_tier_scores", "exact_tier_scores_postings", "zmix_base"]
