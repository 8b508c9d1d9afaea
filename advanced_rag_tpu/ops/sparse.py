"""Sparse lexical (BM25 / inner-product) scoring + top-k on TPU.

Replaces Milvus's SPARSE_INVERTED_INDEX with inner-product scoring
(reference indexing.py:158-167, retrieval.py:97-101).  An inverted index
is gather-hostile on a systolic-array machine, so the layout is inverted
the other way (SURVEY.md §7 hard-part 3): every document is a
**fixed-nnz padded row** — ``doc_idx[N, P]`` term ids (-1 pad) and
``doc_tf[N, P]`` term frequencies — giving fully static shapes and
sequential HBM reads.

Scoring is GATHER-FREE: queries have at most T (<=32) active terms, so
each block compares doc term-ids against the query's term ids directly —

    score[d, q] = sum_t q_w[q, t] * sum_p tfw[d, p] * [doc_idx[d, p] == q_idx[q, t]]

a pure compare+FMA loop on the VPU with sequential HBM reads.  The
obvious alternative (scatter query weights into a [V, Q] table, then
``table[doc_idx]``) performs B*P scattered row gathers per block, which
measured ~18x slower on v5e (gathers serialize on TPU; the compare
kernel streams).  BM25 weighting (k1/b/avg-len) is computed on device so
the same stored corpus serves plain-IP parity mode and BM25 without
re-indexing.  Top-k folding reuses the dense scan machinery, so
filters/validity behave identically across index families.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .dense import NEG_INF, cdiv, merge_topk


def _compare_scores(
    idx_blk: jnp.ndarray,   # [B, P] i32 doc term ids (-1 pad)
    tfw: jnp.ndarray,       # [B, P] f32 BM25/IP-weighted term frequencies
    q_idx: jnp.ndarray,     # [Q, T] i32 query term ids (-1 pad)
    q_w: jnp.ndarray,       # [Q, T] f32 query term weights (0 where pad)
) -> jnp.ndarray:
    """Gather-free block scoring -> [Q, B] f32.

    Statically unrolled over the (small) query-term axis; each step is a
    [Q, B, P] compare + masked-sum fused by XLA, no gathers/scatters.
    Duplicate term ids within one query row are fine (contributions add,
    matching the scatter-ADD semantics of an inverted index).
    """
    t_terms = q_idx.shape[1]
    scores = jnp.zeros((q_idx.shape[0], idx_blk.shape[0]), jnp.float32)
    for t in range(t_terms):
        qt = q_idx[:, t]                                   # [Q]
        wt = q_w[:, t].astype(jnp.float32)                 # [Q]
        eq = idx_blk[None, :, :] == qt[:, None, None]      # [Q, B, P]
        contrib = jnp.sum(jnp.where(eq, tfw[None, :, :], 0.0), axis=2)
        scores = scores + wt[:, None] * contrib
    return scores


def idf_weights(df: jnp.ndarray, n_docs: jnp.ndarray) -> jnp.ndarray:
    """Robertson-Sparck-Jones idf over the whole vocab: [V] f32.

    ``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))`` — always positive.
    """
    df = df.astype(jnp.float32)
    n = n_docs.astype(jnp.float32)
    return jnp.log1p(jnp.maximum(n - df + 0.5, 0.5) / (df + 0.5))


@functools.partial(
    jax.jit, static_argnames=("k", "scoring", "block_size")
)
def sparse_topk(
    doc_idx: jnp.ndarray,   # [N, P] i32 term ids, -1 pad
    doc_tf: jnp.ndarray,    # [N, P] f32 term frequencies
    doc_len: jnp.ndarray,   # [N] f32 document lengths (tokens)
    df: jnp.ndarray,        # [V] i32/f32 document frequencies
    n_docs: jnp.ndarray,    # scalar: live corpus size (for idf/avg-len)
    q_idx: jnp.ndarray,     # [Q, T] i32 query term ids, -1 pad
    q_tf: jnp.ndarray,      # [Q, T] f32 query term frequencies
    k: int,
    valid: Optional[jnp.ndarray] = None,   # [N] bool
    avg_len: Optional[jnp.ndarray] = None,  # scalar; None -> from valid rows.
    # Sharded callers pass the GLOBAL average (psum over shards) so BM25
    # length normalization is identical to the single-device program.
    *,
    scoring: str = "bm25",   # "bm25" | "ip"
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked sparse top-k in one jitted program.

    Returns ``(scores [Q, k] f32, ids [Q, k] i32)`` with -1/NEG_INF
    padding, identical conventions to ``dense_topk``.

    ``scoring='ip'`` reproduces the reference's hashed-count inner
    product (indexing.py:629-654); ``'bm25'`` is the quality upgrade
    with device-computed idf and length normalization.

    Contract: term ids within one doc row must be distinct (the encoder
    in index/text.py aggregates tf per term before padding) — BM25 tf
    saturation is applied per slot, so duplicate slots would be
    double-counted.
    """
    n, p = doc_idx.shape
    if n == 0:
        raise ValueError("sparse_topk: empty corpus")
    vocab_size = df.shape[0]

    if scoring == "bm25":
        # one small gather over the [Q, T] query terms only (not per doc)
        q_w = q_tf.astype(jnp.float32) * jnp.where(
            q_idx >= 0, idf_weights(df, n_docs)[jnp.clip(q_idx, 0)], 0.0
        )
    elif scoring == "ip":
        q_w = jnp.where(q_idx >= 0, q_tf.astype(jnp.float32), 0.0)
    else:
        raise ValueError(f"unknown scoring: {scoring}")
    del vocab_size  # scoring no longer touches the vocab table

    v = valid.astype(jnp.bool_) if valid is not None else jnp.ones((n,), jnp.bool_)
    if avg_len is None:
        avg_len = jnp.sum(
            jnp.where(v, doc_len.astype(jnp.float32), 0.0)
        ) / jnp.maximum(jnp.sum(v.astype(jnp.float32)), 1.0)
    else:
        avg_len = jnp.asarray(avg_len, jnp.float32)

    bsz = min(block_size, n)
    nblocks = cdiv(n, bsz)
    padded = nblocks * bsz
    if padded != n:
        doc_idx = jnp.pad(doc_idx, ((0, padded - n), (0, 0)), constant_values=-1)
        doc_tf = jnp.pad(doc_tf, ((0, padded - n), (0, 0)))
        doc_len = jnp.pad(doc_len, (0, padded - n))
        v = jnp.pad(v, (0, padded - n))

    num_q = q_idx.shape[0]
    init_s = jnp.full((num_q, k), NEG_INF, dtype=jnp.float32)
    init_i = jnp.full((num_q, k), -1, dtype=jnp.int32)
    blk_iota = lax.broadcasted_iota(jnp.int32, (1, bsz), 1)
    k1f, bf = jnp.float32(k1), jnp.float32(b)

    def body(carry, blk):
        top_s, top_i = carry
        start = blk * bsz
        idx_blk = lax.dynamic_slice(doc_idx, (start, 0), (bsz, p))
        tf_blk = lax.dynamic_slice(doc_tf, (start, 0), (bsz, p)).astype(jnp.float32)
        len_blk = lax.dynamic_slice(doc_len, (start,), (bsz,)).astype(jnp.float32)
        v_blk = lax.dynamic_slice(v, (start,), (bsz,))

        if scoring == "bm25":
            denom = tf_blk + k1f * (1.0 - bf + bf * len_blk[:, None]
                                    / jnp.maximum(avg_len, 1.0))
            tfw = tf_blk * (k1f + 1.0) / jnp.maximum(denom, 1e-6)
        else:
            tfw = tf_blk
        slot_ok = idx_blk >= 0
        tfw = jnp.where(slot_ok, tfw, 0.0)
        s = _compare_scores(idx_blk, tfw, q_idx, q_w)          # [Q, B]

        ids = blk_iota + start
        keep = jnp.logical_and(v_blk[None, :], ids < n)
        s = jnp.where(keep, s, NEG_INF)
        blk_ids = jnp.where(keep, ids, -1)
        blk_ids = jnp.broadcast_to(blk_ids, s.shape).astype(jnp.int32)
        return merge_topk(top_s, top_i, s, blk_ids, k), None

    (top_s, top_i), _ = lax.scan(
        body, (init_s, init_i), jnp.arange(nblocks, dtype=jnp.int32)
    )
    # BM25 scores are >= 0; declare no-match rows (score 0 with no query
    # term overlap) valid only if some score > 0 was found — keep parity
    # with dense conventions by flagging strictly-masked rows only.
    top_i = jnp.where(top_s <= NEG_INF, -1, top_i)
    return top_s, top_i


__all__ = ["sparse_topk", "idf_weights"]
