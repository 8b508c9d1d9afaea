"""Inverted postings-list BM25: query work independent of corpus size.

True parity with Milvus's SPARSE_INVERTED_INDEX (reference
indexing.py:158-167): per-term postings lists, so a query touches only
the rows containing its terms.  The slot-scan kernels (ops/sparse.py,
ops/pallas_sparse.py) read every doc-term slot (N*P per query); this
layout reads T*L slots — fixed by the query, ~500x less at 1M docs.

TPU-static design:
- ``post_rows [V, L] i32`` / ``post_tf [V, L]`` — per-term postings
  padded to cap L (-1 pad).  Terms with df > L keep their HIGHEST-tf
  postings (same quality tradeoff as Milvus drop_ratio: common terms
  carry ~zero idf anyway).
- query: gather T postings lists -> [T, L] candidate (row, tf) pairs;
  BM25-weight each (doc_len via one [T, L] gather); aggregate per-row
  with a SORT-based segmented sum (no TPU scatter): sort by row id,
  exclusive-cummax of segment-boundary cumsums, subtract.  One
  lax.sort + cumsum + top_k — all static [Q, T*L] shapes.

Scores match the slot-scan kernels exactly whenever no query term's
document frequency exceeds L (tested); beyond L they are a documented
underestimate for ultra-common terms.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .dense import NEG_INF
from .sparse import idf_weights


def _segment_topk(rows: jnp.ndarray, contrib: jnp.ndarray, k: int,
                  n_valid_hint: jnp.ndarray | None = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """rows [M] i32 (-1 pad), contrib [M] f32 (>=0) -> per-unique-row sums,
    top-k (scores, row_ids).  Sort-based; contributions are non-negative
    so cumulative sums are monotone and cummax recovers segment starts."""
    m = rows.shape[0]
    # push pads to the end by sorting on (row == -1, row)
    sort_key = jnp.where(rows < 0, jnp.int32(2**30), rows)
    sorted_rows, sorted_c = lax.sort_key_val(sort_key, contrib)
    csum = jnp.cumsum(sorted_c)
    nxt = jnp.concatenate([sorted_rows[1:], jnp.full((1,), -2, jnp.int32)])
    is_last = sorted_rows != nxt                       # segment ends
    # cumulative total up to the END of the previous segment
    end_csum = jnp.where(is_last, csum, 0.0)
    prev_end = jnp.concatenate([jnp.zeros((1,), csum.dtype), end_csum[:-1]])
    prev_end = lax.cummax(prev_end)
    seg_sum = csum - prev_end                          # valid where is_last
    ok = is_last & (sorted_rows < 2**30)
    scores = jnp.where(ok, seg_sum, NEG_INF)
    top_s, sel = lax.top_k(scores, k)
    top_i = jnp.where(top_s <= NEG_INF, -1, sorted_rows[sel])
    return top_s, top_i


@functools.partial(
    jax.jit, static_argnames=("k", "scoring", "k1", "b", "impl"),
)
def postings_topk(
    post_rows: jnp.ndarray,   # [V, L] i32 row ids per term (-1 pad)
    post_tf: jnp.ndarray,     # [V, L] f32 term frequencies
    doc_len: jnp.ndarray,     # [N] f32 (row-indexed)
    df: jnp.ndarray,          # [V]
    n_docs: jnp.ndarray,      # scalar
    q_idx: jnp.ndarray,       # [Q, T] i32 (-1 pad)
    q_tf: jnp.ndarray,        # [Q, T] f32
    k: int,
    valid: Optional[jnp.ndarray] = None,   # [N] bool (row-indexed)
    avg_len: Optional[jnp.ndarray] = None,
    post_tfw: Optional[jnp.ndarray] = None,  # [V, L] precomputed BM25
    *,                                       # tf-weights (build-time
    scoring: str = "bm25",                   # avg_len; see
    k1: float = 1.2,                         # postings_tf_weights)
    b: float = 0.75,
    impl: str = "sort",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as ops.sparse.sparse_topk, postings-backed.

    Performance shape (measured at 10M rows, postings cap 40k, Q=1 —
    docs/PERF.md round-5 sparse attribution): the sort-based segmented
    sum is ~13 ms, and the per-posting doc_len/valid RANDOM gathers add
    ~10 ms more.  Two independent levers, composable:

    - ``post_tfw``: the BM25 tf-saturation term precomputed per posting
      at BUILD time (length normalization uses the build-time live
      avg_len — exact until appends shift the average, and maintenance
      rebuilds refresh it).  Removes the [T*L] doc_len gather and the
      denominator math from the query path entirely.
    - ``impl="scatter"``: accumulate contributions into a [Q, N] HBM
      accumulator via scatter-add and reduce with the sort-free
      ``approx_max_k`` (recall_target 0.99 — the same reduction the
      dense rung uses), applying the validity mask VECTORIZED on the
      accumulator instead of a per-posting random gather.  Wins for
      small query batches (accumulator is Q*N*4 B); the sort path
      amortizes Q and stays the rung for larger batches.
    """
    n = doc_len.shape[0]
    v = valid.astype(jnp.bool_) if valid is not None else jnp.ones((n,), jnp.bool_)
    if avg_len is None:
        avg_len = jnp.sum(
            jnp.where(v, doc_len.astype(jnp.float32), 0.0)
        ) / jnp.maximum(jnp.sum(v.astype(jnp.float32)), 1.0)
    else:
        avg_len = jnp.asarray(avg_len, jnp.float32)

    if scoring == "bm25":
        q_w = q_tf.astype(jnp.float32) * jnp.where(
            q_idx >= 0, idf_weights(df, n_docs)[jnp.clip(q_idx, 0)], 0.0)
    elif scoring == "ip":
        q_w = jnp.where(q_idx >= 0, q_tf.astype(jnp.float32), 0.0)
    else:
        raise ValueError(f"unknown scoring: {scoring}")

    k1f, bf = jnp.float32(k1), jnp.float32(b)

    if impl == "scatter":
        Q, T = q_idx.shape

        def step(acc, t):
            qi_t = q_idx[:, t]                           # [Q]
            safe_t = jnp.clip(qi_t, 0)
            rows = post_rows[safe_t]                     # [Q, L]
            if scoring != "bm25" or post_tfw is None:
                tf = post_tf[safe_t].astype(jnp.float32)
                if scoring == "bm25":
                    dlen = doc_len[jnp.clip(rows, 0)].astype(jnp.float32)
                    denom = tf + k1f * (1.0 - bf + bf * dlen
                                        / jnp.maximum(avg_len, 1.0))
                    tfw = tf * (k1f + 1.0) / jnp.maximum(denom, 1e-6)
                else:
                    tfw = tf
            else:
                tfw = post_tfw[safe_t].astype(jnp.float32)
            w = q_w[:, t][:, None] * tfw                 # [Q, L]
            ok = (rows >= 0) & (qi_t >= 0)[:, None]
            # out-of-range index drops the update (mode="drop")
            safe_r = jnp.where(ok, rows, n)
            acc = acc.at[jnp.arange(Q)[:, None], safe_r].add(
                jnp.where(ok, w, 0.0), mode="drop")
            return acc, None

        acc, _ = lax.scan(step, jnp.zeros((Q, n), jnp.float32),
                          jnp.arange(T))
        acc = jnp.where(v[None, :], acc, 0.0)            # vectorized mask
        top_s, top_i = lax.approx_max_k(acc, k, recall_target=0.99)
        top_i = jnp.where(top_s > 0.0, top_i, -1)
        top_s = jnp.where(top_s > 0.0, top_s, NEG_INF)
        return top_s, top_i

    def one_query(qi, qw):
        safe_t = jnp.clip(qi, 0)
        rows = post_rows[safe_t]                       # [T, L]
        term_ok = (qi >= 0)[:, None]
        rows = jnp.where(term_ok, rows, -1)
        safe_r = jnp.clip(rows, 0)
        row_ok = (rows >= 0) & v[safe_r]
        if scoring == "bm25" and post_tfw is not None:
            tfw = post_tfw[safe_t].astype(jnp.float32)
        elif scoring == "bm25":
            tf = post_tf[safe_t].astype(jnp.float32)   # [T, L]
            dlen = doc_len[safe_r].astype(jnp.float32)
            denom = tf + k1f * (1.0 - bf + bf * dlen / jnp.maximum(avg_len, 1.0))
            tfw = tf * (k1f + 1.0) / jnp.maximum(denom, 1e-6)
        else:
            tfw = post_tf[safe_t].astype(jnp.float32)
        contrib = jnp.where(row_ok, qw[:, None] * tfw, 0.0)
        rows = jnp.where(row_ok, rows, -1)
        return _segment_topk(rows.reshape(-1), contrib.reshape(-1), k)

    top_s, top_i = jax.vmap(one_query)(q_idx, q_w)
    return top_s, top_i


def postings_tf_weights(post_rows, post_tf, doc_len, avg_len: float,
                        k1: float = 1.2, b: float = 0.75):
    """Precompute the BM25 tf-saturation weight per posting (numpy).

    tfw = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avg_len)) — everything the
    query path needs from ``tf`` and ``doc_len``, folded at build time
    so queries touch neither (the doc_len random gather was ~25% of the
    10M sparse stage).  avg_len is the build-time LIVE average; appends
    shift the true average until the next maintenance rebuild — the
    same documented staleness as postings compaction.
    """
    import numpy as np

    rows = np.asarray(post_rows)
    tf = np.asarray(post_tf, np.float32)
    dl = np.asarray(doc_len, np.float32)[np.clip(rows, 0, None)]
    denom = tf + k1 * (1.0 - b + b * dl / max(avg_len, 1.0))
    tfw = tf * (k1 + 1.0) / np.maximum(denom, 1e-6)
    tfw[rows < 0] = 0.0
    return tfw.astype(np.float32)


def build_postings(
    doc_idx, doc_tf, vocab_size: int, cap: int,
):
    """Host-side build from the slot layout -> (post_rows, post_tf) numpy.

    Keeps the HIGHEST-tf cap postings per term (vectorized: stable sort
    by (term, -tf) then searchsorted positions, like the IVF packer).
    """
    import numpy as np

    n, p = doc_idx.shape
    flat_t = np.asarray(doc_idx).reshape(-1)
    flat_tf = np.asarray(doc_tf, np.float32).reshape(-1)
    flat_r = np.repeat(np.arange(n, dtype=np.int32), p)
    keep = flat_t >= 0
    flat_t, flat_tf, flat_r = flat_t[keep], flat_tf[keep], flat_r[keep]
    # sort by (term asc, tf desc) so truncation drops lowest-tf postings
    order = np.lexsort((-flat_tf, flat_t))
    st, stf, sr = flat_t[order], flat_tf[order], flat_r[order]
    first = np.searchsorted(st, np.arange(vocab_size))
    pos = np.arange(len(st), dtype=np.int64) - first[st]
    keep = pos < cap
    post_rows = np.full((vocab_size, cap), -1, np.int32)
    post_tf = np.zeros((vocab_size, cap), np.float32)
    post_rows[st[keep], pos[keep]] = sr[keep]
    post_tf[st[keep], pos[keep]] = stf[keep]
    return post_rows, post_tf


def auto_postings_cap(n_docs: int, doc_nnz: int, vocab_size: int,
                      headroom: float = 8.0, lo: int = 128,
                      hi: int = 16384) -> int:
    """Cap ~ headroom * average postings length, pow2-rounded."""
    avg = max(1.0, n_docs * doc_nnz / max(vocab_size, 1))
    cap = 1
    while cap < avg * headroom:
        cap *= 2
    return max(lo, min(hi, cap))


__all__ = ["postings_topk", "postings_tf_weights", "build_postings", "auto_postings_cap"]
