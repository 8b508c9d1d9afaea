"""Dense scoring + masked top-k: the device-resident replacement for
Milvus HNSW vector search (reference indexing.py:445-551).

Design (SURVEY.md §7 B1): the corpus is a packed ``emb[N, D]`` array in
HBM (bf16 by default).  Search is ONE jitted program: a `lax.scan` over
corpus blocks computes ``q @ block.T`` on the MXU in f32 accumulation,
applies the metadata-filter mask (the compiled equivalent of Milvus
``expr`` — reference retrieval.py:573-632), and folds each block into a
running top-k that never materializes the full [Q, N] score matrix in
HBM.  Wall-clock is HBM-bandwidth-bound: each corpus byte is read
exactly once per query batch.

Everything here is shape-static and jit/vmap/shard_map friendly; the
sharded multi-chip path in ``parallel/sharded_search.py`` runs this same
program per shard and merges top-k over ICI.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

#: Sentinel for masked-out scores.  Finite (not -inf) so downstream
#: arithmetic (softmax over fused scores, etc.) never produces NaN.
NEG_INF = jnp.float32(-1e30)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12, axis: int = -1) -> jnp.ndarray:
    """Row-normalize in f32 (safe for zero rows)."""
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=axis, keepdims=True))
    return x32 / jnp.maximum(norm, eps)


def _block_scores(
    e_blk: jnp.ndarray,    # [B, D] storage dtype
    q: jnp.ndarray,        # [Q, D] f32 (pre-normalized if cosine)
    metric: str,
) -> jnp.ndarray:
    """Similarity of a corpus block against the query batch -> [Q, B] f32.

    The matmul hits the MXU with f32 accumulation regardless of the
    storage dtype (bf16 corpus reads halve HBM traffic).
    """
    if metric == "cosine":
        e = l2_normalize(e_blk)
        return jnp.dot(q, e.T, preferred_element_type=jnp.float32)
    if metric == "ip":
        return jnp.dot(q, e_blk.T.astype(jnp.float32), preferred_element_type=jnp.float32)
    if metric == "l2":
        # rank by -||q - e||^2 = 2 q.e - ||e||^2 - ||q||^2 ; the ||q||^2
        # term is constant per query so we keep it for exact score values.
        e = e_blk.astype(jnp.float32)
        qe = jnp.dot(q, e.T, preferred_element_type=jnp.float32)
        e_sq = jnp.sum(e * e, axis=-1)
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        return 2.0 * qe - e_sq[None, :] - q_sq
    raise ValueError(f"unknown metric: {metric}")


def merge_topk(
    top_s: jnp.ndarray, top_i: jnp.ndarray,
    blk_s: jnp.ndarray, blk_i: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold candidate (scores, ids) into the running top-k along axis 1.

    Also the merge step of the cross-shard ICI top-k reduction
    (parallel/sharded_search.py) — only k ids+scores ever cross links.
    """
    cat_s = jnp.concatenate([top_s, blk_s], axis=1)
    cat_i = jnp.concatenate([top_i, blk_i], axis=1)
    new_s, sel = lax.top_k(cat_s, k)
    new_i = jnp.take_along_axis(cat_i, sel, axis=1)
    return new_s, new_i


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "block_size", "normalize_queries")
)
def dense_topk(
    emb: jnp.ndarray,                    # [N, D] corpus (any float dtype)
    queries: jnp.ndarray,                # [Q, D]
    k: int,
    valid: Optional[jnp.ndarray] = None,  # [N] bool; False rows excluded
    *,
    metric: str = "cosine",
    block_size: int = 65536,
    normalize_queries: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact masked top-k similarity search in one jitted program.

    Returns ``(scores [Q, k] f32, ids [Q, k] i32)``.  Masked/absent rows
    surface as score ``<= NEG_INF`` and id ``-1``.  ``N`` need not be a
    multiple of ``block_size``; the tail is zero-padded and bounds-masked
    (a no-op for the power-of-two capacities CorpusStore allocates).

    Replaces: Milvus HNSW search at ef=64 (reference indexing.py:504-528)
    — exact instead of approximate, so recall@k == 1.0 by construction.
    """
    n, d = emb.shape
    if n == 0:
        raise ValueError("dense_topk: empty corpus")
    q = queries.astype(jnp.float32)
    if metric == "cosine" and normalize_queries:
        q = l2_normalize(q)

    bsz = min(block_size, n)
    nblocks = cdiv(n, bsz)
    padded = nblocks * bsz

    # NO pad copy of emb: at 10M x 384 a jnp.pad of the corpus costs a
    # full HBM read+write (~19 ms) per call.  The ragged tail is handled
    # by CLAMPING the last block's start to n - bsz (overlapping the
    # previous block) and masking the already-seen rows via ids >= start.
    v = valid.astype(jnp.bool_) if valid is not None else jnp.ones((n,), jnp.bool_)

    num_q = q.shape[0]
    init_s = jnp.full((num_q, k), NEG_INF, dtype=jnp.float32)
    init_i = jnp.full((num_q, k), -1, dtype=jnp.int32)
    blk_iota = lax.broadcasted_iota(jnp.int32, (1, bsz), 1)

    def body(carry, blk):
        top_s, top_i = carry
        start = blk * bsz
        sc = jnp.minimum(start, n - bsz)       # last block overlaps back
        e_blk = lax.dynamic_slice(emb, (sc, 0), (bsz, d))
        v_blk = lax.dynamic_slice(v, (sc,), (bsz,))
        s = _block_scores(e_blk, q, metric)                    # [Q, B]
        ids = blk_iota + sc                                    # [1, B]
        # ids >= start drops rows the previous block already scored
        keep = jnp.logical_and(v_blk[None, :], ids >= start)
        s = jnp.where(keep, s, NEG_INF)
        blk_ids = jnp.where(keep, ids, -1)
        blk_ids = jnp.broadcast_to(blk_ids, s.shape).astype(jnp.int32)
        return merge_topk(top_s, top_i, s, blk_ids, k), None

    (top_s, top_i), _ = lax.scan(
        body, (init_s, init_i), jnp.arange(nblocks, dtype=jnp.int32)
    )
    # Rows whose score stayed at NEG_INF never matched anything valid.
    top_i = jnp.where(top_s <= NEG_INF, -1, top_i)
    return top_s, top_i


@functools.partial(jax.jit, static_argnames=("k", "metric", "recall_target"))
def dense_topk_approx(
    emb: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    valid: Optional[jnp.ndarray] = None,
    *,
    metric: str = "cosine",
    recall_target: float = 0.95,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate top-k via the TPU-native `lax.approx_max_k` sort-free
    reduction — the hardware analogue of tuning HNSW ``ef`` below exact
    (reference retrieval.py:93-96).  Materializes [Q, N] scores, so use
    for N where that fits; beyond that prefer IVF (ops/ivf.py).
    """
    q = queries.astype(jnp.float32)
    if metric == "cosine":
        q = l2_normalize(q)
    s = _block_scores(emb, q, metric)
    if valid is not None:
        s = jnp.where(valid[None, :].astype(jnp.bool_), s, NEG_INF)
    top_s, top_i = lax.approx_max_k(s, k, recall_target=recall_target)
    top_i = jnp.where(top_s <= NEG_INF, -1, top_i.astype(jnp.int32))
    return top_s, top_i.astype(jnp.int32)


__all__ = [
    "dense_topk",
    "dense_topk_approx",
    "merge_topk",
    "l2_normalize",
    "NEG_INF",
    "cdiv",
]
