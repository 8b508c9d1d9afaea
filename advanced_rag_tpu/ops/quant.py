"""SQ8 int8 scalar-quantized dense tier: 4x smaller than f32, 2x bf16.

The reference's scale story is "add Milvus nodes"; its config hints at
quantization only through index-type choices.  On TPU the equivalent
lever is storage dtype: v5e's MXU runs int8 x int8 -> int32 natively at
2x bf16 throughput, and the dense scan is HBM-bandwidth-bound, so int8
codes double effective search speed AND double per-chip capacity
(10M x 384 bf16 = 7.7 GB; int8 = 3.8 GB -> ~30M rows/chip with room
for the sparse index).  This is the TPU-native substitute for IVF_SQ8
(SURVEY.md §7 hard part 2: "optional PQ for the 10M tier" — scalar
quantization is chosen over PQ because PQ's codebook lookups are
gather-bound, the one access pattern TPUs punish; SQ8 keeps every hot
op a dense tile).

Scheme: symmetric per-row scales.
    scale[i] = max|emb[i, :]| / 127        (f32, one per row)
    codes[i] = round(emb[i] / scale[i])    (int8)
    score(q, i) ~= (q_scale * scale[i]) * dot(q_i8, codes[i])

Queries are quantized per-row the same way, so the inner product runs
entirely in int8 on the MXU with exact int32 accumulation; the only
approximation is the two rounding steps.  For L2-normalized embeddings
(the cosine path stores normalized rows) the end-to-end top-k overlap
vs f32 exact search is >0.99 at D=384 (tests/test_quant.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .dense import NEG_INF, cdiv, l2_normalize, merge_topk


def sq8_quantize_host(emb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """f32 [N, D] -> (codes int8 [N, D], scale f32 [N]).  Host-side so the
    f32 source never needs to be device-resident (the point of the tier)."""
    emb = np.asarray(emb, np.float32)
    maxabs = np.max(np.abs(emb), axis=1)
    scale = np.maximum(maxabs, 1e-12) / 127.0
    codes = np.clip(np.rint(emb / scale[:, None]), -127, 127).astype(np.int8)
    return codes, scale.astype(np.float32)


@jax.jit
def sq8_quantize(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side row quantization (used for queries)."""
    x = x.astype(jnp.float32)
    maxabs = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(maxabs, 1e-12) / 127.0
    codes = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
    return codes, scale


def sq8_block_scores(
    codes_blk: jnp.ndarray,   # [B, D] int8
    scale_blk: jnp.ndarray,   # [B] f32
    q_codes: jnp.ndarray,     # [Q, D] int8
    q_scale: jnp.ndarray,     # [Q] f32
) -> jnp.ndarray:
    """int8 MXU matmul with exact int32 accumulation -> [Q, B] f32."""
    acc = jax.lax.dot_general(
        q_codes, codes_blk,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                    # [Q, B] i32, exact
    return acc.astype(jnp.float32) * (q_scale[:, None] * scale_blk[None, :])


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "block_size", "normalize_queries")
)
def dense_topk_sq8(
    codes: jnp.ndarray,                   # [N, D] int8
    scale: jnp.ndarray,                   # [N] f32
    queries: jnp.ndarray,                 # [Q, D] f32
    k: int,
    valid: Optional[jnp.ndarray] = None,  # [N] bool
    *,
    metric: str = "ip",                   # "ip" | "cosine" (rows pre-normalized)
    block_size: int = 131072,
    normalize_queries: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked exact-top-k over int8 codes; same contract as dense_topk.

    "cosine" assumes rows were normalized BEFORE quantization (DenseIndex
    does this at append) and normalizes the queries here; the score is
    then quantized cosine similarity.
    """
    n, d = codes.shape
    if n == 0:
        raise ValueError("dense_topk_sq8: empty corpus")
    if metric not in ("ip", "cosine"):
        raise ValueError(f"sq8 supports ip/cosine, got: {metric}")
    q = queries.astype(jnp.float32)
    if metric == "cosine" and normalize_queries:
        q = l2_normalize(q)
    q_codes, q_scale = sq8_quantize(q)

    bsz = min(block_size, n)
    nblocks = cdiv(n, bsz)
    # No pad copy of the corpus (full HBM read+write per call at scale):
    # the ragged tail clamps its start back and masks re-scored rows.
    v = valid.astype(jnp.bool_) if valid is not None else jnp.ones((n,), jnp.bool_)

    num_q = q.shape[0]
    init_s = jnp.full((num_q, k), NEG_INF, dtype=jnp.float32)
    init_i = jnp.full((num_q, k), -1, dtype=jnp.int32)
    blk_iota = lax.broadcasted_iota(jnp.int32, (1, bsz), 1)

    def body(carry, blk):
        top_s, top_i = carry
        start = blk * bsz
        sc = jnp.minimum(start, n - bsz)       # last block overlaps back
        c_blk = lax.dynamic_slice(codes, (sc, 0), (bsz, d))
        s_blk = lax.dynamic_slice(scale, (sc,), (bsz,))
        v_blk = lax.dynamic_slice(v, (sc,), (bsz,))
        s = sq8_block_scores(c_blk, s_blk, q_codes, q_scale)    # [Q, B]
        ids = blk_iota + sc
        keep = jnp.logical_and(v_blk[None, :], ids >= start)
        s = jnp.where(keep, s, NEG_INF)
        blk_ids = jnp.where(keep, ids, -1)
        blk_ids = jnp.broadcast_to(blk_ids, s.shape).astype(jnp.int32)
        return merge_topk(top_s, top_i, s, blk_ids, k), None

    (top_s, top_i), _ = lax.scan(
        body, (init_s, init_i), jnp.arange(nblocks, dtype=jnp.int32)
    )
    top_i = jnp.where(top_s <= NEG_INF, -1, top_i)
    return top_s, top_i


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "recall_target",
                              "normalize_queries")
)
def dense_topk_sq8_approx(
    codes: jnp.ndarray,                   # [N, D] int8
    scale: jnp.ndarray,                   # [N] f32
    queries: jnp.ndarray,                 # [Q, D] f32
    k: int,
    valid: Optional[jnp.ndarray] = None,
    *,
    metric: str = "ip",
    recall_target: float = 0.99,
    normalize_queries: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SQ8 scoring with the TPU-native sort-free `approx_max_k`
    reduction: one int8 MXU matmul materializes [Q, N] scores (4 bytes/
    row/query — fine to ~4M rows), then the approx top-k.  Measured
    faster than the blocked exact scan wherever [Q, N] fits, mirroring
    the bf16 approx path (ops/dense.py dense_topk_approx)."""
    if metric not in ("ip", "cosine"):
        raise ValueError(f"sq8 supports ip/cosine, got: {metric}")
    q = queries.astype(jnp.float32)
    if metric == "cosine" and normalize_queries:
        q = l2_normalize(q)
    q_codes, q_scale = sq8_quantize(q)
    acc = jax.lax.dot_general(
        q_codes, codes, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)                 # [Q, N] i32
    s = acc.astype(jnp.float32) * (q_scale[:, None] * scale[None, :])
    if valid is not None:
        s = jnp.where(valid[None, :].astype(jnp.bool_), s, NEG_INF)
    top_s, top_i = lax.approx_max_k(s, k, recall_target=recall_target)
    top_i = jnp.where(top_s <= NEG_INF, -1, top_i.astype(jnp.int32))
    return top_s, top_i.astype(jnp.int32)


__all__ = [
    "sq8_quantize_host",
    "sq8_quantize",
    "sq8_block_scores",
    "dense_topk_sq8",
    "dense_topk_sq8_approx",
]
