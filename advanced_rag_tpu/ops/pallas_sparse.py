"""Pallas BM25 scoring kernel: one HBM pass, VMEM-resident compares.

The XLA version of the gather-free compare kernel (ops/sparse.py)
re-streams the corpus term arrays once per query-term accumulation
step (~T passes -> ~16 GB of HBM traffic at 1M x 64nnz x T=32,
measured 18-24 ms on v5e).  This kernel loads each corpus block into
VMEM ONCE and runs all Q x T compare+FMA steps against the resident
block, so HBM traffic is exactly one read of (doc_idx, doc_tf, doc_len)
— the speed-of-light for this scoring — plus a [Q, N] score write.

Layout per grid step j (corpus block of ``bs`` rows):
  idx [bs, P] i32, tf [bs, P] f32, len [bs, 1] f32   (VMEM, streamed)
  q_idx [Q, T] i32, q_w [Q, T] f32                   (VMEM, replicated)
  k1/b/avg_len                                        (SMEM scalars)
  out [Q, bs] f32                                     (VMEM, streamed out)

Top-k over the materialized [Q, N] scores happens outside the kernel
(exact `lax.top_k` or TPU-native `lax.approx_max_k`).

Falls back to interpreter mode off-TPU so the same tests run on the
virtual CPU mesh (pallas_guide.md: `interpret=True`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dense import NEG_INF, cdiv
from .sparse import idf_weights


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bm25_kernel(scal_ref, q_idx_ref, q_w_ref, idx_ref, tf_ref, len_ref,
                 mask_ref, out_ref):
    """One corpus block vs all queries.  scal = [k1, b, avg_len].

    Term-slot-major layout (BACKLOG r1 #1): blocks arrive PRE-TRANSPOSED
    as [P, bs], so every VPU op runs with the 2048-row block axis on the
    128 lanes — the [bs, 64] orientation padded 64 -> 128 lanes and
    wasted half of every tile (measured 29 ms at Q=8/1M vs 15.4 XLA).
    The transpose happens OUTSIDE the kernel (stored/one-shot XLA
    relayout): in-kernel relayouts and dynamic trip-count loops both
    hung the Mosaic pipeline on this toolchain, so the kernel body
    keeps the proven static-unroll structure.
    """
    k1 = scal_ref[0]
    b = scal_ref[1]
    avg_len = scal_ref[2]
    idx = idx_ref[:]                        # [P, bs] i32 (pre-transposed)
    tf = tf_ref[:].astype(jnp.float32)      # [P, bs]
    dlen = len_ref[:].astype(jnp.float32)   # [1, bs]

    denom = tf + k1 * (1.0 - b + b * dlen / jnp.maximum(avg_len, 1.0))
    tfw = tf * (k1 + 1.0) / jnp.maximum(denom, 1e-6)
    tfw = jnp.where(idx >= 0, tfw, 0.0)     # [P, bs]

    num_q, t_terms = q_idx_ref.shape
    for q in range(num_q):                  # static unroll
        m = jnp.zeros_like(tfw)
        for t in range(t_terms):            # static unroll, VMEM-resident
            qt = q_idx_ref[q, t]
            wt = q_w_ref[q, t]
            m = m + wt * (idx == qt).astype(jnp.float32)
        out_ref[q, :] = jnp.sum(tfw * m, axis=0) + mask_ref[0, :]


def _ip_kernel(scal_ref, q_idx_ref, q_w_ref, idx_ref, tf_ref, len_ref,
               mask_ref, out_ref):
    """Plain inner-product variant (reference hashed-count scoring)."""
    del scal_ref, len_ref
    idx = idx_ref[:]                        # [P, bs] (pre-transposed)
    tfw = jnp.where(idx >= 0, tf_ref[:].astype(jnp.float32), 0.0)
    num_q, t_terms = q_idx_ref.shape
    for q in range(num_q):
        m = jnp.zeros_like(tfw)
        for t in range(t_terms):
            m = m + q_w_ref[q, t] * (idx == q_idx_ref[q, t]).astype(jnp.float32)
        out_ref[q, :] = jnp.sum(tfw * m, axis=0) + mask_ref[0, :]


@functools.partial(
    jax.jit,
    static_argnames=("k", "scoring", "k1", "b", "block_size", "reduce"),
)
def sparse_topk_pallas(
    doc_idx: jnp.ndarray,   # [N, P] i32 (-1 pad)
    doc_tf: jnp.ndarray,    # [N, P] f32
    doc_len: jnp.ndarray,   # [N] f32
    df: jnp.ndarray,        # [V]
    n_docs: jnp.ndarray,    # scalar
    q_idx: jnp.ndarray,     # [Q, T] i32 (-1 pad)
    q_tf: jnp.ndarray,      # [Q, T] f32
    k: int,
    valid: Optional[jnp.ndarray] = None,
    avg_len: Optional[jnp.ndarray] = None,
    doc_idx_t: Optional[jnp.ndarray] = None,   # [P, N] stored T-layout
    doc_tf_t: Optional[jnp.ndarray] = None,    # [P, N]
    *,
    scoring: str = "bm25",
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = 2048,
    reduce: str = "exact",   # "exact" lax.top_k | "approx" lax.approx_max_k
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.sparse.sparse_topk (same contract)."""
    n, p = doc_idx.shape
    if n == 0:
        raise ValueError("sparse_topk_pallas: empty corpus")
    v = valid.astype(jnp.bool_) if valid is not None else jnp.ones((n,), jnp.bool_)
    if avg_len is None:
        avg_len = jnp.sum(
            jnp.where(v, doc_len.astype(jnp.float32), 0.0)
        ) / jnp.maximum(jnp.sum(v.astype(jnp.float32)), 1.0)

    if scoring == "bm25":
        q_w = q_tf.astype(jnp.float32) * jnp.where(
            q_idx >= 0, idf_weights(df, n_docs)[jnp.clip(q_idx, 0)], 0.0)
        kernel = _bm25_kernel
    elif scoring == "ip":
        q_w = jnp.where(q_idx >= 0, q_tf.astype(jnp.float32), 0.0)
        kernel = _ip_kernel
    else:
        raise ValueError(f"unknown scoring: {scoring}")

    bs = min(block_size, n)
    nb = cdiv(n, bs)
    padded = nb * bs
    if padded != n:
        doc_len = jnp.pad(doc_len, (0, padded - n))
        v = jnp.pad(v, (0, padded - n))
        if doc_idx_t is not None:
            doc_idx_t = jnp.pad(doc_idx_t, ((0, 0), (0, padded - n)),
                                constant_values=-1)
            doc_tf_t = jnp.pad(doc_tf_t, ((0, 0), (0, padded - n)))
        else:
            doc_idx = jnp.pad(doc_idx, ((0, padded - n), (0, 0)),
                              constant_values=-1)
            doc_tf = jnp.pad(doc_tf, ((0, padded - n), (0, 0)))

    num_q = q_idx.shape[0]
    # additive validity mask: 0 for live rows, NEG_INF for masked/pad
    mask_add = jnp.where(v, 0.0, NEG_INF).astype(jnp.float32)[None, :]
    scal = jnp.asarray([k1, b, 0.0], jnp.float32).at[2].set(
        avg_len.astype(jnp.float32))

    # term-slot-major relayout [N, P] -> [P, N]: one XLA transpose per
    # call (cheap at the <postings-threshold corpus sizes this rung
    # serves; SparseIndex passes stored T-layout mirrors at steady state)
    if doc_idx_t is None:
        doc_idx_t = doc_idx.T
    if doc_tf_t is None:
        doc_tf_t = doc_tf.T

    scores = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # scal [3]
            pl.BlockSpec((num_q, q_idx.shape[1]),
                         lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_q, q_idx.shape[1]),
                         lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, bs), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, bs), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_q, bs), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_q, padded), jnp.float32),
        # The consumer top-k tempts XLA into VMEM-placing the [Q, N]
        # score buffer; at Q=8 x 1M that trips the default 16 MB scoped
        # limit (observed +12 KB over).  v5e has 128 MB VMEM — raise it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(scal, q_idx, q_w, doc_idx_t, doc_tf_t,
      doc_len.astype(jnp.float32)[None, :], mask_add)

    if reduce == "approx" and not _interpret():
        top_s, top_i = lax.approx_max_k(scores, k, recall_target=0.99)
        top_i = top_i.astype(jnp.int32)
    else:
        top_s, top_i = lax.top_k(scores, k)
        top_i = top_i.astype(jnp.int32)
    top_i = jnp.where(top_s <= NEG_INF, -1, top_i)
    return top_s, top_i


__all__ = ["sparse_topk_pallas"]
