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


def _bm25_kernel(scal_ref, cnt_ref, q_idx_ref, q_w_ref, idx_ref, tf_ref,
                 len_ref, mask_ref, out_ref):
    """One corpus block vs all queries.  scal = [k1, b, avg_len].

    Term-slot-major compute (BACKLOG r1 #1): the [bs, P] block is
    transposed ONCE to [P, bs] so every VPU op runs with the 2048-row
    block on the 128-lane axis — the [bs, 64] orientation pads 64 -> 128
    lanes and wastes half of every tile (measured 29 ms at Q=8/1M vs
    15.4 XLA).  Query term ids/weights live in SMEM, compacted by the
    caller so active terms come first; the per-query term loop is a
    DYNAMIC fori_loop bounded by the real term count, so padded slots
    cost nothing (typical queries fill ~half the padded T).
    Accumulation stays functional (vector registers) — a VMEM scratch
    accumulator serializes on read-modify-write round trips.
    """
    k1 = scal_ref[0]
    b = scal_ref[1]
    avg_len = scal_ref[2]
    idx = idx_ref[:].T                      # [P, bs] relayout, once
    tf = tf_ref[:].astype(jnp.float32).T    # [P, bs]
    dlen = len_ref[:].astype(jnp.float32).T  # [1, bs]

    denom = tf + k1 * (1.0 - b + b * dlen / jnp.maximum(avg_len, 1.0))
    tfw = tf * (k1 + 1.0) / jnp.maximum(denom, 1e-6)
    tfw = jnp.where(idx >= 0, tfw, 0.0)     # [P, bs]

    num_q = out_ref.shape[0]
    for q in range(num_q):                  # static unroll over queries

        def body(t, m, q=q):
            wt = q_w_ref[q, t]
            qt = q_idx_ref[q, t]
            return m + wt * (idx == qt).astype(jnp.float32)

        m = lax.fori_loop(0, cnt_ref[q], body, jnp.zeros_like(tfw))
        out_ref[q, :] = jnp.sum(tfw * m, axis=0) + mask_ref[:, 0]


def _ip_kernel(scal_ref, cnt_ref, q_idx_ref, q_w_ref, idx_ref, tf_ref,
               len_ref, mask_ref, out_ref):
    """Plain inner-product variant (reference hashed-count scoring)."""
    del scal_ref, len_ref
    idx = idx_ref[:].T                      # [P, bs]
    tfw = jnp.where(idx >= 0, tf_ref[:].astype(jnp.float32).T, 0.0)
    num_q = out_ref.shape[0]
    for q in range(num_q):

        def body(t, m, q=q):
            return m + q_w_ref[q, t] * (
                idx == q_idx_ref[q, t]).astype(jnp.float32)

        m = lax.fori_loop(0, cnt_ref[q], body, jnp.zeros_like(tfw))
        out_ref[q, :] = jnp.sum(tfw * m, axis=0) + mask_ref[:, 0]


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
        doc_idx = jnp.pad(doc_idx, ((0, padded - n), (0, 0)), constant_values=-1)
        doc_tf = jnp.pad(doc_tf, ((0, padded - n), (0, 0)))
        doc_len = jnp.pad(doc_len, (0, padded - n))
        v = jnp.pad(v, (0, padded - n))

    num_q = q_idx.shape[0]
    # additive validity mask: 0 for live rows, NEG_INF for masked/pad
    mask_add = jnp.where(v, 0.0, NEG_INF).astype(jnp.float32)[:, None]
    scal = jnp.asarray([k1, b, 0.0], jnp.float32).at[2].set(
        avg_len.astype(jnp.float32))

    # compact active terms to the front so the kernel's dynamic term
    # loop is bounded by the REAL term count, not the padded T
    order = jnp.argsort((q_w == 0.0).astype(jnp.int32), axis=1,
                        stable=True)
    q_idx_c = jnp.take_along_axis(q_idx, order, axis=1)
    q_w_c = jnp.take_along_axis(q_w, order, axis=1)
    q_cnt = jnp.sum((q_w_c != 0.0).astype(jnp.int32), axis=1)

    scores = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # scal [3]
            pl.BlockSpec(memory_space=pltpu.SMEM),               # cnt [Q]
            pl.BlockSpec(memory_space=pltpu.SMEM),               # q_idx
            pl.BlockSpec(memory_space=pltpu.SMEM),               # q_w
            pl.BlockSpec((bs, p), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, p), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, 1), lambda j: (j, 0), memory_space=pltpu.VMEM),
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
    )(scal, q_cnt, q_idx_c, q_w_c, doc_idx, doc_tf,
      doc_len.astype(jnp.float32)[:, None], mask_add)

    if reduce == "approx" and not _interpret():
        top_s, top_i = lax.approx_max_k(scores, k, recall_target=0.99)
        top_i = top_i.astype(jnp.int32)
    else:
        top_s, top_i = lax.top_k(scores, k)
        top_i = top_i.astype(jnp.int32)
    top_i = jnp.where(top_s <= NEG_INF, -1, top_i)
    return top_s, top_i


__all__ = ["sparse_topk_pallas"]
