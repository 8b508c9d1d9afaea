"""Pallas dense-scan kernels: HBM-roofline brute-force scoring.

The XLA blocked scan (ops/dense.py dense_topk) measured ~425 GB/s of
the v5e's ~819 GB/s at 10M x 384 bf16 (docs/PERF.md): the per-block
top-k merge between matmuls serializes against the next block's HBM
read.  Here the kernel does ONLY the matmul — Mosaic double-buffers
the corpus block DMA against the previous block's MXU work, so the
scan runs at streaming speed — and the (cheap) top-k reduction runs
once over the materialized [Q, N] scores outside the kernel
(`lax.approx_max_k`, the TPU-native sort-free reduction).

Score-buffer cost: writing+reading [Q, N] f32 adds 8*Q bytes/row of
traffic vs the corpus read's 2*D bytes/row — at D=384, Q=8 that is
~4% overhead, the price of keeping the kernel a pure streaming matmul.

Variants: bf16/f32 rows (`dense_scores_pallas`) and SQ8 int8 rows +
per-row scale (`dense_scores_sq8_pallas`).  Both stream an optional
validity mask as an additive NEG_INF bias.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dense import NEG_INF, cdiv, l2_normalize


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _matmul_kernel(q_ref, emb_ref, mask_ref, out_ref):
    """scores[Q, bs] = q @ block.T + mask (NEG_INF on dead rows).

    The MXU's native input dtype is bf16 — an f32xf32 matmul runs at a
    fraction of peak, so for bf16 corpora the f32 queries are split
    q = q_hi + q_lo into two bf16 operands and the two partial matmuls
    accumulate in f32: full f32-query precision at bf16 MXU rates
    (the corpus side is already bf16, so no precision is lost there).
    """
    e = emb_ref[:]                                   # [bs, D]
    if e.dtype == jnp.bfloat16:
        q = q_ref[:]
        q_hi = q.astype(jnp.bfloat16)
        q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        s = (jnp.dot(q_hi, e.T, preferred_element_type=jnp.float32)
             + jnp.dot(q_lo, e.T, preferred_element_type=jnp.float32))
    else:
        s = jnp.dot(q_ref[:], e.astype(jnp.float32).T,
                    preferred_element_type=jnp.float32)
    out_ref[:] = s + mask_ref[0, :]


def _matmul_sq8_kernel(q_ref, emb_ref, scale_ref, mask_ref, out_ref):
    """SQ8 rows x quantized queries, per-row scale + mask.

    Both operands are integer-valued (|v| <= 127) — exactly
    representable in bf16, and each product (<= 127^2) accumulates
    exactly in the MXU's f32 accumulator, so feeding the MXU bf16 is
    BIT-IDENTICAL to the f32 dot for D <= 1024 while running at full
    MXU rate instead of the decomposed-f32 rate.
    """
    e = emb_ref[:]                                   # [bs, D] int8
    s = jnp.dot(q_ref[:].astype(jnp.bfloat16), e.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32)
    out_ref[:] = s * scale_ref[0, :] + mask_ref[0, :]


def _scores(kernel, operands, num_q, n, bs, extra_specs):
    nb = cdiv(n, bs)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((num_q, operands[0].shape[1]),
                         lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, operands[0].shape[1]),
                         lambda j: (j, 0), memory_space=pltpu.VMEM),
            *extra_specs,
            pl.BlockSpec((1, bs), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_q, bs), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_q, nb * bs), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*operands)


def _pad_rows(arr, padded, value=0):
    n = arr.shape[0]
    if padded == n:
        return arr
    pad = [(0, padded - n)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, pad, constant_values=value)


def _pick_bs(n: int, row_bytes: int, requested: int) -> int:
    """Block size for the streaming scan.

    Prefer the LARGEST divisor of ``n`` that is lane-aligned (%128 —
    the mask/scale blocks are laid out (1, bs)) and fits the VMEM
    budget — a divisor means ``_pad_rows`` on the corpus is a no-op.
    A non-divisor block forces jnp.pad to copy the whole corpus every
    call (a full HBM read+write: ~19 ms at 10M x 384 bf16, measured).
    Falls back to ``requested`` (pad path) only when n has no aligned
    divisor >= 1024.
    """
    if n <= requested:
        return max(n, 1)
    cap = min(max(requested, 8192) * 4, 16 * 1024 * 1024 // row_bytes)
    cap -= cap % 128
    for d in range(cap, 1023, -128):
        if n % d == 0:
            return d
    return min(requested, n)


def _mask_add(valid, n, padded):
    v = (valid.astype(jnp.bool_) if valid is not None
         else jnp.ones((n,), jnp.bool_))
    v = _pad_rows(v, padded, False)
    return jnp.where(v, 0.0, NEG_INF).astype(jnp.float32)[None, :]


def _reduce(scores, n, k, reduce):
    # NO slice to [:, :n]: slicing materializes the [Q, padded] score
    # buffer and breaks XLA's fusion of the reduction into the scan
    # (measured 37 -> 14 ms at 10M x 384).  Padded rows carry the
    # additive NEG_INF mask, so the reduction can run over the full
    # padded width; any pad id that still surfaces maps to -1 below.
    if reduce == "approx" and not _interpret():
        top_s, top_i = lax.approx_max_k(scores, k, recall_target=0.99)
    else:
        top_s, top_i = lax.top_k(scores, k)
    top_i = top_i.astype(jnp.int32)
    top_i = jnp.where((top_s <= NEG_INF) | (top_i >= n), -1, top_i)
    return top_s, top_i


@functools.partial(jax.jit, static_argnames=(
    "k", "metric", "block_size", "normalize_queries", "reduce"))
def dense_topk_pallas(
    emb: jnp.ndarray,                    # [N, D] bf16/f32
    queries: jnp.ndarray,                # [Q, D] f32
    k: int,
    valid: Optional[jnp.ndarray] = None,
    *,
    metric: str = "ip",
    block_size: int = 8192,
    normalize_queries: bool = True,
    reduce: str = "approx",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as ops.dense.dense_topk (ip/cosine path)."""
    n, d = emb.shape
    q = queries.astype(jnp.float32)
    if metric not in ("ip", "cosine"):
        raise ValueError(f"unsupported metric for pallas scan: {metric}")
    if metric == "cosine" and normalize_queries:
        q = l2_normalize(q)
    bs = _pick_bs(n, d * emb.dtype.itemsize, block_size)
    padded = cdiv(n, bs) * bs
    scores = _scores(
        _matmul_kernel,
        [q, _pad_rows(emb, padded), _mask_add(valid, n, padded)],
        q.shape[0], padded, bs, [])
    return _reduce(scores, n, k, reduce)


@functools.partial(jax.jit, static_argnames=(
    "k", "metric", "block_size", "normalize_queries", "reduce"))
def dense_topk_sq8_pallas(
    codes: jnp.ndarray,                  # [N, D] int8
    scale: jnp.ndarray,                  # [N] f32
    queries: jnp.ndarray,                # [Q, D] f32
    k: int,
    valid: Optional[jnp.ndarray] = None,
    *,
    metric: str = "ip",
    block_size: int = 8192,
    normalize_queries: bool = True,
    reduce: str = "approx",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as ops.quant.dense_topk_sq8 (approx candidates —
    quantized q like the XLA path so scores match bit-for-bit)."""
    from .quant import sq8_quantize

    n, d = codes.shape
    q = queries.astype(jnp.float32)
    if metric == "cosine" and normalize_queries:
        q = l2_normalize(q)
    q_codes, q_scale = sq8_quantize(q)
    bs = _pick_bs(n, d, block_size)
    padded = cdiv(n, bs) * bs
    scale_specs = [pl.BlockSpec((1, bs), lambda j: (0, j),
                                memory_space=pltpu.VMEM)]
    scores = _scores(
        _matmul_sq8_kernel,
        [q_codes.astype(jnp.float32), _pad_rows(codes, padded),
         _pad_rows(scale, padded)[None, :],
         _mask_add(valid, n, padded)],
        q.shape[0], padded, bs, scale_specs)
    # q_scale > 0 per query, so scaling is rank-preserving: reduce the
    # raw scores first, scale only the [Q, k] winners — scaling the full
    # [Q, padded] buffer would materialize 4*Q bytes/row of extra HBM
    # traffic between the scan and the reduction.
    top_s, top_i = _reduce(scores, n, k, reduce)
    top_s = jnp.where(top_s <= NEG_INF, top_s, top_s * q_scale[:, None])
    return top_s, top_i


__all__ = ["dense_topk_pallas", "dense_topk_sq8_pallas"]
