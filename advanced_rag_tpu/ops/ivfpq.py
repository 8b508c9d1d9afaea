"""IVF-PQ: coarse k-means partitions + product-quantized RESIDUALS.

The top rung of the dense capacity ladder (bf16 -> SQ8 -> flat PQ ->
IVF-PQ), replacing the Milvus ``IVF_PQ`` index type (reference exposes
index types at indexing.py:62-77).  Two multiplicative wins over flat
PQ (ops/pq.py):

- **nprobe-bounded query cost.**  Flat PQ reads every code each query
  (~14 GB/query-batch at 150M rows).  Here a query scores ``nprobe`` of
  ``nlist`` partitions — HBM traffic drops by ~nlist/nprobe on top of
  the 16x code compression.
- **Residual encoding recall** (BACKLOG capability #5).  Codes quantize
  ``r = x - centroid[assign(x)]`` instead of ``x``.  Residual norms are
  a fraction of vector norms on clustered corpora, so the same 1
  bit/dim spends its resolution on the part of the vector the coarse
  quantizer didn't already explain — measured on the adversarial
  1024-cluster synthetic: candidate recall@10 (depth 320) 0.44 flat ->
  0.9+ residual.

Score decomposition is exact for inner product (and cosine with rows
pre-normalized upstream):

    q . x  =  q . c_p  +  q . r        (x in partition p)

so per query the program computes one centroid matmul (already needed
for probe selection) plus an ADC over the probed partitions' codes.
The ADC is the same gather-free formulation as ops/pq.py — a sum over
the c=16 code values of (codes == ci) masks times LUT slices, all VPU
compares and reductions on contiguous tiles; no per-code gathers, no
one-hot ever materialized in HBM.

Streaming appends stay in the same geometry: new rows are assigned +
residual-encoded on device (``ivfpq_encode_tail``) into a flat tail
(codes + partition assignment) scored by the same ADC every query, so
append cost is O(batch) and the index never degrades to a float tail —
steady-state memory stays ~m bytes/row end to end.  A maintenance
rebuild (index/manager.py) re-packs the tail into partitions.

Layout (all static shapes):
- centroids   [nlist, D] f32
- codebooks   [m, c, dsub] f32     (residual codebooks, shared)
- packed_codes[nlist, cap, m] i8   (cap = factor * N/nlist, -1-row pad)
- packed_rows [nlist, cap] i32
- tail_codes  [Tcap, m] i8, tail_rows [Tcap] i32, tail_assign [Tcap] i32
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .dense import NEG_INF, merge_topk
from .ivf import kmeans_fit, kmeans_init
from .pq import PQCodebook, _pq_kmeans, auto_pq_m


class IVFPQIndex(NamedTuple):
    centroids: jnp.ndarray      # [nlist, D] f32
    codebooks: jnp.ndarray      # [m, c, dsub] f32 residual codebooks
    packed_codes: jnp.ndarray   # [nlist, cap, m] int8
    packed_rows: jnp.ndarray    # [nlist, cap] i32, -1 = pad
    tail_codes: jnp.ndarray     # [Tcap, m] int8 (appended rows)
    tail_rows: jnp.ndarray      # [Tcap] i32, -1 = free slot
    tail_assign: jnp.ndarray    # [Tcap] i32 partition of each tail row


# -- fused assign + residual encode ------------------------------------------


@functools.partial(jax.jit, static_argnames=("c_chunk",))
def _assign_encode_block(
    xb: jnp.ndarray,            # [B, D] float
    centroids: jnp.ndarray,     # [nlist_pad, D] f32 (NEG_INF-masked pad)
    codebooks: jnp.ndarray,     # [m, c, dsub] f32
    nlist: int,                 # real centroid count (traced ok)
    *,
    c_chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (assign [B] i32, codes [B, m] i8).  Running argmax over
    centroid chunks (never materializes [B, nlist]), then nearest
    residual sub-centroids via the same small einsum as ops/pq.py."""
    b, d = xb.shape
    m, c, dsub = codebooks.shape
    x = xb.astype(jnp.float32)

    best_s = jnp.full((b,), -jnp.inf, jnp.float32)
    best_i = jnp.zeros((b,), jnp.int32)

    def body(carry, j):
        bs_, bi_ = carry
        cb = lax.dynamic_slice(centroids, (j * c_chunk, 0), (c_chunk, d))
        s = jnp.dot(x, cb.T, preferred_element_type=jnp.float32)
        col = lax.broadcasted_iota(jnp.int32, (1, c_chunk), 1) + j * c_chunk
        s = jnp.where(col < nlist, s, -jnp.inf)
        loc = jnp.argmax(s, axis=1).astype(jnp.int32)
        val = jnp.max(s, axis=1)
        better = val > bs_
        return (jnp.where(better, val, bs_),
                jnp.where(better, loc + j * c_chunk, bi_)), None

    (best_s, best_i), _ = lax.scan(
        body, (best_s, best_i),
        jnp.arange(centroids.shape[0] // c_chunk, dtype=jnp.int32))

    r = x - centroids[best_i]                              # [B, D]
    rs = r.reshape(b, m, dsub)
    s = jnp.einsum("bmd,mcd->bmc", rs, codebooks,
                   preferred_element_type=jnp.float32)
    s = s - 0.5 * jnp.sum(codebooks * codebooks, axis=-1)[None]
    return best_i, jnp.argmax(s, axis=-1).astype(jnp.int8)


def _pad_centroids(cent: np.ndarray, c_chunk: int) -> np.ndarray:
    nlist = cent.shape[0]
    c_pad = -(-nlist // c_chunk) * c_chunk
    return np.pad(cent, ((0, c_pad - nlist), (0, 0)))


# -- build -------------------------------------------------------------------


def build_ivfpq(
    emb_host: np.ndarray,       # [N, D] f32 (pre-normalized for cosine)
    nlist: int,
    *,
    m: int = 0,
    bits: int = 4,
    kmeans_iters: int = 16,
    pq_iters: int = 12,
    train_sample: int = 262144,
    capacity_factor: float = 2.0,
    tail_capacity: int = 8192,
    seed: int = 0,
    centroids: Optional[np.ndarray] = None,     # skip coarse training
    codebooks: Optional[jnp.ndarray] = None,    # skip residual training
) -> IVFPQIndex:
    """Coarse k-means -> residual PQ codebooks -> device-side encode ->
    partition packing.  Rows past a partition's cap land in the tail
    (residual-coded, ADC-scanned every query) so recall never drops from
    overflow.  Pass ``centroids``/``codebooks`` to re-pack with fixed
    quantizers (checkpoint restore: codes stay comparable, no k-means)."""
    n, d = emb_host.shape
    m = m or auto_pq_m(d, bits)
    if d % m:
        raise ValueError(f"dim {d} not divisible by pq_m {m}")
    c = 1 << bits
    rng = np.random.default_rng(seed)

    x = emb_host
    if n > train_sample:
        sel = rng.choice(n, train_sample, replace=False)
        x = emb_host[sel]
    if centroids is not None:
        cent = np.asarray(centroids, np.float32)
        nlist = cent.shape[0]
    else:
        cent = np.asarray(
            kmeans_fit(jnp.asarray(x),
                       jnp.asarray(kmeans_init(x, nlist, seed)),
                       nlist=nlist, iters=kmeans_iters))

    c_chunk = min(2048, max(8, nlist))
    cent_pad = jnp.asarray(_pad_centroids(cent, c_chunk))

    if codebooks is None:
        # residual codebooks: train on the sample's residuals (device
        # assign, host residual slice — the sample is small by design)
        s_assign, _ = _assign_encode_block(
            jnp.asarray(x), cent_pad,
            jnp.zeros((m, c, d // m), jnp.float32), nlist, c_chunk=c_chunk)
        res = x - cent[np.asarray(s_assign)]
        sub = np.ascontiguousarray(
            res.reshape(res.shape[0], m, d // m).transpose(1, 0, 2))
        pick = rng.choice(sub.shape[1], size=min(c, sub.shape[1]),
                          replace=False)
        init = sub[:, pick]
        if init.shape[1] < c:
            reps = -(-c // init.shape[1])
            init = np.tile(init, (1, reps, 1))[:, :c]
        codebooks = _pq_kmeans(jnp.asarray(sub), jnp.asarray(init),
                               c=c, iters=pq_iters)
    else:
        codebooks = jnp.asarray(codebooks, jnp.float32)

    # assign + encode every row (device, blockwise; downloads are the
    # small code/assign arrays — ~100 B/row over the host tunnel)
    assign = np.zeros((n,), np.int32)
    codes = np.zeros((n, m), np.int8)
    block = 262144
    for start in range(0, n, block):
        xb = jnp.asarray(emb_host[start:start + block])
        a_b, c_b = _assign_encode_block(xb, cent_pad, codebooks, nlist,
                                        c_chunk=c_chunk)
        assign[start:start + block] = np.asarray(a_b)
        codes[start:start + block] = np.asarray(c_b)

    # vectorized packing (same scheme as ops/ivf.py build_ivf)
    cap = max(8, int(np.ceil(capacity_factor * n / nlist)))
    packed_rows = np.full((nlist, cap), -1, np.int32)
    order = np.argsort(assign, kind="stable").astype(np.int64)
    sorted_c = assign[order]
    first = np.searchsorted(sorted_c, np.arange(nlist))
    pos = np.arange(n, dtype=np.int64) - first[sorted_c]
    keep = pos < cap
    packed_rows[sorted_c[keep], pos[keep]] = order[keep].astype(np.int32)
    over = order[~keep].astype(np.int32)

    gather = np.where(packed_rows >= 0, packed_rows, 0)
    packed_codes = codes[gather.reshape(-1)].reshape(nlist, cap, m)
    packed_codes[packed_rows < 0] = 0

    t_cap = max(tail_capacity, 1 << max(int(len(over)) - 1, 0).bit_length())
    tail_codes = np.zeros((t_cap, m), np.int8)
    tail_rows = np.full((t_cap,), -1, np.int32)
    tail_assign = np.zeros((t_cap,), np.int32)
    if len(over):
        tail_codes[: len(over)] = codes[over]
        tail_rows[: len(over)] = over
        tail_assign[: len(over)] = assign[over]

    return IVFPQIndex(
        centroids=jnp.asarray(cent),
        codebooks=codebooks,
        packed_codes=jax.device_put(packed_codes),
        packed_rows=jnp.asarray(packed_rows),
        tail_codes=jax.device_put(tail_codes),
        tail_rows=jnp.asarray(tail_rows),
        tail_assign=jnp.asarray(tail_assign),
    )


# -- streaming appends -------------------------------------------------------


def ivfpq_append_tail(
    idx: IVFPQIndex,
    vectors: jnp.ndarray,        # [B, D] float on device (pre-normalized)
    row_ids: jnp.ndarray,        # [B] i32 original row ids
    tail_fill: int,              # current tail occupancy (host-tracked)
) -> IVFPQIndex:
    """Assign + residual-encode a batch on device and scatter it into
    the tail at ``tail_fill`` (grows by pow2 re-allocation when full).
    Returns the updated index; caller tracks ``tail_fill + B``."""
    b = vectors.shape[0]
    t_cap = idx.tail_codes.shape[0]
    need = tail_fill + b
    if need > t_cap:
        new_cap = t_cap
        while new_cap < need:
            new_cap *= 2
        idx = idx._replace(
            tail_codes=jnp.pad(idx.tail_codes, ((0, new_cap - t_cap), (0, 0))),
            tail_rows=jnp.pad(idx.tail_rows, (0, new_cap - t_cap),
                              constant_values=-1),
            tail_assign=jnp.pad(idx.tail_assign, (0, new_cap - t_cap)),
        )
    nlist, d = idx.centroids.shape
    c_chunk = min(2048, max(8, nlist))
    c_pad = -(-nlist // c_chunk) * c_chunk
    cent_pad = jnp.pad(idx.centroids, ((0, c_pad - nlist), (0, 0)))
    a_b, c_b = _assign_encode_block(vectors, cent_pad, idx.codebooks, nlist,
                                    c_chunk=c_chunk)
    return idx._replace(
        tail_codes=lax.dynamic_update_slice(idx.tail_codes, c_b,
                                            (tail_fill, 0)),
        tail_rows=lax.dynamic_update_slice(idx.tail_rows,
                                           row_ids.astype(jnp.int32),
                                           (tail_fill,)),
        tail_assign=lax.dynamic_update_slice(idx.tail_assign, a_b,
                                             (tail_fill,)),
    )


# -- search ------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "m", "bits"))
def ivfpq_topk(
    idx: IVFPQIndex,
    queries: jnp.ndarray,                 # [Q, D] f32 (normalized upstream)
    k: int,
    valid: Optional[jnp.ndarray] = None,  # [N_capacity] bool, original rows
    *,
    nprobe: int = 32,
    m: int,
    bits: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked IVF-PQ top-k -> (scores [Q, k], original row ids [Q, k]).

    score = q.centroid[p] + ADC(q-residual LUT, codes) — exact IP
    decomposition; the ADC is the unrolled (codes == ci) masked-sum, no
    gathers.  Tail rows (streaming appends) go through the identical
    ADC with their own partition term, then merge."""
    q = queries.astype(jnp.float32)
    nq = q.shape[0]
    nlist, cap, _ = idx.packed_codes.shape
    c = 1 << bits
    dsub = idx.codebooks.shape[-1]

    c_scores = jnp.dot(q, idx.centroids.T,
                       preferred_element_type=jnp.float32)    # [Q, nlist]
    nprobe = min(nprobe, nlist)
    probe_s, probe = lax.top_k(c_scores, nprobe)              # [Q, nprobe]

    # residual LUTs [Q, m, c]
    q_sub = q.reshape(nq, m, dsub)
    lut = jnp.einsum("qmd,mcd->qmc", q_sub, idx.codebooks,
                     preferred_element_type=jnp.float32)

    def one_query(probes_1, probe_s_1, lut_1):
        pc = idx.packed_codes[probes_1]                       # [nprobe, cap, m]
        pr = idx.packed_rows[probes_1]                        # [nprobe, cap]
        acc = jnp.zeros((nprobe, cap), jnp.float32)
        for ci in range(c):                                   # static unroll
            mask_ci = (pc == ci).astype(jnp.bfloat16)         # [np, cap, m]
            acc = acc + jnp.einsum(
                "pcm,m->pc", mask_ci, lut_1[:, ci].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
        s = acc + probe_s_1[:, None]                          # + q.centroid
        ok = pr >= 0
        if valid is not None:
            ok = jnp.logical_and(ok, valid[jnp.clip(pr, 0)])
        s = jnp.where(ok, s, NEG_INF)
        flat_s = s.reshape(-1)
        flat_r = jnp.where(ok, pr, -1).reshape(-1)
        kq = min(k, flat_s.shape[0])
        top_s, sel = lax.top_k(flat_s, kq)
        top_s = jnp.pad(top_s, (0, k - kq), constant_values=NEG_INF)
        top_r = jnp.pad(flat_r[sel], (0, k - kq), constant_values=-1)
        return top_s, top_r

    top_s, top_i = jax.vmap(one_query)(probe, probe_s, lut)

    # tail: identical ADC over the flat appended codes (all queries at
    # once — [Q, Tcap] fits; Tcap is maintenance-bounded)
    t_cap = idx.tail_codes.shape[0]
    acc = jnp.zeros((nq, t_cap), jnp.float32)
    for ci in range(c):
        mask_ci = (idx.tail_codes == ci).astype(jnp.bfloat16)  # [Tcap, m]
        acc = acc + jax.lax.dot_general(
            lut[:, :, ci].astype(jnp.bfloat16), mask_ci,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    ts = acc + jnp.take_along_axis(
        c_scores, jnp.clip(idx.tail_assign, 0)[None, :].repeat(nq, 0), axis=1)
    ok = idx.tail_rows >= 0
    if valid is not None:
        ok = jnp.logical_and(ok, valid[jnp.clip(idx.tail_rows, 0)])
    ts = jnp.where(ok[None, :], ts, NEG_INF)
    kk = min(k, t_cap)
    tail_s, sel = lax.top_k(ts, kk)
    tail_i = jnp.where(tail_s <= NEG_INF, -1, idx.tail_rows[sel])
    if kk < k:
        tail_s = jnp.pad(tail_s, ((0, 0), (0, k - kk)),
                         constant_values=float(NEG_INF))
        tail_i = jnp.pad(tail_i, ((0, 0), (0, k - kk)), constant_values=-1)
    top_s, top_i = merge_topk(top_s, top_i, tail_s, tail_i, k)
    top_i = jnp.where(top_s <= NEG_INF, -1, top_i)
    return top_s, top_i


def ivfpq_codebook(idx: IVFPQIndex, *, bits: int) -> PQCodebook:
    """View the residual codebooks as a PQCodebook (for decode paths)."""
    return PQCodebook(codebooks=idx.codebooks,
                      m=int(idx.codebooks.shape[0]), bits=bits)


__all__ = [
    "IVFPQIndex",
    "build_ivfpq",
    "ivfpq_append_tail",
    "ivfpq_topk",
    "ivfpq_codebook",
]
