"""IVF (inverted-file) partitioned ANN: the 10M-chunk-scale dense path.

Replaces Milvus HNSW at scale (reference indexing.py:150-153: M=16,
efConstruction=200, ef=64).  Graph ANN is pointer-chasing — hostile to a
machine built for dense tiles — so the TPU-native equivalent is IVF
(SURVEY.md §7 B1): a k-means coarse quantizer + packed partitions, where
a query scores ``nprobe`` partitions instead of the whole corpus,
cutting HBM traffic by ~nlist/nprobe while matching HNSW-class recall
at equal memory (centroids add <1% overhead; no graph edges needed).

Static-shape layout (XLA-friendly):
- ``centroids [nlist, D]`` f32, trained by jitted Lloyd's iterations;
- ``packed_emb [nlist, cap, D]`` storage dtype — each partition padded
  to the same capacity; rows that overflow a full partition spill into a
  brute-force tail scanned every query (bounded by construction);
- ``packed_rows [nlist, cap]`` i32 original row ids (-1 = pad).

Search = one jitted program: centroid matmul -> top-nprobe -> partition
gather (nprobe row-granular DMAs) -> masked scoring -> top-k, merged
with the tail scan.  Validity/filter masks apply via ``mask[packed_rows]``
so deletes/filters behave identically to the flat path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .dense import NEG_INF, dense_topk, l2_normalize, merge_topk


class IVFPartitions(NamedTuple):
    centroids: jnp.ndarray     # [nlist, D] f32
    packed_emb: jnp.ndarray    # [nlist, cap, D] storage dtype (bf16/f32/int8)
    packed_rows: jnp.ndarray   # [nlist, cap] i32, -1 pad
    tail_emb: jnp.ndarray      # [T, D] overflow rows (brute-forced)
    tail_rows: jnp.ndarray     # [T] i32
    # SQ8 tier (ops/quant.py): per-row dequant scales when packed_emb is
    # int8, else None — partition scoring runs int8 on the MXU and
    # rescales, halving IVF HBM traffic again vs bf16.
    packed_scale: Optional[jnp.ndarray] = None  # [nlist, cap] f32
    tail_scale: Optional[jnp.ndarray] = None    # [T] f32


# -- k-means training -----------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("nlist", "iters", "block"))
def kmeans_fit(
    x: jnp.ndarray,            # [M, D] f32 training sample (normalized ok)
    init: jnp.ndarray,         # [nlist, D] f32 initial centroids
    *,
    nlist: int,
    iters: int = 16,
    block: int = 65536,
) -> jnp.ndarray:
    """Jitted Lloyd's iterations; empty clusters keep their centroid."""
    m, d = x.shape

    def assign(c):
        # blockwise argmax of cosine/IP against centroids
        nb = -(-m // block)
        pad = nb * block - m
        xp = jnp.pad(x, ((0, pad), (0, 0)))

        def body(_, blk):
            xb = lax.dynamic_slice(xp, (blk * block, 0), (block, d))
            s = jnp.dot(xb, c.T, preferred_element_type=jnp.float32)
            return None, jnp.argmax(s, axis=1).astype(jnp.int32)

        _, parts = lax.scan(body, None, jnp.arange(nb, dtype=jnp.int32))
        return parts.reshape(-1)[:m]

    def step(c, _):
        a = assign(c)
        sums = jnp.zeros((nlist, d), jnp.float32).at[a].add(x)
        counts = jnp.zeros((nlist,), jnp.float32).at[a].add(1.0)
        new_c = jnp.where(counts[:, None] > 0,
                          sums / jnp.maximum(counts[:, None], 1.0), c)
        return new_c, None

    c, _ = lax.scan(step, init.astype(jnp.float32), None, length=iters)
    return c


def kmeans_init(x: np.ndarray, nlist: int, seed: int = 0) -> np.ndarray:
    """k-means++-lite init: random distinct points (host-side)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(x.shape[0], size=min(nlist, x.shape[0]), replace=False)
    init = x[idx]
    if init.shape[0] < nlist:  # tiny corpora: tile
        reps = -(-nlist // init.shape[0])
        init = np.tile(init, (reps, 1))[:nlist]
    return init.astype(np.float32)


# -- build ------------------------------------------------------------------------

def build_ivf(
    emb_host: np.ndarray,      # [N, D] f32 (pre-normalized for cosine)
    nlist: int,
    *,
    dtype: str = "bfloat16",
    kmeans_iters: int = 16,
    train_sample: int = 262144,
    capacity_factor: float = 2.0,
    seed: int = 0,
) -> IVFPartitions:
    """Train + pack.  cap = factor * N/nlist; rows beyond a partition's
    capacity spill to the tail (scanned exactly, so recall never drops
    from overflow — only speed does, and factor 2 keeps the tail tiny)."""
    n, d = emb_host.shape
    x = emb_host
    if n > train_sample:
        sel = np.random.default_rng(seed).choice(n, train_sample, replace=False)
        x = emb_host[sel]
    cent = np.asarray(
        kmeans_fit(jnp.asarray(x), jnp.asarray(kmeans_init(x, nlist, seed)),
                   nlist=nlist, iters=kmeans_iters)
    )

    # assign every row on device: running argmax over CENTROID chunks so
    # the [rows, nlist] score matrix never materializes (at 10M x 12640
    # that would be 50 GB)
    c_chunk = min(2048, nlist)
    c_pad = -(-nlist // c_chunk) * c_chunk
    cj = jnp.asarray(np.pad(cent, ((0, c_pad - nlist), (0, 0))))

    @functools.partial(jax.jit, static_argnames=("chunk", "n_real"))
    def _assign_block(xb, cj, chunk, n_real):
        rows = xb.shape[0]
        best_s = jnp.full((rows,), -jnp.inf, jnp.float32)
        best_i = jnp.zeros((rows,), jnp.int32)

        def body(carry, j):
            bs_, bi_ = carry
            cb = lax.dynamic_slice(cj, (j * chunk, 0), (chunk, cj.shape[1]))
            s = jnp.dot(xb, cb.T, preferred_element_type=jnp.float32)
            col = lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + j * chunk
            s = jnp.where(col < n_real, s, -jnp.inf)  # mask padded centroids
            loc = jnp.argmax(s, axis=1).astype(jnp.int32)
            val = jnp.max(s, axis=1)
            better = val > bs_
            return (jnp.where(better, val, bs_),
                    jnp.where(better, loc + j * chunk, bi_)), None

        (best_s, best_i), _ = lax.scan(
            body, (best_s, best_i),
            jnp.arange(cj.shape[0] // chunk, dtype=jnp.int32))
        return best_i

    assign = []
    block = 262144
    for start in range(0, n, block):
        xb = jnp.asarray(emb_host[start : start + block])
        assign.append(np.asarray(_assign_block(xb, cj, c_chunk, nlist)))
    a = np.concatenate(assign)

    # round capacity to the VPU sublane multiple: unaligned [.., cap, D]
    # blocks compile noticeably slower in Mosaic (an early unaligned
    # cap=625 HUNG the kernel compile on the 2025 toolchain), and the
    # XLA gather path tiles better aligned too
    cap = max(8, int(np.ceil(capacity_factor * n / nlist)))
    cap = -(-cap // 8) * 8
    packed_rows = np.full((nlist, cap), -1, np.int32)
    # vectorized packing: sort rows by cluster, position-within-cluster
    # via searchsorted (no Python loop — matters at 10M rows on 1 core)
    order = np.argsort(a, kind="stable").astype(np.int64)
    sorted_c = a[order]
    first = np.searchsorted(sorted_c, np.arange(nlist))
    pos = np.arange(n, dtype=np.int64) - first[sorted_c]
    keep = pos < cap
    packed_rows[sorted_c[keep], pos[keep]] = order[keep].astype(np.int32)
    tail_rows = order[~keep].astype(np.int32)

    gather_rows = np.where(packed_rows >= 0, packed_rows, 0)
    live = (packed_rows >= 0)[:, :, None]
    n_tail = len(tail_rows)

    if dtype == "int8":
        # SQ8 tier: quantize once over original rows, pack codes + scales
        from .quant import sq8_quantize_host

        codes, scale = sq8_quantize_host(emb_host)
        packed_emb = codes[gather_rows.reshape(-1)].reshape(nlist, cap, d)
        packed_emb = np.where(live, packed_emb, np.int8(0))
        packed_scale = scale[gather_rows] * (packed_rows >= 0)
        tail_emb = np.zeros((max(n_tail, 1), d), np.int8)
        tail_scale = np.zeros((max(n_tail, 1),), np.float32)
        if n_tail:
            tail_emb[:n_tail] = codes[tail_rows]
            tail_scale[:n_tail] = scale[tail_rows]
        else:
            tail_rows = np.full(1, -1, np.int32)
        return IVFPartitions(
            centroids=jnp.asarray(cent),
            packed_emb=jax.device_put(packed_emb),
            packed_rows=jnp.asarray(packed_rows),
            tail_emb=jax.device_put(tail_emb),
            tail_rows=jnp.asarray(tail_rows),
            packed_scale=jax.device_put(packed_scale.astype(np.float32)),
            tail_scale=jax.device_put(tail_scale),
        )

    # Convert to the storage dtype ON HOST (ml_dtypes) before device_put:
    # jnp.asarray(f32_array, dtype=bf16) can stage the f32 on device
    # first — a 2x HBM spike that OOMs at the 10M tier.
    import ml_dtypes

    jdt = jnp.dtype(dtype)
    np_dt = (np.dtype(ml_dtypes.bfloat16) if jdt == jnp.bfloat16
             else np.dtype(jdt.name))
    packed_emb = emb_host[gather_rows.reshape(-1)].reshape(nlist, cap, d)
    packed_emb = (packed_emb * live).astype(np_dt)
    tail_emb = np.zeros((max(n_tail, 1), d), np_dt)
    if n_tail:
        tail_emb[:n_tail] = emb_host[tail_rows].astype(np_dt)
    else:
        tail_rows = np.full(1, -1, np.int32)

    return IVFPartitions(
        centroids=jnp.asarray(cent),
        packed_emb=jax.device_put(packed_emb),
        packed_rows=jnp.asarray(packed_rows),
        tail_emb=jax.device_put(tail_emb),
        tail_rows=jnp.asarray(tail_rows),
    )


# -- search -----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def ivf_topk(
    parts: IVFPartitions,
    queries: jnp.ndarray,               # [Q, D] f32 (normalized upstream)
    k: int,
    valid: Optional[jnp.ndarray] = None,  # [N_capacity] bool over ORIGINAL rows
    *,
    nprobe: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked IVF top-k -> (scores [Q, k], original row ids [Q, k])."""
    q = queries.astype(jnp.float32)
    nlist, cap, d = parts.packed_emb.shape
    nprobe = min(nprobe, nlist)  # small shards: never probe past nlist

    c_scores = jnp.dot(q, parts.centroids.T,
                       preferred_element_type=jnp.float32)   # [Q, nlist]
    _, probe = lax.top_k(c_scores, nprobe)                   # [Q, nprobe]

    sq8 = parts.packed_scale is not None
    if sq8:
        from .quant import sq8_quantize

        q_codes, q_scale = sq8_quantize(q)                   # [Q, D] i8, [Q]

    def one_query(qv, probes, qs):
        pe = parts.packed_emb[probes]                        # [nprobe, cap, D]
        pr = parts.packed_rows[probes]                       # [nprobe, cap]
        if sq8:
            acc = jnp.einsum("d,pcd->pc", qv, pe,
                             preferred_element_type=jnp.int32)
            s = acc.astype(jnp.float32) * (qs * parts.packed_scale[probes])
        else:
            s = jnp.einsum("d,pcd->pc", qv, pe.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        ok = pr >= 0
        if valid is not None:
            ok = jnp.logical_and(ok, valid[jnp.clip(pr, 0)])
        s = jnp.where(ok, s, NEG_INF)
        flat_s = s.reshape(-1)
        flat_r = jnp.where(ok, pr, -1).reshape(-1)
        kq = min(k, flat_s.shape[0])  # tiny corpora: nprobe*cap < k
        top_s, sel = lax.top_k(flat_s, kq)
        top_s = jnp.pad(top_s, (0, k - kq), constant_values=NEG_INF)
        top_r = jnp.pad(flat_r[sel], (0, k - kq), constant_values=-1)
        return top_s, top_r

    top_s, top_i = jax.vmap(one_query)(
        q_codes if sq8 else q, probe,
        q_scale if sq8 else jnp.zeros((q.shape[0],), jnp.float32))

    # exact tail merge (overflow rows)
    if sq8:
        acc = jax.lax.dot_general(
            q_codes, parts.tail_emb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        ts = acc.astype(jnp.float32) * (
            q_scale[:, None] * parts.tail_scale[None, :])    # [Q, T]
    else:
        ts = jnp.dot(q, parts.tail_emb.T.astype(jnp.float32),
                     preferred_element_type=jnp.float32)     # [Q, T]
    ok = parts.tail_rows >= 0
    if valid is not None:
        ok = jnp.logical_and(ok, valid[jnp.clip(parts.tail_rows, 0)])
    ts = jnp.where(ok[None, :], ts, NEG_INF)
    kk = min(k, parts.tail_emb.shape[0])
    tail_s, sel = lax.top_k(ts, kk)
    tail_i = jnp.where(tail_s <= NEG_INF, -1,
                       parts.tail_rows[sel])
    top_s, top_i = merge_topk(top_s, top_i, tail_s, tail_i, k)
    top_i = jnp.where(top_s <= NEG_INF, -1, top_i)
    return top_s, top_i


def auto_nlist(n: int, factor: float = 1.0) -> int:
    """nlist ~ factor * sqrt(N), rounded to a multiple of 8.

    sqrt-scale lists + tuned nprobe is the measured recall/latency
    frontier (factor 4 over-fragmented the 10M tier: recall@10 0.65 at
    nprobe=64 — see utils/constants.py IVF_NLIST_FACTOR)."""
    raw = int(factor * np.sqrt(max(n, 1)))
    return max(8, (raw // 8) * 8)


def tune_nprobe(
    parts: IVFPartitions,
    queries: np.ndarray,          # [S, D] held-out sample (normalized upstream)
    oracle_ids: np.ndarray,       # [S, k] exact top-k row ids (from dense_topk)
    *,
    recall_target: float = 0.95,
    k: int = 10,
    max_nprobe: int = 0,          # 0 -> nlist (full probe)
) -> Tuple[int, float]:
    """Pick the smallest nprobe meeting a recall@k target (BACKLOG #11).

    The ANN analogue of tuning HNSW ``ef`` for a recall goal (reference
    ships fixed ef=64 — retrieval.py:93-96; Milvus users sweep it by
    hand).  Doubles nprobe from 1 until mean overlap@k vs the exact
    oracle reaches the target; returns (nprobe, achieved_recall).
    Host-driven sweep of one jitted program per step — a build-time
    cost, measured in seconds even at the 10M tier.
    """
    nlist = parts.centroids.shape[0]
    hi = min(max_nprobe or nlist, nlist)
    q = jnp.asarray(queries, jnp.float32)
    oracle_sets = [set(row[row >= 0].tolist()) for row in np.asarray(oracle_ids)]

    def recall_at(npb: int) -> float:
        _, ids = ivf_topk(parts, q, k, nprobe=npb)
        ids = np.asarray(ids)
        hits = [len(set(r[r >= 0].tolist()) & o) / max(len(o), 1)
                for r, o in zip(ids, oracle_sets)]
        return float(np.mean(hits))

    npb, best = 1, 0.0
    while npb < hi:
        best = recall_at(npb)
        if best >= recall_target:
            return npb, best
        npb *= 2
    return hi, recall_at(hi)


__all__ = ["IVFPartitions", "build_ivf", "ivf_topk", "kmeans_fit",
           "kmeans_init", "auto_nlist", "tune_nprobe"]
