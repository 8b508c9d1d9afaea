"""Fused hybrid retrieval: dense + sparse + RRF + MMR in ONE program.

The reference fans out per-index searches with `asyncio.gather`
(retrieval.py:293-306), then fuses and diversifies on the CPU
(retrieval.py:421-516).  On TPU every dispatch has fixed host->device
cost (measured ~28 ms over the axon tunnel — more than the entire
compute), so the whole query path is one jitted program: masked dense
top-k, masked BM25 top-k, weighted RRF with dedup, candidate-embedding
gather, and greedy MMR, with XLA overlapping the dense scan and the
sparse gather.  One dispatch, one result.

Conventions: candidate ids are CorpusStore rows, -1 = padding;
scores NEG_INF = absent, matching ops/dense.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .dense import NEG_INF, dense_topk
from .fusion import mmr_select, rrf_fuse
from .sparse import sparse_topk


class HybridResult(NamedTuple):
    ids: jnp.ndarray            # [Q, k_out] i32 final ranked rows (-1 pad)
    scores: jnp.ndarray         # [Q, k_out] f32 fused RRF scores
    method_counts: jnp.ndarray  # [Q, k_out] i32 how many indexes hit each id
    dense_ids: jnp.ndarray      # [Q, dense_depth] per-index candidates
    dense_scores: jnp.ndarray   # (depth > k_cand when the PQ tier over-
    sparse_ids: jnp.ndarray     #  retrieves for host exact refinement)
    sparse_scores: jnp.ndarray
    domain_ids: jnp.ndarray     # [Q, k_cand] (-1-filled when no domain)
    domain_scores: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=(
        "k_cand", "k_out", "metric", "scoring", "rrf_k", "use_mmr",
        "dense_block_size", "sparse_block_size", "enable_sparse",
        "dense_impl", "sparse_impl", "sparse_agg", "nprobe",
        "ivf_tail_start",
        "ivf_tail_pad", "pq_m", "pq_bits", "pq_impl", "dense_depth",
    ),
)
def hybrid_retrieve(
    # dense index
    emb: jnp.ndarray,           # [N, D] storage dtype (pre-normalized if cosine)
    # sparse index (pass zeros-shaped dummies when enable_sparse=False)
    doc_idx: jnp.ndarray,       # [N, P] i32
    doc_tf: jnp.ndarray,        # [N, P] f32
    doc_len: jnp.ndarray,       # [N] f32
    df: jnp.ndarray,            # [V]
    n_docs: jnp.ndarray,        # scalar
    # query
    q_dense: jnp.ndarray,       # [Q, D] f32 (normalized upstream if cosine)
    q_idx: jnp.ndarray,         # [Q, T] i32
    q_tf: jnp.ndarray,          # [Q, T] f32
    # row mask (validity AND compiled filters)
    valid: Optional[jnp.ndarray],
    # fusion knobs
    weights: jnp.ndarray,       # [M] f32: (dense, sparse[, domain])
    mmr_lambda: jnp.ndarray,    # scalar f32
    # optional third family: domain embeddings (HNSW domain collection
    # equivalent, reference indexing.py:169-177) — both or neither.
    domain_emb: Optional[jnp.ndarray] = None,   # [N, Dd]
    q_domain: Optional[jnp.ndarray] = None,     # [Q, Dd]
    # inverted postings layout (required when sparse_impl="postings")
    post_rows: Optional[jnp.ndarray] = None,    # [V, L]
    post_tf: Optional[jnp.ndarray] = None,      # [V, L]
    # precomputed BM25 tf-weights (ops/postings.py postings_tf_weights)
    # — removes the per-posting doc_len gather from the sparse stage
    post_tfw: Optional[jnp.ndarray] = None,     # [V, L]
    # SQ8 tier (ops/quant.py): per-row dequant scales when emb is int8
    # codes (required when dense_impl="sq8")
    emb_scale: Optional[jnp.ndarray] = None,    # [N] f32
    # PQ tier (ops/pq.py): codebooks when emb holds PQ codes [N, m]
    # (required when dense_impl="pq"; pq_m/pq_bits are static)
    pq_codebooks: Optional[jnp.ndarray] = None,  # [m, c, dsub] f32
    # IVF partitions (required when dense_impl="ivf"); rows appended
    # since the build form an exact-scan tail at
    # emb[ivf_tail_start : ivf_tail_start + ivf_tail_pad]
    ivf_parts=None,                              # ops.ivf.IVFPartitions
    *,
    k_cand: int,                # per-index over-retrieval (2x top_k, retrieval.py:351)
    k_out: int,
    metric: str = "ip",
    scoring: str = "bm25",
    rrf_k: int = 60,
    use_mmr: bool = True,
    enable_sparse: bool = True,
    dense_block_size: int = 65536,
    sparse_block_size: int = 8192,
    dense_impl: str = "scan",    # "scan" | "approx" | "sq8" | "ivf" | "pq"
    sparse_impl: str = "xla",    # "xla" compare-scan | "pallas" VMEM kernel
    sparse_agg: str = "sort",    # postings aggregation: "sort"|"scatter"
    nprobe: int = 32,            # IVF probes (dense_impl="ivf")
    ivf_tail_start: int = 0,     # first appended-tail row (static)
    ivf_tail_pad: int = 0,       # pow2-padded tail length; 0 = no tail
    pq_m: int = 0,               # PQ geometry (dense_impl="pq")
    pq_bits: int = 4,
    pq_impl: str = "pallas",
    # dense over-retrieve depth for host exact refinement (0 = k_cand):
    # the dense rung retrieves `dense_depth` candidates (returned in
    # dense_ids/dense_scores); fusion in-program still consumes the top
    # k_cand.  The PQ tier uses this to fetch deep raw-rank candidates
    # which the manager exactly re-scores from the f32 mirror and then
    # re-fuses host-side (BACKLOG #2).
    dense_depth: int = 0,
) -> HybridResult:
    """One-dispatch hybrid search (reference call stack 3.2 collapsed).

    Replaces: parallel index fan-out + `_fuse_results` RRF k=60
    (retrieval.py:421-491) + `_mmr_diversify` (:493-516) — MMR here uses
    embedding cosine instead of token Jaccard (better and MXU-friendly).

    impl knobs (measured at 1M x 384 on v5e): dense "approx" halves the
    dense stage (7 -> 3.6 ms) by materializing [Q, N] scores and using
    the TPU-native sort-free approx_max_k at recall_target 0.99; sparse
    "pallas" keeps corpus blocks VMEM-resident across query terms
    (ops/pallas_sparse.py) instead of re-streaming HBM per term.
    """
    depth = max(dense_depth, k_cand)
    if dense_impl == "ivf":
        # partitioned ANN (the 10M-tier path) inside the fused program;
        # appended-tail rows are exact-scanned and merged, identical to
        # DenseIndex.search (streaming-ingest contract).
        from .dense import merge_topk
        from .ivf import ivf_topk

        d_s, d_i = ivf_topk(ivf_parts, q_dense, depth, valid,
                            nprobe=nprobe)
        if ivf_tail_pad:
            t_emb = jax.lax.dynamic_slice_in_dim(
                emb, ivf_tail_start, ivf_tail_pad, axis=0)
            t_mask = (jax.lax.dynamic_slice_in_dim(
                valid, ivf_tail_start, ivf_tail_pad, axis=0)
                if valid is not None
                else jnp.ones((ivf_tail_pad,), jnp.bool_))
            kk = min(depth, ivf_tail_pad)
            if emb_scale is not None:
                from .quant import dense_topk_sq8

                t_scale = jax.lax.dynamic_slice_in_dim(
                    emb_scale, ivf_tail_start, ivf_tail_pad, axis=0)
                ts, ti = dense_topk_sq8(t_emb, t_scale, q_dense, kk, t_mask,
                                        metric="ip", normalize_queries=False)
            else:
                ts, ti = dense_topk(t_emb, q_dense, kk, t_mask,
                                    metric=metric, normalize_queries=False)
            ti = jnp.where(ti >= 0, ti + ivf_tail_start, -1)
            if kk < depth:
                ts = jnp.pad(ts, ((0, 0), (0, depth - kk)),
                             constant_values=float(NEG_INF))
                ti = jnp.pad(ti, ((0, 0), (0, depth - kk)),
                             constant_values=-1)
            d_s, d_i = merge_topk(d_s, d_i, ts, ti, depth)
            d_i = jnp.where(d_s <= NEG_INF, -1, d_i)
    elif dense_impl == "pq":
        # product-quantized codes (the ~250M-rows/chip tier): one-hot
        # matmul ADC scan, Pallas VMEM kernel on real TPUs
        from .pq import pq_topk

        d_s, d_i = pq_topk(
            pq_codebooks, emb, q_dense, depth, valid,
            m=pq_m, bits=pq_bits, impl=pq_impl,
        )
    elif dense_impl == "sq8":
        import jax as _jax

        # approx_max_k over the fused int8 matmul is the fastest rung at
        # every measured size — 732 GB/s at 1M, 740 GB/s (90% of the
        # v5e's HBM peak) at 10M under true device timing (scanned_ms);
        # the Pallas streaming kernel is within 10% and the blocked
        # exact scan runs at ~242 GB/s.  (An earlier round wired Pallas
        # here from chained-dispatch timings that hid a ~4.5 ms/call
        # tunnel floor — see utils/timing.py.)  The score transient is
        # [Q, N] f32; cap it at ~4 GB on TPU (CPU keeps the small cap),
        # falling back to the memory-bounded blocked scan beyond.
        q_n = max(int(q_dense.shape[0]), 1)
        cap_rows = ((4_000_000_000 // (4 * q_n))
                    if _jax.default_backend() == "tpu" else 4_194_304)
        if emb.shape[0] <= cap_rows:
            from .quant import dense_topk_sq8_approx

            d_s, d_i = dense_topk_sq8_approx(
                emb, emb_scale, q_dense, depth, valid,
                metric="ip", normalize_queries=False,
            )
        else:
            from .quant import dense_topk_sq8

            d_s, d_i = dense_topk_sq8(
                emb, emb_scale, q_dense, depth, valid,
                metric="ip",  # cosine rows pre-normalized upstream
                normalize_queries=False,
            )
    elif dense_impl == "approx":
        from .dense import dense_topk_approx

        d_s, d_i = dense_topk_approx(
            emb, q_dense, depth, valid, metric=metric, recall_target=0.99,
        )
    else:
        d_s, d_i = dense_topk(
            emb, q_dense, depth, valid,
            metric=metric, block_size=dense_block_size, normalize_queries=False,
        )
    methods_i = [d_i[:, :k_cand]]
    if enable_sparse:
        if sparse_impl == "postings":
            from .postings import postings_topk

            s_s, s_i = postings_topk(
                post_rows, post_tf, doc_len, df, n_docs, q_idx, q_tf,
                k_cand, valid[: doc_len.shape[0]] if valid is not None
                else None, post_tfw=post_tfw, scoring=scoring,
                impl=sparse_agg,
            )
        elif sparse_impl == "pallas":
            from .pallas_sparse import sparse_topk_pallas

            s_s, s_i = sparse_topk_pallas(
                doc_idx, doc_tf, doc_len, df, n_docs, q_idx, q_tf, k_cand,
                valid, scoring=scoring, reduce="approx",
            )
        else:
            s_s, s_i = sparse_topk(
                doc_idx, doc_tf, doc_len, df, n_docs, q_idx, q_tf, k_cand,
                valid, scoring=scoring, block_size=sparse_block_size,
            )
        methods_i.append(s_i)
    else:
        s_s = jnp.full((d_s.shape[0], k_cand), NEG_INF, d_s.dtype)
        s_i = jnp.full((d_i.shape[0], k_cand), -1, d_i.dtype)
    if domain_emb is not None and q_domain is not None:
        dom_s, dom_i = dense_topk(
            domain_emb, q_domain, k_cand, valid,
            metric=metric, block_size=dense_block_size, normalize_queries=False,
        )
        methods_i.append(dom_i)
    else:
        dom_s = jnp.full((d_s.shape[0], k_cand), NEG_INF, d_s.dtype)
        dom_i = jnp.full((d_i.shape[0], k_cand), -1, d_i.dtype)
    cand_ids = jnp.stack(methods_i, axis=0)                  # [M, Q, K]
    w = weights[: len(methods_i)]

    # Fuse over the full candidate pool; MMR then SELECTS k_out diverse
    # results from the k_cand-deep pool (reference fuses all candidates,
    # then diversifies down to final_k — retrieval.py:421-516).
    fused_s, fused_i, counts = rrf_fuse(cand_ids, w, rrf_k=rrf_k, k_out=k_cand)

    if use_mmr:
        # Gather pool embeddings for cosine-MMR; -1 ids clipped to row 0
        # but masked invalid so they are never selected.
        safe = jnp.clip(fused_i, 0)
        if dense_impl == "pq":
            # reconstruct candidates from their PQ codes (tiny gather)
            from .pq import PQCodebook, pq_decode

            cand_emb = pq_decode(
                PQCodebook(codebooks=pq_codebooks, m=pq_m, bits=pq_bits),
                emb[safe],
            )                                                # [Q, k_cand, D]
        else:
            cand_emb = emb[safe].astype(jnp.float32)         # [Q, k_cand, D]
        if emb_scale is not None:  # dequantize SQ8 codes for cosine-MMR
            cand_emb = cand_emb * emb_scale[safe][..., None]
        ok = fused_i >= 0

        def per_query(ce, rel, okq, lam):
            return mmr_select(ce, rel, k_out, lam, okq)      # [k_out] positions

        pos = jax.vmap(per_query, in_axes=(0, 0, 0, None))(
            cand_emb, fused_s, ok, mmr_lambda
        )
        sel_ok = pos >= 0
        safe_pos = jnp.clip(pos, 0)
        out_i = jnp.where(sel_ok, jnp.take_along_axis(fused_i, safe_pos, 1), -1)
        out_s = jnp.where(sel_ok, jnp.take_along_axis(fused_s, safe_pos, 1),
                          NEG_INF)
        out_c = jnp.where(sel_ok, jnp.take_along_axis(counts, safe_pos, 1), 0)
    else:
        out_i = fused_i[:, :k_out]
        out_s = fused_s[:, :k_out]
        out_c = counts[:, :k_out]

    return HybridResult(out_i, out_s, out_c, d_i, d_s, s_i, s_s,
                        dom_i, dom_s)


__all__ = ["hybrid_retrieve", "HybridResult"]
