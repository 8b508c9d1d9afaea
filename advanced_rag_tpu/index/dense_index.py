"""Dense vector index: device-resident embedding matrix + jitted search.

Replaces the Milvus HNSW semantic/domain collections (reference
indexing.py:143-262).  The index IS the array: ``emb[capacity, D]`` in
HBM (bf16 by default), appended with `dynamic_update_slice`, searched by
``ops.dense.dense_topk`` (exact) or the IVF path (ops/ivf.py) once the
corpus outgrows brute force.  Rows align 1:1 with CorpusStore rows; the
store's validity/filter masks plug straight into the masked top-k.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IndexConfig, Metric
from ..ops.dense import dense_topk, l2_normalize
from .corpus import next_pow2, pad_rows_pow2


def _to_host_dtype(arr: np.ndarray, jdt: jnp.dtype) -> np.ndarray:
    """Convert to the storage dtype ON HOST before device_put —
    jnp.asarray(f32, dtype=bf16) can stage the f32 on device first,
    a 2x HBM spike that OOMs at the 10M-row tier."""
    if jdt == jnp.bfloat16:
        import ml_dtypes

        return arr.astype(ml_dtypes.bfloat16)
    return arr.astype(np.dtype(jdt.name))


class DenseIndex:
    """One embedding family (semantic or domain)."""

    def __init__(self, config: IndexConfig):
        self.config = config
        self.dim = config.dim
        self.capacity = int(config.min_capacity)
        self.size = 0
        # SQ8 tier (ops/quant.py): int8 codes + per-row f32 scales instead
        # of a float matrix — 2x bf16 capacity/speed, ~30M rows/chip.
        self._sq8 = config.dtype == "int8"
        # PQ tier (ops/pq.py): product-quantized codes, ~250M rows/chip.
        # Pre-build the index stores bf16 like the default tier; build_pq()
        # trains codebooks and swaps storage to codes (IVF-style staged
        # build); appends after that encode with the fixed codebooks.
        self._pq_mode = config.dtype == "pq"
        self._pq = None            # ops.pq.PQCodebook once built
        self._pq_rot = None        # OPQ rotation [D, D] (config.pq_opq)
        # IVF-PQ (ops/ivfpq.py): coarse partitions + residual codes on
        # top of PQ mode — nprobe-bounded scans + residual recall
        self._ivfpq = None
        self._ivfpq_size = 0       # rows covered by the last build
        self._ivfpq_fill = 0       # occupied tail slots
        self._dtype = jnp.dtype(
            jnp.int8 if self._sq8
            else (jnp.bfloat16 if self._pq_mode else config.dtype))
        self.emb = jnp.zeros((self.capacity, self.dim), dtype=self._dtype)
        self.emb_scale = (jnp.zeros((self.capacity,), jnp.float32)
                          if self._sq8 else None)
        # numpy mirror (f32) for exact growth/persistence and IVF builds
        self._host = np.zeros((self.capacity, self.dim), dtype=np.float32)
        self._ivf = None  # built lazily by ops/ivf.py when configured

    def _prepare(self, vectors: np.ndarray, *,
                 pre_normalized: bool = False) -> np.ndarray:
        v = np.asarray(vectors, dtype=np.float32)
        if v.ndim != 2 or v.shape[1] != self.dim:
            raise ValueError(f"expected [N, {self.dim}] vectors, got {v.shape}")
        if self.config.metric == Metric.COSINE and not pre_normalized:
            # store normalized -> search reduces to inner product
            norms = np.linalg.norm(v, axis=1, keepdims=True)
            v = v / np.maximum(norms, 1e-12)
        return v

    def _ensure_capacity(self, needed: int) -> None:
        if needed <= self.capacity:
            return
        new_cap = self.capacity
        while new_cap < needed:
            new_cap *= 2
        grown = np.zeros((new_cap, self.dim), dtype=np.float32)
        grown[: self.capacity] = self._host
        self._host = grown
        self.capacity = new_cap
        if self._pq is not None:
            self._pq_reencode_all()
        elif self._sq8:
            from ..ops.quant import sq8_quantize_host

            codes, scale = sq8_quantize_host(grown[: self.size])
            full_c = np.zeros((new_cap, self.dim), np.int8)
            full_c[: self.size] = codes
            full_s = np.zeros((new_cap,), np.float32)
            full_s[: self.size] = scale
            self.emb = jax.device_put(full_c)
            self.emb_scale = jax.device_put(full_s)
        else:
            self.emb = jax.device_put(_to_host_dtype(grown, self._dtype))

    def prepare_append(self, start: int, vectors: np.ndarray, *,
                       pre_normalized: bool = False):
        """Host half of an append (mirror write, capacity growth, padded
        device values) — see CorpusStore.prepare_append for the fused
        protocol.  Returns dev_vals or None when vectors is empty."""
        v = self._prepare(vectors, pre_normalized=pre_normalized)
        n = v.shape[0]
        if n == 0:
            return None
        self._ensure_capacity(start + next_pow2(n))
        self._host[start : start + n] = v
        if self._pq is not None or self._ivfpq is not None:
            import ml_dtypes

            # upload bf16 once; codes/residuals are computed on device
            # (they never cross the host tunnel); pow2-padded rows encode
            # garbage but land beyond `size` and are overwritten by the
            # next append
            dev_v = jnp.asarray(pad_rows_pow2(v).astype(ml_dtypes.bfloat16))
            if self._pq is not None:
                from ..ops.pq import pq_encode_device

                vals = {"emb": pq_encode_device(dev_v, self._pq.codebooks,
                                                self._pq_rot)}
            else:
                # IVF-PQ without flat-PQ codebooks (build_ivfpq was called
                # directly): `emb` is still the bf16 staging matrix — keep
                # it current so maintenance rebuilds / exact refines work
                vals = {"emb": dev_v.astype(self._dtype)}
            if self._ivfpq is not None:
                # residual-encode into the IVF-PQ tail on device too —
                # this must run whenever _ivfpq exists (NOT only when the
                # flat-PQ codebooks do), else streamed appends would be
                # invisible to search until the tail-fraction rebuild
                from ..ops.ivfpq import ivfpq_append_tail

                rows = jnp.arange(start, start + n, dtype=jnp.int32)
                self._ivfpq = ivfpq_append_tail(
                    self._ivfpq, dev_v[:n], rows, self._ivfpq_fill)
                self._ivfpq_fill += n
        elif self._sq8:
            from ..ops.quant import sq8_quantize

            # quantize on device: upload f32 once, codes/scales never
            # exist on the host (the host CPU is burst-throttled — every
            # avoided full-array pass matters at bulk-import sizes)
            dev_v = jax.device_put(v)
            codes, scale = sq8_quantize(dev_v)
            pad = next_pow2(n) - n
            vals = {
                "emb": jnp.pad(codes, ((0, pad), (0, 0))),
                "emb_scale": jnp.pad(scale, (0, pad)),
            }
        else:
            # pad + dtype-cast on device for the same reason (the batch-
            # sized f32 staging spike is fine; only the full-matrix
            # restore path needs the host-side cast of _to_host_dtype)
            dev_v = jax.device_put(v)
            pad = next_pow2(n) - n
            vals = {"emb": jnp.pad(dev_v, ((0, pad), (0, 0))).astype(
                self._dtype)}
        self.size = max(self.size, start + n)
        return vals

    def device_arrays(self):
        d = {"emb": self.emb}
        if self._sq8:
            d["emb_scale"] = self.emb_scale
        return d

    def commit_device(self, updated) -> None:
        self.emb = updated["emb"]
        if self._sq8:
            self.emb_scale = updated["emb_scale"]

    def append(self, start: int, vectors: np.ndarray, *,
               pre_normalized: bool = False) -> None:
        """Write vectors at rows [start, start+N) — row ids come from the
        CorpusStore so every index family stays aligned."""
        from .corpus import fused_append

        vals = self.prepare_append(start, vectors,
                                   pre_normalized=pre_normalized)
        if vals is None:
            return
        self.commit_device(
            fused_append(self.device_arrays(), jnp.int32(start), vals))
        # Streaming ingest (SURVEY.md §7 hard part 5): the quantizer
        # stays valid for the segment it was built over; appended rows
        # form an exact-scan tail merged at query time.  Rebuild when
        # the tail outgrows REBUILD_TAIL_FRACTION (stats expose it).

    def bulk_load(self, vectors: np.ndarray, *,
                  pre_normalized: bool = False) -> int:
        """Engine-level bulk import (BACKLOG: throttled-host imports).

        Appends ``vectors`` at row ``self.size`` and returns the start
        row.  ``pre_normalized=True`` skips the host normalize pass —
        with device-side pad/cast/quantize in prepare_append, the only
        remaining host work is the mirror memcpy, so a multi-GB import
        costs one host pass instead of four.  Embedding dumps are
        normally already unit-norm; pass False (default) to normalize.

        NOTE: rows appended here must stay aligned with the CorpusStore
        when used under MultiIndexManager — use the manager's ingest for
        text corpora; this is the raw-embedding path."""
        start = self.size
        # pre_normalized is threaded through as an explicit parameter
        # (never instance state): a concurrent append on the same index
        # must not observe another call's skip-normalize decision
        self.append(start, vectors, pre_normalized=pre_normalized)
        return start

    @property
    def search_metric(self) -> str:
        # cosine is pre-normalized at append -> ip at query time, with
        # queries normalized in-op.
        return "ip" if self.config.metric == Metric.COSINE else self.config.metric.value

    def build_ivf(self, nlist: int = 0, *, train_sample: int = 262144,
                  seed: int = 0) -> None:
        """Train the coarse quantizer and pack partitions (ops/ivf.py).

        Call after bulk ingest; appends invalidate it (search falls back
        to the exact scan until rebuilt).  Replaces Milvus HNSW build
        at efConstruction=200 (reference indexing.py:150-153)."""
        from ..ops.ivf import auto_nlist, build_ivf
        from ..utils.constants import IndexConstants

        if self.size == 0:
            raise ValueError("cannot build IVF over an empty index")
        if self._pq_mode:
            # PQ tier: "IVF" means the residual IVF-PQ structure
            self.build_ivfpq(nlist, train_sample=train_sample, seed=seed)
            return
        nlist = nlist or self.config.nlist or auto_nlist(
            self.size, IndexConstants.IVF_NLIST_FACTOR)
        nlist = min(nlist, self.size)
        self._ivf = build_ivf(
            self._host[: self.size], nlist,
            dtype=self.config.dtype,
            kmeans_iters=self.config.kmeans_iters,
            train_sample=train_sample,
            seed=seed,
        )
        self._ivf_size = self.size

    def build_ivfpq(self, nlist: int = 0, *, train_sample: int = 262144,
                    seed: int = 0, centroids: Optional[np.ndarray] = None,
                    codebooks: Optional[jnp.ndarray] = None) -> None:
        """Coarse partitions + PQ-coded RESIDUALS (ops/ivfpq.py): the
        nprobe-bounded search tier on top of dtype="pq".  Passing
        ``centroids``/``codebooks`` skips training (checkpoint restore
        re-packs with the persisted quantizers)."""
        from ..ops.ivf import auto_nlist
        from ..ops.ivfpq import build_ivfpq
        from ..utils.constants import IndexConstants

        if self.size == 0:
            raise ValueError("cannot build IVF-PQ over an empty index")
        if not self._pq_mode:
            raise ValueError('build_ivfpq requires dtype="pq"')
        if self._pq_rot is not None:
            raise ValueError(
                "OPQ (pq_opq) applies to the flat-PQ tier only — IVF-PQ "
                "residuals are near-isotropic and rotate-invariant")
        nlist = nlist or self.config.nlist or auto_nlist(
            self.size, IndexConstants.IVF_NLIST_FACTOR)
        nlist = min(nlist, self.size)
        self._ivfpq = build_ivfpq(
            self._host[: self.size], nlist,
            m=self.config.pq_m, bits=self.config.pq_bits,
            kmeans_iters=self.config.kmeans_iters,
            train_sample=train_sample, seed=seed,
            centroids=centroids, codebooks=codebooks,
        )
        self._ivfpq_size = self.size
        self._ivfpq_fill = int(np.sum(np.asarray(self._ivfpq.tail_rows) >= 0))

    @property
    def has_ivfpq(self) -> bool:
        return self._ivfpq is not None

    def build_pq(self, m: int = 0, bits: int = 0, *,
                 train_sample: int = 65536, seed: int = 0) -> None:
        """Train PQ codebooks on the host mirror and swap device storage
        from bf16 rows to codes (ops/pq.py — the >100M-rows/chip tier).

        Build-then-swap like build_ivf: searches keep using the float
        path until the final assignment; appends afterwards encode with
        the fixed codebooks (no tail — codes are always current)."""
        from ..ops.pq import pq_encode_device, pq_train

        if self.size == 0:
            raise ValueError("cannot build PQ over an empty index")
        if not self._pq_mode:
            raise ValueError('build_pq requires dtype="pq"')
        if self.config.pq_opq:
            from ..ops.pq import opq_train

            rot, pq = opq_train(
                self._host[: self.size],
                m or self.config.pq_m,
                bits or self.config.pq_bits,
                train_sample=train_sample,
                seed=seed,
            )
            self._pq_rot = rot
        else:
            pq = pq_train(
                self._host[: self.size],
                m or self.config.pq_m,
                bits or self.config.pq_bits,
                train_sample=train_sample,
                seed=seed,
            )
        # The staged bf16 matrix is already in HBM: encode the whole
        # capacity on device — no host transfers at all (OPQ rotation
        # applies per block inside the encode).  Rows past `size`
        # encode garbage codes; the search path masks them.
        codes = pq_encode_device(self.emb, pq.codebooks, self._pq_rot)
        self.emb, self._pq = codes, pq  # swap last (build-then-swap)

    def _pq_reencode_all(self) -> None:
        """Re-encode the full f32 mirror after growth/restore: one bf16
        upload, device-side encode (the codes never cross the tunnel)."""
        import ml_dtypes

        from ..ops.pq import pq_encode_device

        staged = jax.device_put(self._host.astype(ml_dtypes.bfloat16))
        self.emb = pq_encode_device(staged, self._pq.codebooks,
                                    self._pq_rot)

    @property
    def has_pq(self) -> bool:
        return self._pq is not None

    def tune_nprobe(self, recall_target: float = 0.95, *, k: int = 10,
                    sample: int = 64, seed: int = 0,
                    queries: Optional[np.ndarray] = None
                    ) -> Tuple[int, float]:
        """Auto-pick ``config.nprobe`` for a recall@k target by sweeping
        against an exact-scan oracle (BACKLOG #11; the recall-driven
        analogue of hand-tuning HNSW ef).  Returns (nprobe,
        achieved_recall) and updates the config.

        ``queries``: held-out REAL queries [S, D] (normalized).  Pass
        them when available: stored rows used as self-queries have
        their neighbors concentrated in their own partition, so a
        self-tuned nprobe under-delivers on off-corpus queries —
        measured 0.95 self vs 0.79 eval recall on a realistic manifold
        where query embeddings (summaries) sit off the doc cluster
        cores.  Falls back to sampled stored rows otherwise."""
        from ..ops.ivf import tune_nprobe as _tune

        if self._ivf is None and self._ivfpq is None:
            raise ValueError("tune_nprobe requires a built IVF index")
        if queries is not None:
            q = np.asarray(queries, np.float32)[:max(sample, 1)]
        else:
            rng = np.random.default_rng(seed)
            rows = rng.integers(0, self.size, size=min(sample, self.size))
            q = self._host[rows]  # stored (normalized) vectors as queries
        if self._ivfpq is not None:
            return self._tune_nprobe_ivfpq(q, recall_target, k)
        bound = jnp.arange(self.capacity) < self.size
        if self._sq8:
            from ..ops.quant import dense_topk_sq8

            _, oracle = dense_topk_sq8(self.emb, self.emb_scale,
                                       jnp.asarray(q), k, bound,
                                       metric="ip", normalize_queries=False)
        else:
            _, oracle = dense_topk(self.emb, jnp.asarray(q), k, bound,
                                   metric=self.search_metric,
                                   normalize_queries=False)
        npb, rec = _tune(self._ivf, q, np.asarray(oracle),
                         recall_target=recall_target, k=k)
        self.config.nprobe = npb
        return npb, rec

    def _tune_nprobe_ivfpq(self, q: np.ndarray, recall_target: float,
                           k: int) -> Tuple[int, float]:
        """Doubling sweep for the IVF-PQ tier.  The oracle is the exact
        f32 top-k brute-forced from the host mirror (cheap: [Q, size]
        host matmul; a full-probe device ADC pass was tried first but
        its vmapped [Q, nlist, cap, m] masked-sum transient OOMs HBM at
        ~100k rows x 1536 dims).

        Recall is measured at the tier's OPERATING POINT — does the
        refine-depth candidate set at this nprobe contain the true
        top-k — not on raw ADC ranks (whose quantization shuffle the
        downstream exact refinement erases anyway)."""
        from ..ops.ivfpq import ivfpq_topk

        idx = self._ivfpq
        nlist = int(idx.centroids.shape[0])
        m = int(idx.codebooks.shape[0])
        bits = self.config.pq_bits
        qj = jnp.asarray(q, jnp.float32)
        refine = int(self.config.refine_factor) or 32
        depth = int(min(max(k * max(refine, 1), k), self.size, 1024))
        host_scores = np.asarray(q, np.float32) @ self._host[:self.size].T
        oracle = np.argsort(-host_scores, axis=1, kind="stable")[:, :k]
        oracle_sets = [set(r[r >= 0].tolist()) for r in np.asarray(oracle)]

        def recall_at(npb: int) -> float:
            # 8-query chunks: the ADC's per-color mask transient is
            # [Q, nprobe, cap, m] bf16 — at full probe the whole-sample
            # call compiled to a 17 GB program temp on v5e (observed
            # OOM at 100k x 384); chunking bounds it to Q=8
            hits = []
            for s0 in range(0, qj.shape[0], 8):
                _, ids = ivfpq_topk(idx, qj[s0:s0 + 8], depth,
                                    nprobe=npb, m=m, bits=bits)
                ids = np.asarray(ids)
                hits += [
                    len(set(r[r >= 0].tolist()) & o) / max(len(o), 1)
                    for r, o in zip(ids, oracle_sets[s0:s0 + 8])]
            return float(np.mean(hits))

        npb, best = 1, 0.0
        while npb < nlist:
            best = recall_at(npb)
            if best >= recall_target:
                break
            npb *= 2
        else:
            npb, best = nlist, recall_at(nlist)
        self.config.nprobe = npb
        return npb, best

    #: appended-tail fraction beyond which a rebuild is recommended
    REBUILD_TAIL_FRACTION = 0.2

    @property
    def has_ivf(self) -> bool:
        return self._ivf is not None

    @property
    def ivf_tail_rows(self) -> int:
        """Rows appended since the quantizer was built (scanned via the
        exact tail for IVF, the residual-coded tail for IVF-PQ)."""
        if self._ivf is not None:
            return self.size - getattr(self, "_ivf_size", 0)
        if self._ivfpq is not None:
            return self.size - self._ivfpq_size
        return 0

    @property
    def ivf_needs_rebuild(self) -> bool:
        return ((self._ivf is not None or self._ivfpq is not None)
                and self.size > 0
                and self.ivf_tail_rows / self.size > self.REBUILD_TAIL_FRACTION)

    def search(
        self,
        queries: np.ndarray | jnp.ndarray,   # [Q, D]
        k: int,
        mask: Optional[jnp.ndarray] = None,  # [capacity] bool (valid+filters)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Masked top-k -> (scores [Q, k] f32, rows [Q, k] i32).

        Uses the IVF path when built (nprobe from config), exact scan
        otherwise — same result contract either way.  Quantized tiers
        (int8) with ``config.refine_factor > 1`` over-retrieve with the
        codes, then exactly re-score survivors from the f32 host mirror
        (BACKLOG #2) — final scores are exact at zero steady-state HBM
        cost."""
        q = jnp.asarray(queries, dtype=jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.config.metric == Metric.COSINE:
            q = l2_normalize(q)
        if mask is None:
            # rows in [size, capacity) are padding (zero codes score 0.0
            # on the int8 paths, garbage on pq) — they must never
            # surface as results; computed from traced `size` so no
            # recompile per append
            mask = jnp.arange(self.capacity) < self.size
        pq_tier = self._pq is not None or self._ivfpq is not None
        quantized = self._sq8 or pq_tier
        refine = int(self.config.refine_factor) if quantized else 1
        if refine == 0:  # auto: deep for PQ (1 bit/dim), shallow for SQ8
            refine = 32 if pq_tier else 2
        if refine > 1 and self.size > 0:
            # bound by CAPACITY (stable pow2), not size — a size bound
            # would recompile the jitted search on every append while
            # the corpus is small; missing rows just pad with -1
            k2 = min(max(k * refine, k), self.capacity, 1024)
            if (self._sq8 and self._ivf is None
                    and self.capacity <= 4_194_304):
                # candidate generation, not final ranking: the sort-free
                # approx_max_k reduction is ~10x faster at deep k and
                # the exact re-score below erases its recall cost
                from ..ops.quant import dense_topk_sq8_approx

                s2, i2 = dense_topk_sq8_approx(
                    self.emb, self.emb_scale, q, k2, mask,
                    metric="ip", normalize_queries=False)
            else:
                s2, i2 = self._search_device(q, k2, mask)
            return self._refine_exact(q, i2, k)
        return self._search_device(q, k, mask)

    def _refine_exact_host(self, q: np.ndarray, cand: np.ndarray,
                           k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Re-score candidate rows with exact f32 dot products from the
        host mirror and re-rank -> np (scores [Q, k], rows [Q, k])."""
        from ..ops.dense import NEG_INF as _NEG

        ids = np.asarray(cand)                       # [Q, k2]
        qh = np.asarray(q, np.float32)               # [Q, D] (normalized)
        vecs = self._host[np.clip(ids, 0, None)]     # [Q, k2, D]
        scores = np.einsum("qd,qkd->qk", qh, vecs).astype(np.float32)
        scores[ids < 0] = float(_NEG)
        order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        out_s = np.take_along_axis(scores, order, axis=1)
        out_i = np.take_along_axis(ids, order, axis=1).astype(np.int32)
        out_i[out_s <= float(_NEG)] = -1
        return out_s, out_i

    def _refine_exact(self, q: jnp.ndarray, cand: jnp.ndarray, k: int):
        out_s, out_i = self._refine_exact_host(np.asarray(q),
                                               np.asarray(cand), k)
        return jnp.asarray(out_s), jnp.asarray(out_i)

    def _search_device(
        self,
        q: jnp.ndarray,                      # [Q, D] f32, pre-normalized
        k: int,
        mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self._ivf is not None:
            from ..ops.ivf import ivf_topk
            from ..ops.dense import merge_topk, NEG_INF
            import jax.numpy as _jnp

            npb = min(self.config.nprobe, self._ivf.centroids.shape[0])
            if jax.default_backend() == "tpu":
                # slab-streaming kernel: probed partitions DMA into
                # VMEM once instead of the XLA path's materialized
                # [Q, nprobe, cap, D] gather (3x HBM traffic)
                from ..ops.pallas_ivf import ivf_topk_pallas_batch

                s, i = ivf_topk_pallas_batch(self._ivf, q, k, mask,
                                             nprobe=npb)
            else:
                s, i = ivf_topk(self._ivf, q, k, mask, nprobe=npb)
            tail = self.size - self._ivf_size
            if tail > 0:
                # exact scan over the appended segment, ids offset back
                t_emb = jax.lax.dynamic_slice_in_dim(
                    self.emb, self._ivf_size, next_pow2(tail), axis=0)
                t_mask = (jax.lax.dynamic_slice_in_dim(
                    mask, self._ivf_size, next_pow2(tail), axis=0)
                    if mask is not None else None)
                bound = _jnp.arange(next_pow2(tail)) < tail
                t_mask = bound if t_mask is None else _jnp.logical_and(t_mask, bound)
                kk = min(k, next_pow2(tail))
                if self._sq8:
                    from ..ops.quant import dense_topk_sq8

                    t_scale = jax.lax.dynamic_slice_in_dim(
                        self.emb_scale, self._ivf_size, next_pow2(tail), axis=0)
                    ts, ti = dense_topk_sq8(t_emb, t_scale, q, kk, t_mask,
                                            metric="ip",
                                            normalize_queries=False)
                else:
                    ts, ti = dense_topk(t_emb, q, kk,
                                        t_mask, metric=self.search_metric,
                                        normalize_queries=False)
                ti = _jnp.where(ti >= 0, ti + self._ivf_size, -1)
                s, i = merge_topk(s, i, ts, ti, k)
                i = _jnp.where(s <= NEG_INF, -1, i)
            return s, i
        if self._ivfpq is not None:
            from ..ops.ivfpq import ivfpq_topk

            # packed/tail rows are all real (no garbage-row hazard);
            # store validity masks deletes by original row id
            return ivfpq_topk(
                self._ivfpq, q, k, mask,
                nprobe=self.config.nprobe,
                m=int(self._ivfpq.codebooks.shape[0]),
                bits=self.config.pq_bits,
            )
        if self._pq is not None:
            from ..ops.pq import pq_topk

            if self._pq_rot is not None:  # OPQ: q.x == (qR).(xR)
                q = jnp.dot(q, self._pq_rot,
                            preferred_element_type=jnp.float32)
            # rows past `size` hold garbage codes (device-side encode
            # covers the whole capacity) — unlike the float tiers' zero
            # rows they decode to real centroids, so bound explicitly
            bound = jnp.arange(self.capacity) < self.size
            mask = bound if mask is None else jnp.logical_and(mask, bound)
            return pq_topk(
                self._pq.codebooks, self.emb, q, k, mask,
                m=self._pq.m, bits=self._pq.bits,
                impl="pallas" if jax.default_backend() == "tpu" else "xla",
            )
        if self._sq8:
            from ..ops.quant import dense_topk_sq8

            return dense_topk_sq8(
                self.emb, self.emb_scale, q, k, mask,
                metric="ip",  # cosine rows pre-normalized; q normalized above
                block_size=self.config.scan_block_size,
                normalize_queries=False,
            )
        return dense_topk(
            self.emb,
            q,
            k,
            mask,
            metric=self.search_metric,
            block_size=self.config.scan_block_size,
            normalize_queries=False,
        )

    def get_vectors(self, rows: np.ndarray) -> np.ndarray:
        """Host-side gather of stored (normalized) vectors for MMR/drift."""
        return self._host[np.asarray(rows, dtype=np.int64)]

    def memory_bytes(self) -> int:
        total = 0
        if self._ivfpq is not None:
            iq = self._ivfpq
            total += sum(int(np.prod(a.shape)) * a.dtype.itemsize
                         for a in (iq.centroids, iq.codebooks,
                                   iq.packed_codes, iq.packed_rows,
                                   iq.tail_codes, iq.tail_rows,
                                   iq.tail_assign))
        if self._pq is not None:
            cb = self._pq.codebooks
            return (total
                    + self.capacity * self._pq.m * self.emb.dtype.itemsize
                    + int(np.prod(cb.shape)) * 4)
        scale_b = self.capacity * 4 if self._sq8 else 0
        return (total + self.capacity * self.dim * self.emb.dtype.itemsize
                + scale_b)


__all__ = ["DenseIndex"]
