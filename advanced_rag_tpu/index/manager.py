"""Multi-index manager: the TPU-native replacement for MilvusIndexManager.

Capability parity with reference indexing.py:80-713 — three row-aligned
index families over one CorpusStore:

- ``semantic``: dense bi-encoder embeddings (HNSW collection equivalent)
- ``sparse``:  BM25 hashed-term index (SPARSE_INVERTED_INDEX equivalent)
- ``domain``:  dense domain embeddings (domain HNSW equivalent, optional)

Differences by design: no connection management (the "server" is device
HBM — `connect=False` escape hatches become unnecessary but are accepted
for API parity), no flush (appends are durable in HBM immediately;
host-side persistence is utils/checkpoint.py), batch embedding is one
jitted forward instead of a thread pool (indexing.py:122-126), and
search never needs tenacity retries because there is no network.

IMPORTANT: every search must pass a row mask (validity or compiled
filters) because device arrays are padded to capacity; the manager does
this on all paths.
"""

from __future__ import annotations

import asyncio
import logging
import threading
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IndexConfig, IndexType, Metric, PipelineConfig
from ..models.embedder import Embedder, HashingEmbedder
from ..utils.cache import EmbeddingCache, domain_cache, semantic_cache
from ..utils.exceptions import IndexingError, ValidationError
from .corpus import ChunkRecord, CorpusStore
from .dense_index import DenseIndex
from .sparse_index import SparseIndex

logger = logging.getLogger(__name__)


class MultiIndexManager:
    """Owns the corpus store + index families; exposes search/ingest."""

    #: overall bound on waits for other threads' in-flight rows — raises
    #: TimeoutError instead of spinning forever on a wedged peer ingest
    INGEST_WAIT_DEADLINE_S = 300.0

    def __init__(
        self,
        config: Optional[PipelineConfig] = None,
        embedder: Optional[Embedder] = None,
        domain_embedder: Optional[Embedder] = None,
        *,
        enable_sparse: bool = True,
        enable_domain: bool = False,
        semantic_cache_: Optional[EmbeddingCache] = None,
        domain_cache_: Optional[EmbeddingCache] = None,
        connect: bool = True,  # accepted for reference API parity; unused
    ):
        self.config = config or PipelineConfig()
        self.store = CorpusStore()
        # Default embedder: deterministic hashing projection — the
        # meaningful analogue of the reference's random placeholder
        # (indexing.py:594-597). Swap in NeuralEmbedder for real models.
        # fused_rerank needs a flax encoder inside the one-dispatch
        # program, so it defaults to the neural bi-encoder instead.
        if embedder is None and self.config.fused_rerank:
            from ..models.embedder import NeuralEmbedder

            embedder = NeuralEmbedder(dim=self.config.semantic_dim)
        self.embedder = embedder or HashingEmbedder(dim=self.config.semantic_dim)
        if self.embedder.dim != self.config.semantic_dim:
            self.config.semantic_dim = self.embedder.dim
        self.semantic = DenseIndex(
            IndexConfig(index_type=IndexType.SEMANTIC, dim=self.embedder.dim,
                        metric=Metric.COSINE,
                        dtype=self.config.semantic_dtype,
                        refine_factor=self.config.semantic_refine,
                        pq_opq=self.config.semantic_opq)
        )
        self.enable_sparse = enable_sparse
        self.sparse = (
            SparseIndex(IndexConfig(index_type=IndexType.SPARSE))
            if enable_sparse
            else None
        )
        self.enable_domain = enable_domain
        self.domain_embedder = domain_embedder
        self.domain: Optional[DenseIndex] = None
        if enable_domain:
            self.domain_embedder = domain_embedder or HashingEmbedder(
                dim=self.config.domain_dim, seed=17
            )
            self.domain = DenseIndex(
                IndexConfig(index_type=IndexType.DOMAIN,
                            dim=self.domain_embedder.dim, metric=Metric.COSINE)
            )
        # Fused-rerank token table (config.fused_rerank): the text
        # column in HBM, enabling the one-dispatch retrieve+rerank
        # program (ops/e2e.py) via fused_retrieve_batch_sync.
        self.token_table = None
        if self.config.fused_rerank:
            from ..models.tokenizer import HashingTokenizer, TokenizerConfig
            from .token_table import TokenTable

            tok = getattr(self.embedder, "tokenizer", None) or \
                HashingTokenizer(TokenizerConfig())
            self.token_table = TokenTable(
                tok, max_len=self.config.fused_token_len)
        self._e2e_programs: Dict[Any, Any] = {}
        self._rescore_fn: Any = None
        # Device-scalar cache: a FRESH jnp scalar per search call is a
        # host->device upload that serializes async dispatch on a
        # tunneled chip (~25 ms RTT each — measured 592 -> 19 QPS
        # pipelined when two per-call scalars crept into the e2e loop).
        # Knob values recur (config-driven), so cache by value.
        self._dev_scalars: Dict[Any, Any] = {}
        self._default_reranker: Any = None
        self._semantic_cache = semantic_cache_ or semantic_cache
        self._domain_cache = domain_cache_ or domain_cache
        # Cache namespaces carry the embedder's identity: the module-
        # level caches are shared across managers, and two different
        # same-dimension embedders must never exchange entries (the
        # dimension guard in _embed_batch_cached cannot tell them
        # apart — observed as one manager scoring another model's
        # cached corpus embeddings).
        self._sem_ns = "semantic:" + getattr(self.embedder, "cache_tag", "")
        self._dom_ns = "domain:" + getattr(self.domain_embedder,
                                           "cache_tag", "")
        self._closed = False
        # Serializes corpus mutations (ingest/delete).  Concurrent
        # index_chunks calls are real in the service (client disconnect
        # leaves the first to_thread ingest running while a retry starts
        # a second): without exclusion, both base their fused append on
        # the same device arrays and the last commit silently drops the
        # other's rows; with it, the second call blocks, then dedupes
        # against COMMITTED state (idempotent re-ingest).
        self._write_lock = threading.Lock()
        # Condition over the SAME lock: duplicate ingests wait on it for
        # in-flight rows (claimed in phase 1, committed in phase 3) so
        # "indexed" always means "searchable" — while DISTINCT batches
        # embed concurrently outside the critical section.
        self._write_cv = threading.Condition(self._write_lock)
        self._inflight_rows: set = set()

    # -- embeddings ----------------------------------------------------------

    def _embed_batch_cached(
        self, texts: Sequence[str], embedder: Embedder, cache: EmbeddingCache,
        namespace: str,
    ) -> np.ndarray:
        """Cache-aware batch embedding: misses are embedded in ONE jitted
        forward pass (replaces per-text thread pool, indexing.py:553-599)."""
        out = np.zeros((len(texts), embedder.dim), np.float32)
        miss_pos: List[int] = []
        miss_texts: List[str] = []
        for i, text in enumerate(texts):
            hit = cache.get_sync(text, namespace)
            # dimension guard: the module-level caches are shared across
            # managers; entries from a different embedder are misses
            if hit is not None and hit.shape[0] == embedder.dim:
                out[i] = hit
            else:
                miss_pos.append(i)
                miss_texts.append(text)
        if miss_texts:
            fresh = embedder.encode(miss_texts)
            for j, pos in enumerate(miss_pos):
                out[pos] = fresh[j]
                cache.put_sync(miss_texts[j], fresh[j], namespace)
        return out

    def generate_semantic_embedding(self, text: str) -> np.ndarray:
        """Single-text semantic embedding (reference indexing.py:601-627)."""
        return self._embed_batch_cached([text], self.embedder,
                                        self._semantic_cache, self._sem_ns)[0]

    def generate_domain_embedding(self, text: str) -> np.ndarray:
        if not self.domain_embedder:
            raise IndexingError("domain index not enabled")
        return self._embed_batch_cached([text], self.domain_embedder,
                                        self._domain_cache, self._dom_ns)[0]

    # reference-compat private aliases (tests in the reference monkeypatch
    # `_generate_*_embedding`; keeping the names keeps the test pattern)
    _generate_semantic_embedding = generate_semantic_embedding
    _generate_domain_embedding = generate_domain_embedding

    # -- ingest ----------------------------------------------------------------

    def index_chunks(self, chunks: Sequence[Any]) -> Dict[str, Any]:
        """Index chunk objects (anything with .content/.chunk_id/.doc_id or
        ChunkRecord).  Returns a per-batch report mirroring reference
        indexing.py:264-437 (indexed counts + per-chunk errors)."""
        t0 = time.perf_counter()
        records: List[ChunkRecord] = []
        errors: List[Dict[str, str]] = []
        for pos, chunk in enumerate(chunks):
            try:
                records.append(self._to_record(chunk))
            except Exception as exc:  # per-chunk error capture (:363-367)
                errors.append({"chunk": str(pos), "error": str(exc)})
        report: Dict[str, Any] = {
            "total": len(chunks),
            "indexed": 0,
            "errors": errors,
            "elapsed_ms": 0.0,
        }
        if not records:
            report["elapsed_ms"] = (time.perf_counter() - t0) * 1000
            return report

        # Phase 1 (locked): claim rows + dedupe.  If any deduped row is
        # still in flight in another thread (claimed but not committed),
        # wait for its commit — read-your-writes for duplicate ingests.
        # The claim itself happens INSIDE the try so an exception during
        # either wait loop can never leak claimed rows (a leaked claim
        # would spin every later duplicate ingest / checkpoint save).
        new_rows: List[int] = []
        new_records: List[ChunkRecord] = []
        try:
            with self._write_cv:
                first_new = self.store.size
                rows, store_pending = self.store.prepare_append(records)
                # Only embed rows that are NEW (idempotent re-ingest
                # skips work).
                seen = set()
                for row, rec in zip(rows, records):
                    if row >= first_new and row not in seen:
                        seen.add(row)
                        new_rows.append(row)
                        new_records.append(rec)
                self._inflight_rows.update(new_rows)
                others = set(rows) - seen
                deadline = time.monotonic() + self.INGEST_WAIT_DEADLINE_S
                while others & self._inflight_rows:
                    self._write_cv.wait(timeout=1.0)
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            "ingest timed out waiting for in-flight "
                            f"duplicate rows {sorted(others)[:8]}")

            if not new_rows:
                report["indexed"] = len(records)
                report["rows"] = rows
                report["elapsed_ms"] = (time.perf_counter() - t0) * 1000
                return report

            # Phase 2 (UNLOCKED): embedding + sparse encoding — the slow
            # compute — runs concurrently across ingests.  Claimed rows
            # stay device-invalid until the fused commit below, so
            # searches never see half-written rows.
            start = min(new_rows)
            # rows from CorpusStore.append are contiguous for fresh records
            texts = [r.content for r in new_records]
            emb = self._embed_batch_cached(
                texts, self.embedder, self._semantic_cache, self._sem_ns
            )
            sp_enc = None
            if self.sparse is not None:
                from .text import encode_documents

                sp_enc = encode_documents(texts, self.sparse.vocab_size,
                                          self.sparse.doc_nnz)
            demb = None
            if self.domain is not None and self.domain_embedder is not None:
                demb = self._embed_batch_cached(
                    texts, self.domain_embedder, self._domain_cache, self._dom_ns
                )

            # Phase 3 (locked): ONE fused device program for corpus
            # columns + dense embeddings + sparse slots (+ domain) over
            # device arrays fetched NOW.  Commits must land in ASCENDING
            # row order: append blocks are pow2-padded, so a lower-start
            # block's pad region overlaps the next batch's rows and
            # would wipe them if it committed later.
            mine = set(new_rows)
            with self._write_cv:
                deadline = time.monotonic() + self.INGEST_WAIT_DEADLINE_S
                while any(r < start for r in self._inflight_rows
                          if r not in mine):
                    self._write_cv.wait(timeout=1.0)
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            "ingest timed out waiting for lower-row "
                            "in-flight commits before the fused append")
                from .corpus import fused_append

                arrays: Dict[str, Any] = {}
                vals: Dict[str, Any] = {}

                def collect(prefix: str, arrs, vls) -> None:
                    for name, a in arrs.items():
                        arrays[prefix + name] = a
                        vals[prefix + name] = vls[name]

                if store_pending is not None:
                    collect("c:", self.store.device_arrays(),
                            store_pending[1])
                sem_vals = self.semantic.prepare_append(start, emb)
                collect("e:", self.semantic.device_arrays(), sem_vals)
                if self.sparse is not None:
                    sp_vals = self.sparse.prepare_append_encoded(
                        start, *sp_enc)
                    collect("s:", self.sparse.device_arrays(), sp_vals)
                if demb is not None:
                    dom_vals = self.domain.prepare_append(start, demb)
                    collect("d:", self.domain.device_arrays(), dom_vals)
                if self.token_table is not None:
                    tok_vals = self.token_table.prepare_append(start, texts)
                    collect("t:", self.token_table.device_arrays(),
                            tok_vals)

                updated = fused_append(arrays, jnp.int32(start), vals)

                def split(prefix: str):
                    return {k[len(prefix):]: v for k, v in updated.items()
                            if k.startswith(prefix)}

                if store_pending is not None:
                    self.store.commit_device(split("c:"))
                self.semantic.commit_device(split("e:"))
                if self.sparse is not None:
                    self.sparse.commit_device(split("s:"))
                if demb is not None:
                    self.domain.commit_device(split("d:"))
                if self.token_table is not None:
                    self.token_table.commit_device(split("t:"))
        finally:
            with self._write_cv:
                self._inflight_rows.difference_update(new_rows)
                self._write_cv.notify_all()
        report["indexed"] = len(records)
        report["rows"] = rows
        report["elapsed_ms"] = (time.perf_counter() - t0) * 1000
        return report

    @staticmethod
    def _to_record(chunk: Any) -> ChunkRecord:
        if isinstance(chunk, ChunkRecord):
            if not chunk.content:
                raise ValidationError("empty chunk content")
            return chunk
        content = getattr(chunk, "content", None)
        if not content:
            raise ValidationError("empty chunk content")
        meta = getattr(chunk, "metadata", None)

        def get(name: str, default: Any) -> Any:
            if meta is None:
                return default
            value = getattr(meta, name, None)
            return default if value is None else value

        return ChunkRecord(
            chunk_id=getattr(chunk, "chunk_id", None) or get("chunk_id", f"chunk-{id(chunk)}"),
            doc_id=getattr(chunk, "doc_id", None) or get("doc_id", "unknown"),
            content=content,
            chunk_index=int(get("chunk_index", 0)),
            token_count=int(get("token_count", len(content.split()))),
            entropy=float(get("entropy", 0.0)),
            redundancy=float(get("redundancy", 0.0)),
            domain_density=float(get("domain_density", 0.0)),
            timestamp=float(get("timestamp", time.time())),
            metadata=dict(getattr(meta, "extra", None) or {}),
        )

    # -- search ------------------------------------------------------------------

    def _scalar(self, *vals: float) -> jnp.ndarray:
        """Cached device scalar/vector for recurring knob values
        (weights, mmr lambda, rerank alpha/mix) — see _dev_scalars."""
        key = tuple(float(v) for v in vals)
        arr = self._dev_scalars.get(key)
        if arr is None:
            arr = (jnp.float32(key[0]) if len(key) == 1
                   else jnp.asarray(key, jnp.float32))
            self._dev_scalars[key] = arr
        return arr

    def _row_mask(self, filters: Optional[Dict[str, Any]]) -> jnp.ndarray:
        mask = self.store.build_filter_mask(filters)
        return mask if mask is not None else self.store.valid_mask

    def search_sync(
        self,
        index_type: IndexType | str,
        query: str,
        k: int,
        filters: Optional[Dict[str, Any]] = None,
        query_embedding: Optional[np.ndarray] = None,
    ) -> List[Dict[str, Any]]:
        """Search one index family; returns hydrated hit dicts sorted by
        score (reference indexing.py:445-551, minus the gRPC/retry
        machinery that a device-resident index does not need)."""
        index_type = IndexType(index_type)
        if self._closed:
            raise IndexingError("index manager is closed")
        if k <= 0:
            raise ValidationError("k must be positive")
        k = min(k, self.config.retrieval.max_top_k)
        if self.store.n_valid() == 0:
            return []
        mask = self._row_mask(filters)

        if index_type == IndexType.SEMANTIC:
            q = (query_embedding if query_embedding is not None
                 else self.generate_semantic_embedding(query))
            scores, rows = self.semantic.search(np.asarray(q)[None, :], k, mask)
        elif index_type == IndexType.SPARSE:
            if self.sparse is None:
                return []
            scores, rows = self.sparse.search_texts([query], k, mask)
        elif index_type == IndexType.DOMAIN:
            if self.domain is None or self.domain_embedder is None:
                return []
            q = (query_embedding if query_embedding is not None
                 else self.generate_domain_embedding(query))
            scores, rows = self.domain.search(np.asarray(q)[None, :], k, mask)
        else:
            raise ValidationError(f"cannot search index type {index_type}")

        return self._hydrate(np.asarray(scores)[0], np.asarray(rows)[0],
                             method=index_type.value)

    async def search(
        self,
        index_type: IndexType | str,
        query: str,
        k: int,
        filters: Optional[Dict[str, Any]] = None,
        query_embedding: Optional[np.ndarray] = None,
    ) -> List[Dict[str, Any]]:
        """Async wrapper (parity with reference async search API)."""
        return await asyncio.to_thread(
            self.search_sync, index_type, query, k, filters, query_embedding
        )

    # -- fused hybrid search ---------------------------------------------------

    def hybrid_search_sync(
        self,
        query: str,
        k: int,
        filters: Optional[Dict[str, Any]] = None,
        **knobs: Any,
    ) -> List[Dict[str, Any]]:
        """Single-query fused hybrid search (see hybrid_search_batch_sync)."""
        return self.hybrid_search_batch_sync([query], k, filters, **knobs)[0]

    @staticmethod
    def _query_bucket(n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return b

    def hybrid_search_batch_sync(
        self,
        queries: Sequence[str],
        k: int,
        filters: Optional[Dict[str, Any]] = None,
        *,
        dense_weight: float = 0.7,
        sparse_weight: float = 0.3,
        domain_weight: float = 0.2,
        rrf_k: int = 60,
        use_mmr: bool = True,
        mmr_lambda: float = 0.8,
        over_retrieve: int = 2,
        query_embedding: Optional[np.ndarray] = None,  # [D] or [Q, D]
    ) -> List[List[Dict[str, Any]]]:
        """Dense + BM25 (+ domain) + RRF + MMR in ONE device dispatch,
        batched over queries (pow2 batch buckets share compiled programs).

        Replaces the reference's asyncio fan-out over per-index searches
        plus CPU fusion (retrieval.py:249-516).  k-shapes are bucketed to
        multiples of 8 so distinct profiles share compiled programs;
        ``filters`` apply to the whole batch (the micro-batcher only
        groups requests with identical knobs and filter specs).
        """
        from ..ops.hybrid import hybrid_retrieve

        if self._closed:
            raise IndexingError("index manager is closed")
        if k <= 0:
            raise ValidationError("k must be positive")
        if not queries:
            return []
        k = min(k, self.config.retrieval.max_top_k)
        if self.store.n_valid() == 0:
            return [[] for _ in queries]
        mask = self._row_mask(filters)

        k_out = min(-(-k // 8) * 8, self.config.retrieval.max_top_k)
        k_cand = min(-(-(k * max(over_retrieve, 1)) // 8) * 8,
                     2 * self.config.retrieval.max_top_k)
        k_cand = max(k_cand, k_out)
        nq = len(queries)
        qb = self._query_bucket(nq)

        # Keep query embeddings ON DEVICE: encode_device dispatches
        # async, the fused program queues behind it, and the only host
        # sync is the final result fetch — one round-trip total instead
        # of embed->host->search->host (each RTT costs ~28 ms through
        # the remote-chip tunnel, more than the search compute itself).
        from ..config import Metric
        from ..ops.dense import l2_normalize

        cache_fill: List[str] = []
        if query_embedding is not None:
            qe = np.asarray(query_embedding, np.float32)
            if qe.ndim == 1:
                qe = qe[None, :]
            q = jnp.asarray(np.pad(qe, ((0, qb - nq), (0, 0))))
        else:
            cached = [self._semantic_cache.get_sync(t, self._sem_ns)
                      for t in queries]
            cached = [c if c is not None and c.shape[0] == self.embedder.dim
                      else None for c in cached]
            if all(c is not None for c in cached):
                q = jnp.asarray(np.pad(np.stack(cached),
                                       ((0, qb - nq), (0, 0))))
            else:
                # pad the text batch so encode_device hits the bucket
                q = self.embedder.encode_device(
                    list(queries) + [""] * (qb - nq))
                cache_fill = list(queries)
        if self.semantic.config.metric == Metric.COSINE:
            q = l2_normalize(q)

        sparse_on = self.sparse is not None
        if sparse_on:
            q_idx, q_tf = self.sparse.encode_query(list(queries))
            if qb != nq:
                q_idx = np.pad(q_idx, ((0, qb - nq), (0, 0)),
                               constant_values=-1)
                q_tf = np.pad(q_tf, ((0, qb - nq), (0, 0)))
            sp = self.sparse
            if sp.capacity != self.semantic.capacity:
                raise IndexingError(
                    "index capacities diverged (semantic "
                    f"{self.semantic.capacity} vs sparse {sp.capacity})"
                )
            sparse_args = (sp.doc_idx, sp.doc_tf, sp.doc_len, sp.df,
                           self._scalar(max(sp.n_docs, 1)))
        else:
            n_cap = self.semantic.capacity
            q_idx = np.full((qb, 1), -1, np.int32)
            q_tf = np.zeros((qb, 1), np.float32)
            sparse_args = (
                jnp.full((n_cap, 1), -1, jnp.int32),
                jnp.zeros((n_cap, 1), jnp.float32),
                jnp.zeros((n_cap,), jnp.float32),
                jnp.zeros((8,), jnp.int32),
                jnp.float32(1.0),
            )

        domain_emb = q_dom = None
        weights = [dense_weight, sparse_weight]
        if self.domain is not None and self.domain_embedder is not None:
            if self.domain.capacity != self.semantic.capacity:
                raise IndexingError("index capacities diverged (domain)")
            domain_emb = self.domain.emb
            qd = np.stack([self.generate_domain_embedding(t)
                           for t in queries]).astype(np.float32)
            qd = jnp.asarray(np.pad(qd, ((0, qb - nq), (0, 0))))
            q_dom = (l2_normalize(qd)
                     if self.domain.config.metric == Metric.COSINE else qd)
            weights.append(domain_weight)

        # Impl selection (measured on v5e, ops/hybrid.py docstring):
        # approx dense + Pallas sparse on real TPUs; exact scan + XLA
        # compare kernel elsewhere (Pallas interpret mode is for tests).
        on_tpu = jax.default_backend() == "tpu"
        ivf_args = {}
        if self.semantic.has_ivf:
            # partitioned ANN inside the fused program (the 10M tier);
            # the appended tail is exact-scanned + merged in-program
            from .corpus import next_pow2 as _np2

            dense_impl = "ivf"
            sem = self.semantic
            tail = sem.size - sem._ivf_size
            ivf_args = {
                "ivf_parts": sem._ivf,
                "nprobe": min(sem.config.nprobe,
                              int(sem._ivf.centroids.shape[0])),
                "ivf_tail_start": sem._ivf_size,
                "ivf_tail_pad": _np2(tail) if tail > 0 else 0,
            }
        elif self.semantic.has_pq:
            # PQ-coded corpus (the ~150M-rows/chip tier): emb IS the code
            # matrix; dense ranks feeding RRF are PQ-approximate (exact
            # refinement applies on the pure-dense search path), which
            # rank-based RRF + exact BM25 tolerate by construction.
            dense_impl = "pq"
        elif self.semantic._sq8:
            dense_impl = "sq8"
        else:
            dense_impl = ("approx"
                          if on_tpu and self.semantic.capacity <= 4_194_304
                          else "scan")
        # Sparse impl ladder: inverted postings (query cost ~T*cap,
        # independent of corpus size) once the corpus justifies the
        # postings memory; below that, Pallas VMEM-resident compares for
        # tiny query batches (Q-linear) or the XLA compare-scan
        # (amortizes queries; measured crossover ~Q4 at 1M on v5e).
        post_args = {}
        if sparse_on:
            if (self.sparse.has_postings
                    or self.store.n_valid() >= self.sparse.POSTINGS_AUTO_THRESHOLD):
                if not self.sparse.has_postings:
                    self.sparse.build_postings()
                sparse_impl = "postings"
                post_args = {"post_rows": self.sparse.post_rows,
                             "post_tf": self.sparse.post_tf,
                             "post_tfw": self.sparse.post_tfw}
            else:
                sparse_impl = "pallas" if (on_tpu and qb <= 2) else "xla"
        else:
            sparse_impl = "xla"
        if self.semantic._sq8:
            post_args = dict(post_args, emb_scale=self.semantic.emb_scale)
        post_args.update(ivf_args)
        pq_kwargs: Dict[str, Any] = {}
        pq_refine = 0
        q_prog = q
        if dense_impl == "pq":
            pqc = self.semantic._pq
            post_args["pq_codebooks"] = pqc.codebooks
            pq_kwargs = {"pq_m": pqc.m, "pq_bits": pqc.bits,
                         "pq_impl": "pallas" if on_tpu else "xla"}
            if self.semantic._pq_rot is not None:
                # OPQ: rotate the dense query (q.x == (qR).(xR)); the
                # cached/downloaded q and the exact refinement keep the
                # ORIGINAL embedding space
                q_prog = jnp.dot(q, self.semantic._pq_rot,
                                 preferred_element_type=jnp.float32)
            # BACKLOG #2: over-retrieve deep raw-PQ dense candidates in
            # the fused dispatch, then exactly re-score them from the
            # f32 mirror and re-fuse host-side — hybrid results get the
            # same exact dense ranking as the pure-dense path, at zero
            # extra device round-trips.
            pq_refine = int(self.semantic.config.refine_factor)
            if pq_refine == 0:
                pq_refine = 32
            if pq_refine > 1:
                pq_kwargs["dense_depth"] = min(
                    max(k_cand * pq_refine, k_cand), 1024)
        res = hybrid_retrieve(
            self.semantic.emb, *sparse_args,
            q_prog, jnp.asarray(q_idx), jnp.asarray(q_tf),
            mask,
            self._scalar(*np.asarray(weights, np.float32).tolist()),
            self._scalar(mmr_lambda),
            domain_emb, q_dom,
            **post_args,
            k_cand=k_cand, k_out=k_out,
            metric=self.semantic.search_metric,
            rrf_k=rrf_k, use_mmr=use_mmr, enable_sparse=sparse_on,
            dense_block_size=self.semantic.config.scan_block_size,
            dense_impl=dense_impl, sparse_impl=sparse_impl,
            # postings aggregation rung (10M attribution, PERF.md r5):
            # scatter+approx_max_k wins small batches on big corpora
            sparse_agg=("scatter"
                        if (sparse_impl == "postings" and on_tpu
                            and qb <= 2
                            and self.semantic.capacity >= 4_000_000)
                        else "sort"),
            **pq_kwargs,
        )
        # One blocking transfer for everything the host needs.
        if pq_refine > 1:
            (ids, scores, counts, q_host, d_ids, s_ids, dom_ids) = \
                jax.device_get((res.ids, res.scores, res.method_counts, q,
                                res.dense_ids, res.sparse_ids,
                                res.domain_ids))
            ids, scores, counts = self._refuse_exact(
                q_host[:nq], d_ids[:nq], s_ids[:nq], dom_ids[:nq],
                k_cand=k_cand, k_out=k_out, rrf_k=rrf_k, use_mmr=use_mmr,
                mmr_lambda=mmr_lambda,
                weights=np.asarray(weights, np.float32),
                sparse_on=sparse_on,
                domain_on=domain_emb is not None)
        else:
            ids, scores, counts, q_host = jax.device_get(
                (res.ids, res.scores, res.method_counts, q)
            )
        for text, vec in zip(cache_fill, q_host):
            self._semantic_cache.put_sync(text, np.asarray(vec, np.float32),
                                          self._sem_ns)
        out: List[List[Dict[str, Any]]] = []
        for qi in range(nq):
            hits: List[Dict[str, Any]] = []
            for row, score, cnt in zip(ids[qi].tolist(), scores[qi].tolist(),
                                       counts[qi].tolist()):
                if row < 0 or len(hits) >= k:
                    continue
                hits.append(self.store.hit(int(row), float(score),
                                           method="hybrid",
                                           method_count=int(cnt)))
            out.append(hits)
        return out

    # -- one-dispatch retrieve + rerank (ops/e2e.py) ---------------------------

    def fused_retrieve_batch_sync(
        self,
        queries: Sequence[str],
        k_final: int = 5,
        filters: Optional[Dict[str, Any]] = None,
        *,
        reranker: Any = None,
        k_rerank: int = 16,
        dense_weight: float = 0.7,
        sparse_weight: float = 0.3,
        use_mmr: bool = True,
        mmr_lambda: float = 0.8,
        q_max_len: int = 32,
        rerank_alpha: Optional[float] = None,
        rerank_mode: str = "zblend",
        rerank_base: str = "fused",
        rescore_mix: float = 0.5,
        doc_dedupe: bool = False,
    ) -> List[List[Dict[str, Any]]]:
        """Embed -> hybrid search -> cross-encoder rerank in ONE device
        dispatch (requires ``config.fused_rerank``; the corpus token
        table feeds the reranker via a device gather).  One device->host
        copy per call — on a tunneled chip that is one RTT instead of
        three (the reference pays four process hops, SURVEY.md §3.2).

        Constraints (the serving fast path): a flax embedder
        (NeuralEmbedder) + CrossEncoderReranker; bf16/f32/SQ8 dense
        tiers (IVF/PQ corpora use hybrid_search_batch_sync + host
        rerank); no domain family.

        ``doc_dedupe=True`` reranks a DOC-DISTINCT slate (ops/e2e.py):
        the program over-retrieves a 3x chunk pool and keeps the
        best-ranked chunk per distinct doc before the cross-encoder,
        so the returned k_final rows are k_final distinct documents.
        """
        from ..models.cross_encoder import CrossEncoderReranker
        from ..ops.e2e import make_retrieve_rerank

        if self.token_table is None:
            raise IndexingError(
                "fused_retrieve requires PipelineConfig.fused_rerank=True")
        if not hasattr(self.embedder, "model"):
            raise IndexingError(
                "fused_retrieve requires a flax embedder (NeuralEmbedder)")
        if self.semantic.has_ivf or self.semantic._pq_mode:
            raise IndexingError(
                "fused_retrieve supports the bf16/f32/SQ8 tiers; use "
                "hybrid_search_batch_sync on partitioned/PQ corpora")
        if self._closed:
            raise IndexingError("index manager is closed")
        if not queries:
            return []
        if self.store.n_valid() == 0:
            return [[] for _ in queries]
        if reranker is None:
            # One lazily-built default, NOT a fresh instance per call:
            # the program cache keys on the reranker's identity (its
            # model architecture is baked into the jitted e2e program),
            # so a per-call instance would recompile every call and
            # grow _e2e_programs without bound.
            if self._default_reranker is None:
                self._default_reranker = CrossEncoderReranker()
            reranker = self._default_reranker
        nq = len(queries)
        qb = self._query_bucket(nq)
        k_out = min(-(-max(k_rerank, k_final) // 8) * 8,
                    self.config.retrieval.max_top_k)
        k_rerank = min(k_rerank, k_out)
        # doc-distinct slates need a deeper chunk pool: top-K chunks
        # span ~0.65*K distinct docs on multi-chunk corpora, so a 3x
        # pool keeps the slate full after the in-program dedupe
        k_pool = (min(-(-3 * k_out // 8) * 8, 256)
                  if doc_dedupe else k_out)
        mask = self._row_mask(filters)

        dense_impl = "sq8" if self.semantic._sq8 else (
            "approx" if (jax.default_backend() == "tpu"
                         and self.semantic.capacity <= 4_194_304) else "scan")
        sparse_on = self.sparse is not None
        post_kw: Dict[str, Any] = {}
        sparse_impl = "xla"
        if sparse_on and self.sparse.has_postings:
            sparse_impl = "postings"
            post_kw = {"post_rows": self.sparse.post_rows,
                       "post_tf": self.sparse.post_tf,
                       "post_tfw": self.sparse.post_tfw}
        if self.semantic._sq8:
            post_kw["emb_scale"] = self.semantic.emb_scale
        if rerank_alpha is not None:
            # runtime scalar: blends z-scored CE and retrieval scores
            # inside the program (alpha=1 pure CE, alpha=0 retrieval
            # order); no recompile across alpha values
            post_kw["rerank_alpha"] = self._scalar(rerank_alpha)
            if rerank_base == "exact_postings" and sparse_impl != "postings":
                raise IndexingError(
                    'rerank_base="exact_postings" requires the inverted '
                    "postings sparse tier (SparseIndex.build_postings)")
            if rerank_base in ("exact", "exact_postings"):
                # runtime dense weight of the exact-rescore base
                # (ops/rescore.py); no recompile across mix values
                post_kw["rescore_mix"] = self._scalar(rescore_mix)

        sparse_agg = ("scatter"
                      if (sparse_impl == "postings"
                          and jax.default_backend() == "tpu" and qb <= 2
                          and self.semantic.capacity >= 4_000_000)
                      else "sort")
        key = (qb, k_pool, k_rerank, k_final, dense_impl, sparse_impl,
               sparse_agg, use_mmr, rerank_mode, rerank_base, doc_dedupe,
               id(reranker))
        program = self._e2e_programs.get(key)
        if program is None:
            program = make_retrieve_rerank(
                self.embedder.model, reranker.model,
                k_cand=2 * k_pool, k_out=k_pool, k_rerank=k_rerank,
                k_final=k_final, dense_impl=dense_impl,
                sparse_impl=sparse_impl, sparse_agg=sparse_agg,
                use_mmr=use_mmr,
                rerank_mode=rerank_mode, rerank_base=rerank_base,
                doc_dedupe=doc_dedupe,
                pad_id=self.token_table.tokenizer.config.pad_id,
                sep_id=self.token_table.tokenizer.config.sep_id,
            )
            self._e2e_programs[key] = program
        if doc_dedupe:
            cols = self.store.device_arrays()
            post_kw["doc_lo"] = cols["doc_hash_lo"]
            post_kw["doc_hi"] = cols["doc_hash_hi"]

        tok = self.embedder.tokenizer
        texts = list(queries) + [""] * (qb - nq)
        # pair sequence = [CLS] q [SEP] doc [SEP]; it must fit the
        # cross-encoder trunk's position table
        pair_len = q_max_len + self.token_table.max_len + 1
        ce_max = reranker.model.config.max_len
        if pair_len > ce_max:
            raise IndexingError(
                f"fused pair length {pair_len} (q {q_max_len} + doc "
                f"{self.token_table.max_len} + 1) exceeds the reranker "
                f"max_len {ce_max}")
        q_ids, q_mask = tok.encode_batch(texts, q_max_len)
        if sparse_on:
            q_idx, q_tf = self.sparse.encode_query(texts)
            sp = self.sparse
            sparse_args = (sp.doc_idx, sp.doc_tf, sp.doc_len, sp.df,
                           self._scalar(max(sp.n_docs, 1)))
        else:
            n_cap = self.semantic.capacity
            q_idx = np.full((qb, 1), -1, np.int32)
            q_tf = np.zeros((qb, 1), np.float32)
            sparse_args = (
                jnp.full((n_cap, 1), -1, jnp.int32),
                jnp.zeros((n_cap, 1), jnp.float32),
                jnp.zeros((n_cap,), jnp.float32),
                jnp.zeros((8,), jnp.int32),
                jnp.float32(1.0),
            )

        res = program(
            self.embedder.params, reranker.params,
            jnp.asarray(q_ids), jnp.asarray(q_mask),
            jnp.asarray(q_idx), jnp.asarray(q_tf),
            self.token_table.tokens,
            self.semantic.emb, *sparse_args, mask,
            self._scalar(dense_weight, sparse_weight),
            self._scalar(mmr_lambda), **post_kw,
        )
        ids, ce_scores, fused = jax.device_get(
            (res.ids, res.ce_scores, res.fused_scores))
        out: List[List[Dict[str, Any]]] = []
        for qi in range(nq):
            hits: List[Dict[str, Any]] = []
            for row, ce, fs in zip(ids[qi].tolist(), ce_scores[qi].tolist(),
                                   fused[qi].tolist()):
                if row < 0:
                    continue
                hits.append(self.store.hit(
                    int(row), float(fs), method="fused_rerank",
                    rerank_score=float(ce)))
            out.append(hits)
        return out

    def rescore_candidates_sync(
        self,
        queries: Sequence[str],
        rows: np.ndarray,                 # [Q, K] i32 candidate rows (-1 pad)
        filters: Optional[Dict[str, Any]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact per-tier rescore of retrieval candidates (host entry).

        -> (dense [Q, K], bm25 [Q, K]) f32 — each candidate's EXACT
        dense dot and full-body BM25, the scores rank-based RRF fusion
        discarded (ops/rescore.py rationale).  The unfused retrieval
        path uses this to build the rerank stage's base key; the fused
        one-dispatch program computes the same thing in-program
        (``rerank_base="exact"``).
        """
        from ..config import Metric
        from ..ops.dense import l2_normalize
        from ..ops.rescore import exact_tier_scores

        if self._closed:
            raise IndexingError("index manager is closed")
        if self.semantic._pq_mode:
            raise IndexingError(
                "rescore_candidates_sync needs full-precision embeddings "
                "(bf16/f32/SQ8 tiers); PQ corpora keep ADC scores")
        rows = np.asarray(rows, np.int32)
        if rows.ndim != 2 or len(queries) != rows.shape[0]:
            raise ValidationError(
                "rescore_candidates_sync needs rows shaped [len(queries), K]")
        if not queries:
            return (np.zeros((0, 0), np.float32),) * 2
        q = self.embedder.encode_device(list(queries))
        if self.semantic.config.metric == Metric.COSINE:
            q = l2_normalize(q)
        mask = self._row_mask(filters)
        if self.sparse is not None:
            sp = self.sparse
            q_idx, q_tf = sp.encode_query(list(queries))
            sparse_args = (sp.doc_idx, sp.doc_tf, sp.doc_len, sp.df,
                           self._scalar(max(sp.n_docs, 1)))
        else:
            n_cap = self.semantic.capacity
            q_idx = np.full((len(queries), 1), -1, np.int32)
            q_tf = np.zeros((len(queries), 1), np.float32)
            sparse_args = (
                jnp.full((n_cap, 1), -1, jnp.int32),
                jnp.zeros((n_cap, 1), jnp.float32),
                jnp.zeros((n_cap,), jnp.float32),
                jnp.zeros((8,), jnp.int32),
                jnp.float32(1.0),
            )
        if self._rescore_fn is None:
            self._rescore_fn = jax.jit(exact_tier_scores)
        d_ex, s_ex = self._rescore_fn(
            jnp.asarray(rows), q, jnp.asarray(q_idx), jnp.asarray(q_tf),
            self.semantic.emb, *sparse_args, valid=mask,
            emb_scale=(self.semantic.emb_scale
                       if self.semantic._sq8 else None))
        return np.asarray(d_ex, np.float32), np.asarray(s_ex, np.float32)

    def _refuse_exact(
        self,
        q_host: np.ndarray,       # [Q, D] f32 normalized queries
        d_ids_deep: np.ndarray,   # [Q, depth] raw-PQ dense candidates
        s_ids: np.ndarray,        # [Q, k_cand] sparse candidates
        dom_ids: np.ndarray,      # [Q, k_cand] domain candidates (-1 pad)
        *,
        k_cand: int,
        k_out: int,
        rrf_k: int,
        use_mmr: bool,
        mmr_lambda: float,
        weights: np.ndarray,
        sparse_on: bool,
        domain_on: bool,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Host-side exact re-fusion for the PQ tier (BACKLOG #2).

        The fused device program returned deep raw-PQ dense candidates;
        here they are exactly re-scored from the f32 mirror, then RRF +
        MMR re-run with the SAME ops (ops/fusion.py) on the CPU jax
        backend — candidate pools are <= ~100 rows, so this costs
        microseconds and zero extra device round-trips.  MMR similarity
        uses exact mirror embeddings (better than PQ-decoded)."""
        from ..ops.fusion import mmr_select, rrf_fuse

        _, d_i = self.semantic._refine_exact_host(q_host, d_ids_deep, k_cand)
        methods = [d_i.astype(np.int32)]
        if sparse_on:
            methods.append(np.asarray(s_ids)[:, :k_cand].astype(np.int32))
        if domain_on:
            methods.append(np.asarray(dom_ids)[:, :k_cand].astype(np.int32))
        cand = np.stack(methods, axis=0)                    # [M, Q, K]
        w = np.asarray(weights, np.float32)[: len(methods)]

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            fused_s, fused_i, counts = rrf_fuse(
                jnp.asarray(cand), jnp.asarray(w), rrf_k=rrf_k, k_out=k_cand)
            if use_mmr:
                fi = np.asarray(fused_i)
                cand_emb = self.semantic._host[np.clip(fi, 0, None)]
                ok = jnp.asarray(fi >= 0)
                pos = jax.vmap(
                    lambda ce, rel, okq: mmr_select(
                        ce, rel, k_out, float(mmr_lambda), okq)
                )(jnp.asarray(cand_emb), fused_s, ok)
                sel_ok = pos >= 0
                safe_pos = jnp.clip(pos, 0)
                out_i = jnp.where(
                    sel_ok, jnp.take_along_axis(fused_i, safe_pos, 1), -1)
                out_s = jnp.where(
                    sel_ok, jnp.take_along_axis(fused_s, safe_pos, 1),
                    jnp.float32(-1e30))
                out_c = jnp.where(
                    sel_ok, jnp.take_along_axis(counts, safe_pos, 1), 0)
            else:
                out_i = fused_i[:, :k_out]
                out_s = fused_s[:, :k_out]
                out_c = counts[:, :k_out]
        return (np.asarray(out_i), np.asarray(out_s), np.asarray(out_c))

    def _hydrate(
        self, scores: np.ndarray, rows: np.ndarray, method: str
    ) -> List[Dict[str, Any]]:
        hits = []
        for score, row in zip(scores.tolist(), rows.tolist()):
            if row < 0:
                continue
            hits.append(self.store.hit(int(row), float(score), method=method))
        return hits

    # -- admin ---------------------------------------------------------------------

    def delete_by_filter(self, filters: Dict[str, Any], *,
                         forget_content: bool = False) -> int:
        """Delete rows matching a filter spec (reference indexing.py:692)."""
        with self._write_lock:
            mask = self.store.build_filter_mask(filters)
            if mask is None:
                raise ValidationError("delete_by_filter requires filters")
            rows = np.nonzero(np.asarray(mask))[0].tolist()
            deleted = self.store.delete_rows(rows,
                                             forget_content=forget_content)
            if deleted and self.sparse is not None:
                self.sparse.remove_rows(rows)
            return deleted

    def get_collection_stats(self) -> Dict[str, Any]:
        """Reference indexing.py:678-690 equivalent."""
        stats: Dict[str, Any] = {"store": self.store.stats()}
        stats["semantic"] = {
            "rows": self.semantic.size,
            "dim": self.semantic.dim,
            "memory_bytes": self.semantic.memory_bytes(),
            "ivf": self.semantic.has_ivf,
            "pq": self.semantic.has_pq,
            "ivfpq": self.semantic.has_ivfpq,
            "ivf_tail_rows": self.semantic.ivf_tail_rows,
            "ivf_needs_rebuild": self.semantic.ivf_needs_rebuild,
        }
        if self.sparse is not None:
            stats["sparse"] = {
                "rows": self.sparse.size,
                "vocab_size": self.sparse.vocab_size,
                "memory_bytes": self.sparse.memory_bytes(),
            }
        if self.domain is not None:
            stats["domain"] = {
                "rows": self.domain.size,
                "dim": self.domain.dim,
                "memory_bytes": self.domain.memory_bytes(),
            }
        return stats

    def reset_state(self) -> None:
        """Reinitialize store + index families to empty (same configs).

        Used to roll back a partially-applied restore: load_index
        mutates the store before the dense files stream in, so a
        mid-load failure would otherwise leave a torn manager whose
        chunk ids block both retry-loads and re-ingest."""
        self.store = CorpusStore()
        self.semantic = DenseIndex(self.semantic.config)
        if self.sparse is not None:
            self.sparse = SparseIndex(self.sparse.config)
        if self.domain is not None:
            self.domain = DenseIndex(self.domain.config)

    def build_semantic(self, *, pq: bool = False,
                       ivf: bool = False) -> Dict[str, Any]:
        """Explicit tier builds under the write lock (the service admin
        path) — direct DenseIndex.build_* calls are caller-synchronized;
        anything that can race a live ingest goes through here."""
        out: Dict[str, Any] = {}
        with self._write_lock:
            sem = self.semantic
            if pq and sem._pq_mode and not sem.has_pq:
                sem.build_pq()
                out["pq_built"] = True
            if ivf and not (sem.has_ivf or sem.has_ivfpq):
                if sem._pq_mode and sem._pq_rot is not None:
                    out["ivf_skipped"] = "opq rotation active"
                else:
                    sem.build_ivf()
                    out["ivf_built"] = True
        return out

    # -- background maintenance (BACKLOG #7: Milvus-compaction equivalent) ----

    def maintenance_tick(self) -> Dict[str, Any]:
        """One maintenance pass: rebuild the IVF quantizer when the
        streaming-ingest tail outgrows REBUILD_TAIL_FRACTION (the exact
        tail scan keeps recall perfect but gets slower as it grows).

        Build-then-swap: the new partitions are trained and packed from
        the host mirror while searches keep using the old quantizer; the
        final assignment of ``_ivf``/``_ivf_size`` is atomic under the
        GIL, so there is no torn state and no downtime — the device-side
        analogue of Milvus background compaction/flush (reference
        indexing.py:429-431)."""
        from ..utils.constants import IndexConstants

        with self._write_lock:
            return self._maintenance_tick_locked(IndexConstants)

    def _demotion_recall_ok(self, actions: Dict[str, Any],
                            tier: str) -> bool:
        """Recall guardrail on automatic tier demotion (VERDICT r3 weak
        #6): probe the freshly built partitioned tier's recall@10
        against the exact oracle (tune_nprobe's doubling sweep — which
        also picks the serving nprobe as a side effect) and return
        False when even the deepest swept probe cannot reach
        ``config.demote_recall_target``.  The caller then restores the
        previous tier, so an adversarial corpus (e.g. quantization-
        hostile geometry, PARITY_HNSW.json's clustered-hard case) keeps
        its exact/flat rung instead of silently losing recall."""
        target = float(self.semantic.config.demote_recall_target)
        if target <= 0.0:
            return True
        try:
            nprobe, recall = self.semantic.tune_nprobe(
                recall_target=target, k=10,
                sample=min(64, self.semantic.size))
        except Exception as exc:  # probe failure must not kill the tick
            logger.exception("demotion recall probe failed")
            actions["demotion_probe_error"] = str(exc)[:200]
            return True
        actions["demotion_recall"] = round(float(recall), 4)
        if recall >= target:
            return True
        actions["demotion_blocked"] = {
            "tier": tier, "recall": round(float(recall), 4),
            "target": target, "nprobe": int(nprobe)}
        logger.warning(
            "maintenance: %s demotion BLOCKED — recall@10 %.3f < "
            "target %.2f at nprobe %d; keeping previous tier",
            tier, recall, target, nprobe)
        return False

    def _maintenance_tick_locked(self, IndexConstants) -> Dict[str, Any]:
        """Body of maintenance_tick, under the write lock: tier builds
        swap `semantic.emb` (bf16 staging -> codes), which must never
        interleave with a fused-append commit basing itself on the old
        array object (the commit would resurrect the pre-swap storage
        and leave `_pq` pointing at float data)."""
        actions: Dict[str, Any] = {"ivf_rebuilt": False}
        if self.semantic._pq_mode:
            # PQ tier: once the corpus outgrows the bf16 staging scan,
            # train flat codebooks (fused-hybrid rung + MMR decode) and
            # the residual IVF-PQ partitions (nprobe-bounded dense path)
            if (not self.semantic.has_pq
                    and self.store.n_valid() >= IndexConstants.IVF_AUTO_THRESHOLD):
                sem = self.semantic
                prev = (sem.emb, sem._pq, sem._pq_rot, sem._ivfpq,
                        sem._ivfpq_size, sem.config.nprobe)
                sem.build_pq()
                guarded = sem._pq_rot is None
                if guarded:
                    # OPQ and IVF-PQ are mutually exclusive (residuals
                    # are near-isotropic); with OPQ on, the flat rotated
                    # codes ARE the scale tier
                    sem.build_ivfpq()
                if guarded and not self._demotion_recall_ok(
                        actions, "pq+ivfpq"):
                    # build-then-swap rollback: the bf16 staging array
                    # is still alive in `prev`, so restoring it is one
                    # assignment — no re-upload, no torn state
                    (sem.emb, sem._pq, sem._pq_rot, sem._ivfpq,
                     sem._ivfpq_size, sem.config.nprobe) = prev
                else:
                    actions["pq_built"] = True
            elif self.semantic.ivf_needs_rebuild:
                # streaming tail outgrew the partitions: re-pack
                # (build-then-swap, same discipline as the IVF branch)
                nlist = int(self.semantic._ivfpq.centroids.shape[0])
                self.semantic.build_ivfpq(nlist=nlist)
                actions["ivf_rebuilt"] = True
                actions["ivf_rows"] = self.semantic._ivfpq_size
        elif (not self.semantic.has_ivf
                and self.store.n_valid() >= IndexConstants.IVF_AUTO_THRESHOLD):
            # first build once the corpus outgrows the exact scan —
            # guarded: an IVF that can't hit the recall target at any
            # swept nprobe is refused and the exact scan kept
            sem = self.semantic
            prev = (sem._ivf, getattr(sem, "_ivf_size", 0),
                    sem.config.nprobe)
            sem.build_ivf()
            if self._demotion_recall_ok(actions, "ivf"):
                actions["ivf_rebuilt"] = True
                actions["ivf_rows"] = sem._ivf_size
            else:
                sem._ivf, sem._ivf_size, sem.config.nprobe = prev
        elif self.semantic.ivf_needs_rebuild:
            nlist = self.semantic._ivf.centroids.shape[0]
            self.semantic.build_ivf(nlist=nlist)
            actions["ivf_rebuilt"] = True
            actions["ivf_rows"] = self.semantic._ivf_size
        # postings compaction: deleted rows' postings occupy list slots
        # (masked at query) — rebuild without them once >10% are dead
        if (self.sparse is not None
                and self.sparse.postings_stale_fraction > 0.10):
            self.sparse.build_postings(
                valid=np.asarray(self.store.valid_mask)[: self.sparse.size])
            actions["postings_compacted"] = True
        return actions

    def start_maintenance(self, interval_s: float = 30.0) -> None:
        """Run maintenance_tick on a daemon thread every ``interval_s``."""
        import threading

        if getattr(self, "_maint_thread", None) is not None:
            return
        self._maint_stop = threading.Event()

        def loop() -> None:
            while not self._maint_stop.wait(interval_s):
                if self._closed:
                    return
                try:
                    self.maintenance_tick()
                except Exception:  # keep the loop alive on transient errors
                    logger.exception("maintenance tick failed")

        self._maint_thread = threading.Thread(
            target=loop, name="index-maintenance", daemon=True)
        self._maint_thread.start()

    def stop_maintenance(self) -> None:
        if getattr(self, "_maint_thread", None) is not None:
            self._maint_stop.set()
            self._maint_thread.join(timeout=5.0)
            self._maint_thread = None

    def close(self) -> None:
        self.stop_maintenance()
        self._closed = True


__all__ = ["MultiIndexManager"]
