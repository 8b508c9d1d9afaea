"""Sparse lexical index: fixed-nnz padded rows + device BM25 scoring.

Replaces the Milvus SPARSE_INVERTED_INDEX collection (reference
indexing.py:158-167, :375-420 CSR insert path).  Layout and scoring
rationale live in ops/sparse.py; this class owns the arrays, the df
table, and append/delete bookkeeping, row-aligned with CorpusStore.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import IndexConfig
from ..ops.postings import postings_topk
from ..ops.sparse import sparse_topk
from .corpus import next_pow2, pad_rows_pow2
from .text import encode_documents, encode_queries, remove_documents_df


class SparseIndex:
    """BM25/IP lexical index over hashed terms."""

    def __init__(self, config: IndexConfig):
        self.config = config
        self.vocab_size = config.vocab_size
        self.doc_nnz = config.doc_nnz
        self.capacity = int(config.min_capacity)
        self.size = 0
        self.n_docs = 0
        self.doc_idx = jnp.full((self.capacity, self.doc_nnz), -1, jnp.int32)
        # Term frequencies are small integer counts (exact in bf16 up to
        # 256, far above any within-chunk tf); bf16 halves the dominant
        # sparse HBM read.  Host mirrors stay f32 for exact persistence.
        self.doc_tf = jnp.zeros((self.capacity, self.doc_nnz), jnp.bfloat16)
        self.doc_len = jnp.zeros((self.capacity,), jnp.float32)
        self._host_idx = np.full((self.capacity, self.doc_nnz), -1, np.int32)
        self._host_tf = np.zeros((self.capacity, self.doc_nnz), np.float32)
        self._host_len = np.zeros((self.capacity,), np.float32)
        self._df = np.zeros((self.vocab_size,), np.int64)
        self.df = jnp.asarray(self._df.astype(np.int32))

    def _ensure_capacity(self, needed: int) -> None:
        if needed <= self.capacity:
            return
        new_cap = self.capacity
        while new_cap < needed:
            new_cap *= 2
        grown_idx = np.full((new_cap, self.doc_nnz), -1, np.int32)
        grown_idx[: self.capacity] = self._host_idx
        grown_tf = np.zeros((new_cap, self.doc_nnz), np.float32)
        grown_tf[: self.capacity] = self._host_tf
        grown_len = np.zeros((new_cap,), np.float32)
        grown_len[: self.capacity] = self._host_len
        self._host_idx, self._host_tf, self._host_len = grown_idx, grown_tf, grown_len
        self.capacity = new_cap
        self.doc_idx = jnp.asarray(grown_idx)
        self.doc_tf = jnp.asarray(grown_tf, jnp.bfloat16)
        self.doc_len = jnp.asarray(grown_len)

    def append_texts(self, start: int, texts: Sequence[str]) -> None:
        idx, tf, lens, df_delta = encode_documents(
            list(texts), self.vocab_size, self.doc_nnz
        )
        self.append_encoded(start, idx, tf, lens, df_delta)

    def prepare_append_encoded(
        self,
        start: int,
        idx: np.ndarray,
        tf: np.ndarray,
        lens: np.ndarray,
        df_delta: np.ndarray,
    ):
        """Host half of an append — see CorpusStore.prepare_append for
        the fused protocol.  Returns dev_vals or None when empty."""
        n = idx.shape[0]
        if n == 0:
            return None
        self._ensure_capacity(start + next_pow2(n))
        self._host_idx[start : start + n] = idx
        self._host_tf[start : start + n] = tf
        self._host_len[start : start + n] = lens
        pad_idx = pad_rows_pow2(idx)
        # padding rows must stay -1 (no terms), not 0
        if pad_idx.shape[0] != n:
            pad_idx = pad_idx.copy()
            pad_idx[n:] = -1
        vals = {
            "doc_idx": jnp.asarray(pad_idx),
            "doc_tf": jnp.asarray(pad_rows_pow2(tf), jnp.bfloat16),
            "doc_len": jnp.asarray(pad_rows_pow2(lens)),
        }
        self._df += df_delta.astype(np.int64)
        self.df = jnp.asarray(np.minimum(self._df, 2**31 - 1).astype(np.int32))
        self.size = max(self.size, start + n)
        self.n_docs += n
        if self.has_postings:
            self._postings_append(start, idx, tf)
        return vals

    def device_arrays(self):
        return {"doc_idx": self.doc_idx, "doc_tf": self.doc_tf,
                "doc_len": self.doc_len}

    def commit_device(self, updated) -> None:
        self.doc_idx = updated["doc_idx"]
        self.doc_tf = updated["doc_tf"]
        self.doc_len = updated["doc_len"]

    def append_encoded(
        self,
        start: int,
        idx: np.ndarray,
        tf: np.ndarray,
        lens: np.ndarray,
        df_delta: np.ndarray,
    ) -> None:
        from .corpus import fused_append

        vals = self.prepare_append_encoded(start, idx, tf, lens, df_delta)
        if vals is None:
            return
        self.commit_device(
            fused_append(self.device_arrays(), jnp.int32(start), vals))

    # -- inverted postings (ops/postings.py) --------------------------------

    #: corpus size beyond which the manager auto-builds postings (the
    #: slot scan reads N*P slots/query; postings read T*cap).
    POSTINGS_AUTO_THRESHOLD = 50_000

    @property
    def has_postings(self) -> bool:
        return getattr(self, "_post_rows", None) is not None

    def build_postings(self, cap: int = 0,
                       valid: Optional[np.ndarray] = None) -> None:
        """Build the inverted layout from the slot layout; subsequent
        appends maintain it incrementally (append_encoded).

        ``valid`` (bool [size], from CorpusStore) drops deleted rows'
        postings entirely — the compaction path; without it dead rows
        stay in the lists and are masked at query time."""
        from ..ops.postings import auto_postings_cap, build_postings

        cap = cap or auto_postings_cap(max(self.n_docs, 1), self.doc_nnz,
                                       self.vocab_size)
        src_idx = self._host_idx[: self.size]
        if valid is not None:
            src_idx = np.where(np.asarray(valid[: self.size], bool)[:, None],
                               src_idx, -1)
        rows, tf = build_postings(src_idx,
                                  self._host_tf[: self.size],
                                  self.vocab_size, cap)
        self._postings_stale = 0
        self._post_cap = cap
        self._host_post_rows = rows
        self._host_post_tf = tf
        self._post_fill = (rows >= 0).sum(axis=1).astype(np.int64)
        self._post_rows = jnp.asarray(rows)
        self._post_tf = jnp.asarray(tf, jnp.bfloat16)
        # precomputed BM25 tf-weights: removes the per-posting doc_len
        # random gather from the query path (ops/postings.py
        # postings_tf_weights; ~25% of the 10M sparse stage).  avg_len
        # is frozen at build time; appends keep per-row dl exact but
        # the average drifts until the next rebuild (documented).
        from ..ops.postings import postings_tf_weights

        lens = self._host_len[: self.size]
        if valid is not None:
            live = np.asarray(valid[: self.size], bool)
            self._post_avg_len = float(lens[live].mean()) if live.any() else 1.0
        else:
            self._post_avg_len = float(lens.mean()) if self.size else 1.0
        tfw = postings_tf_weights(rows, tf, self._host_len[: self.size],
                                  self._post_avg_len,
                                  k1=self.config.bm25_k1,
                                  b=self.config.bm25_b)
        self._host_post_tfw = tfw
        self._post_tfw = jnp.asarray(tfw, jnp.bfloat16)

    @property
    def post_rows(self):
        return getattr(self, "_post_rows", None)

    @property
    def post_tf(self):
        return getattr(self, "_post_tf", None)

    @property
    def post_tfw(self):
        return getattr(self, "_post_tfw", None)

    @property
    def post_avg_len(self):
        return getattr(self, "_post_avg_len", None)

    def _postings_append(self, start: int, idx: np.ndarray,
                         tf: np.ndarray) -> None:
        """Incremental postings update for newly appended rows; grows the
        cap (x2, re-upload) when any touched term is full."""
        flat_t = idx.reshape(-1)
        keep = flat_t >= 0
        flat_t = flat_t[keep]
        flat_tf = tf.reshape(-1)[keep].astype(np.float32)
        flat_r = np.repeat(np.arange(idx.shape[0], dtype=np.int32) + start,
                           idx.shape[1])[keep]
        incoming = np.bincount(flat_t, minlength=self.vocab_size)
        grew = False
        while ((self._post_fill + incoming) > self._post_cap).any() \
                and self._post_cap < 16384:
            new_cap = self._post_cap * 2
            grown_r = np.full((self.vocab_size, new_cap), -1, np.int32)
            grown_r[:, : self._post_cap] = self._host_post_rows
            grown_t = np.zeros((self.vocab_size, new_cap), np.float32)
            grown_t[:, : self._post_cap] = self._host_post_tf
            grown_w = np.zeros((self.vocab_size, new_cap), np.float32)
            grown_w[:, : self._post_cap] = self._host_post_tfw
            self._host_post_rows, self._host_post_tf = grown_r, grown_t
            self._host_post_tfw = grown_w
            self._post_cap = new_cap
            grew = True
        # positions per posting: per-term running cursor (vectorized via
        # sort-by-term + searchsorted offsets)
        order = np.argsort(flat_t, kind="stable")
        st, sr, stf = flat_t[order], flat_r[order], flat_tf[order]
        first = np.searchsorted(st, np.arange(self.vocab_size))
        within = np.arange(len(st), dtype=np.int64) - first[st]
        pos = self._post_fill[st] + within
        ok = pos < self._post_cap  # beyond-cap postings dropped (hi limit)
        self._host_post_rows[st[ok], pos[ok]] = sr[ok]
        self._host_post_tf[st[ok], pos[ok]] = stf[ok]
        # tf-weight for the new postings: per-row dl is exact; avg_len
        # stays the build-time value until the next rebuild
        dl_new = self._host_len[sr[ok]].astype(np.float32)
        k1, b = self.config.bm25_k1, self.config.bm25_b
        avg = max(getattr(self, "_post_avg_len", 1.0) or 1.0, 1.0)
        denom = stf[ok] + k1 * (1.0 - b + b * dl_new / avg)
        tfw_new = (stf[ok] * (k1 + 1.0)
                   / np.maximum(denom, 1e-6)).astype(np.float32)
        self._host_post_tfw[st[ok], pos[ok]] = tfw_new
        np.add.at(self._post_fill, st[ok], 1)
        if grew:
            # capacity changed: one full upload of the grown layout
            self._post_rows = jnp.asarray(self._host_post_rows)
            self._post_tf = jnp.asarray(self._host_post_tf, jnp.bfloat16)
            self._post_tfw = jnp.asarray(self._host_post_tfw, jnp.bfloat16)
            return
        # steady state: device-side scatter of ONLY the new postings —
        # a full [V, cap] re-upload is ~1.5 GB at the 1M tier, vs
        # n*nnz scattered slots here.  Indices padded to pow2 buckets
        # with an idempotent repeat (same value re-written) so compiled
        # programs are reused across batch sizes.
        t_new, p_new = st[ok].astype(np.int32), pos[ok].astype(np.int32)
        r_new, tf_new = sr[ok], stf[ok]
        if len(t_new) == 0:
            return
        m = next_pow2(len(t_new))
        if m != len(t_new):
            padder = lambda a: np.concatenate(
                [a, np.repeat(a[:1], m - len(a), axis=0)])
            t_new, p_new = padder(t_new), padder(p_new)
            r_new, tf_new = padder(r_new), padder(tf_new)
        ti, pi = jnp.asarray(t_new), jnp.asarray(p_new)
        self._post_rows = self._post_rows.at[ti, pi].set(jnp.asarray(r_new))
        self._post_tf = self._post_tf.at[ti, pi].set(
            jnp.asarray(tf_new, jnp.bfloat16))
        tfw_dev = tfw_new
        if len(tfw_dev) != len(t_new):   # same idempotent pow2 padding
            tfw_dev = np.concatenate(
                [tfw_dev, np.repeat(tfw_dev[:1], len(t_new) - len(tfw_dev),
                                    axis=0)])
        self._post_tfw = self._post_tfw.at[ti, pi].set(
            jnp.asarray(tfw_dev, jnp.bfloat16))

    def search_postings(
        self,
        q_idx: np.ndarray,
        q_tf: np.ndarray,
        k: int,
        mask: Optional[jnp.ndarray] = None,
        *,
        scoring: str = "bm25",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if not self.has_postings:
            self.build_postings()
        # rung choice (10M attribution, docs/PERF.md round 5): the
        # scatter+approx_max_k aggregation wins for small query batches
        # on large corpora; the sort path amortizes bigger batches
        import jax as _jax

        q_n = np.asarray(q_idx).shape[0]
        impl = ("scatter"
                if (_jax.default_backend() == "tpu" and q_n <= 2
                    and self.doc_len.shape[0] >= 4_000_000
                    and scoring == "bm25")
                else "sort")
        return postings_topk(
            self._post_rows, self._post_tf, self.doc_len, self.df,
            jnp.float32(max(self.n_docs, 1)), jnp.asarray(q_idx),
            jnp.asarray(q_tf), k,
            mask[: self.doc_len.shape[0]] if mask is not None else None,
            post_tfw=(getattr(self, "_post_tfw", None)
                      if scoring == "bm25" else None),
            scoring=scoring, k1=self.config.bm25_k1, b=self.config.bm25_b,
            impl=impl,
        )

    def remove_rows(self, rows: Sequence[int]) -> None:
        """df bookkeeping for deletes (validity masking happens upstream).

        Postings lists keep the dead row ids (masked at query time) until
        the next rebuild; ``postings_stale_fraction`` drives compaction
        in MultiIndexManager.maintenance_tick."""
        rows = [r for r in rows if 0 <= r < self.size]
        if not rows:
            return
        df_delta = remove_documents_df(self._host_idx[np.asarray(rows)], self.vocab_size)
        self._df = np.maximum(self._df - df_delta.astype(np.int64), 0)
        self.df = jnp.asarray(np.minimum(self._df, 2**31 - 1).astype(np.int32))
        self.n_docs = max(self.n_docs - len(rows), 0)
        if self.has_postings:
            self._postings_stale = getattr(self, "_postings_stale", 0) + len(rows)

    @property
    def postings_stale_fraction(self) -> float:
        """Deleted-row postings still occupying list slots (0 when no
        postings are built)."""
        if not self.has_postings:
            return 0.0
        return getattr(self, "_postings_stale", 0) / max(self.n_docs, 1)

    def encode_query(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        return encode_queries(
            list(texts),
            self.vocab_size,
            self.config.query_nnz,
            drop_ratio=self.config.drop_ratio,
        )

    def search(
        self,
        q_idx: np.ndarray,
        q_tf: np.ndarray,
        k: int,
        mask: Optional[jnp.ndarray] = None,
        *,
        scoring: str = "bm25",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return sparse_topk(
            self.doc_idx,
            self.doc_tf,
            self.doc_len,
            self.df,
            jnp.float32(max(self.n_docs, 1)),
            jnp.asarray(q_idx),
            jnp.asarray(q_tf),
            k,
            mask,
            scoring=scoring,
            k1=self.config.bm25_k1,
            b=self.config.bm25_b,
        )

    def search_texts(
        self,
        texts: Sequence[str],
        k: int,
        mask: Optional[jnp.ndarray] = None,
        *,
        scoring: str = "bm25",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        q_idx, q_tf = self.encode_query(texts)
        return self.search(q_idx, q_tf, k, mask, scoring=scoring)

    def memory_bytes(self) -> int:
        # device layout: i32 ids (4B) + bf16 tf (2B) per slot, f32 len per row
        return self.capacity * self.doc_nnz * 6 + self.capacity * 4


__all__ = ["SparseIndex"]
