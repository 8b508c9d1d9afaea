"""Cross-encoder reranker running on the TPU.

Replaces the reference's ms-marco-MiniLM *placeholder* that returns
dummy scores (retrieval.py:651-681) with a real jitted Flax
cross-encoder: [CLS] query [SEP] doc [SEP] through the shared trunk,
scalar relevance head, batched over (query, candidate) pairs so the
top-20 -> top-5 rerank is one MXU forward pass.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .encoder import CrossEncoder, EncoderConfig, init_cross_encoder
from .tokenizer import HashingTokenizer, TokenizerConfig


class CrossEncoderReranker:
    """Jitted pairwise scorer with padded batch buckets."""

    def __init__(
        self,
        config: Optional[EncoderConfig] = None,
        params: Any = None,
        tokenizer: Optional[HashingTokenizer] = None,
        seed: int = 0,
        max_batch: int = 64,
        max_len: int = 128,
        q_len: Optional[int] = None,
        d_len: Optional[int] = None,
    ):
        self.config = config or EncoderConfig(max_len=max_len)
        # Static-slot pair layout (tokenizer.encode_pairs_static): the
        # SAME layout the fused on-device program builds (ops/e2e.py)
        # and train/rerank.py trains with, so one checkpoint scores
        # identically on the host path and the fused path.
        self.q_len = q_len if q_len is not None else min(
            32, self.config.max_len // 3)
        self.d_len = d_len if d_len is not None else (
            self.config.max_len - self.q_len - 1)
        if self.q_len + self.d_len + 1 > self.config.max_len:
            raise ValueError(
                f"pair length {self.q_len}+{self.d_len}+1 exceeds "
                f"encoder max_len {self.config.max_len}")
        self.tokenizer = tokenizer or HashingTokenizer(
            TokenizerConfig(vocab_size=self.config.vocab_size,
                            max_len=self.config.max_len)
        )
        if params is None:
            self.model, self.params = init_cross_encoder(self.config, seed)
        else:
            self.model = CrossEncoder(self.config)
            self.params = params
        self.max_batch = max_batch

        @jax.jit
        def _apply(params, ids, mask, segs):
            return self.model.apply(params, ids, mask, segs)

        self._apply = _apply

    def score(self, query: str, documents: Sequence[str]) -> np.ndarray:
        """Relevance scores [len(documents)] f32 for one query."""
        return self.score_pairs([query] * len(documents), list(documents))

    def score_pairs(
        self, queries: Sequence[str], documents: Sequence[str]
    ) -> np.ndarray:
        if len(queries) != len(documents):
            raise ValueError("queries and documents must align")
        n = len(queries)
        if n == 0:
            return np.zeros((0,), np.float32)
        out = np.zeros((n,), np.float32)
        pos = 0
        while pos < n:
            q_chunk = list(queries[pos : pos + self.max_batch])
            d_chunk = list(documents[pos : pos + self.max_batch])
            b = 1
            while b < len(q_chunk) and b < self.max_batch:
                b *= 2
            ids, mask, segs = self.tokenizer.encode_pairs_static(
                q_chunk, d_chunk, self.q_len, self.d_len)
            if ids.shape[0] < b:
                pad = b - ids.shape[0]
                ids = np.pad(ids, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
                segs = np.pad(segs, ((0, pad), (0, 0)))
            s = self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask),
                            jnp.asarray(segs))
            out[pos : pos + len(q_chunk)] = np.asarray(s)[: len(q_chunk)]
            pos += len(q_chunk)
        return out


__all__ = ["CrossEncoderReranker"]
