"""HuggingFace-checkpoint cross-encoder reranker.

The reference names ms-marco-MiniLM as its reranker but ships a
placeholder returning dummy scores (retrieval.py:651-681).  This loads
the REAL checkpoint (any sequence-classification cross-encoder, e.g.
cross-encoder/ms-marco-MiniLM-L-6-v2) from local files and runs it as a
jitted Flax forward on the TPU — same ``score``/``score_pairs`` surface
as models/cross_encoder.py, so it drops into the retriever's rerank
stage (`RAG_RERANKER=hf:<path>`).

Zero-egress environments: `local_files_only=True` always; PyTorch-only
checkpoints convert via `from_pt=True` (torch-cpu is available).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n and b < max_batch:
        b *= 2
    return min(b, max_batch)


class HFCrossEncoder:
    """Jitted pairwise relevance scorer from a local HF checkpoint."""

    def __init__(self, path: str, *, max_len: int = 256, max_batch: int = 64,
                 dtype: Any = jnp.float32):
        from transformers import (
            AutoTokenizer,
            FlaxAutoModelForSequenceClassification,
        )

        self.tokenizer = AutoTokenizer.from_pretrained(
            path, local_files_only=True)
        try:
            self.model = FlaxAutoModelForSequenceClassification.from_pretrained(
                path, local_files_only=True, dtype=dtype)
        except (OSError, EnvironmentError):
            self.model = FlaxAutoModelForSequenceClassification.from_pretrained(
                path, local_files_only=True, from_pt=True, dtype=dtype)
        self.max_len = max_len
        self.max_batch = max_batch

        @jax.jit
        def _forward(params, ids, mask, type_ids):
            # the FlaxPreTrainedModel __call__ fills position_ids /
            # head_mask defaults and is jit-traceable
            out = self.model(input_ids=ids, attention_mask=mask,
                             token_type_ids=type_ids, params=params,
                             train=False)
            logits = out.logits.astype(jnp.float32)          # [B, num_labels]
            # ms-marco-style rerankers have 1 label; multi-label heads
            # fall back to the first logit (relevance convention)
            return logits[:, 0]

        self._forward = _forward
        self._params = self.model.params

    def _tokenize(self, queries: Sequence[str], documents: Sequence[str],
                  batch: int):
        enc = self.tokenizer(
            list(queries), list(documents), padding="max_length",
            truncation=True, max_length=self.max_len, return_tensors="np")
        ids = enc["input_ids"].astype(np.int32)
        mask = enc["attention_mask"].astype(np.int32)
        type_ids = enc.get("token_type_ids")
        type_ids = (type_ids.astype(np.int32) if type_ids is not None
                    else np.zeros_like(ids))
        if ids.shape[0] < batch:
            pad = batch - ids.shape[0]
            ids = np.pad(ids, ((0, pad), (0, 0)))
            mask = np.pad(mask, ((0, pad), (0, 0)))
            type_ids = np.pad(type_ids, ((0, pad), (0, 0)))
        return ids, mask, type_ids

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
            b = _bucket(len(q_chunk), self.max_batch)
            ids, mask, type_ids = self._tokenize(q_chunk, d_chunk, b)
            s = self._forward(self._params, jnp.asarray(ids),
                              jnp.asarray(mask), jnp.asarray(type_ids))
            out[pos : pos + len(q_chunk)] = np.asarray(s)[: len(q_chunk)]
            pos += len(q_chunk)
        return out

    def score(self, query: str, documents: Sequence[str]) -> np.ndarray:
        return self.score_pairs([query] * len(documents), list(documents))


__all__ = ["HFCrossEncoder"]
