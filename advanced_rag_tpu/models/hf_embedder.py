"""HuggingFace-checkpoint embedder: real sentence-transformer weights.

The reference plugs external embedding APIs behind a thread pool
(indexing.py:553-599); here a LOCAL HF checkpoint (e.g. a MiniLM
sentence-transformer) runs as a jitted Flax forward on the TPU —
same `Embedder` protocol as HashingEmbedder/NeuralEmbedder, so it drops
into MultiIndexManager unchanged.

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


class HFEmbedder:
    """Jitted mean-pooled sentence embedder from a local HF checkpoint."""

    def __init__(self, path: str, *, max_len: int = 128, max_batch: int = 64,
                 dtype: Any = jnp.float32):
        from transformers import AutoTokenizer, FlaxAutoModel

        self.tokenizer = AutoTokenizer.from_pretrained(
            path, local_files_only=True)
        try:
            self.model = FlaxAutoModel.from_pretrained(
                path, local_files_only=True, dtype=dtype)
        except (OSError, EnvironmentError):
            # PyTorch-only checkpoint: convert weights once at load.
            self.model = FlaxAutoModel.from_pretrained(
                path, local_files_only=True, from_pt=True, dtype=dtype)
        self.max_len = max_len
        self.max_batch = max_batch
        self.dim = int(self.model.config.hidden_size)

        @jax.jit
        def _forward(params, ids, mask):
            # the FlaxPreTrainedModel __call__ fills position_ids /
            # head_mask defaults and is jit-traceable
            out = self.model(input_ids=ids, attention_mask=mask,
                             params=params, train=False)
            hidden = out.last_hidden_state.astype(jnp.float32)  # [B, L, H]
            m = mask[:, :, None].astype(jnp.float32)
            pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0)
            norm = jnp.sqrt(jnp.sum(pooled * pooled, axis=-1, keepdims=True))
            return pooled / jnp.maximum(norm, 1e-12)

        self._forward = _forward
        self._params = self.model.params

    def _tokenize(self, texts: Sequence[str], batch: int):
        enc = self.tokenizer(
            list(texts), padding="max_length", truncation=True,
            max_length=self.max_len, return_tensors="np")
        ids = enc["input_ids"].astype(np.int32)
        mask = enc["attention_mask"].astype(np.float32)
        if ids.shape[0] < batch:
            pad = batch - ids.shape[0]
            ids = np.pad(ids, ((0, pad), (0, 0)))
            mask = np.pad(mask, ((0, pad), (0, 0)))
        return ids, mask

    def encode_device(self, texts: Sequence[str]) -> jnp.ndarray:
        """Non-blocking device encode (async dispatch), <= max_batch texts."""
        b = _bucket(max(len(texts), 1), self.max_batch)
        ids, mask = self._tokenize(texts, b)
        return self._forward(self._params, jnp.asarray(ids),
                             jnp.asarray(mask))[: len(texts)]

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        if len(texts) == 0:
            return np.zeros((0, self.dim), np.float32)
        out = np.zeros((len(texts), self.dim), np.float32)
        pos = 0
        while pos < len(texts):
            chunk = list(texts[pos : pos + self.max_batch])
            out[pos : pos + len(chunk)] = np.asarray(self.encode_device(chunk))
            pos += len(chunk)
        return out


__all__ = ["HFEmbedder"]
