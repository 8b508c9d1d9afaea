"""Embedding generators that run on the TPU.

Two implementations behind one interface (``encode(texts) -> [B, D]``):

- ``NeuralEmbedder`` — the MiniLM-class Flax bi-encoder (encoder.py),
  jitted with bucketed batch shapes.  Replaces the reference's
  ThreadPoolExecutor(8) around an external embedding API
  (indexing.py:122-126, :580-587) with one batched MXU forward pass.
- ``HashingEmbedder`` — deterministic, training-free: hashed term
  counts projected through a fixed signed random projection that lives
  on device.  Replaces the reference's random-vector placeholder
  fallback (indexing.py:594-597) with something reproducible AND
  similarity-preserving (cosine tracks lexical overlap), so the whole
  pipeline is meaningful without trained weights.

Both produce L2-normalized f32 vectors, so cosine == inner product and
the dense index can store bf16 and search with metric='ip'.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Protocol, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .encoder import BiEncoder, EncoderConfig, init_bi_encoder
from .tokenizer import HashingTokenizer, TokenizerConfig


class Embedder(Protocol):
    """Interface the index layer consumes (sync; async wrappers upstream)."""

    dim: int

    def encode(self, texts: Sequence[str]) -> np.ndarray: ...


def _bucket(n: int, max_batch: int) -> int:
    """Next power-of-two batch bucket, capping jit recompiles."""
    b = 1
    while b < n and b < max_batch:
        b *= 2
    return min(b, max_batch)


class NeuralEmbedder:
    """Jitted Flax bi-encoder with padded batch buckets."""

    def __init__(
        self,
        dim: int = 384,
        config: Optional[EncoderConfig] = None,
        params: Any = None,
        tokenizer: Optional[HashingTokenizer] = None,
        seed: int = 0,
        max_batch: int = 128,
    ):
        self.config = config or EncoderConfig()
        self.dim = dim
        self.tokenizer = tokenizer or HashingTokenizer(
            TokenizerConfig(vocab_size=self.config.vocab_size,
                            max_len=self.config.max_len)
        )
        if params is None:
            self.model, self.params = init_bi_encoder(self.config, dim, seed)
        else:
            self.model = BiEncoder(self.config, out_dim=dim)
            self.params = params
        self.max_batch = max_batch
        # Cache identity: the module-level embedding caches are shared
        # across managers and key on TEXT — two different same-dim
        # models would silently exchange embeddings (observed: a second
        # manager scoring another model's cached corpus vectors,
        # top-1 recall 0.01).  A per-instance tag partitions the cache.
        import uuid

        self.cache_tag = f"neural{dim}-{uuid.uuid4().hex[:12]}"

        @functools.partial(jax.jit, static_argnames=())
        def _apply(params, ids, mask):
            return self.model.apply(params, ids, mask)

        self._apply = _apply

    def encode_device(self, texts: Sequence[str]) -> jnp.ndarray:
        """Single-bucket device encode; returns WITHOUT blocking so the
        caller can queue the search program behind it (async dispatch).
        For > max_batch texts use `encode`."""
        b = _bucket(max(len(texts), 1), self.max_batch)
        ids, mask = self.tokenizer.encode_batch(list(texts))
        if ids.shape[0] < b:
            pad = b - ids.shape[0]
            ids = np.pad(ids, ((0, pad), (0, 0)))
            mask = np.pad(mask, ((0, pad), (0, 0)))
        return self._apply(self.params, jnp.asarray(ids),
                           jnp.asarray(mask))[: len(texts)]

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        if len(texts) == 0:
            return np.zeros((0, self.dim), np.float32)
        out = np.zeros((len(texts), self.dim), np.float32)
        pos = 0
        while pos < len(texts):
            chunk = texts[pos : pos + self.max_batch]
            b = _bucket(len(chunk), self.max_batch)
            ids, mask = self.tokenizer.encode_batch(list(chunk))
            if ids.shape[0] < b:
                pad = b - ids.shape[0]
                ids = np.pad(ids, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
            emb = self._apply(self.params, jnp.asarray(ids), jnp.asarray(mask))
            out[pos : pos + len(chunk)] = np.asarray(emb)[: len(chunk)]
            pos += len(chunk)
        return out


class HashingEmbedder:
    """Deterministic signed-random-projection embedder (device gather)."""

    def __init__(
        self,
        dim: int = 384,
        vocab_size: int = 16384,
        doc_nnz: int = 128,
        seed: int = 0,
    ):
        self.dim = dim
        self.vocab_size = vocab_size
        self.doc_nnz = doc_nnz
        # deterministic embedder => deterministic cache identity: two
        # HashingEmbedders with the same knobs produce identical vectors,
        # so they may share cache entries (see NeuralEmbedder.cache_tag)
        self.cache_tag = f"hash{dim}v{vocab_size}s{seed}"
        key = jax.random.PRNGKey(seed)
        # fixed +-1/sqrt(dim) projection; lives in HBM once.
        self._proj = (
            jax.random.rademacher(key, (vocab_size, dim), dtype=jnp.float32)
            / np.sqrt(dim)
        )

        @jax.jit
        def _project(proj, idx, tf):
            ok = (idx >= 0).astype(jnp.float32)
            rows = proj[jnp.clip(idx, 0)]                    # [B, P, D]
            w = (tf * ok)[:, :, None]
            emb = jnp.sum(rows * w, axis=1)                  # [B, D]
            norm = jnp.sqrt(jnp.sum(emb * emb, axis=-1, keepdims=True))
            return emb / jnp.maximum(norm, 1e-12)

        self._project = _project

    def encode_device(self, texts: Sequence[str]) -> jnp.ndarray:
        """Device encode without host sync (see NeuralEmbedder.encode_device)."""
        # Deferred: index.text also imports the models package (cycle).
        from ..index.text import encode_documents

        idx, tf, _, _ = encode_documents(list(texts), self.vocab_size, self.doc_nnz)
        return self._project(self._proj, jnp.asarray(idx), jnp.asarray(tf))

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        if len(texts) == 0:
            return np.zeros((0, self.dim), np.float32)
        return np.asarray(self.encode_device(texts))


__all__ = ["Embedder", "NeuralEmbedder", "HashingEmbedder"]
