"""Device-resident token table: the text column of the corpus, in HBM.

Enables the one-dispatch retrieve+rerank program (ops/e2e.py): the
cross-encoder gathers its candidate documents ON DEVICE from the hybrid
search output, so rerank costs zero extra host round trips.  Rows align
1:1 with the CorpusStore; appends participate in the manager's fused
single-dispatch ingest via the same prepare/commit protocol as
DenseIndex (index/dense_index.py).

Storage is [capacity, max_len] int32 ([CLS] body [SEP], pad_id-padded);
a host mirror supports growth and checkpoint restore (tokens are
deterministic given contents, so checkpoints rebuild from the corpus
instead of persisting the table).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .corpus import next_pow2


class TokenTable:
    def __init__(self, tokenizer, *, max_len: int = 48,
                 min_capacity: int = 1024):
        self.tokenizer = tokenizer
        self.max_len = int(max_len)
        self.capacity = int(min_capacity)
        self.size = 0
        self.tokens = jnp.zeros((self.capacity, self.max_len), jnp.int32)
        self._host = np.zeros((self.capacity, self.max_len), np.int32)

    def _encode(self, texts: Sequence[str]) -> np.ndarray:
        ids, _ = self.tokenizer.encode_batch(list(texts), self.max_len)
        return ids.astype(np.int32)

    def _ensure_capacity(self, needed: int) -> None:
        if needed <= self.capacity:
            return
        new_cap = self.capacity
        while new_cap < needed:
            new_cap *= 2
        grown = np.zeros((new_cap, self.max_len), np.int32)
        grown[: self.capacity] = self._host
        self._host = grown
        self.capacity = new_cap
        self.tokens = jnp.asarray(grown)

    def prepare_append(self, start: int,
                       texts: Sequence[str]) -> Optional[Dict]:
        ids = self._encode(texts)
        n = ids.shape[0]
        if n == 0:
            return None
        self._ensure_capacity(start + next_pow2(n))
        self._host[start: start + n] = ids
        pad = next_pow2(n) - n
        self.size = max(self.size, start + n)
        return {"tok": jnp.asarray(np.pad(ids, ((0, pad), (0, 0))))}

    def device_arrays(self) -> Dict[str, jnp.ndarray]:
        return {"tok": self.tokens}

    def commit_device(self, updated: Dict[str, jnp.ndarray]) -> None:
        self.tokens = updated["tok"]

    def rebuild(self, contents: Sequence[str]) -> None:
        """Checkpoint restore: re-tokenize the corpus (deterministic)."""
        self.size = 0
        self._ensure_capacity(next_pow2(max(len(contents), 1)))
        self._host[:] = 0
        if contents:
            self._host[: len(contents)] = self._encode(contents)
            self.size = len(contents)
        self.tokens = jax.device_put(self._host)

    def memory_bytes(self) -> int:
        return self.capacity * self.max_len * 4


__all__ = ["TokenTable"]
