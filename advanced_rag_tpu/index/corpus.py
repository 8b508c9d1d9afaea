"""Device-resident corpus store: packed metadata columns + host records.

Replaces the Milvus collection schemas (reference indexing.py:191-225:
id/chunk_id/doc_id/content/chunk_index/token_count + entropy/redundancy/
domain_density scalars + embedding + metadata_json + timestamp) with:

- **device columns** (f32/i32/i64 arrays in HBM, power-of-two capacity,
  contiguous `dynamic_update_slice` appends) for everything a filter or
  scoring op touches;
- **host records** (chunk_id/doc_id/content/metadata dicts) for
  everything only the response needs.

Metadata filtering — Milvus ``expr`` strings built by the reference's
security filter builder (retrieval.py:566-632) — becomes a typed dict
spec compiled to an on-device boolean mask: field whitelist enforced
here, no string parsing, no injection surface at all.
"""

from __future__ import annotations

import functools
import hashlib
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import IndexConstants
from ..utils.exceptions import ValidationError

#: Fields a filter may reference (reference whitelist retrieval.py:566-569).
FILTERABLE_FIELDS = frozenset(
    {
        "doc_id",
        "chunk_id",
        "chunk_index",
        "token_count",
        "entropy",
        "redundancy",
        "domain_density",
        "timestamp",
    }
)

#: Operators a filter may use (reference whitelist retrieval.py:571).
FILTER_OPERATORS = frozenset({"eq", "ne", "in", "gt", "gte", "lt", "lte"})

_MAX_IN_TERMS = 16


def stable_hash64(text: str) -> int:
    """Stable 63-bit string hash for device-side id comparisons."""
    h = hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "little") & 0x7FFF_FFFF_FFFF_FFFF


@dataclass
class ChunkRecord:
    """One indexed chunk (host view)."""

    chunk_id: str
    doc_id: str
    content: str
    chunk_index: int = 0
    token_count: int = 0
    entropy: float = 0.0
    redundancy: float = 0.0
    domain_density: float = 0.0
    timestamp: float = field(default_factory=time.time)
    metadata: Dict[str, Any] = field(default_factory=dict)


# Device columns are 32-bit (JAX runs with x64 disabled); 64-bit string
# hashes are split into two 31-bit halves compared jointly.
_COLUMN_SPECS = {
    "doc_hash_lo": np.int32,
    "doc_hash_hi": np.int32,
    "chunk_hash_lo": np.int32,
    "chunk_hash_hi": np.int32,
    "chunk_index": np.int32,
    "token_count": np.int32,
    "entropy": np.float32,
    "redundancy": np.float32,
    "domain_density": np.float32,
    "timestamp": np.float32,
}

#: string-id fields -> (lo, hi) column pair
_HASH_FIELDS = {
    "doc_id": ("doc_hash_lo", "doc_hash_hi"),
    "chunk_id": ("chunk_hash_lo", "chunk_hash_hi"),
}

_FIELD_TO_COLUMN = {
    "chunk_index": "chunk_index",
    "token_count": "token_count",
    "entropy": "entropy",
    "redundancy": "redundancy",
    "domain_density": "domain_density",
    "timestamp": "timestamp",
}


def split_hash64(h: int) -> tuple[int, int]:
    return h & 0x7FFF_FFFF, (h >> 31) & 0x7FFF_FFFF


@functools.partial(jax.jit, donate_argnums=(0,))
def fused_append(arrays: dict, start: jnp.ndarray, vals: dict):
    """Row-appends to ANY set of device arrays in ONE program: one
    compile per pow2 batch bucket and one dispatch per ingest, instead
    of one per array or store (compiles cost seconds on a remote chip;
    dispatches cost ~28 ms).  The manager fuses corpus columns + dense
    embeddings + sparse slots through this single program (BACKLOG #6);
    stores also use it for their standalone appends."""
    out = {}
    for name, arr in arrays.items():
        idx = (start,) + (jnp.int32(0),) * (arr.ndim - 1)
        out[name] = jax.lax.dynamic_update_slice(arr, vals[name], idx)
    return out


# backwards-compatible alias (corpus columns were the first fused append)
_append_columns = fused_append


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def pad_rows_pow2(arr: np.ndarray) -> np.ndarray:
    """Pad axis 0 to the next power of two so jitted append/update
    programs see a bounded set of shapes (log2 buckets, not one per
    batch size).  Padded rows land beyond ``size`` where they are
    unused until a later append claims them."""
    n = arr.shape[0]
    p = next_pow2(max(n, 1))
    if p == n:
        return arr
    pad = [(0, p - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


class CorpusStore:
    """Append-only chunk store with device metadata columns.

    Row ids are stable positions; deletes flip the validity mask
    (the right-to-forget path additionally drops host content).
    Capacity grows by powers of two; every device column keeps a
    synchronized numpy mirror so growth and persistence are exact.
    """

    def __init__(self, min_capacity: int = IndexConstants.MIN_CAPACITY):
        self.capacity = int(min_capacity)
        self.size = 0
        self._host_cols: Dict[str, np.ndarray] = {
            name: np.zeros(self.capacity, dtype=dt)
            for name, dt in _COLUMN_SPECS.items()
        }
        self._host_valid = np.zeros(self.capacity, dtype=bool)
        self._dev_cols: Dict[str, jnp.ndarray] = {
            name: jnp.asarray(col) for name, col in self._host_cols.items()
        }
        self._dev_valid = jnp.asarray(self._host_valid)
        # host-only record fields
        self.chunk_ids: List[str] = []
        self.doc_ids: List[str] = []
        self.contents: List[Optional[str]] = []
        self.metadata: List[Dict[str, Any]] = []
        self._chunk_row: Dict[str, int] = {}

    # -- growth ------------------------------------------------------------

    def _ensure_capacity(self, needed: int) -> None:
        if needed <= self.capacity:
            return
        new_cap = self.capacity
        while new_cap < needed:
            new_cap *= IndexConstants.GROWTH_FACTOR
        for name, col in self._host_cols.items():
            grown = np.zeros(new_cap, dtype=col.dtype)
            grown[: self.capacity] = col
            self._host_cols[name] = grown
        grown_valid = np.zeros(new_cap, dtype=bool)
        grown_valid[: self.capacity] = self._host_valid
        self._host_valid = grown_valid
        self.capacity = new_cap
        self._dev_cols = {
            name: jnp.asarray(col) for name, col in self._host_cols.items()
        }
        self._dev_valid = jnp.asarray(self._host_valid)

    # -- append / delete ----------------------------------------------------

    def prepare_append(
        self, records: Sequence[ChunkRecord]
    ) -> Tuple[List[int], Optional[Tuple[int, Dict[str, jnp.ndarray]]]]:
        """Host-side half of an append: dedupe, grow capacity, update
        host mirrors/records, and build the padded device values.

        Returns ``(rows, pending)``; ``pending = (start, dev_vals)`` must
        be applied by running ``fused_append`` over ``device_arrays()``
        and passing the result to ``commit_device`` (the manager fuses
        this with the dense/sparse appends into ONE device program), or
        is None when every record was an idempotent duplicate."""
        fresh: List[ChunkRecord] = []
        pending: Dict[str, int] = {}  # chunk_id -> index into fresh (intra-batch dup)
        rows: List[int] = []
        for rec in records:
            existing = self._chunk_row.get(rec.chunk_id)
            if existing is not None and self._host_valid[existing]:
                rows.append(existing)
            elif rec.chunk_id in pending:
                rows.append(-2 - pending[rec.chunk_id])  # placeholder
            else:
                pending[rec.chunk_id] = len(fresh)
                fresh.append(rec)
                rows.append(-2 - pending[rec.chunk_id])
        if not fresh:
            return rows, None

        start = self.size
        n = len(fresh)
        n_pad = next_pow2(n)
        self._ensure_capacity(start + n_pad)
        doc_h = [split_hash64(stable_hash64(r.doc_id)) for r in fresh]
        chunk_h = [split_hash64(stable_hash64(r.chunk_id)) for r in fresh]
        cols = {
            "doc_hash_lo": np.array([h[0] for h in doc_h], np.int32),
            "doc_hash_hi": np.array([h[1] for h in doc_h], np.int32),
            "chunk_hash_lo": np.array([h[0] for h in chunk_h], np.int32),
            "chunk_hash_hi": np.array([h[1] for h in chunk_h], np.int32),
            "chunk_index": np.array([r.chunk_index for r in fresh], np.int32),
            "token_count": np.array([r.token_count for r in fresh], np.int32),
            "entropy": np.array([r.entropy for r in fresh], np.float32),
            "redundancy": np.array([r.redundancy for r in fresh], np.float32),
            "domain_density": np.array([r.domain_density for r in fresh], np.float32),
            "timestamp": np.array([r.timestamp for r in fresh], np.float32),
        }
        for name, vals in cols.items():
            self._host_cols[name][start : start + n] = vals
        self._host_valid[start : start + n] = True
        valid_vals = np.zeros(n_pad, dtype=bool)
        valid_vals[:n] = True
        dev_vals = {name: jnp.asarray(pad_rows_pow2(vals))
                    for name, vals in cols.items()}
        dev_vals["__valid__"] = jnp.asarray(valid_vals)
        # host records, in fresh order (rows start..start+n-1)
        for offset, rec in enumerate(fresh):
            self.chunk_ids.append(rec.chunk_id)
            self.doc_ids.append(rec.doc_id)
            self.contents.append(rec.content)
            self.metadata.append(dict(rec.metadata))
            self._chunk_row[rec.chunk_id] = start + offset
        rows = [r if r >= 0 else start + (-2 - r) for r in rows]
        self.size = start + n
        return rows, (start, dev_vals)

    def device_arrays(self) -> Dict[str, jnp.ndarray]:
        """Device arrays keyed like prepare_append's dev_vals."""
        d = dict(self._dev_cols)
        d["__valid__"] = self._dev_valid
        return d

    def commit_device(self, updated: Dict[str, jnp.ndarray]) -> None:
        updated = dict(updated)
        self._dev_valid = updated.pop("__valid__")
        self._dev_cols = updated

    def append(self, records: Sequence[ChunkRecord]) -> List[int]:
        """Insert records; returns their row ids. Duplicate chunk_ids are
        idempotent upserts (content-hash ids make re-ingest a no-op,
        reference chunking.py:357-364)."""
        rows, pending = self.prepare_append(records)
        if pending is not None:
            start, dev_vals = pending
            self.commit_device(
                fused_append(self.device_arrays(), jnp.int32(start), dev_vals)
            )
        return rows

    def delete_rows(self, rows: Iterable[int], *, forget_content: bool = False) -> int:
        rows = [r for r in rows if 0 <= r < self.size and self._host_valid[r]]
        if not rows:
            return 0
        idx = np.asarray(rows, dtype=np.int64)
        self._host_valid[idx] = False
        # pad to pow2 with a repeated (idempotent) index to bound recompiles
        padded = np.full(next_pow2(len(rows)), idx[0], dtype=np.int64)
        padded[: len(rows)] = idx
        self._dev_valid = self._dev_valid.at[jnp.asarray(padded)].set(False)
        if forget_content:
            for r in rows:
                self.contents[r] = None
                self.metadata[r] = {}
        return len(rows)

    def rows_for_doc(self, doc_id: str) -> List[int]:
        lo, hi = split_hash64(stable_hash64(doc_id))
        hits = np.nonzero(
            (self._host_cols["doc_hash_lo"][: self.size] == lo)
            & (self._host_cols["doc_hash_hi"][: self.size] == hi)
            & self._host_valid[: self.size]
        )[0]
        return hits.tolist()

    # -- filters -------------------------------------------------------------

    def _hash_eq_mask(self, fld: str, value: Any) -> jnp.ndarray:
        if not isinstance(value, str):
            raise ValidationError(f"filter on {fld} requires a string")
        lo_col, hi_col = _HASH_FIELDS[fld]
        lo, hi = split_hash64(stable_hash64(value))
        return jnp.logical_and(
            self._dev_cols[lo_col] == jnp.int32(lo),
            self._dev_cols[hi_col] == jnp.int32(hi),
        )

    @staticmethod
    def _numeric_value(fld: str, value: Any) -> Any:
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise ValidationError(f"filter on {fld} requires a number")
        return value

    def build_filter_mask(
        self, filters: Optional[Dict[str, Any]]
    ) -> Optional[jnp.ndarray]:
        """Compile a typed filter spec to a device boolean mask [capacity].

        Spec: ``{"doc_id": "d1"}``, ``{"doc_id": {"in": [...]}}``,
        ``{"domain_density": {"gte": 0.2, "lt": 0.8}}``, ...
        Unknown fields/operators raise ValidationError — the typed
        equivalent of the reference's whitelist + escaping
        (retrieval.py:566-632), with no string expression to inject into.
        """
        if not filters:
            return None
        mask = self._dev_valid
        for fld, cond in filters.items():
            if fld not in FILTERABLE_FIELDS:
                raise ValidationError(f"field not filterable: {fld!r}")
            if not isinstance(cond, dict):
                cond = {"eq": cond}
            for op, value in cond.items():
                if op not in FILTER_OPERATORS:
                    raise ValidationError(f"operator not allowed: {op!r}")
                if fld in _HASH_FIELDS:
                    if op == "eq":
                        m = self._hash_eq_mask(fld, value)
                    elif op == "ne":
                        m = jnp.logical_not(self._hash_eq_mask(fld, value))
                    elif op == "in":
                        if not isinstance(value, (list, tuple)) or not value:
                            raise ValidationError("'in' requires a non-empty list")
                        if len(value) > _MAX_IN_TERMS:
                            raise ValidationError(
                                f"'in' supports at most {_MAX_IN_TERMS} values"
                            )
                        m = self._hash_eq_mask(fld, value[0])
                        for v in value[1:]:
                            m = jnp.logical_or(m, self._hash_eq_mask(fld, v))
                    else:
                        raise ValidationError(
                            f"operator {op!r} not valid for string field {fld!r}"
                        )
                else:
                    col = self._dev_cols[_FIELD_TO_COLUMN[fld]]
                    if op == "in":
                        if not isinstance(value, (list, tuple)) or not value:
                            raise ValidationError("'in' requires a non-empty list")
                        if len(value) > _MAX_IN_TERMS:
                            raise ValidationError(
                                f"'in' supports at most {_MAX_IN_TERMS} values"
                            )
                        terms = jnp.asarray(
                            [self._numeric_value(fld, v) for v in value],
                            dtype=col.dtype,
                        )
                        m = jnp.any(col[:, None] == terms[None, :], axis=1)
                    else:
                        v = jnp.asarray(self._numeric_value(fld, value),
                                        dtype=col.dtype)
                        m = {
                            "eq": col == v,
                            "ne": col != v,
                            "gt": col > v,
                            "gte": col >= v,
                            "lt": col < v,
                            "lte": col <= v,
                        }[op]
                mask = jnp.logical_and(mask, m)
        return mask

    # -- views ----------------------------------------------------------------

    @property
    def valid_mask(self) -> jnp.ndarray:
        return self._dev_valid

    @property
    def device_columns(self) -> Dict[str, jnp.ndarray]:
        return dict(self._dev_cols)

    def n_valid(self) -> int:
        return int(self._host_valid[: self.size].sum())

    def hit(self, row: int, score: float, **extra: Any) -> Dict[str, Any]:
        """Materialize one search hit (host record + scalar columns)."""
        rec = {
            "row": row,
            "chunk_id": self.chunk_ids[row],
            "doc_id": self.doc_ids[row],
            "content": self.contents[row],
            "score": float(score),
            "chunk_index": int(self._host_cols["chunk_index"][row]),
            "token_count": int(self._host_cols["token_count"][row]),
            "entropy": float(self._host_cols["entropy"][row]),
            "redundancy": float(self._host_cols["redundancy"][row]),
            "domain_density": float(self._host_cols["domain_density"][row]),
            "timestamp": float(self._host_cols["timestamp"][row]),
            "metadata": self.metadata[row],
        }
        rec.update(extra)
        return rec

    def stats(self) -> Dict[str, Any]:
        return {
            "size": self.size,
            "valid": self.n_valid(),
            "capacity": self.capacity,
            "num_docs": len(set(self.doc_ids)),
        }


__all__ = [
    "ChunkRecord",
    "CorpusStore",
    "FILTERABLE_FIELDS",
    "FILTER_OPERATORS",
    "stable_hash64",
]
