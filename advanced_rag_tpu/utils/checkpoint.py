"""Index persistence: serialize device state to disk and mmap-restore.

The reference's durability is Milvus ``flush()`` after insert
(indexing.py:429-431) plus content-hash chunk ids for idempotent
re-ingest.  Here the index IS device arrays, so durability = writing
the host mirrors + record tables to disk (SURVEY.md §5 "checkpoint /
resume": serialize index shards and restore).

Format: a directory with
- ``manifest.json``  — sizes, dims, dtypes, framework version;
- ``columns.npz``    — corpus metadata columns + validity;
- ``dense_<name>.npy`` (mmap-restorable) — embedding matrices;
- ``sparse.npz``     — doc_idx/doc_tf/doc_len/df;
- ``records.jsonl``  — chunk_id/doc_id/content/metadata rows.

Orbax is available in this image but targets pytree model checkpoints;
the index wants column-level mmap restore, so this stays explicit.
"""

from __future__ import annotations

import json
import time

import jax
from pathlib import Path
from typing import TYPE_CHECKING, Any, Dict

import numpy as np

if TYPE_CHECKING:  # pragma: no cover
    from ..index.manager import MultiIndexManager

FORMAT_VERSION = 1


def save_index(manager: "MultiIndexManager", path: str | Path) -> Dict[str, Any]:
    """Write the full index state; returns the manifest."""
    root = Path(path)
    root.mkdir(parents=True, exist_ok=True)
    store = manager.store

    np.savez_compressed(
        root / "columns.npz",
        valid=store._host_valid[: store.size],
        **{name: col[: store.size] for name, col in store._host_cols.items()},
    )

    manifest: Dict[str, Any] = {
        "format_version": FORMAT_VERSION,
        "saved_at": time.time(),
        "size": store.size,
        "dense": {},
        "sparse": None,
    }

    families = {"semantic": manager.semantic}
    if manager.domain is not None:
        families["domain"] = manager.domain
    for name, idx in families.items():
        np.save(root / f"dense_{name}.npy", idx._host[: idx.size])
        manifest["dense"][name] = {
            "dim": idx.dim,
            "size": idx.size,
            "dtype": str(idx.config.dtype),
            "metric": idx.config.metric.value,
        }
        if idx._pq is not None:
            # persist trained codebooks so restore re-encodes with the
            # SAME quantizer (codes stay comparable across restarts)
            np.save(root / f"dense_{name}_pq.npy",
                    np.asarray(idx._pq.codebooks, np.float32))
            manifest["dense"][name]["pq"] = {
                "m": idx._pq.m, "bits": idx._pq.bits,
                "opq": idx._pq_rot is not None,
            }
            if idx._pq_rot is not None:
                np.save(root / f"dense_{name}_opq.npy",
                        np.asarray(idx._pq_rot, np.float32))
        if idx._ivfpq is not None:
            # persist both quantizers; restore re-packs partitions with
            # them (device-side assign+encode, no k-means on load)
            np.save(root / f"dense_{name}_ivfpq_cent.npy",
                    np.asarray(idx._ivfpq.centroids, np.float32))
            np.save(root / f"dense_{name}_ivfpq_cb.npy",
                    np.asarray(idx._ivfpq.codebooks, np.float32))
            manifest["dense"][name]["ivfpq"] = {
                "nlist": int(idx._ivfpq.centroids.shape[0]),
                "m": int(idx._ivfpq.codebooks.shape[0]),
                "bits": idx.config.pq_bits,
            }

    if manager.sparse is not None:
        sp = manager.sparse
        np.savez_compressed(
            root / "sparse.npz",
            doc_idx=sp._host_idx[: sp.size],
            doc_tf=sp._host_tf[: sp.size],
            doc_len=sp._host_len[: sp.size],
            df=sp._df,
        )
        manifest["sparse"] = {
            "vocab_size": sp.vocab_size,
            "doc_nnz": sp.doc_nnz,
            "size": sp.size,
            "n_docs": sp.n_docs,
        }

    with open(root / "records.jsonl", "w", encoding="utf-8") as f:
        for row in range(store.size):
            f.write(json.dumps({
                "chunk_id": store.chunk_ids[row],
                "doc_id": store.doc_ids[row],
                "content": store.contents[row],
                "metadata": store.metadata[row],
            }) + "\n")

    with open(root / "manifest.json", "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_index(manager: "MultiIndexManager", path: str | Path) -> Dict[str, Any]:
    """Restore state saved by ``save_index`` into a FRESH manager.

    Embedding matrices load via np.load(mmap_mode='r') and stream to the
    device in one put per family — no per-row python loop.
    """
    root = Path(path)
    with open(root / "manifest.json", encoding="utf-8") as f:
        manifest = json.load(f)
    if manifest["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint format "
                         f"{manifest['format_version']}")
    store = manager.store
    if store.size != 0:
        raise ValueError("load_index requires a fresh manager")

    n = manifest["size"]
    cols = np.load(root / "columns.npz")

    # records first (host tables)
    with open(root / "records.jsonl", encoding="utf-8") as f:
        for row, line in enumerate(f):
            rec = json.loads(line)
            store.chunk_ids.append(rec["chunk_id"])
            store.doc_ids.append(rec["doc_id"])
            store.contents.append(rec["content"])
            store.metadata.append(rec["metadata"])
            store._chunk_row[rec["chunk_id"]] = row

    store._ensure_capacity(n)
    for name in store._host_cols:
        store._host_cols[name][:n] = cols[name]
    store._host_valid[:n] = cols["valid"]
    store.size = n
    import jax.numpy as jnp

    store._dev_cols = {name: jnp.asarray(col)
                       for name, col in store._host_cols.items()}
    store._dev_valid = jnp.asarray(store._host_valid)

    for name, meta in manifest["dense"].items():
        idx = manager.semantic if name == "semantic" else manager.domain
        if idx is None:
            continue
        emb = np.load(root / f"dense_{name}.npy", mmap_mode="r")
        idx._ensure_capacity(meta["size"])
        idx._host[: meta["size"]] = emb
        idx.size = meta["size"]
        pq_meta = meta.get("pq")
        if pq_meta and idx._pq_mode:
            import jax.numpy as _jnp

            from ..ops.pq import PQCodebook

            idx._pq = PQCodebook(
                codebooks=_jnp.asarray(np.load(root / f"dense_{name}_pq.npy")),
                m=int(pq_meta["m"]), bits=int(pq_meta["bits"]),
            )
            if pq_meta.get("opq"):
                idx._pq_rot = _jnp.asarray(
                    np.load(root / f"dense_{name}_opq.npy"))
            idx._pq_reencode_all()  # bf16 upload + device-side encode
        ivfpq_meta = meta.get("ivfpq")
        if ivfpq_meta and idx._pq_mode:
            # searches read m/bits from the RESTORING config
            # (DenseIndex.search passes bits=config.pq_bits), so the
            # persisted quantizer geometry must be written back into it —
            # a checkpoint saved at pq_bits=8 loaded under a default
            # pq_bits=4 config would otherwise silently ADC-sum only 16
            # of 256 code values
            idx.config.pq_m = int(ivfpq_meta["m"])
            idx.config.pq_bits = int(ivfpq_meta["bits"])
            idx.build_ivfpq(
                nlist=int(ivfpq_meta["nlist"]),
                centroids=np.load(root / f"dense_{name}_ivfpq_cent.npy"),
                codebooks=np.load(root / f"dense_{name}_ivfpq_cb.npy"),
            )
        if pq_meta and idx._pq_mode:
            pass  # emb already holds codes (re-encoded above) — the
            #       float restore below must NOT overwrite them
        elif idx._sq8:
            from ..ops.quant import sq8_quantize_host

            codes, scale = sq8_quantize_host(idx._host[: idx.size])
            full_c = np.zeros((idx.capacity, idx.dim), np.int8)
            full_c[: idx.size] = codes
            full_s = np.zeros((idx.capacity,), np.float32)
            full_s[: idx.size] = scale
            idx.emb = jax.device_put(full_c)
            idx.emb_scale = jax.device_put(full_s)
        else:
            from ..index.dense_index import _to_host_dtype

            idx.emb = jax.device_put(_to_host_dtype(idx._host, idx._dtype))

    if manifest["sparse"] and manager.sparse is not None:
        sp = manager.sparse
        data = np.load(root / "sparse.npz")
        size = manifest["sparse"]["size"]
        sp._ensure_capacity(size)
        sp._host_idx[:size] = data["doc_idx"]
        sp._host_tf[:size] = data["doc_tf"]
        sp._host_len[:size] = data["doc_len"]
        sp._df[:] = data["df"]
        sp.doc_idx = jnp.asarray(sp._host_idx)
        sp.doc_tf = jnp.asarray(sp._host_tf, jnp.bfloat16)
        sp.doc_len = jnp.asarray(sp._host_len)
        sp.df = jnp.asarray(np.minimum(sp._df, 2**31 - 1).astype(np.int32))
        sp.size = size
        sp.n_docs = manifest["sparse"]["n_docs"]

    if manager.token_table is not None:
        # tokens are deterministic given contents — rebuild instead of
        # persisting the table (index/token_table.py)
        manager.token_table.rebuild(manager.store.contents)
    return manifest


__all__ = ["save_index", "load_index", "FORMAT_VERSION"]
