"""Checkpoint/restore: full index state round-trips exactly."""

import numpy as np

from advanced_rag_tpu.index.corpus import ChunkRecord
from advanced_rag_tpu.index.manager import MultiIndexManager
from advanced_rag_tpu.utils.checkpoint import load_index, save_index


def _records(n=40):
    return [
        ChunkRecord(chunk_id=f"c{i}", doc_id=f"d{i % 4}",
                    content=f"chunk {i} about topic {'alpha' if i % 2 else 'beta'}",
                    chunk_index=i, token_count=6, entropy=0.5,
                    timestamp=1000.0 + i)
        for i in range(n)
    ]


def test_roundtrip(tmp_path):
    m1 = MultiIndexManager()
    m1.index_chunks(_records())
    m1.delete_by_filter({"doc_id": "d3"})
    before = m1.hybrid_search_sync("alpha topic", 5)
    manifest = save_index(m1, tmp_path / "ckpt")
    assert manifest["size"] == 40

    m2 = MultiIndexManager()
    load_index(m2, tmp_path / "ckpt")
    after = m2.hybrid_search_sync("alpha topic", 5)

    assert [h["chunk_id"] for h in after] == [h["chunk_id"] for h in before]
    np.testing.assert_allclose([h["score"] for h in after],
                               [h["score"] for h in before], rtol=1e-5)
    # deleted rows stay deleted
    assert all(h["doc_id"] != "d3" for h in after)
    assert m2.store.n_valid() == m1.store.n_valid()
    # re-ingest after restore: live rows dedupe (content-hash chunk ids);
    # only the 10 deleted d3 rows are re-added
    m2.index_chunks(_records())
    assert m2.store.size == 50
    assert m2.store.n_valid() == 40


def test_load_requires_fresh_manager(tmp_path):
    m1 = MultiIndexManager()
    m1.index_chunks(_records(8))
    save_index(m1, tmp_path / "ckpt")
    import pytest

    with pytest.raises(ValueError):
        load_index(m1, tmp_path / "ckpt")
