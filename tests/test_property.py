"""Model-based test: random ingest/delete/search walks keep the device
index consistent with a naive host-side reference model."""

import numpy as np

from advanced_rag_tpu.index.corpus import ChunkRecord
from advanced_rag_tpu.index.manager import MultiIndexManager

# heavy compiles / large corpora: nightly + pre-merge (pytest -m slow)
pytestmark = __import__("pytest").mark.slow

WORDS = ["alpha", "beta", "gamma", "delta", "fox", "zeta", "query", "chip"]


def _record(rng, i):
    words = " ".join(rng.choice(WORDS, size=6).tolist())
    return ChunkRecord(chunk_id=f"c{i}", doc_id=f"d{i % 7}",
                       content=f"{words} item {i}", token_count=8)


def test_random_walk_consistency(rng):
    m = MultiIndexManager()
    live = {}          # chunk_id -> doc_id (reference model)
    next_id = 0

    for step in range(12):
        op = rng.choice(["ingest", "delete", "search", "reingest"])
        if op == "ingest" or not live:
            batch = [_record(rng, next_id + j) for j in range(int(rng.integers(1, 8)))]
            next_id += len(batch)
            report = m.index_chunks(batch)
            assert not report["errors"]
            for rec in batch:
                live[rec.chunk_id] = rec.doc_id
        elif op == "delete":
            doc = rng.choice(sorted({d for d in live.values()}))
            removed = m.delete_by_filter({"doc_id": str(doc)})
            expected = [c for c, d in live.items() if d == doc]
            assert removed == len(expected)
            for c in expected:
                del live[c]
        elif op == "reingest":
            # re-ingesting live chunks is a no-op (content-hash dedup)
            ids = sorted(live)[:3]
            size_before = m.store.size
            m.index_chunks([
                ChunkRecord(chunk_id=c, doc_id=live[c],
                            content="ignored-on-dup", token_count=1)
                for c in ids
            ])
            assert m.store.size == size_before
        else:
            if not live:
                continue
            hits = m.hybrid_search_sync(
                " ".join(rng.choice(WORDS, size=3).tolist()), 8)
            for h in hits:
                assert h["chunk_id"] in live, "deleted row surfaced"
                assert live[h["chunk_id"]] == h["doc_id"]

        # invariant: device validity count matches the model
        assert m.store.n_valid() == len(live)

    # final filtered search honors the model exactly
    if live:
        doc = sorted(live.values())[0]
        hits = m.hybrid_search_sync("alpha beta gamma", 20,
                                    filters={"doc_id": doc})
        assert all(h["doc_id"] == doc for h in hits)
        assert all(h["chunk_id"] in live for h in hits)


def test_random_walk_pq_tier_with_maintenance(rng, monkeypatch):
    """Same random-walk model on the PQ tier, with maintenance ticks
    interleaved: the staged build (bf16 -> flat codes -> IVF-PQ) and
    the residual tail must never surface deleted rows, lose live ones,
    or desync the validity model — across tier transitions."""
    from advanced_rag_tpu.config import PipelineConfig
    from advanced_rag_tpu.utils import constants

    monkeypatch.setattr(constants.IndexConstants, "IVF_AUTO_THRESHOLD", 24)
    m = MultiIndexManager(config=PipelineConfig(semantic_dtype="pq"))
    live = {}
    next_id = 0
    tiers_seen = set()

    for step in range(16):
        op = rng.choice(["ingest", "delete", "search", "maintain"])
        if op == "ingest" or not live:
            batch = [_record(rng, next_id + j)
                     for j in range(int(rng.integers(2, 10)))]
            next_id += len(batch)
            report = m.index_chunks(batch)
            assert not report["errors"]
            for rec in batch:
                live[rec.chunk_id] = rec.doc_id
        elif op == "delete":
            doc = rng.choice(sorted({d for d in live.values()}))
            removed = m.delete_by_filter({"doc_id": str(doc)})
            expected = [c for c, d in live.items() if d == doc]
            assert removed == len(expected)
            for c in expected:
                del live[c]
        elif op == "maintain":
            m.maintenance_tick()
        else:
            hits = m.hybrid_search_sync(
                " ".join(rng.choice(WORDS, size=3).tolist()), 8)
            for h in hits:
                assert h["chunk_id"] in live, "deleted row surfaced"
                assert live[h["chunk_id"]] == h["doc_id"]
            # pure-dense path too (exercises refine + ivfpq dispatch)
            dh = m.search_sync("semantic", "alpha fox chip", 5)
            for h in dh:
                assert h["chunk_id"] in live
        tiers_seen.add((m.semantic.has_pq, m.semantic.has_ivfpq))
        assert m.store.n_valid() == len(live)

    # force the tier boundary: top up past the threshold and tick
    while m.store.n_valid() < 24:
        batch = [_record(rng, next_id + j) for j in range(8)]
        next_id += len(batch)
        m.index_chunks(batch)
        for rec in batch:
            live[rec.chunk_id] = rec.doc_id
    m.maintenance_tick()
    assert m.semantic.has_pq and m.semantic.has_ivfpq
    assert m.store.n_valid() == len(live)
    # post-build: deletes + appends keep working through the new tier
    doc = sorted(live.values())[0]
    removed = m.delete_by_filter({"doc_id": str(doc)})
    for c in [c for c, d in list(live.items()) if d == doc]:
        del live[c]
    batch = [_record(rng, next_id + j) for j in range(3)]
    next_id += 3
    m.index_chunks(batch)
    for rec in batch:
        live[rec.chunk_id] = rec.doc_id
    assert m.store.n_valid() == len(live)
    hits = m.hybrid_search_sync("alpha beta gamma fox", 12)
    for h in hits:
        assert h["chunk_id"] in live, "deleted row surfaced post-build"
    # every live chunk is retrievable by its own distinctive content
    sample = sorted(live)[:5]
    for cid in sample:
        row = m.store._chunk_row[cid]
        content = m.store.contents[row]
        hits = m.hybrid_search_sync(content, 10)
        assert any(h["chunk_id"] == cid for h in hits), (cid, content)
