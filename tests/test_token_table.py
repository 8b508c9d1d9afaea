"""TokenTable: device-resident text column (index/token_table.py).

Covers the growth / rebuild / fused-append protocol edges that the
e2e tests only exercise implicitly.
"""

import numpy as np

from advanced_rag_tpu.index.token_table import TokenTable
from advanced_rag_tpu.models.tokenizer import HashingTokenizer, TokenizerConfig


def _table(max_len=16, min_capacity=8):
    tok = HashingTokenizer(TokenizerConfig(max_len=max_len))
    return TokenTable(tok, max_len=max_len, min_capacity=min_capacity)


class TestTokenTable:
    def test_prepare_commit_roundtrip(self):
        t = _table()
        upd = t.prepare_append(0, ["alpha beta", "gamma"])
        assert upd is not None and upd["tok"].shape[1] == t.max_len
        # fused-ingest protocol: host mirror updated at prepare, device
        # arrays swapped at commit
        t.commit_device({"tok": upd["tok"]})
        assert t.size == 2
        assert np.asarray(t.tokens)[:2].any()

    def test_empty_append_is_noop(self):
        t = _table()
        assert t.prepare_append(0, []) is None
        assert t.size == 0

    def test_capacity_doubles_and_preserves_rows(self):
        t = _table(min_capacity=4)
        first = t.prepare_append(0, ["one", "two"])
        del first
        before = t._host[:2].copy()
        t.prepare_append(2, [f"doc {i}" for i in range(10)])
        assert t.capacity >= 16  # grew past min_capacity=4
        np.testing.assert_array_equal(t._host[:2], before)
        assert t.size == 12

    def test_rebuild_matches_fresh_encode(self):
        texts = ["retrieval kernel", "sparse postings", "dense scan"]
        t = _table()
        t.prepare_append(0, texts)
        fresh = _table()
        fresh.rebuild(texts)
        np.testing.assert_array_equal(
            np.asarray(fresh.tokens)[:3], t._host[:3])
        assert fresh.size == 3

    def test_rebuild_empty_corpus(self):
        t = _table()
        t.prepare_append(0, ["something"])
        t.rebuild([])
        assert t.size == 0
        assert not np.asarray(t.tokens).any()

    def test_memory_bytes_tracks_capacity(self):
        t = _table(max_len=16, min_capacity=8)
        assert t.memory_bytes() == 8 * 16 * 4
        t.prepare_append(0, [f"d{i}" for i in range(20)])
        assert t.memory_bytes() == t.capacity * 16 * 4
