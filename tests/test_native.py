"""Native C++ text kernels == the pure-Python reference implementation.

The native path mirrors index/text.py exactly (same blake2b hash, same
tokenizer, same Counter tie-break), so indexes built by either path are
interchangeable.
"""

import os

import numpy as np
import pytest

from advanced_rag_tpu.native import (
    encode_documents_native,
    encode_queries_native,
    get_lib,
    text_stats_native,
)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")

TEXTS = [
    "The Quick Brown Fox jumps over the lazy dog!  Again: quick, quick.",
    "alpha beta GAMMA delta alpha beta alpha 42 numbers 42 too",
    "",
    "stopwords the and of in a an should vanish from this text",
    "unicode café naïve über tokens split on non-ascii",
]


def _python_encode_documents(texts, vocab, nnz):
    os.environ["ADVANCED_RAG_TPU_NO_NATIVE"] = "1"
    try:
        import importlib

        from advanced_rag_tpu.index import text as text_mod
        return text_mod.encode_documents.__wrapped__(texts, vocab, nnz) \
            if hasattr(text_mod.encode_documents, "__wrapped__") \
            else _call_python(text_mod, texts, vocab, nnz)
    finally:
        del os.environ["ADVANCED_RAG_TPU_NO_NATIVE"]


def _call_python(text_mod, texts, vocab, nnz):
    return text_mod.encode_documents(texts, vocab, nnz)


def test_encode_documents_matches_python():
    from advanced_rag_tpu.index import text as text_mod

    vocab, nnz = 4096, 16
    native = encode_documents_native(TEXTS, vocab, nnz)
    assert native is not None
    os.environ["ADVANCED_RAG_TPU_NO_NATIVE"] = "1"
    try:
        ref = text_mod.encode_documents(TEXTS, vocab, nnz)
    finally:
        del os.environ["ADVANCED_RAG_TPU_NO_NATIVE"]
    for got, want, name in zip(native, ref,
                               ("doc_idx", "doc_tf", "doc_len", "df_delta")):
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_encode_queries_matches_python():
    from advanced_rag_tpu.index import text as text_mod

    vocab, nnz = 4096, 8
    queries = ["Quick fox QUERY", "alpha beta alpha beta gamma delta x y z w"]
    native = encode_queries_native(queries, vocab, nnz, drop_ratio=0.2)
    assert native is not None
    os.environ["ADVANCED_RAG_TPU_NO_NATIVE"] = "1"
    try:
        ref = text_mod.encode_queries(queries, vocab, nnz, drop_ratio=0.2)
    finally:
        del os.environ["ADVANCED_RAG_TPU_NO_NATIVE"]
    np.testing.assert_array_equal(native[0], ref[0])
    np.testing.assert_array_equal(native[1], ref[1])


def test_text_stats_sane():
    stats = text_stats_native("one two three one two one", drop_stopwords=False)
    tokens, entropy, r1, r2, r3, distinct = stats
    assert tokens == 6 and distinct == 3
    assert 0 < entropy <= 1
    assert r1 == pytest.approx(0.5)   # 3 unique / 6 total
    assert 0 <= r2 <= 1 and 0 <= r3 <= 1


def test_repeated_text_redundancy():
    stats = text_stats_native("same same same same", drop_stopwords=False)
    assert stats[2] == pytest.approx(0.75)  # 1 unique / 4
    assert stats[1] == 0.0                  # zero entropy


def test_hash_parity_with_python():
    """The blake2b term hash must match hashlib exactly."""
    from advanced_rag_tpu.index.text import hash_term

    vocab = 16384
    native = encode_documents_native(["zebra"], vocab, 4)
    assert native[0][0, 0] == hash_term("zebra", vocab)


class TestSplitSentencesNative:
    CASES = [
        "Simple one. And two! Then three? Done.",
        "No terminal punctuation here",
        "Para one line.\n\nPara two starts here. And ends.",
        "Trailing spaces.   \n\n   Leading spaces after blank.",
        "Mixed \n \n no split on broken blank line",
        "a.b stays joined. but this splits.  Double-space delim.",
        "Ends with punct and space. ",
        "  leading ws then text. second piece.",
        "don't drop apostrophes. can't count wrong.",
        "newline run\n\n\n\nmany blanks",
        "ascii separators a.\x1cb split. like\x1d python? whitespace\x1e!",
        "end.\x1d start again.",
        "",
        "   ",
    ]

    def test_matches_python_split_and_counts(self):
        from advanced_rag_tpu.native import split_sentences_native
        from advanced_rag_tpu.pipeline.diagnostics import (
            split_sentences,
            tokenize_words,
        )

        if split_sentences_native("probe. text.") is None:
            pytest.skip("native build unavailable")
        for text in self.CASES:
            got = split_sentences_native(text)
            want = split_sentences(text)
            if got is None:
                assert text == ""  # empty input short-circuits
                continue
            sents, counts = got
            assert sents == want, text
            assert counts == [len(tokenize_words(s)) for s in want], text

    def test_chunker_output_identical(self):
        import os

        from advanced_rag_tpu.pipeline.chunking import AdaptiveChunker

        text = ("The quick brown fox jumps. " * 40 + "\n\n" +
                "Second paragraph with different words here! " * 30 +
                "Tail question, yes? Final words.")
        ch = AdaptiveChunker()
        native = ch.chunk_document(text, doc_id="d")
        os.environ["ADVANCED_RAG_TPU_NO_NATIVE"] = "1"
        try:
            python = ch.chunk_document(text, doc_id="d")
        finally:
            del os.environ["ADVANCED_RAG_TPU_NO_NATIVE"]
        assert [c.content for c in native] == [c.content for c in python]
        assert [c.metadata.start_char for c in native] == \
            [c.metadata.start_char for c in python]


class TestAnalyzeDocumentNative:
    CASES = [
        "The quick brown fox jumps over the lazy dog. " * 20,
        "Algorithm api architecture! Database deployment encryption. "
        "Patient therapy treatment?",
        "One sentence only without punctuation",
        "Para one.\n\nPara two here. Three! Four? " * 10,
        "don't can't won't isn't. apostrophes count once.",
        "",
        "Repeat repeat repeat repeat. Repeat repeat repeat.",
        "asset audit bond capital. appeal attorney breach clause!",
    ]

    def test_full_parity_with_python(self):
        """Every DiagnosticMetrics field matches the pure-python path:
        counts exactly, floats to 1e-9, dicts (top-20 distribution,
        domain scores, n-gram redundancy) exactly."""
        import os

        from advanced_rag_tpu.pipeline.diagnostics import DocumentDiagnostics

        d = DocumentDiagnostics()
        from advanced_rag_tpu.native import analyze_document_native

        if analyze_document_native("probe. text.", d.lexicons) is None:
            pytest.skip("native build unavailable")
        for t in self.CASES:
            a = d.analyze_document(t)
            os.environ["ADVANCED_RAG_TPU_NO_NATIVE"] = "1"
            try:
                b = d.analyze_document(t)
            finally:
                del os.environ["ADVANCED_RAG_TPU_NO_NATIVE"]
            assert a.token_count == b.token_count, t
            assert a.sentence_count == b.sentence_count, t
            for f in ("entropy", "redundancy", "domain_density",
                      "vocabulary_diversity", "coherence", "complexity"):
                assert abs(getattr(a, f) - getattr(b, f)) < 1e-9, (f, t)
            assert a.token_distribution == b.token_distribution, t
            assert a.domain_scores == b.domain_scores, t
            for g in (1, 2, 3):
                assert abs(a.ngram_redundancy[g]
                           - b.ngram_redundancy[g]) < 1e-9, (g, t)

    def test_unicode_falls_back(self):
        from advanced_rag_tpu.pipeline.diagnostics import DocumentDiagnostics

        d = DocumentDiagnostics()
        m = d.analyze_document("Füchse springen. Und laufen weiter.")
        assert m.token_count > 0  # python path handles it
