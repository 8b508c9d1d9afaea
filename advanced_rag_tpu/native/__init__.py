"""Native (C++) fast paths, loaded via ctypes.

The reference's only native component is the external Milvus server;
here the device kernels replace that, and this package natively
accelerates the remaining HOST hot loops — per-token hashing/tf
aggregation and n-gram diagnostics (SURVEY.md §3.1 hot loops #1-#3).

The shared library compiles on first use with g++ (cached next to the
source, keyed by source hash) and is OPTIONAL: every entry point has a
pure-Python reference implementation (index/text.py,
pipeline/diagnostics.py) that remains the source of truth.  Disable
with ADVANCED_RAG_TPU_NO_NATIVE=1.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "text_native.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:12]
    out = _SRC.parent / f"text_native_{tag}.so"
    if not out.exists():
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               str(_SRC), "-o", str(out)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.SubprocessError, FileNotFoundError) as exc:
            logger.info("native build unavailable (%s); using python path", exc)
            return None
    lib = ctypes.CDLL(str(out))
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.art_encode_documents.argtypes = [
        ctypes.c_char_p, i64p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, i32p, f32p, f32p, i32p]
    lib.art_encode_queries.argtypes = [
        ctypes.c_char_p, i64p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float, i32p, f32p]
    lib.art_text_stats.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, f64p]
    lib.art_split_sentences.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, i64p, i64p, i32p, ctypes.c_int32]
    lib.art_split_sentences.restype = ctypes.c_int32
    lib.art_quick_stats.argtypes = [ctypes.c_char_p, ctypes.c_int64, f64p]
    lib.art_analyze_document.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_char_p, i64p, ctypes.c_int64, i32p, ctypes.c_int32,
        f64p, i64p, i64p, i64p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if os.environ.get("ADVANCED_RAG_TPU_NO_NATIVE"):
        return None
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            try:
                _LIB = _build_and_load()
            except Exception:  # any failure -> python fallback
                logger.exception("native load failed; using python path")
                _LIB = None
        return _LIB


def _pack(texts: Sequence[str]) -> Tuple[bytes, np.ndarray]:
    encoded = [t.encode("utf-8", "ignore") for t in texts]
    offsets = np.zeros(len(encoded) + 1, np.int64)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    return b"".join(encoded), offsets


def encode_documents_native(
    texts: Sequence[str], vocab_size: int, doc_nnz: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """C++ fast path for index.text.encode_documents; None if unavailable."""
    lib = get_lib()
    if lib is None or not texts:
        return None
    buf, offsets = _pack(texts)
    n = len(texts)
    doc_idx = np.full((n, doc_nnz), -1, np.int32)
    doc_tf = np.zeros((n, doc_nnz), np.float32)
    doc_len = np.zeros((n,), np.float32)
    df_delta = np.zeros((vocab_size,), np.int32)
    lib.art_encode_documents(
        buf, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, vocab_size, doc_nnz,
        doc_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        doc_tf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        doc_len.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        df_delta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return doc_idx, doc_tf, doc_len, df_delta


def encode_queries_native(
    texts: Sequence[str], vocab_size: int, query_nnz: int,
    drop_ratio: float = 0.0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None or not texts:
        return None
    buf, offsets = _pack(texts)
    n = len(texts)
    q_idx = np.full((n, query_nnz), -1, np.int32)
    q_tf = np.zeros((n, query_nnz), np.float32)
    lib.art_encode_queries(
        buf, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, vocab_size, query_nnz, drop_ratio,
        q_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        q_tf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return q_idx, q_tf


def text_stats_native(text: str, drop_stopwords: bool = False):
    """(tokens, entropy, r1, r2, r3, distinct) or None."""
    lib = get_lib()
    if lib is None:
        return None
    data = text.encode("utf-8", "ignore")
    out = np.zeros(6, np.float64)
    lib.art_text_stats(data, len(data), int(drop_stopwords),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return tuple(out.tolist())


__all__ = [
    "get_lib",
    "encode_documents_native",
    "encode_queries_native",
    "text_stats_native",
]


def split_sentences_native(text: str):
    """C++ fast path for chunking: -> (sentences, token_counts) in one
    pass, or None if unavailable.  Matches diagnostics.split_sentences
    + per-sentence len(tokenize_words(s)) on ASCII whitespace (unicode
    whitespace falls back to the python path upstream)."""
    lib = get_lib()
    if lib is None or not text:
        return None
    raw = text.encode("utf-8", "ignore")
    # realistic sentences are tens of bytes; start with a conservative
    # cap (a len//2 bound would allocate ~10x the text in scratch) and
    # retry with the worst-case bound only if it fills up
    max_sents = min(len(raw) // 8 + 16, len(raw) // 2 + 1)
    while True:
        starts = np.zeros(max_sents, np.int64)
        ends = np.zeros(max_sents, np.int64)
        counts = np.zeros(max_sents, np.int32)
        n = lib.art_split_sentences(
            raw, len(raw),
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_sents)
        if n < max_sents or max_sents >= len(raw) // 2 + 1:
            break
        max_sents = len(raw) // 2 + 1
    sentences = [raw[starts[i]:ends[i]].decode("utf-8", "ignore")
                 for i in range(n)]
    return sentences, counts[:n].tolist()


def quick_stats_native(text: str):
    """(token_count, entropy, distinct) for per-chunk quick stats, or
    None.  Token rule matches diagnostics.tokenize_words exactly
    (apostrophe included), so no content guard is needed."""
    lib = get_lib()
    if lib is None:
        return None
    data = text.encode("utf-8", "ignore")
    out = np.zeros(3, np.float64)
    lib.art_quick_stats(data, len(data),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return int(out[0]), float(out[1]), int(out[2])


def analyze_document_native(text: str, lexicons):
    """One-pass document diagnostics: returns a dict with token_count,
    entropy, ngrams {1,2,3}, distinct, sentence_count, coherence,
    domain hit-rates per lexicon (in iteration order), and the top-20
    token distribution — or None.  ASCII-gated by the caller."""
    lib = get_lib()
    if lib is None:
        return None
    raw = text.encode("utf-8", "ignore")
    names = list(lexicons.keys())
    words, ids = [], []
    for li, name in enumerate(names):
        for w in lexicons[name]:
            words.append(w.encode("utf-8", "ignore"))
            ids.append(li)
    lex_buf = b"".join(words)
    lex_off = np.zeros(len(words) + 1, np.int64)
    np.cumsum([len(w) for w in words], out=lex_off[1:])
    lex_ids = np.asarray(ids, np.int32)
    out = np.zeros(8 + len(names), np.float64)
    top_off = np.zeros(20, np.int64)
    top_len = np.zeros(20, np.int64)
    top_cnt = np.zeros(20, np.int64)
    lib.art_analyze_document(
        raw, len(raw), lex_buf,
        lex_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(words),
        lex_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(names),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        top_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        top_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        top_cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    dist = {}
    for k in range(20):
        if top_off[k] < 0 or top_cnt[k] == 0:
            break
        word = raw[top_off[k]:top_off[k] + top_len[k]].decode(
            "utf-8", "ignore").lower()
        dist[word] = int(top_cnt[k])
    return {
        "token_count": int(out[0]),
        "entropy": float(out[1]),
        "ngrams": {1: float(out[2]), 2: float(out[3]), 3: float(out[4])},
        "distinct": int(out[5]),
        "sentence_count": int(out[6]),
        "coherence": float(out[7]),
        "domain_scores": {name: float(out[8 + i])
                          for i, name in enumerate(names)},
        "token_distribution": dist,
    }
