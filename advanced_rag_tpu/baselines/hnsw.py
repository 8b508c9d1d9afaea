"""ctypes wrapper over native/hnsw_native.cpp (clean-room HNSW, CPU).

Mirrors the hnswlib surface the reference's Milvus deployment implies:
build(M, ef_construction) + search(k, ef), inner-product metric over
pre-normalized vectors (cosine).  Build compiles the shared library on
first use exactly like the text fast path (native/__init__.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent.parent / "native" / "hnsw_native.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        src = _SRC.read_text()
        tag = hashlib.sha256(src.encode()).hexdigest()[:12]
        out = _SRC.parent / f"hnsw_native_{tag}.so"
        if not out.exists():
            cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                   "-fPIC", "-std=c++17", str(_SRC), "-o", str(out)]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=180)
            except (subprocess.SubprocessError, FileNotFoundError):
                # no libgomp on this host: fall back to sequential
                cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                       "-std=c++17", str(_SRC), "-o", str(out)]
                try:
                    subprocess.run(cmd, check=True, capture_output=True,
                                   timeout=180)
                except (subprocess.SubprocessError,
                        FileNotFoundError) as exc:
                    logger.warning("hnsw baseline build failed: %s", exc)
                    return None
        lib = ctypes.CDLL(str(out))
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.art_hnsw_build.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_uint64]
        lib.art_hnsw_build.restype = ctypes.c_void_p
        lib.art_hnsw_search.argtypes = [
            ctypes.c_void_p, f32p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, i32p, f32p]
        lib.art_hnsw_memory_bytes.argtypes = [ctypes.c_void_p]
        lib.art_hnsw_memory_bytes.restype = ctypes.c_int64
        lib.art_hnsw_max_level.argtypes = [ctypes.c_void_p]
        lib.art_hnsw_max_level.restype = ctypes.c_int32
        lib.art_hnsw_free.argtypes = [ctypes.c_void_p]
        lib.art_hnsw_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.art_hnsw_save.restype = ctypes.c_int32
        lib.art_hnsw_load.argtypes = [ctypes.c_char_p]
        lib.art_hnsw_load.restype = ctypes.c_void_p
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


class HNSWBaseline:
    """Build-once / search-many HNSW graph over normalized vectors.

    Knobs default to the reference's semantic collection
    (indexing.py:150-153): M=16, ef_construction=200, search ef=64.
    """

    def __init__(self, vectors: np.ndarray, *, M: int = 16,
                 ef_construction: int = 200, seed: int = 0,
                 normalize: bool = True, cache_path=None):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "hnsw_native.so unavailable (g++ missing?) — the HNSW "
                "baseline is a benchmarking tool and has no python path")
        v = np.ascontiguousarray(vectors, dtype=np.float32)
        if normalize:
            v = v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        self.n, self.dim = v.shape
        self.M = M
        self._lib = lib
        self._idx = None
        if cache_path is not None and Path(cache_path).exists():
            idx = lib.art_hnsw_load(str(cache_path).encode())
            if idx:
                self._idx = idx
        if self._idx is None:
            self._idx = lib.art_hnsw_build(
                v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.n, self.dim, M, ef_construction, seed)
            if cache_path is not None:
                rc = lib.art_hnsw_save(self._idx,
                                       str(cache_path).encode())
                if rc != 0:
                    logger.warning("hnsw graph cache save failed: %s",
                                   cache_path)

    def search(self, queries: np.ndarray, k: int, *, ef: int = 64,
               normalize: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        q = np.ascontiguousarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if normalize:
            q = q / np.maximum(
                np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        nq = q.shape[0]
        ids = np.empty((nq, k), np.int32)
        scores = np.empty((nq, k), np.float32)
        self._lib.art_hnsw_search(
            self._idx, q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nq, k, max(ef, k),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return scores, ids

    def graph_bytes(self) -> int:
        """Graph-only memory (links + levels), excluding raw vectors."""
        return int(self._lib.art_hnsw_memory_bytes(self._idx))

    def memory_bytes(self) -> int:
        """Equal-memory accounting: f32 vectors + graph (what an HNSW
        deployment actually holds resident; hnswlib stores both)."""
        return self.n * self.dim * 4 + self.graph_bytes()

    @property
    def max_level(self) -> int:
        return int(self._lib.art_hnsw_max_level(self._idx))

    def __del__(self):
        idx = getattr(self, "_idx", None)
        if idx:
            self._lib.art_hnsw_free(idx)
            self._idx = None


__all__ = ["HNSWBaseline", "available"]
