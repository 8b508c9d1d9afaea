"""Bake the serving XLA compile cache at image-build / pre-deploy time.

Cold-start attribution (artifacts/COLD_START.json) shows warm-up — XLA
compiling every serving program shape — IS the cold-start cost: restore
is sub-second, build a few seconds, compiles tens to hundreds of
seconds on a fresh cache.  The persistent compile cache
(JAX_COMPILATION_CACHE_DIR, on by default in the service —
service/app.py _enable_compile_cache) removes all of it on the SECOND
boot of a build; this script runs the exact deploy path once so the
FIRST production boot is the second compile.

Usage (at image build or as a pre-deploy hook, with the same env the
service will run under — RAG_* knobs change program shapes):

    RAG_CHECKPOINT_DIR=/ckpts/corpus \
    JAX_COMPILATION_CACHE_DIR=/var/cache/rag_tpu_xla \
    python scripts/bake_serving_cache.py

It boots ServiceState exactly like `python -m advanced_rag_tpu.service.app`
(config from env, checkpoint restore, warm_up over every pow2
micro-batch bucket and k-bucket, fused one-dispatch signatures
included), then exits.  Deploys that mount the same cache directory —
or bake it into the image — boot with every compile a cache hit
(measured as the "warm" row of scripts/bench_cold_start.py).

The corpus CAPACITY is a compile-relevant shape: bake against the same
checkpoint (or one with the same pow2 capacity) the deploy will
restore, or the bake misses those shapes.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_repo = str(_Path(__file__).resolve().parent.parent)
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import json
import os
import tempfile
import time


def main() -> None:
    t0 = time.time()
    os.environ.setdefault("RAG_WARMUP", "1")
    # chat DB is irrelevant to the bake; keep it out of the image
    os.environ.setdefault("CHAT_DB_PATH",
                          os.path.join(tempfile.mkdtemp(), "bake.db"))
    from advanced_rag_tpu.service.app import create_app

    app = create_app()
    state = app["state"]
    rows = state.pipeline.index_manager.store.size
    if rows == 0:
        print("WARNING: no checkpoint restored (RAG_CHECKPOINT_DIR "
              "unset or empty) — only ingest-independent shapes baked",
              flush=True)
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/rag_tpu_xla"))
    n_entries = sum(1 for _ in _Path(cache).glob("*")) \
        if _Path(cache).exists() else 0
    state.pipeline.close()
    print(json.dumps({
        "baked_s": round(time.time() - t0, 1),
        "corpus_rows": rows,
        "cache_dir": cache,
        "cache_entries": n_entries,
    }))


if __name__ == "__main__":
    main()
