"""One source of truth for headline numbers (VERDICT r2 weak #7).

README.md and docs/PERF.md carried hand-copied numbers that drifted
from the shipped artifacts (601-vs-592 QPS, 0.742-vs-0.711 R@10).
This script renders the headline tables FROM the artifacts —
BENCH_r*.json (latest), QUALITY_REAL.json, PARITY_HNSW.json,
MUTATION.json when present — and splices them between AUTOGEN markers:

    <!-- AUTOGEN:<name> (scripts/gen_perf_tables.py) -->
    ...generated...
    <!-- /AUTOGEN:<name> -->

Usage:
  python scripts/gen_perf_tables.py            # rewrite in place
  python scripts/gen_perf_tables.py --check    # CI: fail on drift
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_repo = _Path(__file__).resolve().parent.parent
if str(_repo) not in _sys.path:
    _sys.path.insert(0, str(_repo))

import argparse
import json
import re
import sys


def load_latest_bench():
    benches = sorted(_repo.glob("BENCH_r*.json"))
    if not benches:
        return None, None
    blob = json.loads(benches[-1].read_text())
    return blob.get("parsed") or blob, benches[-1].name


def fmt(x, nd=2):
    return "—" if x is None else f"{x:.{nd}f}".rstrip("0").rstrip(".")


def perf_headline() -> str:
    bench, bench_name = load_latest_bench()
    rows = []
    if bench:
        e = bench.get("extra", {})
        rows.append(("**END-TO-END retrieve** (embed → hybrid @ 1M → "
                     "cross-encoder rerank 20→5 → eval), p50",
                     f"**{fmt(bench.get('value'))} ms**", "80 ms SLA"))
        rows.append(("End-to-end p99 @ 1M", f"{fmt(e.get('p99_ms'))} ms",
                     "300 ms endpoint SLO"))
        q = e.get("qps_pipelined_by_batch", {})
        if q:
            b_best = max(q, key=q.get)
            rows.append(("Throughput, pipelined dispatch (best batch "
                         f"{b_best})", f"**{fmt(q[b_best], 1)} QPS**",
                         '"100+ QPS with sharding"'))
        if e.get("e2e_p50_ms_10M") is not None:
            rows.append(("10M rows on ONE chip, end-to-end p50 / p99",
                         f"**{fmt(e['e2e_p50_ms_10M'])} / "
                         f"{fmt(e.get('e2e_p99_ms_10M'))} ms**",
                         '80 ms SLA, "with sharding"'))
        if e.get("stage_hybrid_ms_b8") is not None:
            rows.append(("Hybrid search stage alone (dense+BM25+RRF+MMR) "
                         "@ 1M, b8, device",
                         f"{fmt(e['stage_hybrid_ms_b8'])} ms",
                         "35–55 ms combined budgets"))
        if e.get("dense_hbm_fraction") is not None:
            rows.append(("Dense scan HBM-roofline fraction (device-true)",
                         f"{fmt(100 * e['dense_hbm_fraction'], 1)}% "
                         f"({fmt(e.get('dense_sq8_gbs'), 0)}–"
                         f"{fmt(e.get('dense_1536_gbs'), 0)} GB/s)",
                         'Milvus "vector search 20–30 ms"'))
    parity = _repo / "PARITY_HNSW.json"
    if parity.exists():
        configs = json.loads(parity.read_text())
        for c in configs:
            h = c["tiers"].get("hnsw_m16_ef64")
            if not h:
                continue
            ours = {k: v for k, v in c["tiers"].items()
                    if k != "hnsw_m16_ef64"}
            if not ours:
                continue
            best = max(ours.values(), key=lambda t: t["recall_at_10"])
            rows.append((
                f"recall@10 vs HNSW (M=16/ef=64), {c['corpus']} "
                f"{c['n']:,}×{c['dim']}",
                f"**{fmt(best['recall_at_10'], 3)}** vs HNSW "
                f"{fmt(h['recall_at_10'], 3)} "
                f"({fmt(best['bytes_per_row'], 0)} vs "
                f"{fmt(h['bytes_per_row'], 0)} B/row)",
                '"HNSW quality" assumed'))
    quality = _repo / "QUALITY_REAL.json"
    if quality.exists():
        qr = json.loads(quality.read_text())
        t = qr.get("tiers", {})
        best_name = max(
            (n for n in t if "reused" not in str(t[n])),
            key=lambda n: t[n].get("recall_at_10", 0), default=None)
        if best_name:
            rows.append((
                f"Real-text retrieval quality, best tier ({best_name}, "
                f"{qr.get('n_docs', '?')} docs)",
                f"R@10 **{fmt(t[best_name]['recall_at_10'], 3)}** / "
                f"MRR@10 {fmt(t[best_name]['mrr_at_10'], 3)}",
                "reference placeholder scores"))
    src = f" (generated from {bench_name}, QUALITY_REAL.json, " \
          f"PARITY_HNSW.json)" if bench else ""
    out = [f"| Metric | Value | Reference target |{src and ''}",
           "|---|---|---|"]
    out += [f"| {a} | {b} | {c} |" for a, b, c in rows]
    return "\n".join(out)


def quality_table() -> str:
    qr = json.loads((_repo / "QUALITY_REAL.json").read_text())
    order = ["bm25", "hash_hybrid", "trained_hybrid", "trained_dense_only",
             "trained_hybrid_adapted", "bm25_test_half", "trained_rescored",
             "trained_reranked", "fused_reranked", "fused_reranked_dd",
             "fused_serving"]
    label = {
        "bm25": "BM25 only (full query set)",
        "hash_hybrid": "hash hybrid (training-free), default 0.7/0.3",
        "trained_hybrid": "trained hybrid, default 0.7/0.3",
        "trained_dense_only": "trained dense only",
        "trained_hybrid_adapted":
            "trained hybrid, ADAPTED weights (test half)",
        "bm25_test_half": "BM25 on the same test half",
        "trained_rescored":
            "+ exact tier rescore base, no CE (test half)",
        "trained_reranked":
            "**+ trained cross-encoder rerank (test half)**",
        "fused_reranked":
            "**+ fused one-dispatch rerank (`ops/e2e.py`, test half)**",
        "fused_reranked_dd":
            "**+ fused rerank, doc-distinct slate (`doc_dedupe`)**",
        "fused_serving":
            "**fused SERVING shape (dev-picked k x dedupe, test half)**",
    }
    out = ["| Tier | R@10 | MRR@10 |", "|---|---|---|"]
    for name in order:
        t = qr.get("tiers", {}).get(name)
        if not t:
            continue
        out.append(f"| {label.get(name, name)} | "
                   f"{fmt(t['recall_at_10'], 3)} | "
                   f"{fmt(t['mrr_at_10'], 3)} |")
    out.append("")
    pv = qr.get("protocol_version",
                2 if qr.get("protocol", {}).get("chunked") else 1)
    out.append(f"({qr.get('n_docs')} docs, {qr.get('n_queries')} queries, "
               f"quality protocol v{pv} "
               f"({'chunked doc-level' if pv >= 2 else 'whole-doc'}); "
               "rows are comparable only within one protocol version; "
               "generated from QUALITY_REAL.json — do not hand-edit)")
    return "\n".join(out)


def parity_table() -> str:
    p = _repo / "PARITY_HNSW.json"
    if not p.exists():
        return "PARITY_HNSW.json not yet generated this round."
    configs = json.loads(p.read_text())
    out = []
    for c in configs:
        out.append(f"**{c['corpus']} {c['n']:,}×{c['dim']}** "
                   f"({c['queries']} queries, recall@{c['k']} vs exact "
                   "f32 oracle):")
        out.append("")
        out.append("| Tier | recall@10 | B/row | ms/query | build |")
        out.append("|---|---|---|---|---|")
        for name, t in c["tiers"].items():
            ms = t.get("device_ms_per_query_b8",
                       t.get("device_ms_per_query_unbatched"))
            col = (f"{fmt(ms, 2)} (device b8)"
                   if "device_ms_per_query_b8" in t else
                   f"{fmt(t['cpu_ms_per_query'], 2)} (host 1 core)"
                   if "cpu_ms_per_query" in t else
                   f"{fmt(ms, 2)} (CPU fallback)")
            nb = f" np={t['nprobe']}" if "nprobe" in t else ""
            out.append(f"| {name}{nb} | {fmt(t['recall_at_10'], 3)} | "
                       f"{fmt(t['bytes_per_row'], 0)} | {col} | "
                       f"{fmt(t['build_s'], 0)} s |")
        out.append("")
    out.append("(generated from PARITY_HNSW.json — do not hand-edit)")
    return "\n".join(out)


def mutation_line() -> str:
    p = _repo / "MUTATION.json"
    if not p.exists():
        return "Mutation score: not yet measured."
    m = json.loads(p.read_text())
    e = m.get("extra", {})
    return (f"Mutation score: **{fmt(m.get('value'), 3)}** "
            f"({e.get('killed', 0)} killed + {e.get('timeout', 0)} timeout "
            f"of {e.get('tried', 0)} sampled mutants across "
            f"{e.get('sites_total', '?')} sites; "
            "scripts/mutation_score.py, gate 0.60 in mutation.yml).")


BLOCKS = {
    "perf-headline": perf_headline,
    "quality-table": quality_table,
    "parity-table": parity_table,
    "mutation-score": mutation_line,
}
FILES = ["README.md", "docs/PERF.md"]


def splice(text: str, name: str, body: str):
    start = f"<!-- AUTOGEN:{name} (scripts/gen_perf_tables.py) -->"
    end = f"<!-- /AUTOGEN:{name} -->"
    pattern = re.compile(re.escape(start) + r".*?" + re.escape(end),
                         re.DOTALL)
    if not pattern.search(text):
        return text, False
    return pattern.sub(start + "\n" + body + "\n" + end, text), True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    drift = []
    for fname in FILES:
        path = _repo / fname
        orig = path.read_text()
        text = orig
        for name, gen in BLOCKS.items():
            text, _found = splice(text, name, gen())
        if text != orig:
            if args.check:
                drift.append(fname)
            else:
                path.write_text(text)
                print(f"updated {fname}")
    if args.check and drift:
        print(f"DRIFT: {drift} out of date — run "
              "python scripts/gen_perf_tables.py")
        sys.exit(1)
    print("ok")


if __name__ == "__main__":
    main()
