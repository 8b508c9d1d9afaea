"""Self-contained mutation testing (mutmut is not installable here).

Round-2 verdict: the mutation workflow ran `mutmut ... || true` — it
could never fail and recorded no score.  This harness needs no external
package: it enumerates AST-level mutation sites (comparison flips,
arithmetic swaps, and/or swaps, boolean-constant flips, off-by-one on
integer literals) in the pure-Python pipeline/utils layers, applies one
mutant at a time to the working tree (restoring the original bytes in a
finally), runs the module's fastest killing test subset in a
subprocess, and scores killed / tried.  Timeouts count as killed
(an infinite loop IS a detected behavior change), import errors as
killed, clean exits as SURVIVED.

Usage:
  python scripts/mutation_score.py [--max-mutants 60] [--seed 0]
                                   [--out MUTATION.json] [--fail-under 0]
Prints one JSON line and writes the full report; exits non-zero when
the score is below --fail-under (the CI gate).
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_repo = str(_Path(__file__).resolve().parent.parent)
if _repo not in _sys.path:
    _sys.path.insert(0, _repo)

import argparse
import ast
import json
import os
import random
import subprocess
import sys
import time
from pathlib import Path

# module -> the fastest test subset that should kill its mutants
# (SURVEY.md §4: unit tests with fakes are the reference's whole
# strategy; the mapping keeps per-mutant wall-clock bounded)
FAST_TESTS = ["tests/test_utils_infra.py", "tests/test_infra_edges.py"]
PIPE_TESTS = ["tests/test_pipeline.py"]
TARGETS = {
    "advanced_rag_tpu/utils/cache.py": FAST_TESTS,
    "advanced_rag_tpu/utils/circuit_breaker.py": FAST_TESTS,
    "advanced_rag_tpu/utils/db_pool.py": FAST_TESTS,
    "advanced_rag_tpu/pipeline/experiments.py": PIPE_TESTS,
    "advanced_rag_tpu/pipeline/query_ops.py": PIPE_TESTS,
    "advanced_rag_tpu/pipeline/enrichment.py": PIPE_TESTS,
    "advanced_rag_tpu/pipeline/diagnostics.py": PIPE_TESTS,
    "advanced_rag_tpu/pipeline/chunking.py": PIPE_TESTS,
    "advanced_rag_tpu/pipeline/evaluation.py": PIPE_TESTS,
    "advanced_rag_tpu/pipeline/compliance.py": PIPE_TESTS,
    "advanced_rag_tpu/pipeline/ranker.py": PIPE_TESTS,
}

CMP_SWAP = {ast.Lt: ast.LtE, ast.LtE: ast.Lt, ast.Gt: ast.GtE,
            ast.GtE: ast.Gt, ast.Eq: ast.NotEq, ast.NotEq: ast.Eq}
BIN_SWAP = {ast.Add: ast.Sub, ast.Sub: ast.Add,
            ast.Mult: ast.Div, ast.Div: ast.Mult}


def enumerate_sites(src: str):
    """-> [(lineno, col, kind)] of mutable sites in source order."""
    tree = ast.parse(src)
    sites = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Compare) and len(node.ops) == 1 \
                and type(node.ops[0]) in CMP_SWAP:
            sites.append((node.lineno, node.col_offset, "cmp"))
        elif isinstance(node, ast.BinOp) and type(node.op) in BIN_SWAP:
            sites.append((node.lineno, node.col_offset, "bin"))
        elif isinstance(node, ast.BoolOp):
            sites.append((node.lineno, node.col_offset, "bool"))
        elif isinstance(node, ast.Constant) and node.value is True:
            sites.append((node.lineno, node.col_offset, "true"))
        elif isinstance(node, ast.Constant) and node.value is False:
            sites.append((node.lineno, node.col_offset, "false"))
        elif (isinstance(node, ast.Constant)
              and type(node.value) is int and 0 < abs(node.value) < 1000):
            sites.append((node.lineno, node.col_offset, "int"))
    return sites


class _Mutator(ast.NodeTransformer):
    def __init__(self, target):
        self.target = target          # (lineno, col, kind)
        self.applied = False

    def _is(self, node, kind):
        return (not self.applied
                and (node.lineno, node.col_offset, kind) == self.target)

    def visit_Compare(self, node):
        self.generic_visit(node)
        if self._is(node, "cmp") and len(node.ops) == 1:
            node.ops[0] = CMP_SWAP[type(node.ops[0])]()
            self.applied = True
        return node

    def visit_BinOp(self, node):
        self.generic_visit(node)
        if self._is(node, "bin"):
            node.op = BIN_SWAP[type(node.op)]()
            self.applied = True
        return node

    def visit_BoolOp(self, node):
        self.generic_visit(node)
        if self._is(node, "bool"):
            node.op = ast.Or() if isinstance(node.op, ast.And) else ast.And()
            self.applied = True
        return node

    def visit_Constant(self, node):
        if self._is(node, "true") and node.value is True:
            self.applied = True
            return ast.copy_location(ast.Constant(False), node)
        if self._is(node, "false") and node.value is False:
            self.applied = True
            return ast.copy_location(ast.Constant(True), node)
        if self._is(node, "int") and type(node.value) is int \
                and 0 < abs(node.value) < 1000:
            self.applied = True
            return ast.copy_location(ast.Constant(node.value + 1), node)
        return node


def mutate(src: str, site) -> str:
    tree = ast.parse(src)
    m = _Mutator(site)
    tree = m.visit(tree)
    if not m.applied:
        raise RuntimeError(f"site not found: {site}")
    return ast.unparse(tree)


def run_tests(tests, timeout_s: float) -> str:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    try:
        p = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q", "-p",
             "no:cacheprovider", *tests],
            capture_output=True, timeout=timeout_s, cwd=_repo, env=env)
        return "survived" if p.returncode == 0 else "killed"
    except subprocess.TimeoutExpired:
        return "timeout"          # counted as killed


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-mutants", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="MUTATION.json")
    ap.add_argument("--fail-under", type=float, default=0.0)
    ap.add_argument("--timeout", type=float, default=300.0)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    all_mutants = []
    for path, tests in TARGETS.items():
        src = Path(_repo, path).read_text()
        for site in enumerate_sites(src):
            all_mutants.append((path, site, tests))
    rng.shuffle(all_mutants)
    # spread the sample across modules: round-robin by file
    by_file: dict = {}
    for mut in all_mutants:
        by_file.setdefault(mut[0], []).append(mut)
    sample = []
    while len(sample) < args.max_mutants and any(by_file.values()):
        for path in list(by_file):
            if by_file[path] and len(sample) < args.max_mutants:
                sample.append(by_file[path].pop())

    print(f"{len(all_mutants)} sites; sampling {len(sample)}", flush=True)
    results = {"killed": 0, "survived": 0, "timeout": 0, "skipped": 0}
    survivors = []
    t_start = time.time()
    for i, (path, site, tests) in enumerate(sample):
        full = Path(_repo, path)
        original = full.read_bytes()
        try:
            mutated = mutate(original.decode(), site)
        except (RuntimeError, SyntaxError):
            results["skipped"] += 1
            continue
        try:
            full.write_text(mutated)
            verdict = run_tests(tests, args.timeout)
        finally:
            full.write_bytes(original)
        results[verdict] += 1
        if verdict == "survived":
            survivors.append({"file": path, "line": site[0],
                              "kind": site[2]})
        print(f"  [{i+1}/{len(sample)}] {path}:{site[0]} {site[2]} "
              f"-> {verdict}", flush=True)

    tried = results["killed"] + results["survived"] + results["timeout"]
    score = (results["killed"] + results["timeout"]) / max(tried, 1)
    report = {
        "metric": "mutation_score",
        "value": round(score, 4),
        "unit": "fraction_killed",
        "vs_baseline": None,   # reference never recorded a score either
        "extra": {**results, "tried": tried,
                  "sites_total": len(all_mutants),
                  "survivors": survivors,
                  "elapsed_s": round(time.time() - t_start, 1),
                  "seed": args.seed},
    }
    Path(_repo, args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps({k: report[k] for k in ("metric", "value", "unit")}))
    if score < args.fail_under:
        print(f"FAIL: mutation score {score:.3f} < {args.fail_under}")
        sys.exit(1)


if __name__ == "__main__":
    main()
