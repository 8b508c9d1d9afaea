"""Line-coverage measurement with only the standard library.

This environment has no coverage.py/pytest-cov; CI uses the real tools,
but the published figure must be measurable here too.  Uses the
PEP 669 ``sys.monitoring`` API (Python 3.12+, low overhead) to record
executed lines for every module under ``advanced_rag_tpu``, then
compares against the executable-line universe derived from each
module's compiled code objects (``co_lines``) — the same universe
coverage.py uses, minus its AST-level exclusion pragmas, so this figure
is an *underestimate* of what coverage.py would report (docstrings and
``pragma: no cover`` lines still count as misses here).

Usage:  python scripts/stdlib_coverage.py [pytest args...]
Writes coverage.json {file: {executed, executable, pct}, total_pct}.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
PKG_ROOT = REPO_ROOT / "advanced_rag_tpu"
TOOL_ID = sys.monitoring.PROFILER_ID

_executed: dict[str, set[int]] = defaultdict(set)


def _on_line(code, line_number):
    fn = code.co_filename
    if fn.startswith(str(PKG_ROOT)):
        _executed[fn].add(line_number)
    else:
        return sys.monitoring.DISABLE


def _executable_lines(path: Path) -> set[int]:
    """All line numbers that appear in any code object of the module."""
    try:
        source = path.read_text()
        top = compile(source, str(path), "exec")
    except (SyntaxError, UnicodeDecodeError):
        return set()
    lines: set[int] = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _start, _end, ln in code.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    # Exclusions mirroring coverage.py's defaults where cheaply possible
    src_lines = source.splitlines()
    for i, text in enumerate(src_lines, 1):
        if "pragma: no cover" in text:
            lines.discard(i)
    return lines


def main() -> int:
    sys.monitoring.use_tool_id(TOOL_ID, "stdlib-coverage")
    sys.monitoring.register_callback(
        TOOL_ID, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.set_events(TOOL_ID, sys.monitoring.events.LINE)

    import pytest

    rc = pytest.main(sys.argv[1:] or ["tests/", "-q"])

    sys.monitoring.set_events(TOOL_ID, 0)
    sys.monitoring.free_tool_id(TOOL_ID)

    report: dict[str, dict] = {}
    tot_exec = tot_all = 0
    for path in sorted(PKG_ROOT.rglob("*.py")):
        universe = _executable_lines(path)
        if not universe:
            continue
        hit = _executed.get(str(path), set()) & universe
        tot_exec += len(hit)
        tot_all += len(universe)
        entry = {
            "executed": len(hit),
            "executable": len(universe),
            "pct": round(100.0 * len(hit) / len(universe), 1),
        }
        if os.environ.get("COVERAGE_MISSING"):
            entry["missing"] = sorted(universe - hit)
        report[str(path.relative_to(PKG_ROOT.parent))] = entry
    total = round(100.0 * tot_exec / max(tot_all, 1), 1)
    out = {"files": report, "total_pct": total,
           "note": "stdlib sys.monitoring measurement; underestimates "
                   "coverage.py (no docstring/pragma exclusions beyond "
                   "'pragma: no cover')"}
    Path("coverage.json").write_text(json.dumps(out, indent=1))
    print(f"\nTOTAL stdlib-coverage: {total}% "
          f"({tot_exec}/{tot_all} lines) -> coverage.json")
    return rc


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    raise SystemExit(main())
