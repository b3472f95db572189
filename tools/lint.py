"""In-repo lint: the static checks `make lint` enforces.

The reference gates on rustfmt + clippy `-D warnings`
(.github/workflows/ci.yml:14-96, Cargo.toml:31-58). This image ships no
Python linters (ruff/flake8/pylint absent), so the equivalent gate is
implemented here with stdlib ast — deliberately small, zero-config, and
strict: any finding fails the build.

Checks:
  unused-import      import never referenced in the module
  bare-except        `except:` catches SystemExit/KeyboardInterrupt
  mutable-default    def f(x=[]) / {} / set() — shared across calls
  eq-none            `== None` / `!= None` (use is / is not)
  eq-bool            `== True` / `== False`
  f-string-no-field  f"..." without any placeholder
  tab-indent         literal tab in indentation
  dup-test-name      two tests with one name — the first silently never runs
  trailing-ws        trailing whitespace (style drift)

Run: python tools/lint.py [paths...]   (default: the package + tests +
benches + examples + bench.py + __graft_entry__.py + tools)
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

DEFAULT_PATHS = [
    "trueno_rag_tpu", "tests", "benches", "examples", "tools",
    "bench.py", "__graft_entry__.py",
]


def iter_files(paths):
    for p in paths:
        path = Path(p)
        if path.is_dir():
            yield from sorted(path.rglob("*.py"))
        elif path.suffix == ".py":
            yield path


class Checker(ast.NodeVisitor):
    def __init__(self, tree: ast.AST, source: str, path: Path) -> None:
        self.path = path
        self.findings: list[tuple[int, str, str]] = []
        self.imported: dict[str, tuple[int, str]] = {}
        self.used_names: set[str] = set()
        self.test_names: dict[str, int] = {}
        self.source = source
        self.visit(tree)

    def add(self, node, code, msg):
        self.findings.append((node.lineno, code, msg))

    # -- imports -----------------------------------------------------------
    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imported[name] = (node.lineno, a.name)

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            self.imported[a.asname or a.name] = (node.lineno, a.name)

    def visit_Name(self, node):
        self.used_names.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)

    # -- checks ------------------------------------------------------------
    def visit_ExceptHandler(self, node):
        if node.type is None:
            self.add(node, "bare-except",
                     "bare `except:` also catches SystemExit/KeyboardInterrupt")
        self.generic_visit(node)

    def _check_defaults(self, node):
        for d in list(node.args.defaults) + [d for d in node.args.kw_defaults if d]:
            if isinstance(d, (ast.List, ast.Dict, ast.Set)) or (
                isinstance(d, ast.Call)
                and isinstance(d.func, ast.Name)
                and d.func.id in ("list", "dict", "set")
            ):
                self.add(d, "mutable-default",
                         "mutable default argument is shared across calls")

    def visit_FunctionDef(self, node):
        self._check_defaults(node)
        if node.name.startswith("test_") and self.path.name.startswith("test"):
            if node.name in self.test_names:
                self.add(node, "dup-test-name",
                         f"duplicate test name {node.name!r} "
                         f"(first at line {self.test_names[node.name]} never runs)")
            else:
                self.test_names[node.name] = node.lineno
        self.generic_visit(node)

    def visit_AsyncFunctionDef(self, node):
        self._check_defaults(node)
        self.generic_visit(node)

    def visit_Compare(self, node):
        for op, right in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Eq, ast.NotEq)):
                if isinstance(right, ast.Constant) and right.value is None:
                    self.add(node, "eq-none", "compare to None with `is` / `is not`")
                # `is True/False` comparison must use identity checks (note:
                # 0/1 equal True/False under ==, so `value in (True, False)`
                # would also flag `== 0`)
                elif isinstance(right, ast.Constant) and (
                    right.value is True or right.value is False
                ):
                    self.add(node, "eq-bool", "compare to booleans directly, not with ==")
        self.generic_visit(node)

    def visit_FormattedValue(self, node):
        # visit the interpolated expression but NOT the format spec: a
        # spec like `:.4f` parses as an inner JoinedStr with no fields
        # and would false-positive f-string-no-field
        self.visit(node.value)

    def visit_JoinedStr(self, node):
        if not any(isinstance(v, ast.FormattedValue) for v in node.values):
            self.add(node, "f-string-no-field", "f-string without placeholders")
        self.generic_visit(node)

    def finish(self):
        # module-level __all__ strings count as usage (re-export surfaces)
        for name, (lineno, orig) in sorted(self.imported.items()):
            if name in self.used_names or name == "_":
                continue
            if f'"{name}"' in self.source or f"'{name}'" in self.source:
                continue  # referenced by string (e.g. __all__, getattr)
            self.findings.append(
                (lineno, "unused-import", f"{orig!r} imported but unused")
            )
        return sorted(self.findings)


def lint_file(path: Path) -> list[str]:
    source = path.read_text(encoding="utf-8")
    out = []
    try:
        tree = ast.parse(source, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax-error {e.msg}"]
    checker = Checker(tree, source, path)
    for lineno, code, msg in checker.finish():
        out.append(f"{path}:{lineno}: {code} {msg}")
    for i, line in enumerate(source.splitlines(), 1):
        stripped = line.rstrip("\n")
        if stripped != stripped.rstrip():
            out.append(f"{path}:{i}: trailing-ws trailing whitespace")
        indent = stripped[: len(stripped) - len(stripped.lstrip())]
        if "\t" in indent:
            out.append(f"{path}:{i}: tab-indent tab in indentation")
    return out


def main(argv) -> int:
    paths = argv[1:] or DEFAULT_PATHS
    findings = []
    n_files = 0
    for f in iter_files(paths):
        n_files += 1
        findings.extend(lint_file(f))
    for line in findings:
        print(line)
    print(f"lint: {n_files} files, {len(findings)} findings", file=sys.stderr)
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
