#!/usr/bin/env python
"""Static lint gate: unused imports + undefined names, stdlib-only.

The reference CI enforces ``cargo clippy -D warnings``
(/root/reference/.github/workflows/ci.yml:12-31); this is the local
analogue for environments without ruff (CI additionally runs ruff —
.github/workflows/ci.yml).  Checks, per file:

  * F401 unused imports      — via the ``ast`` module (respects
    ``# noqa`` on the import's first line, ``__all__`` re-exports, and
    conventional ``as _``/same-name re-export aliases in __init__.py).
  * F821 undefined names     — via ``symtable``: any name loaded in a
    scope that is neither bound locally, a parameter, a global/builtin,
    an import, nor visible in an enclosing function scope.

Usage:  python scripts/lint.py [paths...]      (default: the repo tree)
Exit 1 on any finding — wired into ``make lint``.
"""

from __future__ import annotations

import ast
import builtins
import sys
import symtable
from pathlib import Path

REPO = Path(__file__).parent.parent

DEFAULT_PATHS = ["voxtral_tpu", "benches", "scripts", "tests", "bench.py",
                 "__graft_entry__.py"]

BUILTINS = set(dir(builtins)) | {"__file__", "__name__", "__doc__",
                                 "__package__", "__spec__", "__builtins__",
                                 "__debug__", "__loader__", "__path__"}


def _noqa_lines(src: str) -> set[int]:
    return {i + 1 for i, line in enumerate(src.splitlines())
            if "# noqa" in line}


def check_unused_imports(path: Path, tree: ast.AST, src: str) -> list[str]:
    noqa = _noqa_lines(src)
    is_init = path.name == "__init__.py"

    imported: dict[str, tuple[int, str]] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = a.asname or a.name.split(".")[0]
                # `import x as x` is the conventional explicit re-export.
                if a.asname and a.asname == a.name:
                    continue
                imported[name] = (node.lineno, a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                if a.asname and a.asname == a.name:
                    continue
                name = a.asname or a.name
                imported[name] = (node.lineno, a.name)

    used: set[str] = set()
    exported: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass  # the base Name node is walked separately
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    v = node.value
                    if isinstance(v, (ast.List, ast.Tuple)):
                        exported |= {e.value for e in v.elts
                                     if isinstance(e, ast.Constant)
                                     and isinstance(e.value, str)}

    # String-annotation uses ("jax.Array" in quotes) — cheap approximation:
    # count any imported name appearing inside string constants.
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            for name in imported:
                if name in node.value:
                    used.add(name)

    out = []
    for name, (lineno, target) in sorted(imported.items(),
                                         key=lambda kv: kv[1][0]):
        if name in used or name in exported or lineno in noqa:
            continue
        if is_init:
            continue  # package surfaces re-export by convention
        out.append(f"{path}:{lineno}: F401 unused import '{target}'"
                   + (f" as '{name}'" if name != target else ""))
    return out


def _scope_findings(path: Path, table: symtable.SymbolTable,
                    enclosing: set[str], noqa: set[int]) -> list[str]:
    out: list[str] = []
    local_names = {s.get_name() for s in table.get_symbols()
                   if s.is_local() or s.is_parameter() or s.is_imported()
                   or s.is_assigned()}
    if table.get_type() == "class":
        # Class bodies don't contribute to nested function scopes.
        child_enclosing = enclosing
    else:
        child_enclosing = enclosing | local_names

    if table.get_type() != "class":
        for s in table.get_symbols():
            name = s.get_name()
            if not s.is_referenced():
                continue
            if (s.is_local() or s.is_parameter() or s.is_imported()
                    or s.is_assigned() or s.is_global()
                    or s.is_declared_global() or s.is_free()):
                continue
            if name in BUILTINS or name in enclosing:
                continue
            line = table.get_lineno()
            if line in noqa:
                continue
            out.append(f"{path}:{line}: F821 undefined name '{name}' "
                       f"(in {table.get_name()})")

    for child in table.get_children():
        out.extend(_scope_findings(path, child, child_enclosing, noqa))
    return out


def check_undefined_names(path: Path, src: str) -> list[str]:
    try:
        table = symtable.symtable(src, str(path), "exec")
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]
    noqa = _noqa_lines(src)
    module_names = {s.get_name() for s in table.get_symbols()}
    out: list[str] = []
    # Module level: globals resolve at runtime; only nested scopes are
    # checked (module-level undefined names crash immediately in tests).
    for child in table.get_children():
        out.extend(_scope_findings(path, child, module_names, noqa))
    return out


def lint_file(path: Path) -> list[str]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]
    return check_unused_imports(path, tree, src) + check_undefined_names(
        path, src)


def main(argv: list[str]) -> int:
    roots = [Path(p) for p in (argv or DEFAULT_PATHS)]
    files: list[Path] = []
    for r in roots:
        r = (REPO / r) if not r.is_absolute() and not r.exists() else r
        if r.is_dir():
            files.extend(sorted(r.rglob("*.py")))
        elif r.suffix == ".py":
            files.append(r)
    findings: list[str] = []
    for f in files:
        findings.extend(lint_file(f))
    for line in findings:
        print(line)
    print(f"lint: {len(files)} files, {len(findings)} findings",
          file=sys.stderr)
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
