#!/usr/bin/env python
"""Minimal lint/format gate (CI stage) — the reference gates on `cargo fmt`
(.github/workflows/rust.yml:21).  ruff/flake8/black are not in this image
(no installs allowed), so this is a self-contained AST + text checker:

  * syntax errors (ast.parse)
  * unused imports (module-level `import x` / `from m import x` never
    referenced elsewhere in the file; `_`-prefixed and __future__ exempt)
  * tabs in indentation, trailing whitespace, missing final newline
  * lines longer than 100 characters

Exit 0 iff clean.  Usage: python scripts/lint.py [paths...]
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LINE = 100

# names that re-export intentionally (package __init__ surface) are exempt
# when the module defines __all__ or the file is an __init__.py
def _imported_names(tree: ast.AST):
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                yield node.lineno, a.asname or a.name.split(".")[0]
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                yield node.lineno, a.asname or a.name


def _used_names(tree: ast.AST):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    return used


def check_file(path: Path) -> list[str]:
    errs = []
    text = path.read_text()
    try:
        tree = ast.parse(text, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    lines = text.splitlines()
    noqa = {i for i, line in enumerate(lines, 1) if "# noqa" in line}
    for i, line in enumerate(lines, 1):
        if i in noqa:
            continue
        if line != line.rstrip():
            errs.append(f"{path}:{i}: trailing whitespace")
        stripped = line.lstrip(" ")
        if stripped.startswith("\t"):
            errs.append(f"{path}:{i}: tab in indentation")
        if len(line) > MAX_LINE:
            errs.append(f"{path}:{i}: line too long ({len(line)} > {MAX_LINE})")
    if text and not text.endswith("\n"):
        errs.append(f"{path}: missing final newline")

    if path.name != "__init__.py":
        used = _used_names(tree)
        # names referenced only inside docstring doctests / __all__ strings
        consts = {
            n.value
            for n in ast.walk(tree)
            if isinstance(n, ast.Constant) and isinstance(n.value, str)
        }
        for lineno, name in _imported_names(tree):
            if name.startswith("_") or lineno in noqa:
                continue
            if name not in used and name not in consts:
                errs.append(f"{path}:{lineno}: unused import '{name}'")
    return errs


def main(argv: list[str]) -> int:
    roots = [Path(a) for a in argv] or [
        Path("halo2_tpu"),
        Path("tests"),
        Path("scripts"),
        Path("bench.py"),
        Path("__graft_entry__.py"),
    ]
    files = []
    for r in roots:
        if r.is_dir():
            files.extend(sorted(r.rglob("*.py")))
        else:
            files.append(r)
    all_errs = []
    for f in files:
        if "__pycache__" in f.parts:
            continue
        all_errs.extend(check_file(f))
    for e in all_errs:
        print(e)
    print(f"lint: {len(files)} files, {len(all_errs)} findings")
    return 1 if all_errs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
