"""AST-based lint gate for pecos_tpu (no third-party linters in the image).

Role of the reference's `make format` discipline (reference Makefile:30-48:
black + flake8 + mypy); implemented here as a from-scratch checker:

- syntax: every file must byte-compile
- F401-analog: unused imports (module scope)
- mutable default arguments
- bare `except:`
- `== None` / `!= None` comparisons
- stray breakpoints / pdb imports
- NotImplementedError stub bodies in package (non-test) code
- tabs in indentation

Exit code 1 on any finding.  Run via `make lint` or `make test`.
"""

import ast
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
TARGETS = ["pecos_tpu", "tests", "scripts", "examples", "bench.py", "__graft_entry__.py"]

# names whose import is a re-export or registration side effect
REEXPORT_OK = {"__init__.py"}


def iter_files():
    for t in TARGETS:
        p = REPO / t
        if p.is_file():
            yield p
        else:
            yield from sorted(p.rglob("*.py"))


def module_unused_imports(tree, src):
    """Unused module-scope imports; `as _` and __init__ re-exports excluded."""
    imported = {}  # name -> lineno
    for node in tree.body:
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__" or any(a.name == "*" for a in node.names):
                continue
            for a in node.names:
                imported[a.asname or a.name] = node.lineno
    if not imported:
        return []
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
    # names referenced only inside strings (docstring examples) don't count;
    # names in __all__ do
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    for el in ast.walk(node.value):
                        if isinstance(el, ast.Constant) and isinstance(el.value, str):
                            used.add(el.value)
    out = []
    for name, lineno in imported.items():
        if name not in used and not name.startswith("_"):
            out.append((lineno, f"unused import `{name}`"))
    return out


def check_file(path):
    rel = path.relative_to(REPO)
    src = path.read_text()
    problems = []
    try:
        tree = ast.parse(src, filename=str(rel))
    except SyntaxError as e:
        return [(e.lineno or 0, f"syntax error: {e.msg}")]

    for i, line in enumerate(src.splitlines(), 1):
        if line.startswith("\t") or line.lstrip("\t") != line.lstrip():
            if "\t" in line[: len(line) - len(line.lstrip())]:
                problems.append((i, "tab in indentation"))

    if path.name not in REEXPORT_OK:
        problems.extend(module_unused_imports(tree, src))

    in_package = str(rel).startswith("pecos_tpu/")
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append((node.lineno, "bare `except:` (catch Exception instead)"))
        if isinstance(node, ast.Compare):
            for op, comp in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)) and (
                    isinstance(comp, ast.Constant) and comp.value is None
                ):
                    problems.append((node.lineno, "`== None` (use `is None`)"))
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        (node.lineno, f"mutable default argument in `{node.name}`")
                    )
            if in_package and len(node.body) == 1:
                b = node.body[0]
                if (
                    isinstance(b, ast.Raise)
                    and isinstance(b.exc, (ast.Call, ast.Name))
                    and getattr(
                        b.exc.func if isinstance(b.exc, ast.Call) else b.exc, "id", ""
                    )
                    == "NotImplementedError"
                ):
                    problems.append(
                        (node.lineno, f"NotImplementedError stub `{node.name}`")
                    )
        if isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Name) and f.id == "breakpoint":
                problems.append((node.lineno, "breakpoint() left in code"))
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            names = [a.name for a in node.names]
            if "pdb" in names or getattr(node, "module", "") == "pdb":
                problems.append((node.lineno, "pdb import left in code"))
    return problems


def main():
    total = 0
    nfiles = 0
    for path in iter_files():
        nfiles += 1
        for lineno, msg in sorted(check_file(path)):
            print(f"{path.relative_to(REPO)}:{lineno}: {msg}")
            total += 1
    if total:
        print(f"\nlint: {total} problem(s) across {nfiles} files")
        return 1
    print(f"lint: OK ({nfiles} files)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
