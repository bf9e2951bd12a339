"""In-repo static sanitizer gate (SURVEY §5: the environment ships no
ruff/flake8/mypy, so the gate is a compact AST lint that runs with the
test suite — pyproject.toml also carries a [tool.ruff] config for
environments that have ruff).

Checks every package source file for the defect classes that have bitten
numerical/serving code: syntax errors, bare excepts that can swallow
device OOMs, mutable default arguments, f-string-less format calls left
in asserts, and stray debugging prints in library modules.
"""

import ast
import pathlib
import py_compile

import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / "mistral_inference_tpu"
SOURCES = sorted(PKG.rglob("*.py"))

# Modules whose job is console I/O.
PRINT_OK = {"main.py", "api.py"}


def test_sources_found():
    assert len(SOURCES) > 20


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: str(p.relative_to(PKG)))
def test_compiles(path):
    py_compile.compile(str(path), doraise=True)


@pytest.mark.parametrize("path", SOURCES, ids=lambda p: str(p.relative_to(PKG)))
def test_ast_lint(path):
    tree = ast.parse(path.read_text(), filename=str(path))
    problems = []
    for node in ast.walk(tree):
        # Bare `except:` swallows KeyboardInterrupt and masks device OOMs.
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"line {node.lineno}: bare except")
        # Mutable default arguments are shared across calls.
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None
            ]:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    problems.append(
                        f"line {node.lineno}: mutable default arg in {node.name}"
                    )
        # Debug prints don't belong in library modules (loggers/metrics do).
        if (
            path.name not in PRINT_OK
            and isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "print"
        ):
            problems.append(f"line {node.lineno}: print() in library module")
        # assert with a side-effect-free constant message is fine; assert on
        # a tuple is always-true and a classic silent-pass bug.
        if isinstance(node, ast.Assert) and isinstance(node.test, ast.Tuple):
            problems.append(f"line {node.lineno}: assert on tuple (always true)")
    assert not problems, "\n".join(str(path.relative_to(PKG)) + ": " + p for p in problems)
