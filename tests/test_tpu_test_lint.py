"""Static undefined-name lint for TPU-gated test files.

tests/test_pallas_tpu.py module-skips unless RUN_TPU_TESTS=1, so the CPU
suite never executes its test bodies — a refactor once moved a name out
of its import list and the resulting NameError was only visible on
hardware runs. This check parses the gated file and verifies every name
*loaded* in a function body is bound somewhere: function-locally, at
module level (imports/defs/assignments), or as a builtin. Conservative
on scoping (anything stored anywhere in the function counts as bound),
so it cannot false-alarm; it exists to catch exactly the
unbound-anywhere case.
"""
import ast
import builtins
from pathlib import Path

TESTS_DIR = Path(__file__).resolve().parent
GATED_FILES = ["test_pallas_tpu.py"]


def _module_level_names(tree: ast.Module) -> set:
    names = set()
    for node in tree.body:
        if isinstance(node, ast.Import):
            names.update(a.asname or a.name.split(".")[0] for a in node.names)
        elif isinstance(node, ast.ImportFrom):
            names.update(a.asname or a.name for a in node.names)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            names.add(node.name)
        elif isinstance(node, (ast.Assign, ast.AugAssign, ast.AnnAssign)):
            for t in ast.walk(node):
                if isinstance(t, ast.Name) and isinstance(t.ctx, ast.Store):
                    names.add(t.id)
        elif isinstance(node, (ast.If, ast.Try, ast.With)):
            # names bound inside module-level control flow (e.g. gated
            # imports) still land in module scope
            for t in ast.walk(node):
                if isinstance(t, ast.Name) and isinstance(t.ctx, ast.Store):
                    names.add(t.id)
                elif isinstance(t, (ast.Import, ast.ImportFrom)):
                    names.update(a.asname or (a.name or "*").split(".")[0]
                                 for a in t.names)
    return names


def _function_loads_unbound(fn: ast.FunctionDef, module_names: set) -> set:
    bound = {a.arg for a in (fn.args.args + fn.args.posonlyargs
                             + fn.args.kwonlyargs)}
    if fn.args.vararg:
        bound.add(fn.args.vararg.arg)
    if fn.args.kwarg:
        bound.add(fn.args.kwarg.arg)
    loads = set()
    for node in ast.walk(fn):
        if isinstance(node, ast.Name):
            if isinstance(node.ctx, ast.Store):
                bound.add(node.id)
            elif isinstance(node.ctx, ast.Load):
                loads.add(node.id)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            bound.update(a.asname or (a.name or "*").split(".")[0]
                         for a in node.names)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.Lambda)):
            if node is not fn:
                # nested callables get their params counted as bound —
                # conservative, keeps the checker false-positive-free
                a = node.args
                bound.update(x.arg for x in (a.args + a.posonlyargs
                                             + a.kwonlyargs))
                if a.vararg:
                    bound.add(a.vararg.arg)
                if a.kwarg:
                    bound.add(a.kwarg.arg)
    return {n for n in loads
            if n not in bound
            and n not in module_names
            and not hasattr(builtins, n)}


def test_tpu_gated_files_have_no_unbound_names():
    problems = []
    for fname in GATED_FILES:
        path = TESTS_DIR / fname
        tree = ast.parse(path.read_text(), filename=str(path))
        module_names = _module_level_names(tree)
        for node in tree.body:
            if isinstance(node, ast.FunctionDef):
                missing = _function_loads_unbound(node, module_names)
                for name in sorted(missing):
                    problems.append(f"{fname}:{node.name}: "
                                    f"unbound name {name!r}")
    assert not problems, "\n".join(problems)


def test_lint_catches_a_seeded_unbound_name():
    """The checker must actually flag the failure mode it exists for
    (a name used in a test body but missing from the imports)."""
    src = ("import os\n"
           "def test_x():\n"
           "    ref = pospopcnt_ref(os.getpid())\n")
    tree = ast.parse(src)
    module_names = _module_level_names(tree)
    fn = tree.body[1]
    assert _function_loads_unbound(fn, module_names) == {"pospopcnt_ref"}
